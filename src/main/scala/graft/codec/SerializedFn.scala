package graft.codec

import java.io._

/** Closures as column data: a serialized zero-arg function stored in a
  * struct `{func_bytes: binary, func_class: string}`.
  *
  * Capability from the reference's pickled-callable column
  * (ref: oarphpy/spark.py:971-1088): a row carries a function that loads
  * its payload on demand (flyweight-factory pattern, ref docstring
  * oarphpy/spark.py:995-1013). On the JVM the closure must be
  * `Serializable`, and — exactly like the reference warns for cloudpickle
  * (ref: oarphpy/spark.py:986-993) — deserialization is only safe with
  * the same classpath/versions. Empty/absent callables round-trip as an
  * empty byte array and throw on invocation (ref: oarphpy/spark.py:1043-1050).
  */
final case class SerializedFn(func_bytes: Array[Byte], func_class: String) {

  def isEmpty: Boolean = func_bytes.isEmpty

  def invoke[T](): T = {
    if (isEmpty)
      throw new IllegalStateException("invoking empty SerializedFn")
    val in = new ObjectInputStream(new ByteArrayInputStream(func_bytes))
    try in.readObject().asInstanceOf[() => T].apply()
    finally in.close()
  }

  override def equals(o: Any): Boolean = o match {
    case f: SerializedFn =>
      func_class == f.func_class &&
        java.util.Arrays.equals(func_bytes, f.func_bytes)
    case _ => false
  }
  override def hashCode(): Int =
    (func_class, java.util.Arrays.hashCode(func_bytes)).hashCode()
}

object SerializedFn {
  val empty: SerializedFn = SerializedFn(Array.emptyByteArray, "")

  def apply[T](fn: () => T): SerializedFn = {
    val bos = new ByteArrayOutputStream()
    val out = new ObjectOutputStream(bos)
    try { out.writeObject(fn); out.flush() } finally out.close()
    SerializedFn(bos.toByteArray, fn.getClass.getName)
  }
}
