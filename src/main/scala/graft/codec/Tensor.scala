package graft.codec

import java.nio.{ByteBuffer, ByteOrder}

/** Tensor column codec: fixed struct schema with size-triggered packed
  * encoding.
  *
  * Schema contract from the reference (ref: oarphpy/spark.py:933-968):
  * `{shape: array<long>, dtype: string, order: string, values: array<T>,
  * values_packed: binary}` — small tensors stay SQL-queryable as
  * `array<double>`, tensors ≥ 2 KiB (ref: oarphpy/spark.py:931
  * TENSOR_AUTO_PACK_MIN_KBYTES) are stored as ONE little-endian C-order
  * binary blob readable by any BLAS wrapper without Spark
  * (ref: oarphpy/spark.py:936-938 documents external readability as the
  * contract — hence a plain struct, NOT a UserDefinedType, matching the
  * reference's explicit UDT avoidance at oarphpy/spark.py:1103-1107).
  */
final case class Tensor(
    shape: Seq[Long],
    dtype: String,
    order: String,
    values: Seq[Double],
    values_packed: Array[Byte]) {

  def numElements: Long = if (shape.isEmpty) 0L else shape.product

  def toDoubles: Array[Double] =
    if (values.nonEmpty) values.toArray
    else {
      val bb = ByteBuffer.wrap(values_packed).order(ByteOrder.LITTLE_ENDIAN)
      val out = new Array[Double](values_packed.length / 8)
      var i = 0
      while (i < out.length) { out(i) = bb.getDouble(i * 8); i += 1 }
      out
    }

  // Array[Byte] breaks case-class equality; compare by content.
  override def equals(o: Any): Boolean = o match {
    case t: Tensor =>
      shape == t.shape && dtype == t.dtype && order == t.order &&
        values == t.values &&
        java.util.Arrays.equals(values_packed, t.values_packed)
    case _ => false
  }
  override def hashCode(): Int =
    (shape, dtype, order, values,
      java.util.Arrays.hashCode(values_packed)).hashCode()
}

object Tensor {
  /** Pack threshold in bytes (ref: oarphpy/spark.py:931 — 2 KiB). */
  val AutoPackMinBytes: Int = 2 * 1024

  val COrder = "C"

  def fromDoubles(data: Array[Double], shape: Seq[Long] = Seq.empty): Tensor = {
    val shp = if (shape.nonEmpty) shape else Seq(data.length.toLong)
    require(shp.product == data.length,
      s"shape ${shp.mkString("x")} != ${data.length} elements")
    if (data.length * 8 >= AutoPackMinBytes) {
      val bb = ByteBuffer.allocate(data.length * 8).order(ByteOrder.LITTLE_ENDIAN)
      data.foreach(bb.putDouble)
      Tensor(shp, "float64", COrder, Seq.empty, bb.array())
    } else {
      Tensor(shp, "float64", COrder, data.toSeq, Array.emptyByteArray)
    }
  }

  def fromFloats(data: Array[Float], shape: Seq[Long] = Seq.empty): Tensor = {
    val shp = if (shape.nonEmpty) shape else Seq(data.length.toLong)
    require(shp.product == data.length,
      s"shape ${shp.mkString("x")} != ${data.length} elements")
    if (data.length * 4 >= AutoPackMinBytes) {
      val bb = ByteBuffer.allocate(data.length * 4).order(ByteOrder.LITTLE_ENDIAN)
      data.foreach(bb.putFloat)
      Tensor(shp, "float32", COrder, Seq.empty, bb.array())
    } else {
      Tensor(shp, "float32", COrder, data.map(_.toDouble).toSeq, Array.emptyByteArray)
    }
  }

  def toFloats(t: Tensor): Array[Float] =
    if (t.values.nonEmpty) t.values.map(_.toFloat).toArray
    else {
      val bb = ByteBuffer.wrap(t.values_packed).order(ByteOrder.LITTLE_ENDIAN)
      val out = new Array[Float](t.values_packed.length / 4)
      var i = 0
      while (i < out.length) { out(i) = bb.getFloat(i * 4); i += 1 }
      out
    }
}
