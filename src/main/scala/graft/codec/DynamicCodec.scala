package graft.codec

import org.apache.spark.sql.{DataFrame, Dataset, Encoder, Encoders, Row, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.StructType
import scala.reflect.runtime.universe.TypeTag
import graft.operators.UnionDfs

/** Dynamic heterogeneous-record codec — the RowAdapter-parity layer
  * (SURVEY §7.4.1; ref: oarphpy/spark.py:1091-1250).
  *
  * Primary path in this engine is the static one: `Dataset[T]` with a
  * case-class `Encoder` — idiomatic, codegen'd, zero overhead. This
  * class covers the reference's *dynamic* capability: MIXED object types
  * in one DataFrame, discriminated by a `_class` column (the analog of
  * the reference's `__pyclass__`, ref: oarphpy/spark.py:1169-1190), with
  * the decode side resolving classes through an explicit REGISTRY rather
  * than arbitrary-classloading (the reference's `pydoc.resolve`,
  * ref: oarphpy/spark.py:1141-1146 — intentional divergence, documented:
  * arbitrary-class resolution on the JVM is a classloader hazard).
  *
  * Schema-evolution contract on decode (ref: oarphpy/spark.py:1113-1118,
  * 1210-1222): fields in the data but not on the class are ignored;
  * fields on the class but not in the data decode as null/None — both
  * replicated via align().
  */
class DynamicCodec extends Serializable {

  case class Entry(
      className: String,
      schema: StructType,
      enc: Encoder[_],
      mk: (SparkSession, Seq[Any]) => DataFrame,
      rd: DataFrame => Seq[Any])

  private val registry = scala.collection.mutable.LinkedHashMap[String, Entry]()

  val ClassCol = "_class"

  def register[T <: Product : TypeTag : scala.reflect.ClassTag](): Unit = {
    val enc: Encoder[T] = Encoders.product[T]
    val name = scala.reflect.classTag[T].runtimeClass.getName
    val mk = (spark: SparkSession, objs: Seq[Any]) =>
      spark.createDataset(objs.map(_.asInstanceOf[T]))(enc).toDF()
    val rd = (df: DataFrame) =>
      df.as[T](enc).collect().toSeq.map(_.asInstanceOf[Any])
    registry(name) = Entry(name, enc.schema, enc, mk, rd)
  }

  def registered: Seq[String] = registry.keys.toSeq

  /** Mixed objects → one DataFrame with `_class` discriminator; schemas
    * merged across classes via the schema-reconciling union. */
  def toDf(spark: SparkSession, objs: Seq[Product]): DataFrame = {
    require(objs.nonEmpty, "no objects")
    val byClass = objs.groupBy(_.getClass.getName)
    val frames = byClass.map { case (cls, os) =>
      val e = registry.getOrElse(cls,
        throw new IllegalArgumentException(
          s"unregistered class $cls; registered: ${registered.mkString(", ")}"))
      e.mk(spark, os).withColumn(ClassCol, lit(cls))
    }.toSeq
    UnionDfs(frames: _*)
  }

  /** Align a frame to a class schema: drop unknown columns, null-pad
    * missing ones, restore declaration order. */
  private def align(df: DataFrame, schema: StructType): DataFrame = {
    val have = df.columns.toSet
    df.select(schema.fields.map { f =>
      if (have(f.name)) col(f.name).cast(f.dataType)
      else lit(null).cast(f.dataType).as(f.name)
    }.toIndexedSeq: _*)
  }

  /** Decode a discriminated DataFrame back to objects (driver-side
    * collect — for distributed typed processing use `typedSlice`). */
  def fromDf(df: DataFrame): Seq[Any] = {
    val classes = df.select(col(ClassCol)).distinct()
      .collect().map(_.getString(0)).toSeq
    classes.flatMap { cls =>
      val e = registry.getOrElse(cls,
        throw new IllegalArgumentException(s"unregistered class $cls"))
      e.rd(align(df.filter(col(ClassCol) === cls), e.schema))
    }
  }

  /** Distributed typed view of one class's slice (no collect). */
  def typedSlice[T <: Product : TypeTag : scala.reflect.ClassTag](
      df: DataFrame): Dataset[T] = {
    val enc = Encoders.product[T]
    val cls = scala.reflect.classTag[T].runtimeClass.getName
    align(df.filter(col(ClassCol) === cls), enc.schema).as[T](enc)
  }
}
