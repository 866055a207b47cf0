package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import java.nio.file.Files

/** Scalar-type matrix + nesting + negative paths, replicating the
  * reference's schema-assertion backbone (FIXTURES.md §1-2; ref:
  * oarphpy_test/test_spark.py:544-551, 975-995, 566-571, 595-629). */
case class DeepNest(x: Map[String, Seq[Map[String, Seq[Inner]]]])
case class Inner(foo: Long, bar: String)

class TypeMatrixSpec extends AnyFunSuite {
  lazy val spark = SparkFixture.spark
  import spark.implicits._

  test("scalar type inference matrix (boolean/bigint/double/string/binary)") {
    // Spark dtypes asserted exactly as the reference asserts pyspark's
    // (ref: test_spark.py:544-551).
    assert(Seq(true).toDF("x").dtypes.head == ("x", "BooleanType"))
    assert(Seq(1L).toDF("x").dtypes.head == ("x", "LongType"))
    assert(Seq(1.0).toDF("x").dtypes.head == ("x", "DoubleType"))
    assert(Seq("moof").toDF("x").dtypes.head == ("x", "StringType"))
    assert(Seq(Array[Byte](1, 2)).toDF("x").dtypes.head == ("x", "BinaryType"))
    assert(Seq(Seq(1L, 2L)).toDF("x").schema.head.dataType ==
      ArrayType(LongType, containsNull = false))
    assert(Seq(Map("k" -> 1L)).toDF("x").schema.head.dataType ==
      MapType(StringType, LongType, valueContainsNull = false))
  }

  test("all scalar types round-trip through parquet") {
    val df = Seq(
      (1L, true, 2.5, "s", Array[Byte](9, 8), Seq(1L, 2L), Map("a" -> 1L)))
      .toDF("id", "b", "d", "s", "bin", "arr", "m")
    val dir = Files.createTempDirectory("types").toString
    df.write.mode("overwrite").parquet(dir)
    val back = spark.read.parquet(dir).collect()(0)
    assert(back.getAs[Boolean]("b") && back.getAs[Double]("d") == 2.5)
    assert(back.getAs[String]("s") == "s")
    assert(back.getAs[Array[Byte]]("bin").toSeq == Seq[Byte](9, 8))
    assert(back.getAs[scala.collection.Seq[Long]]("arr").toSeq == Seq(1L, 2L))
    assert(back.getAs[Map[String, Long]]("m") == Map("a" -> 1L))
  }

  test("date/timestamp/decimal round-trip (beyond the reference's matrix)") {
    val df = Seq((java.sql.Date.valueOf("2024-02-29"),
      java.sql.Timestamp.valueOf("2024-02-29 12:34:56.789"),
      BigDecimal("12345.67"))).toDF("d", "ts", "dec")
    val dir = Files.createTempDirectory("timetypes").toString
    df.write.mode("overwrite").parquet(dir)
    val back = spark.read.parquet(dir).collect()(0)
    assert(back.getAs[java.sql.Date]("d").toString == "2024-02-29")
    assert(back.getAs[java.sql.Timestamp]("ts").toString
      == "2024-02-29 12:34:56.789")
    assert(back.getAs[java.math.BigDecimal]("dec").doubleValue() == 12345.67)
  }

  test("deep nesting: map of array of map of array of struct, dotted query") {
    // ref golden: x.a[0].b[0].foo = 5 (test_spark.py:975-995)
    val rows = Seq(
      DeepNest(Map("a" -> Seq(Map("b" -> Seq(Inner(5L, "hit")))))),
      DeepNest(Map("a" -> Seq(Map("b" -> Seq(Inner(7L, "miss")))))))
    val dir = Files.createTempDirectory("deep").toString
    rows.toDS().write.mode("overwrite").parquet(dir)
    val df = spark.read.parquet(dir)
    val hit = df.where("x['a'][0]['b'][0].foo = 5").collect()
    assert(hit.length == 1)
    val back = spark.read.parquet(dir).as[DeepNest].collect()
    assert(back.toSet == rows.toSet)
  }

  test("void-typed columns: cast-before-write contract (ref: test_spark.py:566-571)") {
    // The reference pins pyspark-era behavior (void not parquet-writable).
    // Spark 4 diverges: the write may succeed by dropping to a legal
    // representation — so the ENGINE contract we keep is: always cast
    // NullType to a concrete type before write; the cast path must work
    // and round-trip.
    val df = spark.sql("SELECT 1 AS id, NULL AS v")
    assert(df.schema("v").dataType == NullType)
    val dir = Files.createTempDirectory("void").toString
    df.select(col("id"), col("v").cast("string").as("v"))
      .write.mode("overwrite").parquet(dir)
    val back = spark.read.parquet(dir)
    assert(back.schema("v").dataType == StringType)
    assert(back.count() == 1 && back.collect()(0).isNullAt(1))
  }

  test("empty containers need an explicit schema (prototype-row pattern)") {
    // ref: test_spark.py:595-629 — schema of []/{}  can't be inferred;
    // the fix is an explicit schema (the reference's prototype row).
    val schema = StructType(Seq(
      StructField("id", LongType),
      StructField("xs", ArrayType(LongType)),
      StructField("m", MapType(StringType, LongType))))
    val rows = java.util.Arrays.asList(
      org.apache.spark.sql.Row(1L, Seq.empty[Long], Map.empty[String, Long]))
    val df = spark.createDataFrame(rows, schema)
    val dir = Files.createTempDirectory("empty").toString
    df.write.mode("overwrite").parquet(dir)
    val back = spark.read.parquet(dir).collect()(0)
    assert(back.getAs[scala.collection.Seq[Long]]("xs").isEmpty)
    assert(back.getAs[Map[String, Long]]("m").isEmpty)
  }

  test("parquet lz4 and zstd compression round-trip (ref: test_spark.py:54-86)") {
    val df = (1 to 1000).map(i => (i.toLong, s"row$i", i * 1.5)).toDF("id", "s", "v")
    for (codec <- Seq("lz4", "zstd", "snappy", "gzip")) {
      val dir = Files.createTempDirectory(s"comp_$codec").toString
      df.write.mode("overwrite")
        .option("compression", codec).parquet(dir)
      val back = spark.read.parquet(dir)
      assert(back.count() == 1000, codec)
      assert(back.agg(sum(col("id"))).head().getLong(0) == 500500L, codec)
      val ext = Map("gzip" -> "gz").getOrElse(codec, codec)
      val files = new java.io.File(dir).listFiles()
        .map(_.getName).filter(_.endsWith(".parquet"))
      assert(files.exists(_.contains(ext)),
        s"$codec: ${files.mkString(",")}")
    }
  }
}
