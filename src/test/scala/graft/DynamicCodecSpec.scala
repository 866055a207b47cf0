package graft

import org.scalatest.funsuite.AnyFunSuite
import java.nio.file.Files
import graft.codec.DynamicCodec
import graft.operators.ShardedReader
import graft.viz.HistogramWithExamples

case class Animal(name: String, legs: Long)
case class Robot(name: String, battery: Double, serial: Long)
case class AnimalV2(name: String, legs: Long, sound: String) // evolved schema

class DynamicCodecSpec extends AnyFunSuite {
  lazy val spark = SparkFixture.spark
  import spark.implicits._

  test("mixed classes round-trip via _class discriminator") {
    val codec = new DynamicCodec
    codec.register[Animal]()
    codec.register[Robot]()
    val objs = Seq(Animal("cat", 4), Robot("r2", 0.9, 42), Animal("bird", 2))
    val df = codec.toDf(spark, objs)
    assert(df.columns.contains("_class"))
    // merged schema: union of both classes' fields
    assert(df.columns.toSet ==
      Set("_class", "name", "legs", "battery", "serial"))
    val back = codec.fromDf(df)
    assert(back.toSet == objs.toSet)
  }

  test("round-trip survives parquet (at-rest format)") {
    val codec = new DynamicCodec
    codec.register[Animal]()
    codec.register[Robot]()
    val objs = Seq(Animal("dog", 4), Robot("c3po", 0.5, 7))
    val dir = Files.createTempDirectory("dyn").toString
    codec.toDf(spark, objs).write.mode("overwrite").parquet(dir)
    val back = codec.fromDf(spark.read.parquet(dir))
    assert(back.toSet == objs.toSet)
  }

  test("schema evolution: extra data fields ignored, missing fields null") {
    // Encode as Animal, decode as AnimalV2 (new field `sound` → null)
    // and registry keyed by class name simulates class evolution
    // (ref contract: oarphpy/spark.py:1113-1118).
    val enc = new DynamicCodec
    enc.register[Animal]()
    val df = enc.toDf(spark, Seq(Animal("cat", 4)))
    val v2 = enc.typedSlice[AnimalV2](
      df.withColumn("_class", org.apache.spark.sql.functions
        .lit(classOf[AnimalV2].getName)))
    val got = v2.collect()
    assert(got.length == 1)
    assert(got(0).name == "cat" && got(0).legs == 4 && got(0).sound == null)
    // reverse: decode V2-shaped data as Animal → `sound` dropped
    val dfv2 = Seq(AnimalV2("owl", 2, "hoot")).toDS().toDF()
      .withColumn("_class", org.apache.spark.sql.functions
        .lit(classOf[Animal].getName))
    val asV1 = enc.fromDf(dfv2)
    assert(asV1 == Seq(Animal("owl", 2)))
  }

  test("unregistered class raises with guidance") {
    val codec = new DynamicCodec
    codec.register[Animal]()
    val e = intercept[IllegalArgumentException] {
      codec.toDf(spark, Seq(Robot("x", 1.0, 1)))
    }
    assert(e.getMessage.contains("unregistered"))
  }

  test("ShardedReader streams shards without full collect") {
    val df = (1 to 100).map(i => (i % 4, i)).toDF("shard", "v")
    val keys = ShardedReader.shardKeys(df, "shard")
    assert(keys.toSet == Set(0, 1, 2, 3))
    val rows = ShardedReader.interleaved(df, "shard", chunk = 8).toSeq
    assert(rows.size == 100)
    assert(rows.map(_.getInt(1)).toSet == (1 to 100).toSet)
  }

  test("HistogramWithExamples: buckets, pivots, examples, html") {
    val df = graft.queries.Tables.lineitem(spark, SparkFixture.sf0001)
      .select($"l_returnflag", $"l_extendedprice").cache()
    val r = HistogramWithExamples.run(
      df, "l_extendedprice", subPivotCol = Some("l_returnflag"),
      numBins = 10, maxRowsPerBucket = 50)
    val pivots = r.buckets.map(_.pivot).distinct
    assert(pivots.size == 3) // A, N, R
    assert(r.buckets.size == 30)
    val total = r.buckets.map(_.count).sum
    assert(total == df.count())
    assert(r.buckets.exists(_.examples.nonEmpty))
    r.buckets.foreach(b => assert(b.examples.size <= 10))
    val html = HistogramWithExamples.toHtml(r)
    assert(html.contains("<svg") && html.contains("rect"))
    assert(html.contains("l_extendedprice"))
    df.unpersist()
  }
}
