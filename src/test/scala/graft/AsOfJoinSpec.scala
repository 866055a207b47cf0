package graft

import org.scalatest.funsuite.AnyFunSuite
import java.sql.Timestamp
import graft.operators.AsOfJoin
import graft.util.{ThruputAggregator, Artifacts}

class AsOfJoinSpec extends AnyFunSuite {
  lazy val spark = SparkFixture.spark
  import spark.implicits._

  def ts(min: Long) = new Timestamp(1700000000000L + min * 60000)

  test("asof join: most recent prior right row per key, inclusive ties") {
    val trades = Seq(
      (1L, ts(10), "t1"), (1L, ts(20), "t2"), (1L, ts(5), "t0"),
      (2L, ts(10), "t3")).toDF("key", "ts", "trade")
    val quotes = Seq(
      (1L, ts(8), 100.0), (1L, ts(10), 101.0), (1L, ts(15), 102.0),
      (3L, ts(1), 999.0)).toDF("key", "ts", "px")
    val got = AsOfJoin(trades, quotes, "key", "ts", Seq("px"))
      .collect()
      .map(r => (r.getAs[String]("trade"), Option(r.getAs[Any]("asof_px"))))
      .toMap
    assert(got("t0").isEmpty)          // no quote at or before ts(5)
    assert(got("t1").contains(101.0))  // tie at ts(10) is inclusive
    assert(got("t2").contains(102.0))  // latest prior
    assert(got("t3").isEmpty)          // key 2 has no quotes
  }

  test("null timestamps: never match, direction- and mode-independent (ASOF contract)") {
    val trades = Seq(
      (1L, ts(10), "t1"), (1L, null.asInstanceOf[Timestamp], "tnull"),
      (1L, ts(20), "t2")).toDF("key", "ts", "trade")
    val quotes = Seq(
      (1L, ts(8), 100.0), (1L, null.asInstanceOf[Timestamp], 666.0),
      (1L, ts(15), 102.0)).toDF("key", "ts", "px")
    for {
      dir <- Seq("backward", "forward", "nearest")
      slice <- Seq(None, Some(60L * 1000000))
    } {
      val got = AsOfJoin(trades, quotes, "key", "ts", Seq("px"), dir, slice)
        .collect()
        .map(r => (r.getAs[String]("trade"), Option(r.getAs[Any]("asof_px"))))
        .toMap
      // a null-ts left row matches nothing, in every direction and mode
      assert(got("tnull").isEmpty, s"dir=$dir slice=$slice")
      // the null-ts right row (px=666) is invisible to every match
      assert(!got.values.flatten.exists(_ == 666.0), s"dir=$dir slice=$slice")
      // real rows still match per direction
      if (dir == "backward") assert(got("t1").contains(100.0))
      if (dir == "forward") assert(got("t1").contains(102.0))
    }
  }

  test("asof join carries multiple payload columns") {
    val l = Seq((1L, ts(10), "a")).toDF("key", "ts", "x")
    val r = Seq((1L, ts(9), 5L, "meta")).toDF("key", "ts", "qty", "note")
    val got = AsOfJoin(l, r, "key", "ts", Seq("qty", "note")).collect()(0)
    assert(got.getAs[Long]("asof_qty") == 5L)
    assert(got.getAs[String]("asof_note") == "meta")
  }

  test("ThruputAggregator aggregates observers per group in SQL") {
    val rows = Seq(
      ("a", 10L, 100L, 1000000L), ("a", 5L, 50L, 2000000L),
      ("b", 1L, 10L, 500000L)).toDF("g", "items", "bytes", "nanos")
    val got = rows.groupBy($"g")
      .agg(ThruputAggregator.obs($"items", $"bytes", $"nanos").as("obs"))
      .select($"g", $"obs.n", $"obs.numBytes", $"obs.totalNanos")
      .collect().map(r => r.getString(0) ->
        (r.getLong(1), r.getLong(2), r.getLong(3))).toMap
    assert(got("a") == (15L, 150L, 3000000L))
    assert(got("b") == (1L, 10L, 500000L))
  }

  test("Artifacts selftest: library classes load on every executor") {
    val locs = Artifacts.selftestClassLoads(spark)
    assert(locs.nonEmpty)
    // attachSelf is a no-op in sbt dev mode (classes dir, not a jar)
    val attached = Artifacts.attachSelf(spark)
    assert(attached.isEmpty || attached.get.endsWith(".jar"))
  }

  test("Artifacts.download copies local files and expands archives") {
    val dir = java.nio.file.Files.createTempDirectory("dl")
    val src = dir.resolve("payload.txt")
    java.nio.file.Files.writeString(src, "hello")
    val dest = dir.resolve("out").toString
    val got = Artifacts.download(src.toString, dest)
    assert(new String(java.nio.file.Files.readAllBytes(
      java.nio.file.Paths.get(got))) == "hello")
    // archive expansion path
    import java.util.zip.{ZipOutputStream, ZipEntry}
    val zipPath = dir.resolve("arch.zip")
    val zos = new ZipOutputStream(new java.io.FileOutputStream(zipPath.toFile))
    zos.putNextEntry(new ZipEntry("inner/data.txt"))
    zos.write("zipped".getBytes); zos.closeEntry(); zos.close()
    val out = Artifacts.download(zipPath.toString, dir.resolve("out2").toString)
    val extracted = java.nio.file.Paths.get(out, "inner/data.txt")
    assert(new String(java.nio.file.Files.readAllBytes(extracted)) == "zipped")
  }
}
