package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{OutputMode, Trigger}
import graft.operators.VersionedTable

/** The SINK half of the "graft-vt" format
  * (sources/VtStreamSource.scala `createSink`): one micro-batch = one
  * versioned commit with a batchId txn — exactly-once under replays,
  * Append/Complete/Update(merge) mode mapping, CHECK constraints
  * riding the commit path for free. */
class VtStreamSinkSpec extends AnyFunSuite {
  lazy val spark = SparkFixture.spark
  import spark.implicits._

  private val fmt = classOf[graft.sources.VtStreamSource].getName

  private def tmpDir(): java.io.File = {
    val d = java.nio.file.Files.createTempDirectory("graft_vtsink_").toFile
    d.deleteOnExit()
    d
  }

  private def df(ids: Range) =
    ids.map(i => (i.toLong, s"row$i")).toDF("id", "s")

  private def mkSink(path: String, mode: OutputMode,
      opts: Map[String, String] = Map.empty) =
    new graft.sources.VtStreamSource().createSink(
      spark.sqlContext, opts + ("path" -> path), Seq.empty, mode)

  test("append sink: one commit per batch, replayed batchId no-ops") {
    val t = new java.io.File(tmpDir(), "t").getAbsolutePath
    val sink = mkSink(t, OutputMode.Append(),
      Map("statsCols" -> "id"))
    sink.addBatch(0, df(0 until 10))
    sink.addBatch(1, df(10 until 15))
    assert(VersionedTable.read(spark, t).count() == 15)
    assert(VersionedTable.versions(spark, t).map(_.mode) ==
      Seq("append", "append"))
    // the crash-window replay: same batchId re-offered after its
    // commit landed must not double-append
    sink.addBatch(1, df(10 until 15))
    assert(VersionedTable.read(spark, t).count() == 15)
    assert(VersionedTable.latestVersion(spark, t) == Some(1))
    // statsCols option reached the manifest
    assert(VersionedTable.statsSpan(spark, t, "id") ==
      Some(Some((0L, 14L))))
  }

  test("complete sink overwrites; update needs mergeKeys; merge upserts") {
    val dir = tmpDir()
    val t = new java.io.File(dir, "agg").getAbsolutePath
    val c = mkSink(t, OutputMode.Complete())
    c.addBatch(0, df(0 until 10))
    c.addBatch(1, df(0 until 3)) // the re-emitted full result
    assert(VersionedTable.read(spark, t).count() == 3)
    assert(VersionedTable.versions(spark, t).map(_.mode) ==
      Seq("overwrite", "overwrite"))
    // refusals: Update without keys, Complete with keys, partitionBy
    intercept[IllegalArgumentException](
      mkSink(t, OutputMode.Update()))
    intercept[IllegalArgumentException](
      mkSink(t, OutputMode.Complete(), Map("mergeKeys" -> "id")))
    intercept[IllegalArgumentException](
      new graft.sources.VtStreamSource().createSink(spark.sqlContext,
        Map("path" -> t), Seq("id"), OutputMode.Append()))
    intercept[IllegalArgumentException]( // tombstones need keys
      mkSink(t, OutputMode.Append(), Map("tombstoneCol" -> "_del")))
    // Update + mergeKeys: empty table bootstraps, then upserts by key
    val m = new java.io.File(dir, "kv").getAbsolutePath
    val u = mkSink(m, OutputMode.Update(),
      Map("mergeKeys" -> "id", "tombstoneCol" -> "_del"))
    u.addBatch(0, df(0 until 5).withColumn("_del", lit(false)))
    u.addBatch(1, Seq((1L, "one-v2", false), (4L, "gone", true),
      (9L, "nine", false)).toDF("id", "s", "_del"))
    val got = VersionedTable.read(spark, m)
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(got == Map(0L -> "row0", 1L -> "one-v2", 2L -> "row2",
      3L -> "row3", 9L -> "nine"), s"upsert+tombstone state: $got")
    assert(!VersionedTable.read(spark, m).columns.contains("_del"))
    // replayed merge batch no-ops too
    val before = VersionedTable.latestVersion(spark, m)
    u.addBatch(1, Seq((1L, "one-v2", false), (4L, "gone", true),
      (9L, "nine", false)).toDF("id", "s", "_del"))
    assert(VersionedTable.latestVersion(spark, m) == before)
  }

  test("auto-maintenance: compactSmallEvery packs, retainLast bounds the log") {
    val dir = tmpDir()
    // compactSmallEvery=3: after batches 2, 5, ... the per-batch small
    // files pack into one; appends in between still land normally
    val t = new java.io.File(dir, "t").getAbsolutePath
    val sink = mkSink(t, OutputMode.Append(),
      Map("compactSmallEvery" -> "3"))
    sink.addBatch(0, df(0 until 10))
    sink.addBatch(1, df(10 until 20))
    sink.addBatch(2, df(20 until 30)) // triggers compactSmall
    val modes = VersionedTable.versions(spark, t).map(_.mode)
    assert(modes == Seq("append", "append", "append", "optimize"),
      s"third batch triggers the pack: $modes")
    assert(VersionedTable.files(spark, t,
      VersionedTable.latestVersion(spark, t).get).size <
      VersionedTable.files(spark, t, 2).size,
      "packing must reduce the file count")
    assert(VersionedTable.read(spark, t).select("id")
      .as[Long].collect().sorted.toSeq == (0L until 30L),
      "maintenance is content-invisible")
    // a replayed maintenance batch no-ops (commit txn + packed files)
    sink.addBatch(2, df(20 until 30))
    assert(VersionedTable.read(spark, t).count() == 30)

    // retainLast=2: the log never grows past 2 versions
    val r = new java.io.File(dir, "r").getAbsolutePath
    val sink2 = mkSink(r, OutputMode.Append(),
      Map("retainLast" -> "2"))
    sink2.addBatch(0, df(0 until 5))
    sink2.addBatch(1, df(5 until 10))
    sink2.addBatch(2, df(10 until 15))
    assert(VersionedTable.versions(spark, r).size == 2,
      "retention bounds the live history")
    assert(VersionedTable.read(spark, r).count() == 15,
      "content is never lost — only old manifests expire")
  }

  test("deletionVectors sink: CDC merges mask, compactSmall materializes") {
    val dir = tmpDir()
    val t = new java.io.File(dir, "dv").getAbsolutePath
    // the option is a merge-mode posture
    intercept[IllegalArgumentException](
      mkSink(t, OutputMode.Append(), Map("deletionVectors" -> "true")))
    // every 3rd batch packs the per-batch small files — and with them
    // MATERIALIZES the vectors the DV merges accumulated
    val sink = mkSink(t, OutputMode.Update(), Map(
      "mergeKeys" -> "id", "tombstoneCol" -> "_del",
      "deletionVectors" -> "true", "compactSmallEvery" -> "3",
      "statsCols" -> "id"))
    sink.addBatch(0, df(0 until 100).withColumn("_del", lit(false)))
    val v0Files = VersionedTable.files(spark, t,
      VersionedTable.latestVersion(spark, t).get).toSet
    sink.addBatch(1, Seq((7L, "seven-v2", false), (8L, "x", true))
      .toDF("id", "s", "_del"))
    // the DV lane: batch 1's merge touched no base file
    val v1 = VersionedTable.latestVersion(spark, t).get
    assert(v0Files.subsetOf(VersionedTable.files(spark, t, v1).toSet),
      "a DV merge must carry the base files by reference")
    assert(VersionedTable.readEntries(spark, t, v1).exists(_.dv.nonEmpty),
      "the merge's pre-images must mask via a vector")
    sink.addBatch(2, Seq((9L, "nine-v2", false)).toDF("id", "s", "_del"))
    // batch 2 triggered compactSmall: the packed result carries no
    // vectors (materialized away) and the content is the CDC state
    val vN = VersionedTable.latestVersion(spark, t).get
    assert(VersionedTable.versions(spark, t).map(_.mode).last ==
      "optimize", "the third batch must trigger the pack")
    assert(VersionedTable.readEntries(spark, t, vN).forall(_.dv.isEmpty),
      "compactSmall must materialize the accumulated vectors")
    val got = VersionedTable.read(spark, t)
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(got.size == 99 && !got.contains(8L) &&
      got(7L) == "seven-v2" && got(9L) == "nine-v2" &&
      got(0L) == "row0", s"CDC state after materialization: $got")
  }

  test("end-to-end vt->vt relay through writeStream.format") {
    val dir = tmpDir()
    val src = new java.io.File(dir, "src").getAbsolutePath
    val dst = new java.io.File(dir, "dst").getAbsolutePath
    val ck = new java.io.File(dir, "ck").getAbsolutePath
    VersionedTable.commit(df(0 until 10), src, overwrite = true)
    VersionedTable.commit(df(10 until 20), src, overwrite = false)
    def relay(): Unit = {
      val q = spark.readStream.format(fmt).option("path", src).load()
        .writeStream.format(fmt)
        .option("path", dst)
        .option("checkpointLocation", ck)
        .outputMode(OutputMode.Append())
        .trigger(Trigger.AvailableNow())
        .start()
      q.awaitTermination()
    }
    relay()
    assert(VersionedTable.read(spark, dst)
      .select("id").collect().map(_.getLong(0)).sorted.toSeq ==
      (0L until 20L))
    // producer appends while the relay is down; restart moves the delta
    VersionedTable.commit(df(20 until 23), src, overwrite = false)
    relay()
    assert(VersionedTable.read(spark, dst).count() == 23)
    // sink-side constraint gates the relayed rows: a violating append
    // upstream fails the stream instead of landing
    VersionedTable.setConstraint(spark, dst, "id_cap", "id < 100")
    VersionedTable.commit(df(200 until 202), src, overwrite = false)
    val failed =
      try { relay(); false }
      catch { case e: org.apache.spark.sql.streaming
          .StreamingQueryException =>
        e.getMessage.contains("id_cap") ||
          Option(e.getCause).exists(_.getMessage.contains("id_cap")) }
    assert(failed, "a constraint-violating batch must fail the stream")
    assert(VersionedTable.read(spark, dst).count() == 23,
      "nothing from the violating batch may land")
  }
}
