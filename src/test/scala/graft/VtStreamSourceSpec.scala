package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.Trigger
import graft.operators.VersionedTable

/** CDC-out: the streaming source over a [[VersionedTable]] commit log
  * (sources/VtStreamSource.scala) — snapshot-then-tail semantics,
  * exactly-once across restarts, loud refusal across non-append
  * commits, and the expired-watermark re-baseline signal. */
class VtStreamSourceSpec extends AnyFunSuite {
  lazy val spark = SparkFixture.spark
  import spark.implicits._

  private val fmt = classOf[graft.sources.VtStreamSource].getName

  private def tmpDir(): java.io.File = {
    val d = java.nio.file.Files.createTempDirectory("graft_vtsrc_").toFile
    d.deleteOnExit()
    d
  }

  private def df(ids: Range) =
    ids.map(i => (i.toLong, s"row$i")).toDF("id", "s")

  /** Run the source to completion (AvailableNow), folding every
    * micro-batch into `sink`. */
  private def drain(table: String, ck: String,
      sink: (DataFrame, Long) => Unit,
      startingVersion: Option[Int] = None): Unit = {
    val reader = spark.readStream.format(fmt).option("path", table)
    val q = startingVersion.fold(reader)(v =>
        reader.option("startingVersion", v.toString))
      .load()
      .writeStream
      .foreachBatch(sink)
      .option("checkpointLocation", ck)
      .trigger(Trigger.AvailableNow())
      .start()
    q.awaitTermination()
  }

  test("initial snapshot over a DV-backed version streams masked rows") {
    val d = tmpDir()
    val t = s"$d/t"
    VersionedTable.commit(
      df(0 until 200).repartitionByRange(4, org.apache.spark.sql
        .functions.col("id")).sortWithinPartitions("id"),
      t, overwrite = true, statsCols = Seq("id"))
    VersionedTable.deleteWhere(spark,
      t, org.apache.spark.sql.functions.col("id") % 3 === 0,
      deletionVectors = true)
    // then an ordinary append lands on the DV'd table
    VersionedTable.commit(df(500 until 510), t, overwrite = false)
    val got = scala.collection.mutable.ArrayBuffer.empty[Long]
    drain(t, s"$d/ck", (b, _) =>
      got ++= b.select("id").collect().map(_.getLong(0)))
    val expect = (0L until 200L).filter(_ % 3 != 0) ++ (500L until 510L)
    assert(got.sorted.toSeq == expect,
      "the snapshot must mask the deletion vector; the tail appends ride")
  }

  test("snapshot + tail: batches equal the table, exactly-once on restart") {
    val dir = tmpDir()
    val t = new java.io.File(dir, "t").getAbsolutePath
    val ck = new java.io.File(dir, "ck").getAbsolutePath
    VersionedTable.commit(df(0 until 10), t, overwrite = true)
    VersionedTable.commit(df(10 until 20), t, overwrite = false)
    val got = new scala.collection.mutable.ArrayBuffer[(Long, Long)]()
    val sink = (b: DataFrame, id: Long) => {
      b.select("id").collect().foreach(r => got.synchronized {
        got += ((id, r.getLong(0))): Unit
      })
    }
    drain(t, ck, sink)
    // run 1: ONE batch = the full snapshot of the latest version
    assert(got.map(_._2).sorted == (0L until 20L))
    assert(got.map(_._1).distinct.size == 1, "initial snapshot is 1 batch")
    // appends land while the stream is down; the restart consumes ONLY
    // the delta (the checkpointed version offset is the watermark)
    VersionedTable.commit(df(20 until 25), t, overwrite = false)
    VersionedTable.commit(df(25 until 28), t, overwrite = false)
    got.clear()
    drain(t, ck, sink)
    assert(got.map(_._2).sorted == (20L until 28L),
      "restart delivers exactly the unseen appends, no replays")
    // nothing new -> no batch at all
    got.clear()
    drain(t, ck, sink)
    assert(got.isEmpty)
  }

  test("chunked initial snapshot: bounded file windows, then tail") {
    val dir = tmpDir()
    val t = new java.io.File(dir, "t").getAbsolutePath
    val ck = new java.io.File(dir, "ck").getAbsolutePath
    VersionedTable.commit(df(0 until 80).repartition(8), t,
      overwrite = true)
    assert(VersionedTable.files(spark, t, 0).size == 8)
    val got = new scala.collection.mutable.ArrayBuffer[(Long, Long)]()
    def run(): Unit = {
      val q = spark.readStream.format(fmt).option("path", t)
        .option("snapshotFilesPerTrigger", "3")
        .load()
        .writeStream
        .foreachBatch { (b: DataFrame, id: Long) =>
          b.select("id").collect().foreach(r => got.synchronized {
            got += ((id, r.getLong(0))): Unit
          })
        }
        .option("checkpointLocation", ck)
        .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
        .start()
      q.awaitTermination()
    }
    run()
    // 8 files / 3 per trigger -> 3 snapshot batches; union exact
    assert(got.map(_._1).distinct.size == 3,
      s"8 files at 3/trigger must arrive as 3 batches: " +
        s"${got.map(_._1).distinct}")
    assert(got.map(_._2).sorted == (0L until 80L),
      "chunk union must be the exact snapshot — no dup, no loss")
    // tail after the snapshot: appends arrive version-granular
    VersionedTable.commit(df(80 until 85), t, overwrite = false)
    got.clear()
    run()
    assert(got.map(_._2).sorted == (80L until 85L),
      "post-snapshot windows are the plain append tail")
  }

  test("mid-snapshot restart resumes at the checkpointed file watermark") {
    import org.apache.spark.sql.connector.read.streaming.ReadLimit
    import org.apache.spark.sql.execution.streaming.runtime.SerializedOffset
    import org.apache.spark.sql.graftbridge.Bridge
    val dir = tmpDir()
    val t = new java.io.File(dir, "t").getAbsolutePath
    VersionedTable.commit(df(0 until 80).repartition(8), t,
      overwrite = true)
    def mkSource() = new graft.sources.VtStreamSource().createSource(
      spark.sqlContext, new java.io.File(dir, "meta").getAbsolutePath,
      None, fmt, Map("path" -> t, "snapshotFilesPerTrigger" -> "3"))
    def ids(b: DataFrame) = Bridge.asBatchFrame(b)
      .select("id").collect().map(_.getLong(0)).toSeq
    val s1 = mkSource()
    val o1 = s1.asInstanceOf[
      org.apache.spark.sql.connector.read.streaming.SupportsAdmissionControl]
      .latestOffset(null, ReadLimit.allAvailable())
    assert(o1.json == """{"v":0,"f":3}""", s"first window: ${o1.json}")
    val b1 = ids(s1.getBatch(None, SerializedOffset(o1.json)))
    assert(b1.nonEmpty && b1.size < 80, "a strict 3-of-8-file slice")
    // CRASH: a fresh source instance sees only the serialized offset
    val s2 = mkSource()
    val o2 = s2.asInstanceOf[
      org.apache.spark.sql.connector.read.streaming.SupportsAdmissionControl]
      .latestOffset(SerializedOffset(o1.json), ReadLimit.allAvailable())
    assert(o2.json == """{"v":0,"f":6}""", s"resumed window: ${o2.json}")
    val b2 = ids(s2.getBatch(Some(SerializedOffset(o1.json)),
      SerializedOffset(o2.json)))
    assert(b2.nonEmpty && b2.toSet.intersect(b1.toSet).isEmpty,
      "the resumed slice continues, never replays delivered files")
    // the walk completes into a plain tail offset
    val o3 = s2.asInstanceOf[
      org.apache.spark.sql.connector.read.streaming.SupportsAdmissionControl]
      .latestOffset(SerializedOffset(o2.json), ReadLimit.allAvailable())
    assert(o3.json.trim == "0", s"snapshot completion: ${o3.json}")
    val b3 = ids(s2.getBatch(Some(SerializedOffset(o2.json)),
      SerializedOffset(o3.json)))
    assert((b1 ++ b2 ++ b3).sorted == (0L until 80L),
      "the three slices reconstruct the snapshot exactly")
    // a replayed slice (same offsets) re-reads identically
    assert(ids(s2.getBatch(Some(SerializedOffset(o1.json)),
      SerializedOffset(o2.json))).sorted == b2.sorted)
    // option validation
    intercept[IllegalArgumentException](
      new graft.sources.VtStreamSource().createSource(spark.sqlContext,
        "", None, fmt, Map("path" -> t,
          "snapshotFilesPerTrigger" -> "0")))
  }

  test("snapshot-then-CDF: chunked insert snapshot, then typed changes") {
    val dir = tmpDir()
    val t = new java.io.File(dir, "t").getAbsolutePath
    val ck = new java.io.File(dir, "ck").getAbsolutePath
    // history BEFORE the stream starts: commit, append, DV delete —
    // the snapshot must be the CONSOLIDATED latest state (v2), never
    // a history replay
    VersionedTable.commit(df(0 until 80).repartition(8), t,
      overwrite = true)
    VersionedTable.commit(df(80 until 90), t, overwrite = false)
    VersionedTable.deleteWhere(spark, t, col("id") < 5,
      deletionVectors = true)
    val got = new scala.collection.mutable
      .ArrayBuffer[(Long, Int, String, Long)]()
    def drainCdf(): Unit = {
      val q = spark.readStream.format(fmt).option("path", t)
        .option("snapshotFilesPerTrigger", "3")
        .option("readChangeFeed", "true")
        .load()
        .writeStream
        .foreachBatch { (b: DataFrame, id: Long) =>
          b.select("_commit_version", "_change_type", "id").collect()
            .foreach(r => got.synchronized {
              got += ((id, r.getInt(0), r.getString(1),
                r.getLong(2))): Unit
            })
        }
        .option("checkpointLocation", ck)
        .trigger(Trigger.AvailableNow())
        .start()
      q.awaitTermination()
    }
    drainCdf()
    // the snapshot arrives chunked (9 files / 3 per trigger), every
    // row an insert at the pinned version, masked rows absent
    assert(got.map(_._1).distinct.size >= 3,
      s"chunked snapshot: ${got.map(_._1).distinct}")
    assert(got.forall(r => r._3 == "insert" && r._2 == 2),
      "snapshot rows are inserts stamped with the pinned version")
    assert(got.map(_._4).sorted.toSeq == (5L until 90L),
      "the snapshot is the consolidated DV-masked state")
    // commits AFTER the snapshot deliver as typed changes
    VersionedTable.commit(df(100 until 103), t, overwrite = false)
    VersionedTable.deleteWhere(spark, t, col("id") === 100L)
    got.clear()
    drainCdf()
    assert(got.map(r => (r._2, r._3, r._4)).sorted == Seq(
      (3, "insert", 100L), (3, "insert", 101L), (3, "insert", 102L),
      (4, "delete", 100L)),
      s"post-snapshot commits are typed changes: $got")
  }

  test("startingVersion tails appends only (no initial snapshot)") {
    val dir = tmpDir()
    val t = new java.io.File(dir, "t").getAbsolutePath
    val ck = new java.io.File(dir, "ck").getAbsolutePath
    VersionedTable.commit(df(0 until 10), t, overwrite = true)
    VersionedTable.commit(df(10 until 15), t, overwrite = false)
    val got = new scala.collection.mutable.ArrayBuffer[Long]()
    drain(t, ck, (b: DataFrame, _: Long) =>
      b.select("id").collect().foreach(r => got.synchronized {
        got += r.getLong(0): Unit
      }), startingVersion = Some(0))
    assert(got.sorted == (10L until 15L),
      "the consumer already holds v0 — only the appends arrive")
  }

  test("startingTimestamp resolves the wall clock to a version start") {
    val dir = tmpDir()
    val t = new java.io.File(dir, "t").getAbsolutePath
    val ck = new java.io.File(dir, "ck").getAbsolutePath
    VersionedTable.commit(df(0 until 10), t, overwrite = true)
    Thread.sleep(30)
    val between = System.currentTimeMillis()
    Thread.sleep(30)
    VersionedTable.commit(df(10 until 15), t, overwrite = false)
    val got = new scala.collection.mutable.ArrayBuffer[Long]()
    val q = spark.readStream.format(fmt).option("path", t)
      .option("startingTimestamp", between.toString)
      .load().writeStream
      .foreachBatch((b: DataFrame, _: Long) =>
        b.select("id").collect().foreach(r => got.synchronized {
          got += r.getLong(0): Unit
        }))
      .option("checkpointLocation", ck)
      .trigger(Trigger.AvailableNow())
      .start()
    q.awaitTermination()
    assert(got.sorted == (10L until 15L),
      "a timestamp between v0 and v1 tails from after v0")
    // both start coordinates at once refuse loudly
    val e = intercept[Exception] {
      spark.readStream.format(fmt).option("path", t)
        .option("startingTimestamp", between.toString)
        .option("startingVersion", "0").load()
        .writeStream.foreachBatch((_: DataFrame, _: Long) => ())
        .option("checkpointLocation", s"$dir/ck2")
        .trigger(Trigger.AvailableNow()).start().awaitTermination()
    }
    def msgs(x: Throwable): Seq[String] =
      Option(x).toSeq.flatMap(t =>
        Option(t.getMessage).toSeq ++ msgs(t.getCause))
    assert(msgs(e).exists(_.contains("mutually exclusive")), e.getMessage)
  }

  test("a non-append commit inside the tail window fails loudly") {
    val dir = tmpDir()
    val t = new java.io.File(dir, "t").getAbsolutePath
    val ck = new java.io.File(dir, "ck").getAbsolutePath
    VersionedTable.commit(df(0 until 10), t, overwrite = true)
    drain(t, ck, (_: DataFrame, _: Long) => ())
    // OPTIMIZE (an overwrite) + an append land while the stream is down
    VersionedTable.compact(spark, t, targetFileBytes = 1L << 30)
    VersionedTable.commit(df(10 until 12), t, overwrite = false)
    val e = intercept[org.apache.spark.sql.streaming.StreamingQueryException](
      drain(t, ck, (_: DataFrame, _: Long) => ()))
    val msg = Option(e.getCause).map(_.getMessage).getOrElse(e.getMessage)
    assert(msg.contains("non-append"),
      s"the refusal must say WHY the diff is unsound: $msg")
  }

  test("an expired starting watermark raises the re-baseline signal") {
    val dir = tmpDir()
    val t = new java.io.File(dir, "t").getAbsolutePath
    val ck = new java.io.File(dir, "ck").getAbsolutePath
    VersionedTable.commit(df(0 until 5), t, overwrite = true)
    VersionedTable.commit(df(5 until 10), t, overwrite = false)
    VersionedTable.commit(df(10 until 15), t, overwrite = false)
    VersionedTable.expire(spark, t, keepLast = 1)
    val e = intercept[org.apache.spark.sql.streaming.StreamingQueryException](
      drain(t, ck, (_: DataFrame, _: Long) => (),
        startingVersion = Some(0)))
    def causes(x: Throwable): Seq[Throwable] =
      Option(x).toSeq.flatMap(t => t +: causes(t.getCause))
    assert(causes(e).exists(
      _.isInstanceOf[VersionedTable.VersionExpiredException]),
      "the distinguishable expired signal must surface through the stream")
  }

  test("re-baseline recovery: expire -> signal -> fresh snapshot walk -> converged relay") {
    // The OPERATIONAL recipe (VERDICT r11 #7), executable end-to-end:
    // a relay stream falls behind, retention expires its checkpointed
    // watermark, the stream fails with the DISTINGUISHABLE signal, and
    // the operator re-baselines — a NEW checkpoint location + a fresh
    // chunked snapshot walk — into the SAME downstream table. The sink
    // is a keyed MERGE, so replaying the whole snapshot over rows the
    // relay already holds is idempotent by construction; convergence
    // is exact table equality with the source's latest version.
    val dir = tmpDir()
    val t = new java.io.File(dir, "t").getAbsolutePath
    val relay = new java.io.File(dir, "relay").getAbsolutePath
    def mergeSink(gen: String) = (b: DataFrame, id: Long) =>
      if (!b.isEmpty)
        VersionedTable.mergeInto(b.sparkSession, relay, b, Seq("id"),
          txnId = Some(s"relay_${gen}_$id")): Unit
    // merge targets need a v0; bootstrap schema-only (the vt sink's
    // own Update-merge bootstrap shape)
    VersionedTable.commit(df(0 until 0), relay, overwrite = true)
    // generation 1: snapshot + one tail window relayed normally
    VersionedTable.commit(df(0 until 10).repartition(4), t,
      overwrite = true)
    val ck1 = new java.io.File(dir, "ck1").getAbsolutePath
    drain(t, ck1, mergeSink("g1"))
    VersionedTable.commit(df(10 until 20), t, overwrite = false)
    drain(t, ck1, mergeSink("g1"))
    def ids(p: String): Seq[Long] = VersionedTable.read(spark, p)
      .select("id").as[Long].collect().sorted.toSeq
    assert(ids(relay) == (0L until 20L))
    // the relay goes down; the source keeps committing AND compacting,
    // then retention drops everything but the latest version
    VersionedTable.commit(df(20 until 30), t, overwrite = false)
    VersionedTable.compact(spark, t)
    VersionedTable.expire(spark, t, keepLast = 1)
    // the stalled checkpoint now raises the distinguishable signal
    val e = intercept[org.apache.spark.sql.streaming.StreamingQueryException](
      drain(t, ck1, mergeSink("g1")))
    def causes(x: Throwable): Seq[Throwable] =
      Option(x).toSeq.flatMap(t => t +: causes(t.getCause))
    assert(causes(e).exists(
      _.isInstanceOf[VersionedTable.VersionExpiredException]))
    // RE-BASELINE: new checkpoint, fresh snapshot walk in bounded
    // chunks, same keyed-merge sink — replayed rows upsert to
    // themselves, missed rows (20-29) arrive with the snapshot
    val ck2 = new java.io.File(dir, "ck2").getAbsolutePath
    val q = spark.readStream.format(fmt).option("path", t)
      .option("snapshotFilesPerTrigger", "2")
      .load()
      .writeStream.foreachBatch(mergeSink("g2"))
      .option("checkpointLocation", ck2)
      .trigger(Trigger.AvailableNow())
      .start()
    q.awaitTermination()
    assert(ids(relay) == ids(t), "re-baselined relay converges exactly")
    // and generation 2 tails incrementally from here on
    VersionedTable.commit(df(30 until 33), t, overwrite = false)
    drain(t, ck2, mergeSink("g2"))
    assert(ids(relay) == (0L until 33L))
  }

  test("skipChangeCommits rides over a compaction instead of failing") {
    val dir = tmpDir()
    val t = new java.io.File(dir, "t").getAbsolutePath
    val ck = new java.io.File(dir, "ck").getAbsolutePath
    VersionedTable.commit(df(0 until 10), t, overwrite = true)
    val got = new scala.collection.mutable.ArrayBuffer[Long]()
    def drainSkipping(): Unit = {
      val q = spark.readStream.format(fmt).option("path", t)
        .option("skipChangeCommits", "true")
        .load()
        .writeStream
        .foreachBatch { (b: DataFrame, _: Long) =>
          b.select("id").collect().foreach(r => got.synchronized {
            got += r.getLong(0): Unit
          })
        }
        .option("checkpointLocation", ck)
        .trigger(Trigger.AvailableNow())
        .start()
      q.awaitTermination()
    }
    drainSkipping() // initial snapshot
    assert(got.sorted == (0L until 10L))
    // OPTIMIZE + an append land while the stream is down: the strict
    // source fails here (see the loud-refusal test); this one emits
    // ONLY the append's rows — the compaction's rewrites never leak
    VersionedTable.compact(spark, t, targetFileBytes = 1L << 30)
    VersionedTable.commit(df(10 until 13), t, overwrite = false)
    got.clear()
    drainSkipping()
    assert(got.sorted == (10L until 13L),
      s"only the append step's rows may flow: ${got.sorted}")
  }

  test("readChangeFeed streams row-level changes across commit types") {
    val dir = tmpDir()
    val t = new java.io.File(dir, "t").getAbsolutePath
    val ck = new java.io.File(dir, "ck").getAbsolutePath
    VersionedTable.commit(df(0 until 10), t, overwrite = true)
    val got =
      new scala.collection.mutable.ArrayBuffer[(Int, String, Long)]()
    def drainCdf(): Unit = {
      val q = spark.readStream.format(fmt).option("path", t)
        .option("readChangeFeed", "true")
        .load()
        .writeStream
        .foreachBatch { (b: DataFrame, _: Long) =>
          b.select("_commit_version", "_change_type", "id").collect()
            .foreach(r => got.synchronized {
              got += ((r.getInt(0), r.getString(1), r.getLong(2))): Unit
            })
        }
        .option("checkpointLocation", ck)
        .trigger(Trigger.AvailableNow())
        .start()
      q.awaitTermination()
    }
    drainCdf() // history replay: v0's whole content as inserts
    assert(got.sorted == (0 until 10).map(i => (0, "insert", i.toLong)))
    // a DELETE and an append land while the stream is down: the CDF
    // resume emits the delete's removed rows AND the append's inserts
    // — where the plain source refuses and skipChangeCommits goes
    // silent, this mode tells the truth row by row
    VersionedTable.deleteWhere(spark, t, col("id") < 3)
    VersionedTable.commit(df(10 until 12), t, overwrite = false)
    got.clear()
    drainCdf()
    assert(got.sorted == Seq((1, "delete", 0L), (1, "delete", 1L),
      (1, "delete", 2L), (2, "insert", 10L), (2, "insert", 11L)))
    // the two change-commit postures are mutually exclusive
    intercept[IllegalArgumentException](spark.readStream.format(fmt)
      .option("path", t).option("readChangeFeed", "true")
      .option("skipChangeCommits", "true").load())
  }

  test("maxVersionsPerTrigger bounds each micro-batch's window") {
    val dir = tmpDir()
    val t = new java.io.File(dir, "t").getAbsolutePath
    val ck = new java.io.File(dir, "ck").getAbsolutePath
    VersionedTable.commit(df(0 until 2), t, overwrite = true)
    (1 to 3).foreach(i => VersionedTable.commit(
      df(i * 10 until i * 10 + 2), t, overwrite = false))
    val batches =
      new scala.collection.mutable.ArrayBuffer[Seq[Long]]()
    val q = spark.readStream.format(fmt).option("path", t)
      .option("startingVersion", "0")
      .option("maxVersionsPerTrigger", "1")
      .load()
      .writeStream
      .foreachBatch { (b: DataFrame, _: Long) =>
        val rows = b.select("id").collect().map(_.getLong(0)).sorted.toSeq
        batches.synchronized { batches += rows: Unit }
      }
      .option("checkpointLocation", ck)
      .trigger(Trigger.AvailableNow())
      .start()
    q.awaitTermination()
    // the 3-version backlog drains as THREE one-version batches, in
    // commit order — bounded catch-up, not one giant window
    assert(batches.toSeq == Seq(
      Seq(10L, 11L), Seq(20L, 21L), Seq(30L, 31L)))
  }

  test("schema resolves from the manifest; empty table refuses") {
    val dir = tmpDir()
    val t = new java.io.File(dir, "t").getAbsolutePath
    VersionedTable.commit(df(0 until 3), t, overwrite = true)
    val s = spark.readStream.format(fmt).option("path", t).load()
    assert(s.schema.fieldNames.toSeq == Seq("id", "s"))
    assert(s.isStreaming)
    // the short name resolves through META-INF/services too
    assert(spark.readStream.format("graft-vt").option("path", t).load()
      .schema.fieldNames.toSeq == Seq("id", "s"))
    val t2 = new java.io.File(dir, "t2").getAbsolutePath
    intercept[IllegalStateException](
      spark.readStream.format(fmt).option("path", t2).load())
    intercept[IllegalArgumentException](
      spark.readStream.format(fmt).load())
  }
}
