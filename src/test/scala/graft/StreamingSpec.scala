package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.OutputMode
import java.nio.file.Files
import org.apache.spark.sql.types._
import java.sql.Timestamp
import graft.streaming.EventStreams
import graft.streaming.EventStreams.{Event, SessionOut}

/** Stream/batch equivalence: the streaming transforms must produce the
  * same results as their batch twins on the same (finite) data. */
class StreamingSpec extends AnyFunSuite {
  lazy val spark = SparkFixture.spark
  import spark.implicits._

  private def writeEventsDir(): (String, org.apache.spark.sql.DataFrame) = {
    val batch = graft.queries.Tables.events(spark, SparkFixture.sf0001)
    val dir = Files.createTempDirectory("events").toString
    batch.write.mode("overwrite").parquet(dir)
    (dir, spark.read.parquet(dir))
  }

  test("streaming hourly agg == batch hourly agg (complete mode)") {
    val (dir, batchDf) = writeEventsDir()
    val stream = spark.readStream.schema(batchDf.schema).parquet(dir)
    val got = EventStreams.runToMemory(
      EventStreams.hourlyAgg(stream), "hourly_stream", OutputMode.Complete)
      .collect().map(r => (r.getString(0), r.getString(1), r.getLong(2)))
      .toSet
    val want = batchDf
      .groupBy(date_format(date_trunc("hour", col("ts")),
        "yyyy-MM-dd HH:mm:ss").as("hour"), col("event_type"))
      .agg(count(lit(1)).as("n"))
      .collect().map(r => (r.getString(0), r.getString(1), r.getLong(2)))
      .toSet
    assert(got == want)
  }

  test("flatMapGroupsWithState sessionization == batch sessionization") {
    // Crafted input: two users with clear 30-min-gap sessions, plus a
    // far-future sentinel event that pushes the watermark past every
    // real session so EventTimeTimeout flushes them all.
    def ev(id: Long, user: Long, minute: Long, value: Double) =
      Event(id, new Timestamp(1700000000000L + minute * 60000), user,
        "click", value, "{}")
    val events = Seq(
      ev(1, 10, 0, 1.0), ev(2, 10, 5, 2.0), ev(3, 10, 10, 3.0), // session 1
      ev(4, 10, 60, 4.0), ev(5, 10, 65, 5.0), //                   session 2
      ev(6, 20, 0, 1.5), //                                        session 1
      ev(7, 20, 100, 2.5), ev(8, 20, 101, 3.5), //                 session 2
      ev(9, 99, 100000, 0.0)) // sentinel: watermark pusher
    val dir = Files.createTempDirectory("sess").toString
    events.toDS().write.mode("overwrite").parquet(dir)
    val stream = spark.readStream.schema(events.toDS().schema).parquet(dir)
      .as[Event]
    val got = EventStreams.runToMemory(
      EventStreams.sessionize(stream, 30).toDF(), "sessions_stream")
      .as[SessionOut].collect()
      .filter(_.user_id != 99)
      .map(s => (s.user_id, s.n_events, s.sum_value))
      .sortBy(x => (x._1, x._2))
    assert(got.toSeq == Seq(
      (10L, 2L, 9.0), (10L, 3L, 6.0),
      (20L, 1L, 1.5), (20L, 2L, 6.0)).sortBy(x => (x._1, x._2)))
  }

  test("stream-stream interval join: purchases joined to nearby errors") {
    val batch = graft.queries.Tables.events(spark, SparkFixture.sf0001)
    val dir = Files.createTempDirectory("ssj").toString
    batch.write.mode("overwrite").parquet(dir)
    def stream() = spark.readStream.schema(batch.schema).parquet(dir)
    val purchases = stream().where(col("event_type") === "purchase")
      .select(col("user_id").as("p_user"), col("ts").as("p_ts"),
        col("event_id").as("p_id"))
      .withWatermark("p_ts", "1 hour")
    val errors = stream().where(col("event_type") === "error")
      .select(col("user_id").as("e_user"), col("ts").as("e_ts"),
        col("event_id").as("e_id"))
      .withWatermark("e_ts", "1 hour")
    // interval join: error within 6 hours AFTER a purchase (sf0.001 density)
    val joined = purchases.join(errors,
      expr("p_user = e_user AND e_ts >= p_ts AND e_ts <= p_ts + interval 6 hours"))
    val got = EventStreams.runToMemory(joined, "ssj_stream")
    // batch equivalent
    val bp = batch.where(col("event_type") === "purchase")
      .select(col("user_id").as("p_user"), col("ts").as("p_ts"),
        col("event_id").as("p_id"))
    val be = batch.where(col("event_type") === "error")
      .select(col("user_id").as("e_user"), col("ts").as("e_ts"),
        col("event_id").as("e_id"))
    val want = bp.join(be,
      expr("p_user = e_user AND e_ts >= p_ts AND e_ts <= p_ts + interval 6 hours"))
    val gotSet = got.select("p_id", "e_id").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    val wantSet = want.select("p_id", "e_id").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(gotSet == wantSet)
    assert(wantSet.nonEmpty)
  }

  test("streaming dedup drops in-watermark duplicate keys") {
    val batch = graft.queries.Tables.events(spark, SparkFixture.sf0001)
    // plant duplicates: every event twice
    val doubled = batch.union(batch)
    val dir = Files.createTempDirectory("dedup").toString
    doubled.write.mode("overwrite").parquet(dir)
    val stream = spark.readStream.schema(batch.schema).parquet(dir)
    val got = EventStreams.runToMemory(
      EventStreams.dedupStream(stream, Seq("event_id")), "dedup_stream")
    assert(got.count() == batch.count())
    assert(got.select("event_id").distinct().count() == batch.count())
  }

  test("checkpointed streaming: restart resumes exactly-once, no reprocessing") {
    val srcDir = Files.createTempDirectory("ck_src").toString
    val ckDir = Files.createTempDirectory("ck_state").toString
    val outDir = Files.createTempDirectory("ck_out").toString
    def writeBatch(ids: Range): Unit =
      ids.map(i => (i.toLong, i * 2.0)).toDF("id", "v")
        .write.mode("append").parquet(srcDir)
    def runOnce(): Unit = {
      // file sink: the fault-tolerant sink that supports checkpoint
      // recovery (the memory sink explicitly does not)
      val stream = spark.readStream
        .schema(StructType(Seq(
          StructField("id", LongType), StructField("v", DoubleType))))
        .parquet(srcDir)
      val q = stream.writeStream
        .format("parquet")
        .option("path", outDir)
        .option("checkpointLocation", ckDir)
        .outputMode(OutputMode.Append)
        .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
        .start()
      q.awaitTermination()
    }
    writeBatch(1 to 100)
    runOnce()
    assert(spark.read.parquet(outDir).count() == 100)
    // new data arrives; a RESTARTED query must process only the delta
    writeBatch(101 to 150)
    runOnce()
    val ids = spark.read.parquet(outDir).select("id").as[Long].collect()
    assert(ids.length == 150, s"expected exactly-once, got ${ids.length}")
    assert(ids.distinct.length == 150)
  }

  test("stream-stream LEFT OUTER join == batch left outer (outer rows flush at watermark)") {
    // Outer results can only emit when the watermark passes the join
    // bound (the row is then provably unmatched); AvailableNow runs a
    // final no-data batch that advances the watermark to max-event-time
    // minus delay, flushing every decidable outer row. Rows too close
    // to the stream end stay undecidable — the batch reference below
    // excludes exactly those via the same watermark rule.
    val batch = graft.queries.Tables.events(spark, SparkFixture.sf0001)
    val dir = Files.createTempDirectory("events_louter").toString
    batch.write.mode("overwrite").parquet(dir)
    def stream() = spark.readStream.schema(batch.schema).parquet(dir)
    val clicks = stream().where(col("event_type") === "click")
      .select(col("user_id").as("c_user"), col("ts").as("c_ts"),
        col("event_id").as("click_id"))
      .withWatermark("c_ts", "1 hour")
    val views = stream().where(col("event_type") === "view")
      .select(col("user_id").as("v_user"), col("ts").as("v_ts"),
        col("event_id").as("view_id"))
      .withWatermark("v_ts", "1 hour")
    val joined = clicks.join(views,
      col("c_user") === col("v_user") &&
        col("v_ts") >= col("c_ts") &&
        col("v_ts") <= col("c_ts") + expr("interval 30 minutes"),
      "left_outer")
      .select(col("click_id"), col("view_id"))
    val got = EventStreams.runToMemory(joined, "louter_stream")
      .collect().map(r => (r.getLong(0),
        if (r.isNullAt(1)) -1L else r.getLong(1))).toSet

    // Batch reference: full left outer, minus undecidable outer rows —
    // a null-match click whose 30-min window end hasn't passed the
    // final watermark (ms-trunc(max ts) - 1h) stays buffered, not
    // emitted as an outer result.
    val bc = batch.where(col("event_type") === "click")
      .select(col("user_id").as("c_user"), col("ts").as("c_ts"),
        col("event_id").as("click_id"))
    val bv = batch.where(col("event_type") === "view")
      .select(col("user_id").as("v_user"), col("ts").as("v_ts"),
        col("event_id").as("view_id"))
    // The query's watermark is the MIN over the two sides' watermarks,
    // each derived from that side's (filtered) max event time — not the
    // global events max.
    val mrow = batch.agg(
      max(when(col("event_type") === "click", unix_micros(col("ts")))),
      max(when(col("event_type") === "view", unix_micros(col("ts")))))
      .collect()(0)
    val wmUs = math.min(mrow.getLong(0), mrow.getLong(1)) / 1000 * 1000 -
      3600L * 1000000
    val ref = bc.join(bv,
      col("c_user") === col("v_user") &&
        col("v_ts") >= col("c_ts") &&
        col("v_ts") <= col("c_ts") + expr("interval 30 minutes"),
      "left_outer")
      .where(col("view_id").isNotNull ||
        unix_micros(col("c_ts")) + 1800L * 1000000 < wmUs)
      .select(col("click_id"), col("view_id"))
      .collect().map(r => (r.getLong(0),
        if (r.isNullAt(1)) -1L else r.getLong(1))).toSet
    // Spark's state-eviction boundary rounds through ms internally, so
    // an outer row whose window end lands WITHIN ~1 ms of the final
    // watermark is legitimately undecidable either way. Matched rows
    // emit on match (no boundary); compare outer rows outside a ±2 ms
    // band and require the sets to agree exactly there.
    val ctsUs: Map[Long, Long] = bc
      .select(col("click_id"), unix_micros(col("c_ts")))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    def decisive(cid: Long): Boolean =
      math.abs(ctsUs(cid) + 1800L * 1000000 - wmUs) > 2000
    def core(s: Set[(Long, Long)]) =
      s.filter(t => t._2 != -1L || decisive(t._1))
    assert(core(got) == core(ref))
    assert(got.exists(_._2 == -1L), "fixture should produce outer rows")
    assert(got.exists(_._2 != -1L), "fixture should produce matches")
  }

  test("multi-batch append emission == single-batch (watermark carries across batches)") {
    // The driver's st_* fixtures arrive as ONE micro-batch; this pins
    // the genuinely-incremental path: two chronologically-ordered files
    // fed one per micro-batch (maxFilesPerTrigger=1 under AvailableNow),
    // so batch 1 advances the watermark and emits the early closed
    // windows, batch 2 the rest. The union of emissions must equal the
    // single-batch append run — watermark state carries across batches.
    import java.nio.file.{Files => JFiles, Paths, StandardCopyOption}
    val batch = graft.queries.Tables.events(spark, SparkFixture.sf0001)
    val midTs = batch.selectExpr("percentile_approx(unix_micros(ts), 0.5)")
      .collect()(0).getLong(0)
    val dir = JFiles.createTempDirectory("events_mb")
    def writeHalf(df: org.apache.spark.sql.DataFrame, name: String, mtime: Long): Unit = {
      val tmp = JFiles.createTempDirectory("events_half").toString
      df.coalesce(1).write.mode("overwrite").parquet(tmp)
      val part = new java.io.File(tmp).listFiles()
        .find(_.getName.endsWith(".parquet")).get
      val dst = dir.resolve(name)
      JFiles.move(part.toPath, dst, StandardCopyOption.REPLACE_EXISTING)
      require(dst.toFile.setLastModified(mtime),
        s"setLastModified failed for $dst — filesystem does not " +
          "support mtimes, micro-batch ordering would be undefined")
    }
    val t0 = System.currentTimeMillis() - 100000
    writeHalf(batch.where(unix_micros(col("ts")) <= midTs), "a.parquet", t0)
    writeHalf(batch.where(unix_micros(col("ts")) > midTs), "b.parquet", t0 + 50000)
    val schema = batch.schema
    def agg(extraOpt: Map[String, String]) = {
      val reader = extraOpt.foldLeft(spark.readStream.schema(schema)) {
        case (r, (k, v)) => r.option(k, v)
      }
      EventStreams.hourlyAgg(reader.parquet(dir.toString))
    }
    val multi = EventStreams.runToMemory(
      agg(Map("maxFilesPerTrigger" -> "1")), "mb_multi")
      .collect().map(_.toSeq).toSet
    val single = EventStreams.runToMemory(agg(Map.empty), "mb_single")
      .collect().map(_.toSeq).toSet
    assert(multi == single)
    assert(single.nonEmpty)
  }

  test("late data behind the watermark is dropped (st_late_data contract)") {
    import org.apache.spark.sql.functions._
    // Newer half first (advances the watermark), older half second
    // (every row late): the emitted aggregate must equal the NEWER
    // half's batch aggregate under the append-emission rule — and must
    // DIFFER from the full-data aggregate (the drop is observable).
    val got = graft.queries.Streams.queries("st_late_data")(
      spark, SparkFixture.sf0001)
      .collect().map(_.toSeq).toSet
    val ev = graft.queries.Tables.events(spark, SparkFixture.sf0001)
    val b = ev.agg(min(unix_micros(col("ts"))), max(unix_micros(col("ts"))))
      .collect()(0)
    val cut = (b.getLong(0) + b.getLong(1)) / 2
    def hourly(df: org.apache.spark.sql.DataFrame) = df
      .groupBy(date_format(date_trunc("hour", col("ts")),
        "yyyy-MM-dd HH:mm:ss").as("hour"), col("event_type"))
      .agg(count(lit(1)).as("n"),
        sum(col("value").cast("decimal(18,2)")).cast("double")
          .as("sum_value"))
    // append emission: window end (+1h watermark delay) <= ms-trunc(max)
    val wmUs = (b.getLong(1) / 1000L) * 1000L
    val expect = hourly(ev.where(unix_micros(col("ts")) > cut))
      .where(unix_micros(to_timestamp(col("hour"))) +
        2L * 3600L * 1000000L <= wmUs)
      .collect().map(_.toSeq).toSet
    assert(got == expect && got.nonEmpty)
    val fullData = hourly(ev)
      .where(unix_micros(to_timestamp(col("hour"))) +
        2L * 3600L * 1000000L <= wmUs)
      .collect().map(_.toSeq).toSet
    assert(got != fullData,
      "late rows must be missing from straddling windows")
  }

  test("stream-static near-dup screen == independent exact-jaccard pairs") {
    import org.apache.spark.sql.functions._
    // The streaming entry (LSH probe of a broadcast static band index,
    // exact-verify, streaming dropDuplicates) must equal the pair set an
    // INDEPENDENT batch path computes: jaccardPairs' shingle equi-join,
    // restricted to the (odd arriving) × (even corpus) split.
    val got = graft.queries.Streams.queries("st_neardup")(
      spark, SparkFixture.sf0001)
      .select(col("new_id"), col("old_id"))
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val docs = graft.queries.Tables.documents(spark, SparkFixture.sf0001)
    val expect = graft.ext.Dedup.jaccardPairs(docs, "doc_id", "text", 0.5)
      .where(col("id_a") % 2 =!= col("id_b") % 2)
      .collect().map { r =>
        val (a, b) = (r.getLong(0), r.getLong(1))
        if (a % 2 == 1) (a, b) else (b, a)
      }.toSet
    assert(got == expect && got.nonEmpty)
  }

  test("batch sessionization query matches hand-computed sessions") {
    val out = graft.queries.Events.evSessions(spark, SparkFixture.sf0001)
    val rows = out.collect()
    assert(rows.nonEmpty)
    // Session invariants: duration >= 0; n_events >= 1; sessions of one
    // user don't overlap.
    rows.foreach { r =>
      assert(r.getAs[Long]("duration_us") >= 0)
      assert(r.getAs[Long]("n_events") >= 1)
    }
    val byUser = rows.groupBy(_.getAs[Long]("user_id"))
    byUser.values.foreach { ss =>
      val spans = ss.map(s =>
        (s.getAs[Long]("start_us"), s.getAs[Long]("end_us"))).sortBy(_._1)
      spans.zip(spans.tail).foreach { case ((_, e1), (s2, _)) =>
        assert(s2 - e1 > 30L * 60 * 1000000, "sessions must be gap-separated")
      }
    }
  }

  test("quality-gate replay: both lanes are exactly-once under restart") {
    // the st_quality_gate foreachBatch body, driven directly with a
    // replayed batchId — the crash window where a micro-batch lands on
    // one lane but the stream checkpoint never advances, so a
    // restarted stream re-offers the same (batch, batchId). Both the
    // table commit AND the quarantine must be idempotent: before this
    // round the quarantine was a bare append and a replayed bad batch
    // double-appended.
    import spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory("graft_qg_replay_")
    dir.toFile.deleteOnExit()
    val table = s"$dir/table"
    val quarantine = s"$dir/quarantine"
    def offer(batch: org.apache.spark.sql.DataFrame, batchId: Long): Unit = {
      val report = graft.operators.QualityAudit.audit(batch, Seq(
        "price_positive" -> (col("price") > 0)))
      if (report.where(!col("pass")).isEmpty)
        graft.operators.VersionedTable.commit(batch, table,
          overwrite = false, txnId = Some(s"qg_$batchId")): Unit
      else
        graft.operators.VersionedTable.commit(batch, quarantine,
          overwrite = false, txnId = Some(s"qg_bad_$batchId")): Unit
    }
    val clean = Seq((1L, 10.0), (2L, 20.0)).toDF("id", "price")
    val bad = Seq((3L, -5.0), (4L, 30.0)).toDF("id", "price")
    offer(clean, 0); offer(bad, 1)
    def counts() = (
      graft.operators.VersionedTable.read(spark, table).count(),
      graft.operators.VersionedTable.read(spark, quarantine).count())
    assert(counts() == ((2L, 2L)))
    // restart replays the last uncommitted batch — and an operator
    // replaying from an older checkpoint re-offers both
    offer(bad, 1); offer(clean, 0); offer(bad, 1)
    assert(counts() == ((2L, 2L)),
      "replayed batches must not duplicate on either lane")
    assert(graft.operators.VersionedTable.versions(spark, quarantine)
      .size == 1)
  }
}
