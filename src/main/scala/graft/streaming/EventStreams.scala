package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode, Trigger}
import java.sql.Timestamp

/** Structured Streaming surface over event streams — net-new capability
  * vs the reference (SURVEY §2.10: the reference has no streaming; this
  * is the designated extension over the `events` fixture).
  *
  * Each transform has a batch twin in `graft.queries.Events`, and
  * StreamingSpec asserts stream-result == batch-result on the same data
  * (run via a file/memory source with `processAllAvailable`).
  *
  * Scale notes: windowed aggregation state is bounded by the watermark
  * (late data beyond 1h dropped, state evicted); sessionization state is
  * one small Session object per active user key, evicted on event-time
  * timeout — both safe under unbounded input on a real cluster.
  */
object EventStreams {

  /** Schema of the events table after µs normalization. */
  case class Event(event_id: Long, ts: Timestamp, user_id: Long,
      event_type: String, value: Double, props: String)

  case class SessionOut(user_id: Long, start_us: Long, end_us: Long,
      n_events: Long, sum_value: Double)

  /** Internal per-user session buffer (public: Catalyst codegen
    * instantiates it from generated Java, which can't see private
    * classes). `totalCents` keeps the value sum EXACT (the fixture's
    * values are 2-decimal): a sequential double accumulation would
    * drift from the batch twin's decimal(18,2) sum by summation order,
    * breaking stream==batch value equality. */
  case class SessionState(startUs: Long, endUs: Long,
      n: Long, totalCents: Long)

  /** Hourly tumbling-window counts/sums per event type, watermarked.
    * Decimal-exact sum like the batch twin (Events.evHourly): float
    * summation order must not leak into the result. */
  def hourlyAgg(events: DataFrame, watermark: String = "1 hour"): DataFrame =
    events
      .withWatermark("ts", watermark)
      .groupBy(window(col("ts"), "1 hour"), col("event_type"))
      .agg(count(lit(1)).as("n"),
        sum(col("value").cast("decimal(18,2)")).cast("double").as("sum_value"))
      .select(
        date_format(col("window.start"), "yyyy-MM-dd HH:mm:ss").as("hour"),
        col("event_type"), col("n"), col("sum_value"))

  /** Event-time sessionization with a 30-minute inactivity gap via
    * flatMapGroupsWithState: emits a session when the gap elapses
    * (event-time timeout) or a new event arrives beyond the gap. */
  def sessionize(
      events: Dataset[Event],
      gapMinutes: Int = 30): Dataset[SessionOut] = {
    val spark = events.sparkSession
    import spark.implicits._
    val gapUs = gapMinutes.toLong * 60 * 1000000

    events
      .withWatermark("ts", s"$gapMinutes minutes")
      .groupByKey(_.user_id)
      .flatMapGroupsWithState[SessionState, SessionOut](
        OutputMode.Append, GroupStateTimeout.EventTimeTimeout) {
        (userId: Long, rows: Iterator[Event], state: GroupState[SessionState]) =>
          // 2-decimal values are exact in integer cents; /100.0 at the
          // emission edge reproduces DuckDB's CAST(sum(DECIMAL) AS
          // DOUBLE) bit-for-bit.
          def emit(s: SessionState): SessionOut =
            SessionOut(userId, s.startUs, s.endUs, s.n, s.totalCents / 100.0)
          def cents(v: Double): Long = math.round(v * 100)
          if (state.hasTimedOut) {
            val s = state.get
            state.remove()
            Iterator.single(emit(s))
          } else {
            // getTime is ms-truncated; recover the sub-ms µs from
            // getNanos or the batch twin (unix_micros) diverges.
            def usOf(e: Event): Long =
              e.ts.getTime / 1000 * 1000000L + e.ts.getNanos / 1000
            // Events within a micro-batch arrive unordered: sort locally
            // (bounded by per-user-per-batch volume, not total data).
            val sorted = rows.toSeq.sortBy(e => (usOf(e), e.event_id))
            var cur = state.getOption
            val out = Seq.newBuilder[SessionOut]
            sorted.foreach { e =>
              val us = usOf(e)
              cur match {
                case Some(s) if us - s.endUs <= gapUs =>
                  cur = Some(s.copy(endUs = math.max(s.endUs, us),
                    n = s.n + 1, totalCents = s.totalCents + cents(e.value)))
                case Some(s) =>
                  out += emit(s)
                  cur = Some(SessionState(us, us, 1, cents(e.value)))
                case None =>
                  cur = Some(SessionState(us, us, 1, cents(e.value)))
              }
            }
            cur.foreach { s =>
              state.update(s)
              state.setTimeoutTimestamp(s.endUs / 1000 + gapMinutes * 60000L)
            }
            out.result().iterator
          }
      }
  }

  /** Streaming exact dedup: drop events whose `keyCols` were already
    * seen within the watermark horizon — the streaming twin of
    * Dedup.exactDedup. State is bounded by the watermark (keys older
    * than the horizon are evicted), so memory is O(keys-per-horizon),
    * not O(stream). */
  def dedupStream(
      events: DataFrame, keyCols: Seq[String],
      watermark: String = "1 hour"): DataFrame =
    events
      .withWatermark("ts", watermark)
      .dropDuplicatesWithinWatermark(keyCols)

  /** Run a streaming DataFrame to completion against a memory sink and
    * return the collected result (test/batch-replay harness). */
  def runToMemory(
      streamDf: DataFrame, queryName: String,
      mode: OutputMode = OutputMode.Append): DataFrame = {
    val q = streamDf.writeStream
      .outputMode(mode)
      .format("memory")
      .queryName(queryName)
      .trigger(Trigger.AvailableNow())
      .start()
    q.awaitTermination()
    streamDf.sparkSession.table(queryName)
  }
}
