package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window

/** Event-stream queries (batch form — the same transforms run under
  * Structured Streaming in graft.streaming; see StreamingSpec). Time
  * values are emitted as formatted strings / epoch integers so Spark's
  * µs timestamps and DuckDB's ns timestamps hash identically. */
object Events {
  import Tables._

  type Q = (SparkSession, String) => DataFrame

  // Tumbling-window aggregation: hourly event counts + value stats per
  // type. The streaming twin is groupBy(window($"ts", "1 hour"), ...).
  val evHourly: Q = (s, d) =>
    events(s, d)
      .groupBy(
        date_format(date_trunc("hour", col("ts")), "yyyy-MM-dd HH:mm:ss").as("hour"),
        col("event_type"))
      .agg(count(lit(1)).as("n"),
        // value is exact 2-decimal data: decimal sums are exact, so no
        // float summation-order drift (observed flipping round() at
        // sf0.1); avg divides the exact sum at the output edge.
        sum(col("value").cast("decimal(18,2)")).cast("double").as("sum_value"),
        graft.functions.DetRound.det6(
          sum(col("value").cast("decimal(18,2)")).cast("double") /
            count(lit(1))).as("avg_value"))

  // Sessionization: 30-minute inactivity gap splits a user's events into
  // sessions; classic lag → gap flag → running sum. The streaming twin
  // uses flatMapGroupsWithState (see graft.streaming.Sessionize).
  val evSessions: Q = (s, d) => {
    val w = Window.partitionBy(col("user_id")).orderBy(col("ts"), col("event_id"))
    val gapUs = 30L * 60 * 1000000
    events(s, d)
      .withColumn("prev_us", lag(unix_micros(col("ts")), 1).over(w))
      .withColumn("new_sess",
        when(col("prev_us").isNull ||
          unix_micros(col("ts")) - col("prev_us") > gapUs, 1).otherwise(0))
      .withColumn("session_idx",
        sum(col("new_sess")).over(
          w.rowsBetween(Window.unboundedPreceding, Window.currentRow)))
      .groupBy(col("user_id"), col("session_idx"))
      .agg(count(lit(1)).as("n_events"),
        min(unix_micros(col("ts"))).as("start_us"),
        max(unix_micros(col("ts"))).as("end_us"),
        sum(col("value").cast("decimal(18,2)")).cast("double").as("sum_value"))
      .withColumn("duration_us", col("end_us") - col("start_us"))
  }

  // JSON property extraction + top-k users by error count.
  val evErrorProne: Q = (s, d) =>
    events(s, d)
      .where(col("event_type") === "error")
      .withColumn("k", get_json_object(col("props"), "$.k").cast("int"))
      .groupBy(col("user_id"))
      .agg(count(lit(1)).as("n_errors"), sum(col("k")).as("sum_k"))
      .orderBy(col("n_errors").desc, col("user_id"))
      .limit(20)

  // As-of join: each error event annotated with the user's most recent
  // prior purchase (graft.operators.AsOfJoin — union+window plan, no
  // range-expanded join). Oracle: DuckDB's native ASOF JOIN.
  val evAsof: Q = (s, d) => {
    val ev = events(s, d)
    val errors = ev.where(col("event_type") === "error")
      .select(col("user_id"), col("ts"), col("event_id"))
    val purchases = ev.where(col("event_type") === "purchase")
      .select(col("user_id"), col("ts"),
        col("event_id").as("p_event_id"), col("value").as("p_value"))
    graft.operators.AsOfJoin(errors, purchases, "user_id", "ts",
      Seq("p_event_id", "p_value"))
      .select(col("user_id"), col("event_id"),
        date_format(col("ts"), "yyyy-MM-dd HH:mm:ss.SSSSSS").as("ts_s"),
        col("asof_p_event_id"), col("asof_p_value"))
  }

  // The NATIVE (custom LogicalPlan + Strategy + SparkPlan) as-of
  // operator on the same query shape: one sort-merge pass per
  // co-partitioned partition, no unioned frame, no window state.
  // Value-identical to evAsof by the MergeAsOfSpec differential, so it
  // shares the DuckDB ASOF oracle — a driver-value-checked custom
  // physical operator.
  val evAsofNative: Q = (s, d) => {
    val ev = events(s, d)
    val errors = ev.where(col("event_type") === "error")
      .select(col("user_id"), col("ts"), col("event_id"))
    val purchases = ev.where(col("event_type") === "purchase")
      .select(col("user_id"), col("ts"),
        col("event_id").as("p_event_id"), col("value").as("p_value"))
    graft.plans.MergeAsOf.join(errors, purchases, "user_id", "ts",
      Seq("p_event_id", "p_value"))
      .select(col("user_id"), col("event_id"),
        date_format(col("ts"), "yyyy-MM-dd HH:mm:ss.SSSSSS").as("ts_s"),
        col("asof_p_event_id"), col("asof_p_value"))
  }

  // Native operator, forward + nearest directions — same shapes as the
  // declarative entries, sharing their oracles (MergeAsOfSpec pins the
  // differential; the driver row pins the DuckDB value parity).
  private def asofNativeDir(dir: String): Q = (s, d) => {
    val ev = events(s, d)
    val errors = ev.where(col("event_type") === "error")
      .select(col("user_id"), col("ts"), col("event_id"))
    val purchases = ev.where(col("event_type") === "purchase")
      .select(col("user_id"), col("ts"),
        col("event_id").as("p_event_id"), col("value").as("p_value"))
    graft.plans.MergeAsOf.join(errors, purchases, "user_id", "ts",
      Seq("p_event_id", "p_value"), direction = dir)
      .select(col("user_id"), col("event_id"),
        date_format(col("ts"), "yyyy-MM-dd HH:mm:ss.SSSSSS").as("ts_s"),
        col("asof_p_event_id"), col("asof_p_value"))
  }

  // FORWARD as-of: every error joined to the same user's NEXT purchase
  // (earliest purchase at-or-after the error) — the "time to recovery /
  // conversion after incident" shape; same union+window plan as the
  // backward form on reversed time. DuckDB's ASOF supports <= natively.
  val evAsofForward: Q = (s, d) => {
    val ev = events(s, d)
    val errors = ev.where(col("event_type") === "error")
      .select(col("user_id"), col("ts"), col("event_id"))
    val purchases = ev.where(col("event_type") === "purchase")
      .select(col("user_id"), col("ts"),
        col("event_id").as("p_event_id"), col("value").as("p_value"))
    graft.operators.AsOfJoin(errors, purchases, "user_id", "ts",
      Seq("p_event_id", "p_value"), direction = "forward")
      .select(col("user_id"), col("event_id"),
        date_format(col("ts"), "yyyy-MM-dd HH:mm:ss.SSSSSS").as("ts_s"),
        col("asof_p_event_id"), col("asof_p_value"))
  }

  // NEAREST as-of: each error matched to the same user's time-closest
  // purchase in either direction (exact ties prefer backward — a
  // pinned rule the oracle replays via both native ASOFs + the same
  // delta comparison).
  val evAsofNearest: Q = (s, d) => {
    val ev = events(s, d)
    val errors = ev.where(col("event_type") === "error")
      .select(col("user_id"), col("ts"), col("event_id"))
    val purchases = ev.where(col("event_type") === "purchase")
      .select(col("user_id"), col("ts"),
        col("event_id").as("p_event_id"), col("value").as("p_value"))
    graft.operators.AsOfJoin(errors, purchases, "user_id", "ts",
      Seq("p_event_id", "p_value"), direction = "nearest")
      .select(col("user_id"), col("event_id"),
        date_format(col("ts"), "yyyy-MM-dd HH:mm:ss.SSSSSS").as("ts_s"),
        col("asof_p_event_id"), col("asof_p_value"))
  }

  // The SLICED as-of (the skew lever for the window carry — see
  // AsOfJoin's skew note): identical semantics to ev_asof_join,
  // executed with 6-hour time slices so the per-key window partitions
  // are (user, slice) and a hot key cannot serialize into one task.
  // Same DuckDB ASOF oracle — the slicing must be invisible in values.
  val evAsofSliced: Q = (s, d) => {
    val ev = events(s, d)
    val errors = ev.where(col("event_type") === "error")
      .select(col("user_id"), col("ts"), col("event_id"))
    val purchases = ev.where(col("event_type") === "purchase")
      .select(col("user_id"), col("ts"),
        col("event_id").as("p_event_id"), col("value").as("p_value"))
    graft.operators.AsOfJoin(errors, purchases, "user_id", "ts",
      Seq("p_event_id", "p_value"),
      timeSliceMicros = Some(6L * 3600 * 1000000))
      .select(col("user_id"), col("event_id"),
        date_format(col("ts"), "yyyy-MM-dd HH:mm:ss.SSSSSS").as("ts_s"),
        col("asof_p_event_id"), col("asof_p_value"))
  }

  // NATIVE sliced as-of: the same 6-hour-slice skew lever executed by
  // the native merge on the composite (key, slice) distribution with
  // boundary repair (plans/MergeAsOf.slicedNative). Shares the plain
  // ASOF oracle — slicing AND the native execution must both be
  // value-invisible.
  val evAsofNativeSliced: Q = (s, d) => {
    val ev = events(s, d)
    val errors = ev.where(col("event_type") === "error")
      .select(col("user_id"), col("ts"), col("event_id"))
    val purchases = ev.where(col("event_type") === "purchase")
      .select(col("user_id"), col("ts"),
        col("event_id").as("p_event_id"), col("value").as("p_value"))
    graft.plans.MergeAsOf.join(errors, purchases, "user_id", "ts",
      Seq("p_event_id", "p_value"),
      timeSliceMicros = Some(6L * 3600 * 1000000))
      .select(col("user_id"), col("event_id"),
        date_format(col("ts"), "yyyy-MM-dd HH:mm:ss.SSSSSS").as("ts_s"),
        col("asof_p_event_id"), col("asof_p_value"))
  }

  // RESAMPLE + FORWARD-FILL: each user's purchase value re-gridded to a
  // daily series over their active span, gaps carrying the last
  // observation forward — the classic time-series gap-fill, composed
  // from existing machinery: per-user calendar via sequence/explode
  // (bounded: users × their span days), then the backward AsOfJoin
  // carries the payload. Grid timestamps are day-start (exact), so
  // determinism needs no rounding beyond the 2dp value convention.
  val evResampleFfill: Q = (s, d) => {
    val purchases = events(s, d).where(col("event_type") === "purchase")
      .select(col("user_id"),
        col("ts"), col("value"))
    val grid = purchases
      .groupBy(col("user_id"))
      .agg(date_trunc("day", min(col("ts"))).as("d0"),
        date_trunc("day", max(col("ts"))).as("d1"))
      .select(col("user_id"),
        explode(sequence(col("d0"), col("d1"),
          expr("interval 1 day"))).as("ts"))
    graft.operators.AsOfJoin(grid, purchases, "user_id", "ts",
      Seq("value"))
      .select(col("user_id"),
        date_format(col("ts"), "yyyy-MM-dd").as("day"),
        round(col("asof_value"), 2).as("ffill_value"))
  }

  // Interval join via the bucketed equi-join operator (RangeJoin): every
  // error paired with the same user's purchases within ±6 hours. The
  // naive formulation is a BroadcastNestedLoopJoin (PlanSpec asserts
  // this operator never is); the oracle is the plain range-join SQL —
  // bucketing must be invisible in the result.
  val evRangeJoin: Q = (s, d) => {
    val ev = events(s, d)
    val sixHoursUs = 6L * 3600 * 1000000
    val errors = ev.where(col("event_type") === "error")
      .select(col("user_id"), col("ts").as("e_ts"), col("event_id").as("e_id"))
    val purchases = ev.where(col("event_type") === "purchase")
      .select(col("user_id"), col("ts").as("p_ts"), col("event_id").as("p_id"))
    graft.operators.RangeJoin(errors, purchases, Seq("user_id"),
      ("e_ts", "p_ts"), -sixHoursUs, sixHoursUs)
      .select(col("user_id"), col("e_id"), col("p_id"))
  }

  // Conversion funnel (view → click → purchase, each stage within 30
  // minutes of the previous): the classic product-analytics query,
  // composed from the keyed RangeJoin — each stage is a bucketed
  // equi-join bounded to ≤2 probe buckets per row, so per-user history
  // length never explodes the join (the funnel-over-raw-events trap).
  // Output = users surviving each stage.
  val evFunnel: Q = (s, d) => funnelStages(events(s, d))

  /** The funnel core over any events-shaped frame (user_id, ts,
    * event_type) — also driven directly by ScaleProbe. */
  def funnelStages(ev: DataFrame): DataFrame = {
    val tUs = 30L * 60 * 1000000
    def stage(t: String, tsName: String): DataFrame =
      ev.where(col("event_type") === t)
        .select(col("user_id"), col("ts").as(tsName))
    val views = stage("view", "v_ts")
    val clicks = stage("click", "c_ts")
    val purchases = stage("purchase", "p_ts")
    val s1 = views.select(col("user_id")).distinct()
    // qualifying clicks: strictly after a view, within the window
    val vc = graft.operators.RangeJoin(views, clicks, Seq("user_id"),
        ("v_ts", "c_ts"), 1L, tUs)
      .select(col("user_id"), col("c_ts")).distinct()
    val s2 = vc.select(col("user_id")).distinct()
    val s3 = graft.operators.RangeJoin(vc, purchases, Seq("user_id"),
        ("c_ts", "p_ts"), 1L, tUs)
      .select(col("user_id")).distinct()
    def counted(df: DataFrame, n: Int): DataFrame =
      df.agg(count(lit(1)).as("n_users")).select(lit(n).as("stage"),
        col("n_users"))
    counted(s1, 1).unionAll(counted(s2, 2)).unionAll(counted(s3, 3))
  }

  // Cohort retention: for each user, days-since-first-activity → how
  // many users were active at that offset (the classic product
  // retention curve). Two aggregations + one co-partitioned join on
  // user_id — both sides shuffle once on the same key, no broadcast of
  // user-proportional state. All values are exact dates/counts.
  val evRetention: Q = (s, d) => {
    val ev = events(s, d)
    val days = ev.select(col("user_id"),
      date_trunc("day", col("ts")).as("day")).distinct()
    val cohort = days.groupBy(col("user_id"))
      .agg(min(col("day")).as("cohort_day"))
    days.join(cohort, "user_id")
      .select(col("user_id"),
        datediff(col("day"), col("cohort_day")).as("day_offset"))
      .groupBy(col("day_offset"))
      .agg(countDistinct(col("user_id")).as("n_users"))
  }

  // Rolling 7-day active users (WAU): for each calendar day in the
  // data, distinct users active in [day-6, day]. EXACT rolling distinct
  // via presence fan-out — each (user, active-day) row supports ≤ 7
  // report days (explode, a projection), then one distinct-count per
  // report day; the calendar is broadcast for the semi-join. Shuffle =
  // 7 × |user-day presences|, never a per-day rescan — the standard
  // exact-DAU/WAU shape (approx path at extreme scale: per-day HLL
  // sketches unioned over the window).
  val evWau: Q = (s, d) => {
    val days = events(s, d).select(col("user_id"),
      date_trunc("day", col("ts")).cast("date").as("day")).distinct()
    val cal = days.select(col("day").as("report_day")).distinct()
    days
      .withColumn("off", explode(sequence(lit(0), lit(6))))
      .select(col("user_id"),
        date_add(col("day"), col("off")).as("report_day"))
      .join(broadcast(cal), Seq("report_day"), "leftsemi")
      .groupBy(col("report_day"))
      .agg(countDistinct(col("user_id")).as("n_users"))
      .select(date_format(col("report_day"), "yyyy-MM-dd").as("day"),
        col("n_users"))
  }

  // The EXTREME-SCALE WAU lane ev_wau's design note names: one HLL
  // sketch PER DAY (a daily aggregate — each user-day contributes one
  // sketch update), then the trailing-7-day union is a fan-out of ≤ 7
  // SKETCHES per report day (|days| × 7 fixed-size binaries, data-size
  // independent) instead of 7 × |user-day| presence rows. DuckDB can't
  // replay Spark's DataSketches HLL, so the row pins the exact lane
  // (n_users, hash-matched — the same value ev_wau oracles) plus the
  // estimate's accuracy contract as a boolean: |est/exact − 1| ≤ 0.10
  // (lgConfigK=12 ⇒ rsd ≈ 1.6%; the bound is ~6σ, same contract style
  // as op_profile_approx). The oracle emits literal TRUE — an
  // out-of-band estimate flips the hash and fails the row.
  val evWauApprox: Q = (s, d) => {
    val days = events(s, d).select(col("user_id"),
      date_trunc("day", col("ts")).cast("date").as("day")).distinct()
    val cal = days.select(col("day").as("report_day")).distinct()
    val daily = days.groupBy(col("day"))
      .agg(hll_sketch_agg(col("user_id"), lit(12)).as("__sk"))
    val est = daily
      .withColumn("off", explode(sequence(lit(0), lit(6))))
      .select(date_add(col("day"), col("off")).as("report_day"), col("__sk"))
      .join(broadcast(cal), Seq("report_day"), "leftsemi")
      .groupBy(col("report_day"))
      .agg(hll_sketch_estimate(hll_union_agg(col("__sk"))).as("__est"))
    val exact = days
      .withColumn("off", explode(sequence(lit(0), lit(6))))
      .select(col("user_id"),
        date_add(col("day"), col("off")).as("report_day"))
      .join(broadcast(cal), Seq("report_day"), "leftsemi")
      .groupBy(col("report_day"))
      .agg(countDistinct(col("user_id")).as("n_users"))
    exact.join(est, Seq("report_day"))
      .select(date_format(col("report_day"), "yyyy-MM-dd").as("day"),
        col("n_users"),
        (abs(col("__est").cast("double") / col("n_users") - 1.0) <= 0.10)
          .as("est_ok"))
  }

  // Sliding (overlapping) windows: 1-hour windows every 30 minutes —
  // every event lands in exactly two windows (Spark epoch-aligned
  // semantics, replicated in the oracle by unnesting both candidate
  // window starts).
  val evSliding: Q = (s, d) =>
    events(s, d)
      .groupBy(window(col("ts"), "1 hour", "30 minutes"), col("event_type"))
      .agg(count(lit(1)).as("n"),
        sum(col("value").cast("decimal(18,2)")).cast("double").as("sum_value"))
      .select(
        date_format(col("window.start"), "yyyy-MM-dd HH:mm:ss").as("wstart"),
        col("event_type"), col("n"), col("sum_value"))

  // Built-in session_window aggregation (gap 30 min) — the SQL-surface
  // twin of the manual lag/cumsum sessionization (ev_sessions) and the
  // stateful streaming one (st_sessions). Spark defines session end =
  // last event + gap; the oracle mirrors that from the same session CTE.
  val evSessionWindow: Q = (s, d) =>
    events(s, d)
      .groupBy(col("user_id"), session_window(col("ts"), "30 minutes"))
      .agg(count(lit(1)).as("n_events"),
        sum(col("value").cast("decimal(18,2)")).cast("double").as("sum_value"))
      .select(col("user_id"),
        unix_micros(col("session_window.start")).as("start_us"),
        unix_micros(col("session_window.end")).as("end_us"),
        col("n_events"), col("sum_value"))

  // Hourly-volume ANOMALY detection per event type — the monitoring
  // query a pipeline runs over its own event stream: hours whose count
  // deviates > 2σ from that type's mean hourly volume. Moments via the
  // exact-decimal q_zscore convention (integral counts, so sums are
  // exact; the z expression is a pinned arithmetic order both engines
  // replay); per-type stats broadcast back — two map-side aggregates,
  // no window over the corpus.
  val evAnomaly: Q = (s, d) => {
    val hourly = events(s, d)
      .groupBy(date_format(date_trunc("hour", col("ts")),
        "yyyy-MM-dd HH:mm:ss").as("hour"), col("event_type"))
      .agg(count(lit(1)).cast("double").as("n"))
    val m = hourly.groupBy(col("event_type")).agg(
      count(lit(1)).cast("double").as("nh"),
      sum(col("n")).as("s"),
      sum(col("n") * col("n")).as("q"))
    val z = (col("n") - col("s") / col("nh")) /
      sqrt((col("q") - col("s") * col("s") / col("nh")) / col("nh"))
    hourly.join(broadcast(m), "event_type")
      .withColumn("z", graft.functions.DetRound.det6(z))
      .where(abs(col("z")) > 2.0)
      .select(col("event_type"), col("hour"),
        col("n").cast("long").as("n"), col("z"))
  }

  /** Top event-type PATHS (3-step behavioral sequences) — the "what do
    * users do next" product-analytics staple the funnel doesn't cover
    * (a funnel pins the stages; paths DISCOVER them). Per user, events
    * in (ts, event_id) order yield every 3 consecutive event types as
    * "a>b>c"; corpus-wide counts, top 25 (count desc, path asc —
    * deterministic). Scale: the per-user window is the sessionize
    * shape (hot-user caveat documented in SCALE.md — the as-of
    * timeSlice lever applies if a bot user dominates); path counting
    * is a map-side-combined groupBy and the top-25 is TakeOrdered,
    * never a global sort. */
  val evPaths: Q = (s, d) => {
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("user_id")).orderBy(col("ts"), col("event_id"))
    events(s, d)
      .select(col("user_id"), col("event_type"),
        lead(col("event_type"), 1).over(w).as("__e2"),
        lead(col("event_type"), 2).over(w).as("__e3"))
      .where(col("__e2").isNotNull && col("__e3").isNotNull)
      .select(concat_ws(">", col("event_type"), col("__e2"), col("__e3"))
        .as("path"))
      .groupBy(col("path")).agg(count(lit(1)).as("n"))
      .orderBy(col("n").desc, col("path")).limit(25)
  }

  // RFM segmentation (recency / frequency / monetary) — the classic
  // user-value rollup: per user, whole days since last purchase
  // (against the corpus max ts — deterministic, no wall clock),
  // purchase count, and decimal-exact spend; fixed-threshold segments
  // (quantile-based tiers would be 3 GlobalRank runs — the thresholds
  // here are the product definition, like the Gopher rule bundle).
  // One map-side-combined aggregate; the max-ts anchor is a 1-scalar
  // broadcast.
  val evRfm: Q = (s, d) => {
    val p = events(s, d).where(col("event_type") === "purchase")
    val anchor = p.agg(max(unix_micros(col("ts"))).as("__mx"))
    p.groupBy(col("user_id"))
      .agg(max(unix_micros(col("ts"))).as("__last"),
        count(lit(1)).as("frequency"),
        sum(col("value").cast("decimal(18,2)")).cast("double")
          .as("monetary"))
      .crossJoin(broadcast(anchor))
      .withColumn("recency_days",
        // explicit floor: Spark's cast(double→long) truncates but
        // DuckDB's CAST rounds — floor() is identical in both
        floor((col("__mx") - col("__last")) / lit(86400000000L))
          .cast("long"))
      .withColumn("segment",
        when(col("recency_days") <= 7 && col("frequency") >= 10, "champion")
          .when(col("recency_days") <= 30 && col("frequency") >= 5, "loyal")
          .when(col("recency_days") > 60, "at_risk")
          .otherwise("regular"))
      .select(col("user_id"), col("recency_days"), col("frequency"),
        col("monetary"), col("segment"))
  }

  // SCD2 (slowly-changing-dimension type-2) interval build: each user's
  // event stream becomes validity intervals [valid_from, valid_to) via
  // one lead() over the per-user order — the dimension-table shape a
  // warehouse derives from CDC. The window partitions by user_id, so at
  // 100 TB no task ever holds more than one user's history; the open
  // (current) row carries a null valid_to. Epoch-µs output keeps both
  // engines on exact integers.
  val evScd2: Q = (s, d) => {
    val w = Window.partitionBy(col("user_id")).orderBy(col("ts"), col("event_id"))
    events(s, d).select(
      col("user_id"), col("event_id"), col("event_type").as("state"),
      unix_micros(col("ts")).as("valid_from"),
      unix_micros(lead(col("ts"), 1).over(w)).as("valid_to"),
      lead(col("ts"), 1).over(w).isNull.as("is_current"))
  }

  // First-order Markov transition matrix over per-user event sequences
  // (the journey-model complement of ev_paths): transition counts and
  // P(dst | src). The probability window runs over the AGGREGATED
  // |types|² frame, never the raw events; the long/long→double division
  // is one IEEE op, bit-identical cross-engine.
  val evMarkov: Q = (s, d) => {
    val w = Window.partitionBy(col("user_id")).orderBy(col("ts"), col("event_id"))
    events(s, d)
      .select(col("event_type").as("src"),
        lead(col("event_type"), 1).over(w).as("dst"))
      .where(col("dst").isNotNull)
      .groupBy(col("src"), col("dst")).agg(count(lit(1)).as("n"))
      .withColumn("p",
        col("n").cast("double") /
          sum(col("n")).over(Window.partitionBy(col("src"))).cast("double"))
  }

  // Peak concurrency per calendar day (max simultaneously-active
  // sessions — the capacity-planning number), WITHOUT a global sort:
  // the classic sweep-line (+1 at session start, −1 after session end)
  // runs as a per-day window over net deltas grouped by timestamp, and
  // cross-midnight sessions enter as a per-day CARRY-IN computed by a
  // broadcast non-equi join against the tiny day list. At 100 TB the
  // only shuffles are the session agg and the day-partitioned delta
  // window — each day's deltas are one partition, never one reducer
  // for the whole timeline. Tie semantics are deterministic: deltas
  // collapse to one net per µs, so concurrency is evaluated after all
  // arrivals/departures at that instant (a session is active over
  // [start_us, end_us] inclusive).
  val evConcurrency: Q = (s, d) => {
    val w = Window.partitionBy(col("user_id")).orderBy(col("ts"), col("event_id"))
    val sess = events(s, d)
      .withColumn("prev_us", lag(unix_micros(col("ts")), 1).over(w))
      .withColumn("new_sess",
        when(col("prev_us").isNull ||
          unix_micros(col("ts")) - col("prev_us") > 30L * 60 * 1000000, 1)
          .otherwise(0))
      .withColumn("session_idx",
        sum(col("new_sess")).over(
          w.rowsBetween(Window.unboundedPreceding, Window.currentRow)))
      .groupBy(col("user_id"), col("session_idx"))
      .agg(min(unix_micros(col("ts"))).as("s_us"),
        max(unix_micros(col("ts"))).as("e_us"))
      .localCheckpoint() // consumed 3×: days, deltas, carry-in
    // Every day each session touches (cross-midnight sessions span >1).
    // Days as EPOCH-DAY integers end to end — no timezone anywhere —
    // formatted to yyyy-MM-dd only at the output edge.
    val dayUs = 86400000000L
    val days = sess.select(explode(sequence(
        expr(s"s_us div $dayUs"), expr(s"e_us div $dayUs"))).as("dnum"))
      .distinct()
      .withColumn("day_us", col("dnum") * dayUs)
    // The end delta is CLAMPED to the session's own day (dnum from
    // e_us, not e_us+1): a session ending at a day's last microsecond
    // would otherwise emit its −1 as the NEXT day's leading delta —
    // a day where it was never counted (carry-in needs e_us >= day_us)
    // — depressing that day's prefix sums. Within the owning day the
    // +1 offset still orders the decrement after every same-instant
    // arrival (inclusive-end semantics), since e_us+1 > any in-day ts.
    val deltas = sess.select(expr(s"s_us div $dayUs").as("dnum"),
        col("s_us").as("ts_us"), lit(1L).as("delta"))
      .unionAll(sess.select(expr(s"e_us div $dayUs").as("dnum"),
        (col("e_us") + 1).as("ts_us"), lit(-1L).as("delta")))
      .groupBy(col("dnum"), col("ts_us"))
      .agg(sum(col("delta")).as("net"))
    val dw = Window.partitionBy(col("dnum")).orderBy(col("ts_us"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val runs = deltas.withColumn("run", sum(col("net")).over(dw))
      .groupBy(col("dnum")).agg(max(col("run")).as("max_run"))
    // Sessions already active at each midnight: started strictly
    // before, still active at (inclusive-end ⇒ e_us >= day_us).
    val carried = sess.join(broadcast(days),
        col("s_us") < col("day_us") && col("e_us") >= col("day_us"))
      .groupBy(col("dnum")).agg(count(lit(1)).as("carry"))
    days.join(carried, Seq("dnum"), "left")
      .join(runs, Seq("dnum"), "left")
      .select(
        date_format(date_add(lit("1970-01-01").cast("date"),
          col("dnum").cast("int")), "yyyy-MM-dd").as("day"),
        (coalesce(col("carry"), lit(0L)) +
          greatest(lit(0L), coalesce(col("max_run"), lit(0L))))
          .as("max_concurrent"))
  }

  // Marketing attribution per conversion: LAST touch (latest click/view
  // at/before the purchase) and FIRST touch inside the 7-day lookback —
  // both as AS-OF joins (backward for last; forward from the shifted
  // ts−7d for first), the single-pass sort-merge shape, never a
  // purchases × touches window join. Out-of-window matches null out via
  // exact integer-µs guards. Timestamp ties are sub-µs-impossible in
  // the fixture (the standing as-of determinism contract).
  val evAttribution: Q = (s, d) => {
    val windowUs = 7L * 86400L * 1000000L
    val ev = events(s, d)
    val purchases = ev.where(col("event_type") === "purchase")
      .select(col("user_id"), col("ts"), col("event_id"))
    val touches = ev.where(col("event_type").isin("click", "view"))
      .select(col("user_id"), col("ts"), col("event_id").as("t_id"),
        col("event_type").as("channel"), unix_micros(col("ts")).as("t_us"))
    val last = graft.operators.AsOfJoin(purchases, touches,
        "user_id", "ts", Seq("t_id", "channel", "t_us"), "backward")
    val shifted = purchases.withColumn("ts0", col("ts"))
      .withColumn("ts", col("ts") - expr("interval 7 days"))
    val first = graft.operators.AsOfJoin(shifted, touches,
        "user_id", "ts", Seq("t_id", "channel", "t_us"), "forward")
      .select(col("event_id"), col("ts0"),
        col("asof_t_id").as("f_id"), col("asof_channel").as("f_ch"),
        col("asof_t_us").as("f_us"))
    val lastOk = col("asof_t_us") >= unix_micros(col("ts")) - windowUs
    val firstOk = col("f_us") <= unix_micros(col("ts0"))
    last.join(first, Seq("event_id"))
      .select(col("user_id"), col("event_id"),
        date_format(col("ts"), "yyyy-MM-dd HH:mm:ss.SSSSSS").as("ts_s"),
        when(firstOk, col("f_id")).as("first_id"),
        when(firstOk, col("f_ch")).as("first_channel"),
        when(lastOk, col("asof_t_id")).as("last_id"),
        when(lastOk, col("asof_channel")).as("last_channel"))
  }

  // A/B experiment readout: deterministic assignment (user_id parity —
  // the hash-bucket assignment every experimentation platform uses),
  // per-user conversion (≥1 purchase), per-variant rates, and the
  // pooled two-proportion z statistic. Scale shape: ONE per-user agg
  // (map-side combined), then a 2-row variant rollup; the z arithmetic
  // runs on a broadcast 1-row frame — nothing after the first agg is
  // data-proportional. Rate/z pinned at 6dp via the zscore precedent
  // (double division/sqrt are IEEE-exact-rounded — engine-portable).
  val evAbTest: Q = (s, d) => {
    // conversion = heavy purchaser (≥20 purchases): non-degenerate at
    // every fixture SF (≥1-purchase is TRUE for all users here, which
    // would zero the pooled variance — the guard below still nulls z
    // rather than erroring if a corpus degenerates anyway)
    val perUser = events(s, d).groupBy(col("user_id"))
      .agg(when(sum(when(col("event_type") === "purchase", 1L)
        .otherwise(0L)) >= 20, 1L).otherwise(0L).as("conv"))
      .withColumn("variant",
        when(pmod(col("user_id"), lit(2)) === 0, "A").otherwise("B"))
    // the 2-row rollup feeds BOTH the z computation and the output —
    // checkpoint it so the events scan runs once, not once per consumer
    val v = perUser.groupBy(col("variant"))
      .agg(count(lit(1)).as("n_users"), sum(col("conv")).as("n_conv"))
      .localCheckpoint()
    val wide = v.agg(
      sum(when(col("variant") === "A", col("n_users"))).as("na"),
      sum(when(col("variant") === "A", col("n_conv"))).as("ca"),
      sum(when(col("variant") === "B", col("n_users"))).as("nb"),
      sum(when(col("variant") === "B", col("n_conv"))).as("cb"))
    val p = (col("ca") + col("cb")).cast("double") /
      (col("na") + col("nb"))
    val z0 = (col("ca").cast("double") / col("na") -
        col("cb").cast("double") / col("nb")) /
      sqrt(p * (lit(1.0) - p) *
        (lit(1.0) / col("na") + lit(1.0) / col("nb")))
    // all-converted / none-converted / one-armed experiments have no
    // defined z — NULL, never a divide-by-zero job failure
    val z = when(col("na").isNotNull && col("nb").isNotNull &&
      col("na") > 0 && col("nb") > 0 && p > 0 && p < 1, z0)
    v.crossJoin(broadcast(wide.select(
        graft.functions.DetRound.det(z, 6).as("z"))))
      .select(col("variant"), col("n_users"), col("n_conv"),
        graft.functions.DetRound.det(
          col("n_conv").cast("double") / col("n_users"), 6)
          .as("conv_rate"),
        col("z"))
  }

  val queries: Map[String, Q] = Map(
    "ev_ab_test" -> evAbTest,
    "ev_attribution" -> evAttribution,
    "ev_concurrency" -> evConcurrency,
    "ev_scd2" -> evScd2,
    "ev_rfm" -> evRfm,
    "ev_markov" -> evMarkov,
    "ev_paths" -> evPaths,
    "ev_anomaly" -> evAnomaly,
    "ev_sliding" -> evSliding,
    "ev_session_window" -> evSessionWindow,
    "ev_hourly" -> evHourly,
    "ev_sessions" -> evSessions,
    "ev_error_prone" -> evErrorProne,
    "ev_asof_join" -> evAsof,
    "ev_asof_native" -> evAsofNative,
    "ev_asof_native_fwd" -> asofNativeDir("forward"),
    "ev_asof_native_near" -> asofNativeDir("nearest"),
    "ev_asof_forward" -> evAsofForward,
    "ev_asof_nearest" -> evAsofNearest,
    "ev_asof_sliced" -> evAsofSliced,
    "ev_asof_native_sliced" -> evAsofNativeSliced,
    "ev_resample_ffill" -> evResampleFfill,
    "ev_range_join" -> evRangeJoin,
    "ev_funnel" -> evFunnel,
    "ev_retention" -> evRetention,
    "ev_wau" -> evWau,
    "ev_wau_approx" -> evWauApprox)

  private lazy val asofBackwardOracle: String =
    """SELECT e.user_id, e.event_id,
      |  strftime(e.ts, '%Y-%m-%d %H:%M:%S.%f') AS ts_s,
      |  p.p_event_id AS asof_p_event_id, p.p_value AS asof_p_value
      |FROM (SELECT user_id, ts, event_id FROM events
      |      WHERE event_type = 'error') e
      |ASOF LEFT JOIN (SELECT user_id, ts, event_id AS p_event_id,
      |      value AS p_value FROM events
      |      WHERE event_type = 'purchase') p
      |  ON e.user_id = p.user_id AND e.ts >= p.ts""".stripMargin

  val oracles: Map[String, String] = oraclesBase ++ Map(
    // native-operator direction variants share the declarative oracles
    "ev_asof_native_fwd" -> oraclesBase("ev_asof_forward"),
    "ev_asof_native_near" -> oraclesBase("ev_asof_nearest"),
    "ev_asof_native_sliced" -> oraclesBase("ev_asof_sliced"))

  private lazy val oraclesBase: Map[String, String] = Map(
    // Same parity assignment, per-user conversion, pooled z replayed
    // with the identical double arithmetic and 6dp floor-round.
    "ev_ab_test" ->
      """WITH u AS (SELECT user_id,
        |    CASE WHEN sum(CASE WHEN event_type = 'purchase'
        |      THEN 1 ELSE 0 END) >= 20 THEN 1 ELSE 0 END AS conv,
        |    CASE WHEN user_id % 2 = 0 THEN 'A' ELSE 'B' END AS variant
        |  FROM events GROUP BY user_id),
        |v AS (SELECT variant, count(*) AS n_users, sum(conv) AS n_conv
        |  FROM u GROUP BY 1),
        |w AS (SELECT
        |    sum(CASE WHEN variant = 'A' THEN n_users END) AS na,
        |    sum(CASE WHEN variant = 'A' THEN n_conv END) AS ca,
        |    sum(CASE WHEN variant = 'B' THEN n_users END) AS nb,
        |    sum(CASE WHEN variant = 'B' THEN n_conv END) AS cb
        |  FROM v),
        |z AS (SELECT CASE WHEN na > 0 AND nb > 0
        |      AND ca + cb > 0 AND ca + cb < na + nb THEN
        |    floor(((CAST(ca AS DOUBLE) / na
        |      - CAST(cb AS DOUBLE) / nb)
        |    / sqrt((CAST(ca + cb AS DOUBLE) / (na + nb))
        |      * (1.0 - CAST(ca + cb AS DOUBLE) / (na + nb))
        |      * (1.0 / na + 1.0 / nb))) * 1000000 + 0.5) / 1000000
        |    END AS z
        |  FROM w)
        |SELECT v.variant, v.n_users,
        |  CAST(v.n_conv AS BIGINT) AS n_conv,
        |  floor(CAST(v.n_conv AS DOUBLE) / v.n_users * 1000000 + 0.5)
        |    / 1000000 AS conv_rate, z.z
        |FROM v CROSS JOIN z""".stripMargin,
    // Same (ts, event_id) order, same lead() fan, same deterministic
    // (count desc, path asc) top-25.
    "ev_rfm" ->
      """WITH p AS (SELECT user_id, epoch_us(ts) AS us, value FROM events
        |  WHERE event_type = 'purchase'),
        |mx AS (SELECT max(us) AS m FROM p),
        |u AS (SELECT user_id, max(us) AS last_us,
        |    count(*) AS frequency,
        |    CAST(sum(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS monetary
        |  FROM p GROUP BY 1),
        |r AS (SELECT user_id,
        |    CAST(floor(((SELECT m FROM mx) - last_us) / 86400000000.0)
        |      AS BIGINT) AS recency_days,
        |    frequency, monetary FROM u)
        |SELECT user_id, recency_days, frequency, monetary,
        |  CASE WHEN recency_days <= 7 AND frequency >= 10 THEN 'champion'
        |       WHEN recency_days <= 30 AND frequency >= 5 THEN 'loyal'
        |       WHEN recency_days > 60 THEN 'at_risk'
        |       ELSE 'regular' END AS segment
        |FROM r""".stripMargin,
    "ev_scd2" ->
      """SELECT user_id, event_id, event_type AS state,
        |  epoch_us(ts) AS valid_from,
        |  epoch_us(lead(ts, 1) OVER (PARTITION BY user_id
        |    ORDER BY ts, event_id)) AS valid_to,
        |  lead(ts, 1) OVER (PARTITION BY user_id
        |    ORDER BY ts, event_id) IS NULL AS is_current
        |FROM events""".stripMargin,
    "ev_markov" ->
      """WITH t AS (SELECT event_type AS src,
        |    lead(event_type, 1) OVER (PARTITION BY user_id
        |      ORDER BY ts, event_id) AS dst
        |  FROM events),
        |c AS (SELECT src, dst, count(*) AS n FROM t
        |  WHERE dst IS NOT NULL GROUP BY 1, 2)
        |SELECT src, dst, n, CAST(n AS DOUBLE) /
        |  CAST(sum(n) OVER (PARTITION BY src) AS DOUBLE) AS p
        |FROM c""".stripMargin,
    "ev_paths" ->
      """WITH w AS (SELECT user_id, event_type,
        |    lead(event_type, 1) OVER (PARTITION BY user_id
        |      ORDER BY ts, event_id) AS e2,
        |    lead(event_type, 2) OVER (PARTITION BY user_id
        |      ORDER BY ts, event_id) AS e3
        |  FROM events)
        |SELECT event_type || '>' || e2 || '>' || e3 AS path,
        |  count(*) AS n
        |FROM w WHERE e2 IS NOT NULL AND e3 IS NOT NULL
        |GROUP BY 1 ORDER BY n DESC, path LIMIT 25""".stripMargin,
    // Same moment arithmetic (integral hourly counts → exact sums),
    // same z expression order, same 6dp pin and 2σ threshold.
    "ev_anomaly" ->
      """WITH hourly AS (SELECT
        |    strftime(date_trunc('hour', ts), '%Y-%m-%d %H:%M:%S') AS hour,
        |    event_type, CAST(count(*) AS DOUBLE) AS n
        |  FROM events GROUP BY 1, 2),
        |m AS (SELECT event_type, CAST(count(*) AS DOUBLE) AS nh,
        |    sum(n) AS s, sum(n * n) AS q
        |  FROM hourly GROUP BY 1),
        |z AS (SELECT h.event_type, h.hour, h.n,
        |    floor((h.n - m.s / m.nh)
        |      / sqrt((m.q - m.s * m.s / m.nh) / m.nh) * 1000000 + 0.5)
        |      / 1000000 AS z
        |  FROM hourly h JOIN m ON h.event_type = m.event_type)
        |SELECT event_type, hour, CAST(n AS BIGINT) AS n, z
        |FROM z WHERE abs(z) > 2.0""".stripMargin,
    "ev_hourly" ->
      """SELECT strftime(date_trunc('hour', ts), '%Y-%m-%d %H:%M:%S') AS hour,
        |  event_type, count(*) AS n,
        |  CAST(sum(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS sum_value,
        |  floor(CAST(sum(CAST(value AS DECIMAL(18,2))) AS DOUBLE) / count(*)
        |    * 1000000 + 0.5) / 1000000 AS avg_value
        |FROM events GROUP BY 1, 2""".stripMargin,
    // Both attribution directions as DuckDB ASOF joins (backward on the
    // purchase ts; forward from the shifted ts−7d), same integer-µs
    // window guards.
    "ev_attribution" ->
      """WITH p AS (SELECT user_id, ts, event_id FROM events
        |  WHERE event_type = 'purchase'),
        |t AS (SELECT user_id, ts, event_id AS t_id, event_type AS channel
        |  FROM events WHERE event_type IN ('click', 'view')),
        |l AS (SELECT p.user_id, p.event_id, p.ts,
        |    t.t_id AS l_id, t.channel AS l_ch, t.ts AS l_ts
        |  FROM p ASOF LEFT JOIN t
        |    ON p.user_id = t.user_id AND p.ts >= t.ts),
        |p2 AS (SELECT user_id, event_id, ts,
        |    ts - INTERVAL 7 DAY AS ts7 FROM p),
        |f AS (SELECT p2.event_id, t.t_id AS f_id, t.channel AS f_ch,
        |    t.ts AS f_ts, p2.ts AS pts
        |  FROM p2 ASOF LEFT JOIN t
        |    ON p2.user_id = t.user_id AND p2.ts7 <= t.ts)
        |SELECT l.user_id, l.event_id,
        |  strftime(l.ts, '%Y-%m-%d %H:%M:%S.%f') AS ts_s,
        |  CASE WHEN epoch_us(f.f_ts) <= epoch_us(f.pts)
        |    THEN f.f_id END AS first_id,
        |  CASE WHEN epoch_us(f.f_ts) <= epoch_us(f.pts)
        |    THEN f.f_ch END AS first_channel,
        |  CASE WHEN epoch_us(l.l_ts) >= epoch_us(l.ts) - 604800000000
        |    THEN l.l_id END AS last_id,
        |  CASE WHEN epoch_us(l.l_ts) >= epoch_us(l.ts) - 604800000000
        |    THEN l.l_ch END AS last_channel
        |FROM l JOIN f ON l.event_id = f.event_id""".stripMargin,
    // Same gap-sessionization CTE as ev_sessions, then the sweep-line
    // replayed relationally: per-day net deltas + running max, plus the
    // midnight carry-in join. generate_series is DuckDB's `sequence`.
    "ev_concurrency" ->
      """WITH x AS (
        |  SELECT user_id, event_id, ts,
        |    lag(epoch_us(ts)) OVER (PARTITION BY user_id
        |      ORDER BY ts, event_id) AS prev_us
        |  FROM events),
        |y AS (
        |  SELECT *, CASE WHEN prev_us IS NULL
        |      OR epoch_us(ts) - prev_us > 1800000000 THEN 1 ELSE 0 END
        |    AS new_sess
        |  FROM x),
        |z AS (
        |  SELECT *, sum(new_sess) OVER (PARTITION BY user_id
        |      ORDER BY ts, event_id
        |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
        |    AS session_idx
        |  FROM y),
        |sess AS (
        |  SELECT user_id, session_idx,
        |    min(epoch_us(ts)) AS s_us, max(epoch_us(ts)) AS e_us
        |  FROM z GROUP BY 1, 2),
        |days AS (
        |  SELECT DISTINCT u.dnum AS dnum, u.dnum * 86400000000 AS day_us
        |  FROM sess, unnest(generate_series(
        |    s_us // 86400000000, e_us // 86400000000)) u(dnum)),
        |deltas AS (
        |  SELECT dnum, ts_us, sum(delta) AS net
        |  FROM (
        |    SELECT s_us // 86400000000 AS dnum, s_us AS ts_us, 1 AS delta
        |    FROM sess
        |    UNION ALL
        |    SELECT e_us // 86400000000, e_us + 1, -1 FROM sess)
        |  GROUP BY 1, 2),
        |runs AS (
        |  SELECT dnum, max(run) AS max_run FROM (
        |    SELECT dnum, sum(net) OVER (PARTITION BY dnum ORDER BY ts_us
        |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS run
        |    FROM deltas)
        |  GROUP BY 1),
        |carried AS (
        |  SELECT d.dnum, count(*) AS carry
        |  FROM days d JOIN sess ON s_us < day_us AND e_us >= day_us
        |  GROUP BY 1)
        |SELECT strftime(DATE '1970-01-01' + CAST(d.dnum AS INT), '%Y-%m-%d')
        |    AS day,
        |  CAST(coalesce(carry, 0)
        |    + greatest(0, coalesce(max_run, 0)) AS BIGINT) AS max_concurrent
        |FROM days d
        |LEFT JOIN carried c ON d.dnum = c.dnum
        |LEFT JOIN runs r ON d.dnum = r.dnum""".stripMargin,
    "ev_sessions" ->
      """WITH x AS (
        |  SELECT user_id, event_id, ts, value,
        |    lag(epoch_us(ts)) OVER (PARTITION BY user_id
        |      ORDER BY ts, event_id) AS prev_us
        |  FROM events),
        |y AS (
        |  SELECT *, CASE WHEN prev_us IS NULL
        |      OR epoch_us(ts) - prev_us > 1800000000 THEN 1 ELSE 0 END
        |    AS new_sess
        |  FROM x),
        |z AS (
        |  -- CAST: DuckDB sum(INTEGER) is HUGEINT, which lands in the
        |  -- driver's pandas as float64 and breaks the hash vs int64.
        |  SELECT *, CAST(sum(new_sess) OVER (PARTITION BY user_id
        |      ORDER BY ts, event_id
        |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT)
        |    AS session_idx
        |  FROM y)
        |SELECT user_id, session_idx, count(*) AS n_events,
        |  min(epoch_us(ts)) AS start_us, max(epoch_us(ts)) AS end_us,
        |  CAST(sum(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS sum_value,
        |  max(epoch_us(ts)) - min(epoch_us(ts)) AS duration_us
        |FROM z GROUP BY user_id, session_idx""".stripMargin,
    "ev_asof_join" -> asofBackwardOracle,
    // The custom physical operator (MergeAsOfExec) must be
    // value-identical to the declarative plan: same native ASOF oracle.
    "ev_asof_native" -> asofBackwardOracle,
    // Same native ASOF as ev_asof_join — the engine-side time slicing
    // must be value-invisible.
    "ev_asof_sliced" ->
      """SELECT e.user_id, e.event_id,
        |  strftime(e.ts, '%Y-%m-%d %H:%M:%S.%f') AS ts_s,
        |  p.p_event_id AS asof_p_event_id, p.p_value AS asof_p_value
        |FROM (SELECT user_id, ts, event_id FROM events
        |      WHERE event_type = 'error') e
        |ASOF LEFT JOIN (SELECT user_id, ts, event_id AS p_event_id,
        |      value AS p_value FROM events
        |      WHERE event_type = 'purchase') p
        |  ON e.user_id = p.user_id AND e.ts >= p.ts""".stripMargin,
    // Both native ASOF directions joined back per error, then the same
    // seconds-as-double delta comparison with backward tie preference.
    "ev_asof_nearest" ->
      """WITH e AS (SELECT user_id, ts, event_id FROM events
        |  WHERE event_type = 'error'),
        |p AS (SELECT user_id, ts, event_id AS p_event_id,
        |      value AS p_value FROM events WHERE event_type = 'purchase'),
        |b AS (SELECT e.event_id, p.ts AS bts,
        |    p.p_event_id AS b_id, p.p_value AS b_v
        |  FROM e ASOF LEFT JOIN p
        |    ON e.user_id = p.user_id AND e.ts >= p.ts),
        |f AS (SELECT e.event_id, p.ts AS fts,
        |    p.p_event_id AS f_id, p.p_value AS f_v
        |  FROM e ASOF LEFT JOIN p
        |    ON e.user_id = p.user_id AND e.ts <= p.ts)
        |SELECT e.user_id, e.event_id,
        |  strftime(e.ts, '%Y-%m-%d %H:%M:%S.%f') AS ts_s,
        |  CASE WHEN fts IS NULL THEN b_id
        |       WHEN bts IS NULL THEN f_id
        |       WHEN epoch_us(e.ts) - epoch_us(bts) <= epoch_us(fts) - epoch_us(e.ts)
        |         THEN b_id ELSE f_id END AS asof_p_event_id,
        |  CASE WHEN fts IS NULL THEN b_v
        |       WHEN bts IS NULL THEN f_v
        |       WHEN epoch_us(e.ts) - epoch_us(bts) <= epoch_us(fts) - epoch_us(e.ts)
        |         THEN b_v ELSE f_v END AS asof_p_value
        |FROM e JOIN b ON e.event_id = b.event_id
        |JOIN f ON e.event_id = f.event_id""".stripMargin,
    // Daily grid per user (generate_series over the truncated span) +
    // native ASOF carry — day-0 rows predate the first purchase and
    // stay NULL (no observation yet), matching the Spark side.
    "ev_resample_ffill" ->
      """WITH p AS (SELECT user_id, ts, value FROM events
        |  WHERE event_type = 'purchase'),
        |g AS (SELECT user_id, unnest(generate_series(
        |    date_trunc('day', mn), date_trunc('day', mx),
        |    INTERVAL 1 DAY)) AS ts
        |  FROM (SELECT user_id, min(ts) AS mn, max(ts) AS mx
        |        FROM p GROUP BY 1))
        |SELECT g.user_id, strftime(g.ts, '%Y-%m-%d') AS day,
        |  round(p.value, 2) AS ffill_value
        |FROM g ASOF LEFT JOIN p
        |  ON g.user_id = p.user_id AND g.ts >= p.ts""".stripMargin,
    "ev_asof_forward" ->
      """SELECT e.user_id, e.event_id,
        |  strftime(e.ts, '%Y-%m-%d %H:%M:%S.%f') AS ts_s,
        |  p.p_event_id AS asof_p_event_id, p.p_value AS asof_p_value
        |FROM (SELECT user_id, ts, event_id FROM events
        |      WHERE event_type = 'error') e
        |ASOF LEFT JOIN (SELECT user_id, ts, event_id AS p_event_id,
        |      value AS p_value FROM events
        |      WHERE event_type = 'purchase') p
        |  ON e.user_id = p.user_id AND e.ts <= p.ts""".stripMargin,
    "ev_sliding" ->
      """WITH cand AS (
        |  SELECT event_type, value,
        |    unnest([time_bucket(INTERVAL 30 MINUTE, ts),
        |            time_bucket(INTERVAL 30 MINUTE, ts) - INTERVAL 30 MINUTE])
        |      AS ws,
        |    ts
        |  FROM events)
        |SELECT strftime(ws, '%Y-%m-%d %H:%M:%S') AS wstart, event_type,
        |  count(*) AS n,
        |  CAST(sum(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS sum_value
        |FROM cand
        |WHERE ts >= ws AND ts < ws + INTERVAL 1 HOUR
        |GROUP BY 1, 2""".stripMargin,
    "ev_session_window" ->
      """WITH x AS (
        |  SELECT user_id, event_id, ts, value,
        |    lag(epoch_us(ts)) OVER (PARTITION BY user_id
        |      ORDER BY ts, event_id) AS prev_us
        |  FROM events),
        |y AS (
        |  SELECT *, CASE WHEN prev_us IS NULL
        |      OR epoch_us(ts) - prev_us > 1800000000 THEN 1 ELSE 0 END
        |    AS new_sess
        |  FROM x),
        |z AS (
        |  SELECT *, CAST(sum(new_sess) OVER (PARTITION BY user_id
        |      ORDER BY ts, event_id
        |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT)
        |    AS session_idx
        |  FROM y)
        |SELECT user_id,
        |  min(epoch_us(ts)) AS start_us,
        |  max(epoch_us(ts)) + 1800000000 AS end_us,
        |  count(*) AS n_events,
        |  CAST(sum(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS sum_value
        |FROM z GROUP BY user_id, session_idx""".stripMargin,
    "ev_range_join" ->
      """SELECT e.user_id, e.event_id AS e_id, p.event_id AS p_id
        |FROM (SELECT * FROM events WHERE event_type = 'error') e
        |JOIN (SELECT * FROM events WHERE event_type = 'purchase') p
        |  ON e.user_id = p.user_id
        | AND epoch_us(p.ts) BETWEEN epoch_us(e.ts) - 21600000000
        |                        AND epoch_us(e.ts) + 21600000000""".stripMargin,
    "ev_wau" ->
      """WITH days AS (
        |  SELECT DISTINCT user_id, CAST(date_trunc('day', ts) AS DATE)
        |    AS day
        |  FROM events),
        |cal AS (SELECT DISTINCT day FROM days),
        |fan AS (SELECT user_id, day + CAST(u.i AS INT) AS report_day
        |  FROM days, unnest(range(0, 7)) u(i)),
        |f2 AS (SELECT f.user_id, f.report_day
        |  FROM fan f JOIN cal c ON f.report_day = c.day)
        |SELECT strftime(report_day, '%Y-%m-%d') AS day,
        |  count(DISTINCT user_id) AS n_users
        |FROM f2 GROUP BY 1""".stripMargin,
    // Exact lane replayed; the HLL estimate is pinned by its accuracy
    // contract (literal TRUE — see evWauApprox).
    "ev_wau_approx" ->
      """WITH days AS (
        |  SELECT DISTINCT user_id, CAST(date_trunc('day', ts) AS DATE)
        |    AS day
        |  FROM events),
        |cal AS (SELECT DISTINCT day FROM days),
        |fan AS (SELECT user_id, day + CAST(u.i AS INT) AS report_day
        |  FROM days, unnest(range(0, 7)) u(i)),
        |f2 AS (SELECT f.user_id, f.report_day
        |  FROM fan f JOIN cal c ON f.report_day = c.day)
        |SELECT strftime(report_day, '%Y-%m-%d') AS day,
        |  count(DISTINCT user_id) AS n_users,
        |  TRUE AS est_ok
        |FROM f2 GROUP BY 1""".stripMargin,
    "ev_retention" ->
      """WITH days AS (
        |  SELECT DISTINCT user_id, date_trunc('day', ts) AS day
        |  FROM events),
        |cohort AS (SELECT user_id, min(day) AS cohort_day
        |  FROM days GROUP BY 1)
        |SELECT CAST(date_diff('day', c.cohort_day, d.day) AS INT)
        |    AS day_offset,
        |  count(DISTINCT d.user_id) AS n_users
        |FROM days d JOIN cohort c ON d.user_id = c.user_id
        |GROUP BY 1""".stripMargin,
    "ev_funnel" ->
      """WITH v AS (SELECT user_id, ts FROM events WHERE event_type = 'view'),
        |c AS (SELECT user_id, ts FROM events WHERE event_type = 'click'),
        |p AS (SELECT user_id, ts FROM events WHERE event_type = 'purchase'),
        |s1 AS (SELECT DISTINCT user_id FROM v),
        |vc AS (SELECT DISTINCT v.user_id, c.ts AS c_ts
        |  FROM v JOIN c ON v.user_id = c.user_id
        |  AND epoch_us(c.ts) BETWEEN epoch_us(v.ts) + 1
        |                         AND epoch_us(v.ts) + 1800000000),
        |s2 AS (SELECT DISTINCT user_id FROM vc),
        |s3 AS (SELECT DISTINCT vc.user_id
        |  FROM vc JOIN p ON vc.user_id = p.user_id
        |  AND epoch_us(p.ts) BETWEEN epoch_us(vc.c_ts) + 1
        |                         AND epoch_us(vc.c_ts) + 1800000000)
        |SELECT CAST(1 AS INT) AS stage, count(*) AS n_users FROM s1
        |UNION ALL SELECT CAST(2 AS INT), count(*) FROM s2
        |UNION ALL SELECT CAST(3 AS INT), count(*) FROM s3""".stripMargin,
    "ev_error_prone" ->
      """SELECT user_id, count(*) AS n_errors,
        |  CAST(sum(CAST(json_extract_string(props, '$.k') AS INT)) AS BIGINT)
        |    AS sum_k
        |FROM events WHERE event_type = 'error'
        |GROUP BY user_id
        |ORDER BY n_errors DESC, user_id
        |LIMIT 20""".stripMargin)
}
