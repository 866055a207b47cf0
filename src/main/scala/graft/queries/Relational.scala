package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window

/** Core relational query inventory: aggregation, join family, windows,
  * set ops, rollup/cube, sort/limit — the Spark-SQL capability surface
  * the reference delegates to Catalyst (SURVEY §2.3-2.7).
  *
  * Every query has a DuckDB oracle in `oracles`. Conventions for
  * hash-parity with the oracle:
  *   - every computed column is aliased identically on both sides;
  *   - double aggregates are rounded (sum→2dp, avg/stddev→4dp) because
  *     float summation order differs between engines;
  *   - timestamps are emitted as formatted strings, never raw, to avoid
  *     us-vs-ns physical-type mismatches between Spark and DuckDB.
  *
  * Scale notes per query are inline; plans verified via explain() in
  * PlanSpec.
  */
object Relational {
  import Tables._

  type Q = (SparkSession, String) => DataFrame

  // All money/quantity columns in the testdata are exact 2-decimal
  // values: aggregate them in DECIMAL (exact integer arithmetic — no
  // float summation-order drift between engines, which flips rounding
  // at ulp boundaries; observed live on sf0.1 avgs) and cast the exact
  // result back to double at the output edge.
  private def dec(c: org.apache.spark.sql.Column) = c.cast("decimal(18,2)")
  private def sumDec(c: org.apache.spark.sql.Column) =
    sum(dec(c)).cast("double")
  private def avgDec(c: org.apache.spark.sql.Column) =
    sum(dec(c)).cast("double") / count(lit(1))

  // TPC-H Q1-style pricing summary: map-side partial agg, 6-group result.
  val q1PricingSummary: Q = (s, d) => {
    lineitem(s, d)
      .where(col("l_shipdate") <= lit("1998-09-02").cast("timestamp"))
      .groupBy(col("l_returnflag"), col("l_linestatus"))
      .agg(
        sumDec(col("l_quantity")).as("sum_qty"),
        sumDec(col("l_extendedprice")).as("sum_base_price"),
        sum(dec(col("l_extendedprice")) * (lit(1) - dec(col("l_discount"))))
          .cast("double").as("sum_disc_price"),
        graft.functions.DetRound.det(avgDec(col("l_quantity")), 6).as("avg_qty"),
        graft.functions.DetRound.det(avgDec(col("l_discount")), 6).as("avg_disc"),
        count(lit(1)).as("count_order"))
  }

  // TPC-H Q6-style revenue forecast: fully pushed-down range filters,
  // single-row global agg (no shuffle beyond the 1-row partial merge).
  val q6Revenue: Q = (s, d) => {
    lineitem(s, d)
      .where(col("l_shipdate") >= lit("1995-01-01").cast("timestamp") &&
        col("l_shipdate") < lit("1996-01-01").cast("timestamp") &&
        col("l_discount").between(0.03, 0.07) &&
        col("l_quantity") < 24)
      .agg(sum(dec(col("l_extendedprice")) * dec(col("l_discount")))
        .cast("double").as("revenue"))
  }

  // TPC-H Q3-style: shuffle join orders⋈lineitem with broadcast customer
  // filter; top-10 by revenue. Deterministic ordering via orderkey tiebreak.
  val q3TopOrders: Q = (s, d) => {
    val c = customer(s, d).where(col("c_mktsegment") === "BUILDING")
    val o = orders(s, d)
    val l = lineitem(s, d)
    l.join(o, l("l_orderkey") === o("o_orderkey"))
      .join(broadcast(c), o("o_custkey") === c("c_custkey"))
      .groupBy(col("l_orderkey"))
      .agg(sum(dec(col("l_extendedprice")) * (lit(1) - dec(col("l_discount"))))
        .cast("double").as("revenue"))
      .orderBy(col("revenue").desc, col("l_orderkey"))
      .limit(10)
  }

  // TPC-H Q5-style: multi-way join down the dimension chain; all dims
  // broadcast (region/nation/supplier/customer are tiny at every SF —
  // the fact-table shuffle join is only lineitem⋈orders).
  val q5NationRevenue: Q = (s, d) => {
    val l = lineitem(s, d)
    val o = orders(s, d)
    val c = customer(s, d)
    val sup = supplier(s, d)
    val n = nation(s, d)
    val r = region(s, d).where(col("r_name") === "ASIA")
    l.join(o, l("l_orderkey") === o("o_orderkey"))
      .join(broadcast(sup), l("l_suppkey") === sup("s_suppkey"))
      .join(broadcast(c),
        o("o_custkey") === c("c_custkey") &&
          sup("s_nationkey") === c("c_nationkey"))
      .join(broadcast(n), c("c_nationkey") === n("n_nationkey"))
      .join(broadcast(r), n("n_regionkey") === r("r_regionkey"))
      .groupBy(col("n_name"))
      .agg(sum(dec(col("l_extendedprice")) * (lit(1) - dec(col("l_discount"))))
        .cast("double").as("revenue"))
  }

  // Left-semi join: customers having a high-value order (EXISTS).
  val qSemiJoin: Q = (s, d) => {
    val c = customer(s, d)
    val o = orders(s, d).where(col("o_totalprice") > 400000)
    c.join(o, c("c_custkey") === o("o_custkey"), "left_semi")
      .select(col("c_custkey"), col("c_name"))
  }

  // Left-anti join (NOT EXISTS): customers with no HIGH-VALUE order.
  // The filtered right side keeps the anti-join shape while making the
  // answer non-trivial on the synthetic tables, where every customer
  // has at least one order ("no orders at all" proved nothing).
  val qAntiJoin: Q = (s, d) => {
    val c = customer(s, d)
    val o = orders(s, d).where(col("o_totalprice") > 400000)
    c.join(o, c("c_custkey") === o("o_custkey"), "left_anti")
      .select(col("c_custkey"), col("c_nationkey"))
  }

  // Window ranking: top-3 orders per customer by price; unique tiebreak
  // on o_orderkey keeps row_number deterministic across engines.
  val qWindowTopPerCustomer: Q = (s, d) => {
    val w = Window.partitionBy(col("o_custkey"))
      .orderBy(col("o_totalprice").desc, col("o_orderkey"))
    orders(s, d)
      .withColumn("rn", row_number().over(w))
      .where(col("rn") <= 3)
      .select(col("o_custkey"), col("o_orderkey"),
        round(col("o_totalprice"), 2).as("price"), col("rn"))
  }

  // Window analytics: lag/lead + running sum over each customer's order
  // history (frame = unbounded preceding .. current row).
  val qWindowRunning: Q = (s, d) => {
    val w = Window.partitionBy(col("o_custkey"))
      .orderBy(col("o_orderdate"), col("o_orderkey"))
    orders(s, d)
      .withColumn("prev_price",
        round(lag(col("o_totalprice"), 1).over(w), 2))
      .withColumn("running_spend",
        sum(dec(col("o_totalprice")))
          .over(w.rowsBetween(Window.unboundedPreceding, Window.currentRow))
          .cast("double"))
      .select(col("o_custkey"), col("o_orderkey"),
        col("prev_price"), col("running_spend"))
  }

  // Rollup: hierarchical subtotals (priority → status). Spark emits NULL
  // for rolled-up levels exactly as DuckDB does.
  val qRollup: Q = (s, d) =>
    orders(s, d)
      .rollup(col("o_orderpriority"), col("o_orderstatus"))
      .agg(count(lit(1)).as("n"),
        sumDec(col("o_totalprice")).as("total"))

  // Cube over part brand/size band.
  val qCube: Q = (s, d) =>
    part(s, d)
      .withColumn("size_band", (col("p_size") / 10).cast("int"))
      .cube(col("p_brand"), col("size_band"))
      .agg(count(lit(1)).as("n"))

  // Set ops: suppliers that shipped lineitems EXCEPT suppliers in good
  // standing — distinct set difference with a guaranteed non-empty
  // answer on the synthetic tables (a handful of suppliers carry
  // non-positive account balances).
  val qExcept: Q = (s, d) => {
    val ls = lineitem(s, d).select(col("l_suppkey").as("suppkey"))
    val sn = supplier(s, d).where(col("s_acctbal") > 0)
      .select(col("s_suppkey").as("suppkey"))
    ls.except(sn)
  }

  // INTERSECT: nation keys present on both sides.
  val qIntersect: Q = (s, d) => {
    val cn = customer(s, d).select(col("c_nationkey").as("nationkey"))
    val sn = supplier(s, d).select(col("s_nationkey").as("nationkey"))
    cn.intersect(sn)
  }

  // Global stats: min/max/avg/stddev (sample) + exact and approx distinct.
  val qStats: Q = (s, d) =>
    lineitem(s, d).agg(
      round(min(col("l_extendedprice")), 2).as("min_price"),
      round(max(col("l_extendedprice")), 2).as("max_price"),
      graft.functions.DetRound.det(avgDec(col("l_extendedprice")), 6)
        .as("avg_price"),
      // sample stddev from EXACT decimal moments: sqrt((sx2-sx²/n)/(n-1))
      // — identical op order in the oracle, no float accumulation drift.
      graft.functions.DetRound.det(
        sqrt((sum(dec(col("l_extendedprice")) * dec(col("l_extendedprice")))
          .cast("double")
          - sum(dec(col("l_extendedprice"))).cast("double")
            * sum(dec(col("l_extendedprice"))).cast("double") / count(lit(1)))
          / (count(lit(1)) - 1)), 4).as("sd_price"),
      countDistinct(col("l_partkey")).as("n_parts"))

  // Sort + limit → TakeOrderedAndProject (no global sort at scale).
  val qTopK: Q = (s, d) =>
    orders(s, d)
      .orderBy(col("o_totalprice").desc, col("o_orderkey"))
      .limit(25)
      .select(col("o_orderkey"), round(col("o_totalprice"), 2).as("price"))

  // Distinct + order: the P6 pattern (pivot-value discovery).
  val qDistinct: Q = (s, d) =>
    lineitem(s, d).select(col("l_returnflag"), col("l_linestatus")).distinct()

  // Pivot (long → wide): sum of quantity by returnflag × linestatus,
  // status values pinned explicitly (no value-discovery job — the
  // production pivot contract at scale). Quantities are whole-number
  // doubles, so distributed sums are order-exact. Oracle = conditional
  // aggregation.
  val qPivot: Q = (s, d) =>
    lineitem(s, d).groupBy(col("l_returnflag"))
      .pivot("l_linestatus", Seq("F", "O"))
      .agg(sum(col("l_quantity")))
      .withColumnRenamed("F", "qty_f")
      .withColumnRenamed("O", "qty_o")

  // Unpivot (wide → long), the inverse reshaping: the three charge
  // columns melt into (measure, value) rows — Spark's native unpivot
  // (logical Expand, a projection: no shuffle at all). Values are
  // exact 2-decimal doubles.
  val qUnpivot: Q = (s, d) =>
    lineitem(s, d)
      .select(col("l_orderkey"), col("l_linenumber"),
        col("l_extendedprice"), col("l_discount"), col("l_tax"))
      .unpivot(
        Array(col("l_orderkey"), col("l_linenumber")),
        Array(col("l_extendedprice"), col("l_discount"), col("l_tax")),
        "measure", "value")

  // Per-group z-score normalization (the feature-engineering standard):
  // group moments computed as EXACT decimal sums (2dp inputs → 4dp
  // squares, no float summation-order drift), variance/sd derived in
  // double with pinned op order, 6dp-rounded z per row. Moments frame
  // is O(groups) and broadcast — one scan + one tiny join.
  val qZscore: Q = (s, d) => {
    val li = lineitem(s, d).select(col("l_orderkey"), col("l_linenumber"),
      col("l_returnflag"), col("l_extendedprice"))
    val m = li.groupBy(col("l_returnflag")).agg(
      count(lit(1)).cast("double").as("n"),
      sum(col("l_extendedprice").cast("decimal(18,2)"))
        .cast("double").as("s"),
      sum((col("l_extendedprice").cast("decimal(18,2)") *
        col("l_extendedprice").cast("decimal(18,2)")).cast("decimal(38,4)"))
        .cast("double").as("q"))
    li.join(broadcast(m), "l_returnflag")
      .select(col("l_orderkey"), col("l_linenumber"),
        graft.functions.DetRound.det6(
          (col("l_extendedprice") - col("s") / col("n")) /
            sqrt((col("q") - col("s") * col("s") / col("n")) / col("n")))
          .as("z"))
  }

  // Correlated-style aggregation join: orders above 1.5× their customer's
  // average. All comparison arithmetic in exact decimal — float avg
  // differs between engines in the last ulp, which flips rows sitting on
  // the predicate/rounding boundary.
  val qJoinAgg: Q = (s, d) => {
    val o = orders(s, d)
      .withColumn("p", col("o_totalprice").cast("decimal(18,2)"))
    val perCust = o.groupBy(col("o_custkey").as("ac_custkey"))
      .agg(sum(col("p")).as("cust_sum"), count(lit(1)).as("cust_n"))
    o.join(perCust, o("o_custkey") === col("ac_custkey"))
      .where(col("p") * col("cust_n") * 2 > col("cust_sum") * 3)
      .select(col("o_orderkey"), col("o_custkey"),
        round(col("o_totalprice"), 2).as("price"),
        col("cust_sum").cast("double").as("cust_sum"),
        col("cust_n"))
  }

  // Grouped having: nations with >= 50 customers (post-agg filter).
  val qHaving: Q = (s, d) =>
    customer(s, d)
      .groupBy(col("c_nationkey"))
      .agg(count(lit(1)).as("n"),
        graft.functions.DetRound.det(avgDec(col("c_acctbal")), 6).as("avg_bal"))
      .where(col("n") >= 50)

  // Date bucketing on the time column: monthly order volume, emitted as a
  // string key (never raw timestamps — see file Scaladoc).
  val qMonthly: Q = (s, d) =>
    orders(s, d)
      .groupBy(date_format(col("o_orderdate"), "yyyy-MM").as("month"))
      .agg(count(lit(1)).as("n_orders"),
        sumDec(col("o_totalprice")).as("total"))

  // ITERATIVE-STATE SQL — Spark 4's recursive CTE (WITH RECURSIVE,
  // UNION ALL): a 0.5-EWMA over each priority's monthly revenue, the
  // forecasting/state-machine recursion a window function cannot
  // express (each smoothed value depends on the PREVIOUS smoothed
  // value, not on the raw frame). One recursion level per month (80 at
  // this fixture — under Spark's 100-level default), one row per
  // (priority, month) per level: linear, no fan-out. The monthly base
  // is an exact decimal sum, and the smoothing chain is the same IEEE
  // op sequence in both engines, so the oracle (DuckDB's identical
  // recursion) matches to the 6dp pin.
  val qEwmaRecursive: Q = (s, d) => {
    import s.implicits._
    // The monthly base aggregates DISTRIBUTED (exact decimal sums) and
    // collects — O(#priorities × #calendar-months) rows, a
    // calendar-bounded driver frame. The recursion then runs over a
    // LOCAL relation: recursing over the distributed lineage instead
    // costs one full job per level (~80 levels = 37 s measured at
    // sf0.1); over the local frame the whole chain is milliseconds.
    // Trailing 12 months only: Spark executes each recursion level as
    // its own iteration, so the DEPTH is the wall-clock driver — 12
    // levels is the forecasting window and keeps the chain bounded
    // whatever the table's calendar span (80 unbounded levels measured
    // 37 s at sf0.1; the values themselves are identical because the
    // chain re-anchors). Ranks are computed on the collected frame, so
    // the view is a plain local relation.
    val monthly = orders(s, d)
      .groupBy(col("o_orderpriority").as("pri"),
        date_format(col("o_orderdate"), "yyyy-MM").as("month"))
      .agg(sum(col("o_totalprice").cast("decimal(18,2)"))
        .cast("double").as("rev"))
      .collect()
      .map(r => (r.getString(0), r.getString(1), r.getDouble(2)))
    val trailing = monthly.groupBy(_._1).toSeq.flatMap { case (_, rows) =>
      rows.sortBy(_._2).takeRight(12).zipWithIndex
        .map { case ((pri, month, rev), i) => (pri, i + 1, month, rev) }
    }
    trailing.toDF("pri", "rnk", "month", "rev")
      .createOrReplaceTempView("graft_monthly_rec")
    s.sql(
      """WITH RECURSIVE r AS (
        |  SELECT pri, rnk, month, rev, rev AS ewma
        |  FROM graft_monthly_rec WHERE rnk = 1
        |  UNION ALL
        |  SELECT m.pri, m.rnk, m.month, m.rev,
        |    0.5 * m.rev + 0.5 * r.ewma
        |  FROM r JOIN graft_monthly_rec m
        |    ON m.pri = r.pri AND m.rnk = r.rnk + 1)
        |SELECT pri, month, rev,
        |  floor(ewma * 1000000 + 0.5) / 1000000 AS ewma
        |FROM r""".stripMargin)
  }

  // Exact quantiles with linear interpolation, computed via EXPLICIT
  // rank + interpolation (identical formula text on both engines —
  // builtin percentile/quantile_cont agree semantically but not in
  // internal op order, which shifts ulps under rounding). Ties in v get
  // arbitrary rank among equals, but vlo/vhi are then equal values, so
  // the result is unaffected. Ranking is GlobalRank (range partition +
  // parallel local sorts + offset join), NOT an unpartitioned window —
  // exact at any scale with no single-reducer sort.
  val qPercentiles: Q = (s, d) => {
    import s.implicits._
    val v = lineitem(s, d).select(col("l_extendedprice").as("v"))
    // Checkpoint the ranked frame: lo-value and hi-value lookups are
    // two consumers, and each would otherwise re-run the whole
    // range-exchange + sort lineage. (rn, v) is 16 B/row; n comes from
    // max(rn) over the same blocks — no third scan of the source.
    val o = graft.operators.GlobalRank.withRowNumber(v, "rn", Seq(col("v")))
      .localCheckpoint()
    val ps = Seq(0.25, 0.5, 0.75, 0.95).toDF("p")
    val pick = ps.crossJoin(o.agg(max(col("rn")).as("n")))
      .withColumn("k", (col("n") - 1) * col("p"))
      .withColumn("lo", floor(col("k")).cast("long") + 1)
      .withColumn("hi", least(floor(col("k")).cast("long") + 2, col("n")))
      .withColumn("frac", col("k") - floor(col("k")))
    val lov = o.select(col("rn").as("lo"), col("v").as("vlo"))
    val hiv = o.select(col("rn").as("hi"), col("v").as("vhi"))
    pick.join(lov, Seq("lo")).join(hiv, Seq("hi"))
      .withColumn("q", graft.functions.DetRound.det(
        col("vlo") + col("frac") * (col("vhi") - col("vlo")), 4))
      .agg(
        max(when(col("p") === 0.25, col("q"))).as("p25"),
        max(when(col("p") === 0.5, col("q"))).as("p50"),
        max(when(col("p") === 0.75, col("q"))).as("p75"),
        max(when(col("p") === 0.95, col("q"))).as("p95"))
  }

  // Decile bucketing + per-decile stats. Exact SQL-ntile semantics via
  // GlobalRank.withNtile — range partition + parallel local sorts, no
  // unpartitioned window / single-reducer sort at any scale.
  val qNtile: Q = (s, d) =>
    graft.operators.GlobalRank.withNtile(customer(s, d), "decile", 10,
      Seq(col("c_acctbal"), col("c_custkey")))
      .groupBy(col("decile"))
      .agg(count(lit(1)).as("n"),
        round(min(col("c_acctbal")), 2).as("lo_bal"),
        round(max(col("c_acctbal")), 2).as("hi_bal"))

  // TPC-H Q4-style: orders having at least one flagged lineitem —
  // correlated EXISTS, planned as a LeftSemi hash join (never a
  // per-row subquery). Adapted predicate: the fixture has no
  // commit/receipt dates, so the EXISTS tests l_returnflag = 'R'.
  val q4PriorityExists: Q = (s, d) => {
    val flagged = lineitem(s, d).where(col("l_returnflag") === "R")
      .select(col("l_orderkey").as("o_orderkey"))
    orders(s, d).join(flagged, Seq("o_orderkey"), "left_semi")
      .groupBy(col("o_orderpriority"))
      .agg(count(lit(1)).as("n"))
  }

  // TPC-H Q13-style: distribution of per-customer order counts. The
  // LEFT join keeps order-less customers (count = 0 via count(col),
  // which skips nulls); both aggregations are map-side partial.
  val q13CustDistribution: Q = (s, d) => {
    val joined = customer(s, d).select(col("c_custkey"))
      .join(orders(s, d).select(col("o_custkey"), col("o_orderkey")),
        col("c_custkey") === col("o_custkey"), "left")
    joined.groupBy(col("c_custkey"))
      .agg(count(col("o_orderkey")).as("c_count"))
      .groupBy(col("c_count"))
      .agg(count(lit(1)).as("custdist"))
  }

  // RANGE-frame window: per customer, trailing-30-day order revenue.
  // The frame is value-based (peers included), keyed on an exact
  // integer day so both engines agree on frame membership; decimal sum
  // keeps the double cast exact.
  val qWindowRange: Q = (s, d) => {
    val w = Window.partitionBy(col("o_custkey")).orderBy(col("day"))
      .rangeBetween(-30, 0)
    orders(s, d)
      // NTZ → LTZ under the session's UTC zone, then epoch seconds —
      // numerically the naive epoch DuckDB's epoch_ms sees.
      .withColumn("day",
        expr("CAST(CAST(o_orderdate AS TIMESTAMP) AS LONG) div 86400"))
      .withColumn("sum_30d", sum(dec(col("o_totalprice"))).over(w).cast("double"))
      .select(col("o_orderkey"), col("o_custkey"), col("day"), col("sum_30d"))
  }

  // FULL OUTER join: per-nation customer/supplier counts, keeping
  // nations present on either side only (null-padded on the other).
  val qFullOuter: Q = (s, d) => {
    val c = customer(s, d).groupBy(col("c_nationkey").as("nationkey"))
      .agg(count(lit(1)).as("n_cust"))
    val su = supplier(s, d).groupBy(col("s_nationkey").as("skey"))
      .agg(count(lit(1)).as("n_supp"))
    c.join(su, col("nationkey") === col("skey"), "full_outer")
      .select(coalesce(col("nationkey"), col("skey")).as("nationkey"),
        col("n_cust"), col("n_supp"))
  }

  // GROUPING SETS via the SQL-text surface (temp views + spark.sql) —
  // the engine's full SQL interface is part of the capability contract.
  val qGroupingSets: Q = (s, d) => {
    orders(s, d).createOrReplaceTempView("orders_v")
    s.sql(
      """SELECT o_orderpriority, o_orderstatus, count(*) AS n
        |FROM orders_v
        |GROUP BY GROUPING SETS ((o_orderpriority), (o_orderstatus), ())
        |""".stripMargin)
  }

  // TPC-H Q18-style (large-volume orders) through the SQL surface with
  // the IN + grouped-HAVING subquery form — Catalyst plans it as a
  // semi-join against the aggregated subquery, never a per-row probe.
  // sum(l_quantity) is integral-double exact, so the HAVING threshold
  // is engine-portable.
  val q18LargeVolume: Q = (s, d) => {
    orders(s, d).createOrReplaceTempView("orders_v18")
    customer(s, d).createOrReplaceTempView("customer_v18")
    lineitem(s, d).createOrReplaceTempView("lineitem_v18")
    s.sql(
      """SELECT c_custkey, o_orderkey, round(o_totalprice, 2) AS price
        |FROM orders_v18 o JOIN customer_v18 c ON c_custkey = o_custkey
        |WHERE o_orderkey IN (SELECT l_orderkey FROM lineitem_v18
        |  GROUP BY l_orderkey HAVING sum(l_quantity) > 250)
        |""".stripMargin)
  }

  // TPC-H Q17-style (small-quantity-order revenue): lineitems whose
  // quantity is under 20% of their part's average. The 0.2·avg
  // comparison is rewritten to the integer-exact cross-multiplied form
  // `5 · qty · n < sum` (all integral doubles, exact < 2^53) so the
  // boundary never depends on an engine's avg() evaluation order; the
  // revenue sum is decimal-exact per the house convention.
  val q17SmallQtyRevenue: Q = (s, d) => {
    val pq = lineitem(s, d).groupBy(col("l_partkey"))
      .agg(count(lit(1)).as("__n"), sum(col("l_quantity")).as("__s"))
    lineitem(s, d).join(pq, "l_partkey")
      .where(col("l_quantity") * lit(5.0) * col("__n") < col("__s"))
      .agg((sum(dec(col("l_extendedprice"))) / lit(7.0)).cast("double")
        .as("avg_yearly"))
  }

  // Approx twin of q_percentiles: percentile_approx is ONE mergeable
  // map-side sketch aggregate — no global sort, no GlobalRank prefix
  // pass — the shape that wins at 100 TB (q_percentiles stays as the
  // exact reference). DuckDB can't replay Spark's sketch, so the row
  // pins the exact lanes (p25..p95 — the very values q_percentiles
  // oracles) plus the sketch's accuracy contract as booleans:
  // accuracy=10000 bounds rank error at 1e-4, so each approx value
  // must lie between the exact interpolated quantiles at p ∓ 0.002
  // (20× slack absorbs the nearest-rank vs interpolation convention
  // gap). The oracle emits literal TRUE per lane.
  val qPercentilesApprox: Q = (s, d) => {
    import s.implicits._
    val targets = Seq(0.25, 0.5, 0.75, 0.95)
    val eps = 0.002
    val v = lineitem(s, d).select(col("l_extendedprice").as("v"))
    val o = graft.operators.GlobalRank.withRowNumber(v, "rn", Seq(col("v")))
    val ps = targets.flatMap(p => Seq(p - eps, p, p + eps)).toDF("p")
    val pick = ps.crossJoin(v.agg(count(lit(1)).as("n")))
      .withColumn("k", (col("n") - 1) * col("p"))
      .withColumn("lo", floor(col("k")).cast("long") + 1)
      .withColumn("hi", least(floor(col("k")).cast("long") + 2, col("n")))
      .withColumn("frac", col("k") - floor(col("k")))
    val lov = o.select(col("rn").as("lo"), col("v").as("vlo"))
    val hiv = o.select(col("rn").as("hi"), col("v").as("vhi"))
    val qs = pick.join(lov, Seq("lo")).join(hiv, Seq("hi"))
      .withColumn("q", col("vlo") + col("frac") * (col("vhi") - col("vlo")))
    def qAt(p: Double) =
      max(when(abs(col("p") - p) < 1e-9, col("q")))
    val exactRow = qs.agg(
      qAt(0.25).as("e25"), qAt(0.25 - eps).as("l25"), qAt(0.25 + eps).as("h25"),
      qAt(0.50).as("e50"), qAt(0.50 - eps).as("l50"), qAt(0.50 + eps).as("h50"),
      qAt(0.75).as("e75"), qAt(0.75 - eps).as("l75"), qAt(0.75 + eps).as("h75"),
      qAt(0.95).as("e95"), qAt(0.95 - eps).as("l95"), qAt(0.95 + eps).as("h95"))
    val approx = v.agg(percentile_approx(col("v"),
      array(targets.map(lit): _*), lit(10000)).as("ap"))
    def ok(i: Int, l: String, h: String) =
      (col("ap")(i) >= col(l) && col("ap")(i) <= col(h))
    exactRow.crossJoin(approx).select(
      graft.functions.DetRound.det(col("e25"), 4).as("p25"),
      graft.functions.DetRound.det(col("e50"), 4).as("p50"),
      graft.functions.DetRound.det(col("e75"), 4).as("p75"),
      graft.functions.DetRound.det(col("e95"), 4).as("p95"),
      ok(0, "l25", "h25").as("p25_ok"), ok(1, "l50", "h50").as("p50_ok"),
      ok(2, "l75", "h75").as("p75_ok"), ok(3, "l95", "h95").as("p95_ok"))
  }

  // TPC-H Q7-style volume shipping between two trading nations. The
  // two-nation predicate is pushed into the BROADCAST nation dims (2
  // rows each) BEFORE the join — the fact side is never filtered by a
  // post-join residual alone, and the only shuffle join in the plan is
  // lineitem⋈orders. Years as strings per the house date convention.
  val q7VolumeShipping: Q = (s, d) => {
    val pair = Seq("NATION_1", "NATION_2")
    val l = lineitem(s, d)
      .where(col("l_shipdate") >= lit("1996-01-01").cast("timestamp") &&
        col("l_shipdate") < lit("1998-01-01").cast("timestamp"))
    val o = orders(s, d)
    val c = customer(s, d)
    val sup = supplier(s, d)
    val n1 = nation(s, d).where(col("n_name").isin(pair: _*))
      .select(col("n_nationkey").as("snk"), col("n_name").as("supp_nation"))
    val n2 = nation(s, d).where(col("n_name").isin(pair: _*))
      .select(col("n_nationkey").as("cnk"), col("n_name").as("cust_nation"))
    l.join(o, l("l_orderkey") === o("o_orderkey"))
      .join(broadcast(sup), l("l_suppkey") === sup("s_suppkey"))
      .join(broadcast(c), o("o_custkey") === c("c_custkey"))
      .join(broadcast(n1), col("s_nationkey") === col("snk"))
      .join(broadcast(n2), col("c_nationkey") === col("cnk"))
      .where(col("supp_nation") =!= col("cust_nation"))
      .groupBy(col("supp_nation"), col("cust_nation"),
        date_format(col("l_shipdate"), "yyyy").as("l_year"))
      .agg(sum(dec(col("l_extendedprice")) * (lit(1) - dec(col("l_discount"))))
        .cast("double").as("revenue"))
  }

  // TPC-H Q8-style market share: NATION_3 suppliers' share of AMERICA
  // customers' ECONOMY-part volume, per year. Both sums are exact
  // decimals; the single final division is the only float op, so the
  // 6dp deterministic round is engine-stable.
  val q8MarketShare: Q = (s, d) => {
    val l = lineitem(s, d)
    val o = orders(s, d)
    val c = customer(s, d)
    val sup = supplier(s, d)
    val p = part(s, d).where(col("p_type") === "ECONOMY")
    val nCust = nation(s, d).join(
      region(s, d).where(col("r_name") === "AMERICA"),
      col("n_regionkey") === col("r_regionkey"))
      .select(col("n_nationkey").as("cnk"))
    val nSupp = nation(s, d)
      .select(col("n_nationkey").as("snk"), col("n_name").as("supp_nation"))
    l.join(o, l("l_orderkey") === o("o_orderkey"))
      .join(broadcast(p), l("l_partkey") === p("p_partkey"))
      .join(broadcast(sup), l("l_suppkey") === sup("s_suppkey"))
      .join(broadcast(c), o("o_custkey") === c("c_custkey"))
      .join(broadcast(nCust), col("c_nationkey") === col("cnk"))
      .join(broadcast(nSupp), col("s_nationkey") === col("snk"))
      .withColumn("volume",
        dec(col("l_extendedprice")) * (lit(1) - dec(col("l_discount"))))
      .groupBy(date_format(col("o_orderdate"), "yyyy").as("o_year"))
      .agg(graft.functions.DetRound.det(
        sum(when(col("supp_nation") === "NATION_3", col("volume"))
          .otherwise(lit(0).cast("decimal(18,2)"))).cast("double") /
          sum(col("volume")).cast("double"), 6).as("mkt_share"))
  }

  // TPC-H Q9-style product profit (adapted: the fixture has no
  // partsupp, so supply cost is the part's retail price — the join
  // shape is the point, not the constant). Profit per supplier nation
  // per year over 'red' parts; all-decimal arithmetic.
  val q9ProductProfit: Q = (s, d) => {
    val l = lineitem(s, d)
    val o = orders(s, d)
    val sup = supplier(s, d)
    val p = part(s, d).where(col("p_name").like("%red%"))
    val n = nation(s, d)
    l.join(o, l("l_orderkey") === o("o_orderkey"))
      .join(broadcast(p), l("l_partkey") === p("p_partkey"))
      .join(broadcast(sup), l("l_suppkey") === sup("s_suppkey"))
      .join(broadcast(n), col("s_nationkey") === col("n_nationkey"))
      .groupBy(col("n_name").as("nation"),
        date_format(col("o_orderdate"), "yyyy").as("o_year"))
      .agg(sum(dec(col("l_extendedprice")) * (lit(1) - dec(col("l_discount")))
          - dec(col("p_retailprice")) * dec(col("l_quantity")))
        .cast("double").as("sum_profit"))
  }

  // TPC-H Q10-style returned-item report: top 20 customers by revenue
  // lost to returns in one quarter. TakeOrderedAndProject keeps the
  // top-k bounded; c_custkey tiebreak keeps it deterministic.
  val q10ReturnedItems: Q = (s, d) => {
    val l = lineitem(s, d).where(col("l_returnflag") === "R")
    val o = orders(s, d)
      .where(col("o_orderdate") >= lit("1996-01-01").cast("timestamp") &&
        col("o_orderdate") < lit("1996-04-01").cast("timestamp"))
    val c = customer(s, d)
    val n = nation(s, d)
    l.join(o, l("l_orderkey") === o("o_orderkey"))
      .join(c, o("o_custkey") === c("c_custkey"))
      .join(broadcast(n), c("c_nationkey") === col("n_nationkey"))
      .groupBy(col("c_custkey"), col("c_name"),
        round(col("c_acctbal"), 2).as("acctbal"), col("n_name"))
      .agg(sum(dec(col("l_extendedprice")) * (lit(1) - dec(col("l_discount"))))
        .cast("double").as("revenue"))
      .orderBy(col("revenue").desc, col("c_custkey"))
      .limit(20)
  }

  // TPC-H Q14-style promo revenue share for one month: 100·promo/total.
  // Single scalar output; decimal sums, one final rounded division.
  val q14PromoRevenue: Q = (s, d) => {
    val l = lineitem(s, d)
      .where(col("l_shipdate") >= lit("1996-03-01").cast("timestamp") &&
        col("l_shipdate") < lit("1996-04-01").cast("timestamp"))
    val p = part(s, d)
    l.join(broadcast(p), l("l_partkey") === p("p_partkey"))
      .withColumn("volume",
        dec(col("l_extendedprice")) * (lit(1) - dec(col("l_discount"))))
      .agg(graft.functions.DetRound.det(
        lit(100.0) *
          sum(when(col("p_type") === "PROMO", col("volume"))
            .otherwise(lit(0).cast("decimal(18,2)"))).cast("double") /
          sum(col("volume")).cast("double"), 6).as("promo_revenue"))
  }

  // TPC-H Q19-style discounted revenue: OR-of-ANDs over part attributes
  // and line quantity — an equi-join on partkey with a disjunctive
  // residual Catalyst must keep OUT of the join keys (and does; the
  // plan stays a single broadcast hash join, gated in PlanSpec).
  val q19DiscRevenue: Q = (s, d) => {
    val l = lineitem(s, d)
    val p = part(s, d)
    l.join(broadcast(p), l("l_partkey") === p("p_partkey") && (
      (p("p_brand") === "Brand#1" && p("p_size").between(1, 10) &&
        l("l_quantity").between(1, 20)) ||
      (p("p_brand") === "Brand#2" && p("p_size").between(1, 15) &&
        l("l_quantity").between(10, 30)) ||
      (p("p_brand") === "Brand#3" && p("p_size").between(1, 20) &&
        l("l_quantity").between(20, 40))))
      .agg(sum(dec(col("l_extendedprice")) * (lit(1) - dec(col("l_discount"))))
        .cast("double").as("revenue"))
  }

  // TPC-H Q22-style global sales opportunity: well-funded customers
  // (balance above the positive-balance average of their cohort) with
  // no RECENT orders — scalar subquery + filtered anti join, grouped by
  // nation as the country-code analog. (The classic no-orders-at-all
  // predicate is empty on this fixture — every customer orders — so the
  // EXISTS is date-restricted to keep the entry non-trivial.) The avg
  // is an exact decimal sum over an exact count; only the final
  // comparison is float, against balances two decimals wide — no
  // boundary ambiguity.
  val q22GlobalSales: Q = (s, d) => {
    val cohort = Seq(1, 3, 5, 7, 9, 11, 13)
    val c = customer(s, d).where(col("c_nationkey").isin(cohort: _*))
    // house avgDec shape: exact decimal sum cast to double, THEN divide
    // (decimal-division rounding rules are not engine-portable)
    val avgBal = c.where(col("c_acctbal") > 0)
      .agg((sum(dec(col("c_acctbal"))).cast("double") / count(lit(1)))
        .as("avg_bal"))
    val o = orders(s, d)
      .where(col("o_orderdate") >= lit("2000-01-01").cast("timestamp"))
    c.crossJoin(broadcast(avgBal))
      .where(col("c_acctbal") > col("avg_bal"))
      .join(o, col("c_custkey") === o("o_custkey"), "left_anti")
      .groupBy(col("c_nationkey").as("cntry"))
      .agg(count(lit(1)).as("numcust"),
        sumDec(col("c_acctbal")).as("totacctbal"))
  }

  // TPC-H Q15 top supplier: per-supplier revenue over one quarter, then
  // the supplier(s) achieving the maximum — the "create view" scalar-max
  // pattern as a broadcast 1-row cross join (never a second scan-wide
  // shuffle: the max is an O(suppliers) agg over the already-reduced
  // revenue frame). Revenue stays DECIMAL through the max-equality test
  // (float max-equality is ulp-ambiguous across engines) and casts to
  // double only at the output edge. Completes the classic suite as far
  // as the fixture allows: Q2/Q11/Q16/Q20 need partsupp and Q12/Q21 need
  // l_shipmode/l_commitdate/l_receiptdate, none of which the driver's
  // testdata generates.
  val q15TopSupplier: Q = (s, d) => {
    val rev = lineitem(s, d)
      .where(col("l_shipdate") >= lit("1996-01-01").cast("timestamp") &&
        col("l_shipdate") < lit("1996-04-01").cast("timestamp"))
      .groupBy(col("l_suppkey"))
      .agg(sum(dec(col("l_extendedprice")) * (lit(1) - dec(col("l_discount"))))
        .as("rev_dec"))
    val mx = rev.agg(max(col("rev_dec")).as("mx"))
    rev.crossJoin(broadcast(mx)).where(col("rev_dec") === col("mx"))
      .join(broadcast(supplier(s, d)), col("l_suppkey") === col("s_suppkey"))
      .select(col("s_suppkey"), col("s_name"),
        col("rev_dec").cast("double").as("total_revenue"))
  }

  val queries: Map[String, Q] = Map(
    "q15_top_supplier" -> q15TopSupplier,
    "q7_volume_shipping" -> q7VolumeShipping,
    "q8_market_share" -> q8MarketShare,
    "q9_product_profit" -> q9ProductProfit,
    "q10_returned_items" -> q10ReturnedItems,
    "q14_promo_revenue" -> q14PromoRevenue,
    "q19_disc_revenue" -> q19DiscRevenue,
    "q22_global_sales" -> q22GlobalSales,
    "q_percentiles_approx" -> qPercentilesApprox,
    "q18_large_volume" -> q18LargeVolume,
    "q17_small_qty_revenue" -> q17SmallQtyRevenue,
    "q_grouping_sets" -> qGroupingSets,
    "q_percentiles" -> qPercentiles,
    "q_ntile" -> qNtile,
    "q4_priority_exists" -> q4PriorityExists,
    "q13_cust_distribution" -> q13CustDistribution,
    "q_window_range" -> qWindowRange,
    "q_full_outer" -> qFullOuter,
    "q1_pricing_summary" -> q1PricingSummary,
    "q6_revenue" -> q6Revenue,
    "q3_top_orders" -> q3TopOrders,
    "q5_nation_revenue" -> q5NationRevenue,
    "q_semi_join" -> qSemiJoin,
    "q_anti_join" -> qAntiJoin,
    "q_window_top_per_customer" -> qWindowTopPerCustomer,
    "q_window_running" -> qWindowRunning,
    "q_rollup" -> qRollup,
    "q_cube" -> qCube,
    "q_except" -> qExcept,
    "q_intersect" -> qIntersect,
    "q_stats" -> qStats,
    "q_topk" -> qTopK,
    "q_distinct" -> qDistinct,
    "q_pivot" -> qPivot,
    "q_unpivot" -> qUnpivot,
    "q_zscore" -> qZscore,
    "q_join_agg" -> qJoinAgg,
    "q_having" -> qHaving,
    "q_monthly" -> qMonthly,
    "q_ewma_recursive" -> qEwmaRecursive)

  private val volSql =
    "CAST(l_extendedprice AS DECIMAL(18,2)) * " +
      "(1 - CAST(l_discount AS DECIMAL(18,2)))"

  val oracles: Map[String, String] = Map(
    // The scalar-max stays DECIMAL through the equality; double only at
    // the output edge (mirrors the Spark side exactly).
    "q15_top_supplier" ->
      s"""WITH revenue AS (
        |  SELECT l_suppkey, sum($volSql) AS rev_dec
        |  FROM lineitem
        |  WHERE l_shipdate >= TIMESTAMP '1996-01-01'
        |    AND l_shipdate < TIMESTAMP '1996-04-01'
        |  GROUP BY 1)
        |SELECT s_suppkey, s_name, CAST(rev_dec AS DOUBLE) AS total_revenue
        |FROM supplier JOIN revenue ON s_suppkey = l_suppkey
        |WHERE rev_dec = (SELECT max(rev_dec) FROM revenue)""".stripMargin,
    "q7_volume_shipping" ->
      s"""SELECT n1.n_name AS supp_nation, n2.n_name AS cust_nation,
         |  strftime(l_shipdate, '%Y') AS l_year,
         |  CAST(sum($volSql) AS DOUBLE) AS revenue
         |FROM lineitem
         |JOIN orders ON l_orderkey = o_orderkey
         |JOIN supplier ON l_suppkey = s_suppkey
         |JOIN customer ON o_custkey = c_custkey
         |JOIN nation n1 ON s_nationkey = n1.n_nationkey
         |JOIN nation n2 ON c_nationkey = n2.n_nationkey
         |WHERE n1.n_name IN ('NATION_1', 'NATION_2')
         |  AND n2.n_name IN ('NATION_1', 'NATION_2')
         |  AND n1.n_name <> n2.n_name
         |  AND l_shipdate >= TIMESTAMP '1996-01-01'
         |  AND l_shipdate < TIMESTAMP '1998-01-01'
         |GROUP BY 1, 2, 3""".stripMargin,
    "q8_market_share" -> {
      val share = "CAST(sum(CASE WHEN supp_nation = 'NATION_3' THEN volume" +
        " ELSE CAST(0 AS DECIMAL(18,2)) END) AS DOUBLE)" +
        " / CAST(sum(volume) AS DOUBLE)"
      s"""WITH base AS (
         |  SELECT strftime(o_orderdate, '%Y') AS o_year,
         |    $volSql AS volume, n2.n_name AS supp_nation
         |  FROM lineitem
         |  JOIN orders ON l_orderkey = o_orderkey
         |  JOIN part ON l_partkey = p_partkey
         |  JOIN supplier ON l_suppkey = s_suppkey
         |  JOIN customer ON o_custkey = c_custkey
         |  JOIN nation n1 ON c_nationkey = n1.n_nationkey
         |  JOIN region ON n1.n_regionkey = r_regionkey
         |  JOIN nation n2 ON s_nationkey = n2.n_nationkey
         |  WHERE r_name = 'AMERICA' AND p_type = 'ECONOMY')
         |SELECT o_year, ${graft.functions.DetRound.sql(share, 6)} AS mkt_share
         |FROM base GROUP BY 1""".stripMargin
    },
    "q9_product_profit" ->
      s"""SELECT n_name AS nation, strftime(o_orderdate, '%Y') AS o_year,
         |  CAST(sum($volSql
         |      - CAST(p_retailprice AS DECIMAL(18,2))
         |        * CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE)
         |    AS sum_profit
         |FROM lineitem
         |JOIN orders ON l_orderkey = o_orderkey
         |JOIN part ON l_partkey = p_partkey
         |JOIN supplier ON l_suppkey = s_suppkey
         |JOIN nation ON s_nationkey = n_nationkey
         |WHERE p_name LIKE '%red%'
         |GROUP BY 1, 2""".stripMargin,
    "q10_returned_items" ->
      s"""SELECT c_custkey, c_name, round(c_acctbal, 2) AS acctbal, n_name,
         |  CAST(sum($volSql) AS DOUBLE) AS revenue
         |FROM lineitem
         |JOIN orders ON l_orderkey = o_orderkey
         |JOIN customer ON o_custkey = c_custkey
         |JOIN nation ON c_nationkey = n_nationkey
         |WHERE l_returnflag = 'R'
         |  AND o_orderdate >= TIMESTAMP '1996-01-01'
         |  AND o_orderdate < TIMESTAMP '1996-04-01'
         |GROUP BY 1, 2, 3, 4
         |ORDER BY revenue DESC, c_custkey LIMIT 20""".stripMargin,
    "q14_promo_revenue" -> {
      val share = "100.0 * CAST(sum(CASE WHEN p_type = 'PROMO' THEN volume" +
        " ELSE CAST(0 AS DECIMAL(18,2)) END) AS DOUBLE)" +
        " / CAST(sum(volume) AS DOUBLE)"
      s"""WITH base AS (
         |  SELECT $volSql AS volume, p_type
         |  FROM lineitem JOIN part ON l_partkey = p_partkey
         |  WHERE l_shipdate >= TIMESTAMP '1996-03-01'
         |    AND l_shipdate < TIMESTAMP '1996-04-01')
         |SELECT ${graft.functions.DetRound.sql(share, 6)} AS promo_revenue
         |FROM base""".stripMargin
    },
    "q19_disc_revenue" ->
      s"""SELECT CAST(sum($volSql) AS DOUBLE) AS revenue
         |FROM lineitem JOIN part ON l_partkey = p_partkey
         |WHERE (p_brand = 'Brand#1' AND p_size BETWEEN 1 AND 10
         |       AND l_quantity BETWEEN 1 AND 20)
         |   OR (p_brand = 'Brand#2' AND p_size BETWEEN 1 AND 15
         |       AND l_quantity BETWEEN 10 AND 30)
         |   OR (p_brand = 'Brand#3' AND p_size BETWEEN 1 AND 20
         |       AND l_quantity BETWEEN 20 AND 40)""".stripMargin,
    "q22_global_sales" ->
      """WITH cohort AS (SELECT * FROM customer
        |  WHERE c_nationkey IN (1, 3, 5, 7, 9, 11, 13)),
        |ab AS (SELECT CAST(sum(CAST(c_acctbal AS DECIMAL(18,2))) AS DOUBLE)
        |    / count(*) AS avg_bal
        |  FROM cohort WHERE c_acctbal > 0)
        |SELECT c_nationkey AS cntry, count(*) AS numcust,
        |  CAST(sum(CAST(c_acctbal AS DECIMAL(18,2))) AS DOUBLE) AS totacctbal
        |FROM cohort CROSS JOIN ab
        |WHERE c_acctbal > ab.avg_bal
        |  AND NOT EXISTS (SELECT 1 FROM orders
        |    WHERE o_custkey = c_custkey
        |      AND o_orderdate >= TIMESTAMP '2000-01-01')
        |GROUP BY 1""".stripMargin,
    "q18_large_volume" ->
      """SELECT c_custkey, o_orderkey, round(o_totalprice, 2) AS price
        |FROM orders o JOIN customer c ON c_custkey = o_custkey
        |WHERE o_orderkey IN (SELECT l_orderkey FROM lineitem
        |  GROUP BY l_orderkey HAVING sum(l_quantity) > 250)""".stripMargin,
    "q17_small_qty_revenue" ->
      """WITH pq AS (SELECT l_partkey, count(*) AS n, sum(l_quantity) AS s
        |  FROM lineitem GROUP BY 1)
        |SELECT CAST(sum(CAST(l_extendedprice AS DECIMAL(18,2))) / 7.0
        |    AS DOUBLE) AS avg_yearly
        |FROM lineitem l JOIN pq ON l.l_partkey = pq.l_partkey
        |WHERE l.l_quantity * 5.0 * pq.n < pq.s""".stripMargin,
    "q_pivot" ->
      """SELECT l_returnflag,
        |  sum(CASE WHEN l_linestatus = 'F' THEN l_quantity END) AS qty_f,
        |  sum(CASE WHEN l_linestatus = 'O' THEN l_quantity END) AS qty_o
        |FROM lineitem GROUP BY 1""".stripMargin,
    "q_zscore" ->
      """WITH m AS (SELECT l_returnflag,
        |    CAST(count(*) AS DOUBLE) AS n,
        |    CAST(sum(CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE)
        |      AS s,
        |    CAST(sum(CAST(CAST(l_extendedprice AS DECIMAL(18,2)) *
        |        CAST(l_extendedprice AS DECIMAL(18,2)) AS DECIMAL(38,4)))
        |      AS DOUBLE) AS q
        |  FROM lineitem GROUP BY 1)
        |SELECT l.l_orderkey, l.l_linenumber,
        |  floor((l.l_extendedprice - m.s / m.n) /
        |    sqrt((m.q - m.s * m.s / m.n) / m.n) * 1000000 + 0.5) / 1000000
        |    AS z
        |FROM lineitem l JOIN m ON l.l_returnflag = m.l_returnflag""".stripMargin,
    "q_unpivot" ->
      """SELECT l_orderkey, l_linenumber, 'l_extendedprice' AS measure,
        |  l_extendedprice AS value FROM lineitem
        |UNION ALL
        |SELECT l_orderkey, l_linenumber, 'l_discount', l_discount
        |FROM lineitem
        |UNION ALL
        |SELECT l_orderkey, l_linenumber, 'l_tax', l_tax
        |FROM lineitem""".stripMargin,
    "q_grouping_sets" ->
      """SELECT o_orderpriority, o_orderstatus, count(*) AS n
        |FROM orders
        |GROUP BY GROUPING SETS ((o_orderpriority), (o_orderstatus), ())""".stripMargin,
    "q_full_outer" ->
      """SELECT coalesce(c.nationkey, s.skey) AS nationkey,
        |  c.n_cust, s.n_supp
        |FROM (SELECT c_nationkey AS nationkey, count(*) AS n_cust
        |      FROM customer GROUP BY 1) c
        |FULL OUTER JOIN
        |     (SELECT s_nationkey AS skey, count(*) AS n_supp
        |      FROM supplier GROUP BY 1) s
        |  ON c.nationkey = s.skey""".stripMargin,
    "q4_priority_exists" ->
      """SELECT o_orderpriority, count(*) AS n
        |FROM orders
        |WHERE EXISTS (SELECT 1 FROM lineitem
        |              WHERE l_orderkey = o_orderkey AND l_returnflag = 'R')
        |GROUP BY 1""".stripMargin,
    "q13_cust_distribution" ->
      """SELECT c_count, count(*) AS custdist
        |FROM (
        |  SELECT c_custkey, count(o_orderkey) AS c_count
        |  FROM customer LEFT JOIN orders ON c_custkey = o_custkey
        |  GROUP BY 1)
        |GROUP BY 1""".stripMargin,
    "q_window_range" ->
      """SELECT o_orderkey, o_custkey,
        |  epoch_ms(o_orderdate) // 86400000 AS day,
        |  CAST(sum(CAST(o_totalprice AS DECIMAL(18,2))) OVER (
        |    PARTITION BY o_custkey
        |    ORDER BY (epoch_ms(o_orderdate) // 86400000)
        |    RANGE BETWEEN 30 PRECEDING AND CURRENT ROW) AS DOUBLE)
        |    AS sum_30d
        |FROM orders""".stripMargin,
    "q_percentiles" ->
      """WITH v AS (SELECT l_extendedprice AS v FROM lineitem),
        |o AS (SELECT v, row_number() OVER (ORDER BY v) AS rn FROM v),
        |nn AS (SELECT count(*) AS n FROM v),
        |pick AS (
        |  SELECT p.p, (nn.n - 1) * p.p AS k,
        |    CAST(floor((nn.n - 1) * p.p) AS BIGINT) + 1 AS lo,
        |    least(CAST(floor((nn.n - 1) * p.p) AS BIGINT) + 2, nn.n) AS hi,
        |    (nn.n - 1) * p.p - floor((nn.n - 1) * p.p) AS frac
        |  FROM (VALUES (0.25), (0.5), (0.75), (0.95)) p(p), nn),
        |q AS (
        |  SELECT pick.p,
        |    floor((lov.v + pick.frac * (hiv.v - lov.v)) * 10000 + 0.5) / 10000
        |      AS q
        |  FROM pick
        |  JOIN o lov ON lov.rn = pick.lo
        |  JOIN o hiv ON hiv.rn = pick.hi)
        |SELECT
        |  max(CASE WHEN p = 0.25 THEN q END) AS p25,
        |  max(CASE WHEN p = 0.5 THEN q END) AS p50,
        |  max(CASE WHEN p = 0.75 THEN q END) AS p75,
        |  max(CASE WHEN p = 0.95 THEN q END) AS p95
        |FROM q""".stripMargin,
    // Exact q_percentiles lanes replayed; the sketch lanes are pinned
    // by their rank-error contract (literal TRUE — see qPercentilesApprox).
    "q_percentiles_approx" ->
      """WITH v AS (SELECT l_extendedprice AS v FROM lineitem),
        |o AS (SELECT v, row_number() OVER (ORDER BY v) AS rn FROM v),
        |nn AS (SELECT count(*) AS n FROM v),
        |pick AS (
        |  SELECT p.p, (nn.n - 1) * p.p AS k,
        |    CAST(floor((nn.n - 1) * p.p) AS BIGINT) + 1 AS lo,
        |    least(CAST(floor((nn.n - 1) * p.p) AS BIGINT) + 2, nn.n) AS hi,
        |    (nn.n - 1) * p.p - floor((nn.n - 1) * p.p) AS frac
        |  FROM (VALUES (0.25), (0.5), (0.75), (0.95)) p(p), nn),
        |q AS (
        |  SELECT pick.p,
        |    floor((lov.v + pick.frac * (hiv.v - lov.v)) * 10000 + 0.5) / 10000
        |      AS q
        |  FROM pick
        |  JOIN o lov ON lov.rn = pick.lo
        |  JOIN o hiv ON hiv.rn = pick.hi)
        |SELECT
        |  max(CASE WHEN p = 0.25 THEN q END) AS p25,
        |  max(CASE WHEN p = 0.5 THEN q END) AS p50,
        |  max(CASE WHEN p = 0.75 THEN q END) AS p75,
        |  max(CASE WHEN p = 0.95 THEN q END) AS p95,
        |  TRUE AS p25_ok, TRUE AS p50_ok, TRUE AS p75_ok, TRUE AS p95_ok
        |FROM q""".stripMargin,
    "q_ntile" ->
      """SELECT decile, count(*) AS n,
        | round(min(c_acctbal), 2) AS lo_bal,
        | round(max(c_acctbal), 2) AS hi_bal
        |FROM (SELECT c_acctbal,
        |    ntile(10) OVER (ORDER BY c_acctbal, c_custkey) AS decile
        |  FROM customer)
        |GROUP BY decile""".stripMargin,
    "q1_pricing_summary" ->
      """SELECT l_returnflag, l_linestatus,
        | CAST(sum(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS sum_qty,
        | CAST(sum(CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE)
        |   AS sum_base_price,
        | CAST(sum(CAST(l_extendedprice AS DECIMAL(18,2))
        |   * (1 - CAST(l_discount AS DECIMAL(18,2)))) AS DOUBLE)
        |   AS sum_disc_price,
        | floor(CAST(sum(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE)
        |   / count(*) * 1000000 + 0.5) / 1000000 AS avg_qty,
        | floor(CAST(sum(CAST(l_discount AS DECIMAL(18,2))) AS DOUBLE)
        |   / count(*) * 1000000 + 0.5) / 1000000 AS avg_disc,
        | count(*) AS count_order
        |FROM lineitem
        |WHERE l_shipdate <= TIMESTAMP '1998-09-02 00:00:00'
        |GROUP BY l_returnflag, l_linestatus""".stripMargin,
    "q6_revenue" ->
      """SELECT CAST(sum(CAST(l_extendedprice AS DECIMAL(18,2))
        |   * CAST(l_discount AS DECIMAL(18,2))) AS DOUBLE) AS revenue
        |FROM lineitem
        |WHERE l_shipdate >= TIMESTAMP '1995-01-01 00:00:00'
        |  AND l_shipdate < TIMESTAMP '1996-01-01 00:00:00'
        |  AND l_discount BETWEEN 0.03 AND 0.07
        |  AND l_quantity < 24""".stripMargin,
    "q3_top_orders" ->
      """SELECT l_orderkey,
        | CAST(sum(CAST(l_extendedprice AS DECIMAL(18,2))
        |   * (1 - CAST(l_discount AS DECIMAL(18,2)))) AS DOUBLE) AS revenue
        |FROM lineitem
        |JOIN orders ON l_orderkey = o_orderkey
        |JOIN customer ON o_custkey = c_custkey
        |WHERE c_mktsegment = 'BUILDING'
        |GROUP BY l_orderkey
        |ORDER BY revenue DESC, l_orderkey
        |LIMIT 10""".stripMargin,
    "q5_nation_revenue" ->
      """SELECT n_name,
        | CAST(sum(CAST(l_extendedprice AS DECIMAL(18,2))
        |   * (1 - CAST(l_discount AS DECIMAL(18,2)))) AS DOUBLE) AS revenue
        |FROM lineitem
        |JOIN orders ON l_orderkey = o_orderkey
        |JOIN supplier ON l_suppkey = s_suppkey
        |JOIN customer ON o_custkey = c_custkey AND s_nationkey = c_nationkey
        |JOIN nation ON c_nationkey = n_nationkey
        |JOIN region ON n_regionkey = r_regionkey
        |WHERE r_name = 'ASIA'
        |GROUP BY n_name""".stripMargin,
    "q_semi_join" ->
      """SELECT c_custkey, c_name FROM customer
        |WHERE EXISTS (SELECT 1 FROM orders
        |  WHERE o_custkey = c_custkey AND o_totalprice > 400000)""".stripMargin,
    "q_anti_join" ->
      """SELECT c_custkey, c_nationkey FROM customer
        |WHERE NOT EXISTS (SELECT 1 FROM orders
        |  WHERE o_custkey = c_custkey AND o_totalprice > 400000)""".stripMargin,
    "q_window_top_per_customer" ->
      """SELECT o_custkey, o_orderkey, round(o_totalprice, 2) AS price, rn
        |FROM (
        |  SELECT o_custkey, o_orderkey, o_totalprice,
        |    row_number() OVER (PARTITION BY o_custkey
        |      ORDER BY o_totalprice DESC, o_orderkey) AS rn
        |  FROM orders)
        |WHERE rn <= 3""".stripMargin,
    "q_window_running" ->
      """SELECT o_custkey, o_orderkey,
        | round(lag(o_totalprice, 1) OVER w, 2) AS prev_price,
        | CAST(sum(CAST(o_totalprice AS DECIMAL(18,2)))
        |   OVER (PARTITION BY o_custkey
        |   ORDER BY o_orderdate, o_orderkey
        |   ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS DOUBLE)
        |   AS running_spend
        |FROM orders
        |WINDOW w AS (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey)""".stripMargin,
    "q_rollup" ->
      """SELECT o_orderpriority, o_orderstatus, count(*) AS n,
        | CAST(sum(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS total
        |FROM orders
        |GROUP BY ROLLUP (o_orderpriority, o_orderstatus)""".stripMargin,
    "q_cube" ->
      """SELECT p_brand, CAST(floor(p_size / 10.0) AS INT) AS size_band,
        | count(*) AS n
        |FROM part
        |GROUP BY CUBE (p_brand, size_band)""".stripMargin,
    "q_except" ->
      """SELECT l_suppkey AS suppkey FROM lineitem
        |EXCEPT
        |SELECT s_suppkey AS suppkey FROM supplier
        |WHERE s_acctbal > 0""".stripMargin,
    "q_intersect" ->
      """SELECT c_nationkey AS nationkey FROM customer
        |INTERSECT
        |SELECT s_nationkey AS nationkey FROM supplier""".stripMargin,
    "q_stats" ->
      """SELECT round(min(l_extendedprice), 2) AS min_price,
        | round(max(l_extendedprice), 2) AS max_price,
        | floor(CAST(sum(CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE)
        |   / count(*) * 1000000 + 0.5) / 1000000 AS avg_price,
        | floor(sqrt((CAST(sum(CAST(l_extendedprice AS DECIMAL(18,2))
        |       * CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE)
        |     - CAST(sum(CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE)
        |       * CAST(sum(CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE)
        |       / count(*))
        |   / (count(*) - 1)) * 10000 + 0.5) / 10000 AS sd_price,
        | count(DISTINCT l_partkey) AS n_parts
        |FROM lineitem""".stripMargin,
    "q_topk" ->
      """SELECT o_orderkey, round(o_totalprice, 2) AS price
        |FROM orders
        |ORDER BY o_totalprice DESC, o_orderkey
        |LIMIT 25""".stripMargin,
    "q_distinct" ->
      "SELECT DISTINCT l_returnflag, l_linestatus FROM lineitem",
    "q_join_agg" ->
      """SELECT o_orderkey, o_custkey, round(o_totalprice, 2) AS price,
        | CAST(cust_sum AS DOUBLE) AS cust_sum, cust_n
        |FROM orders
        |JOIN (SELECT o_custkey AS ac_custkey,
        |        sum(CAST(o_totalprice AS DECIMAL(18,2))) AS cust_sum,
        |        count(*) AS cust_n
        |      FROM orders GROUP BY o_custkey) a
        |  ON o_custkey = ac_custkey
        |WHERE CAST(o_totalprice AS DECIMAL(18,2)) * cust_n * 2 > cust_sum * 3""".stripMargin,
    "q_having" ->
      """SELECT c_nationkey, count(*) AS n,
        | floor(CAST(sum(CAST(c_acctbal AS DECIMAL(18,2))) AS DOUBLE)
        |   / count(*) * 1000000 + 0.5) / 1000000 AS avg_bal
        |FROM customer
        |GROUP BY c_nationkey
        |HAVING count(*) >= 50""".stripMargin,
    // DuckDB's recursion is the same UNION ALL semantics; the smoothing
    // chain replays the identical op order. rnk ranks forward from the
    // OLDEST RETAINED month (not 13 - back): a priority with fewer than
    // 12 months still gets its rnk=1 anchor, matching the Spark side's
    // takeRight(12) + zipWithIndex numbering on short calendars.
    "q_ewma_recursive" ->
      """WITH RECURSIVE m AS (
        |  SELECT o_orderpriority AS pri,
        |    strftime(o_orderdate, '%Y-%m') AS month,
        |    CAST(sum(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS rev
        |  FROM orders GROUP BY 1, 2),
        |rk0 AS (SELECT pri, month, rev,
        |    CAST(row_number() OVER (PARTITION BY pri ORDER BY month DESC)
        |      AS INT) AS back FROM m),
        |rk AS (SELECT pri, month, rev,
        |    CAST(row_number() OVER (PARTITION BY pri ORDER BY month)
        |      AS INT) AS rnk
        |  FROM rk0 WHERE back <= 12),
        |r AS (
        |  SELECT pri, rnk, month, rev, rev AS ewma FROM rk WHERE rnk = 1
        |  UNION ALL
        |  SELECT rk.pri, rk.rnk, rk.month, rk.rev,
        |    0.5 * rk.rev + 0.5 * r.ewma
        |  FROM r JOIN rk ON rk.pri = r.pri AND rk.rnk = r.rnk + 1)
        |SELECT pri, month, rev,
        |  floor(ewma * 1000000 + 0.5) / 1000000 AS ewma
        |FROM r""".stripMargin,
    "q_monthly" ->
      """SELECT strftime(o_orderdate, '%Y-%m') AS month,
        | count(*) AS n_orders,
        | CAST(sum(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS total
        |FROM orders
        |GROUP BY 1""".stripMargin)
}
