package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Distributed exact global ranking without a single-reducer sort.
  *
  * `Window.orderBy(...)` with no partition clause moves EVERY row to one
  * reducer ("WindowExec: No Partition Defined") — a scale-killer the
  * reference never hits because it delegates ranking to its own engine.
  * This operator produces the identical global `row_number` with all
  * sorts parallel:
  *
  *   1. range-partition on the order key (ascending partition ids hold
  *      ascending value ranges);
  *   2. `row_number` within each partition — parallel local sorts;
  *   3. add per-partition row-count offsets: the counts are one tiny
  *      aggregate (O(#partitions) rows), prefix-summed on the driver and
  *      resolved as a when-chain (never O(rows) on the driver).
  *
  * The partitioned frame is `localCheckpoint`ed so the (sampled) range
  * boundaries are materialized once and the offsets job and the final
  * job read the same layout; checkpoint blocks are GC-cleaned
  * (unlike `cache`) and the checkpoint truncates lineage.
  *
  * Ties across the order key get an arbitrary-but-consistent rank among
  * equals (the range partitioner maps equal keys to one partition, and
  * both jobs read the same materialized layout). Pass a unique tiebreak
  * column for fully deterministic ranks, as with any `row_number`.
  */
object GlobalRank {

  /** (ranked frame, per-partition counts keyed by partition id). */
  private def rank(
      df: DataFrame,
      out: String,
      orderCols: Seq[Column],
      numPartitions: Int): (DataFrame, Map[Int, Long]) = {
    val s = df.sparkSession
    val n = if (numPartitions > 0) numPartitions
            else s.conf.get("spark.sql.shuffle.partitions").toInt
    val parted = df.repartitionByRange(n, orderCols: _*)
      .withColumn("__pid", spark_partition_id())
      .localCheckpoint()
    // O(#partitions) rows to the driver — never O(rows).
    val counts: Map[Int, Long] =
      parted.groupBy(col("__pid")).agg(count(lit(1)).as("__cnt"))
        .collect().map(r => r.getInt(0) -> r.getLong(1)).toMap
    // offset(pid) = total rows in partitions with smaller pid. Resolved
    // by broadcast-joining the tiny (pid, offset) frame back — a
    // when-chain would build an expression of depth O(#partitions),
    // which hits codegen's 64KB-method fallback in the thousands.
    val pids = counts.keys.toSeq.sorted
    val offsetOf: Map[Int, Long] =
      pids.zip(pids.map(counts).scanLeft(0L)(_ + _)).toMap
    import s.implicits._
    val offsetsDf = broadcast(
      offsetOf.toSeq.toDF("__pid", "__gr_off"))
    val w = Window.partitionBy(col("__pid")).orderBy(orderCols: _*)
    val ranked = parted
      .join(offsetsDf, Seq("__pid"))
      .withColumn(out, row_number().over(w).cast("long") + col("__gr_off"))
      .drop("__pid", "__gr_off")
    (ranked, counts)
  }

  def withRowNumber(
      df: DataFrame,
      out: String,
      orderCols: Seq[Column],
      numPartitions: Int = 0): DataFrame =
    rank(df, out, orderCols, numPartitions)._1

  /** Exact GLOBAL running sum of `valueCol` over a total order — the
    * distributed prefix sum — with the same shape as [[withRowNumber]]:
    * range partition, per-partition window sums in parallel, and a tiny
    * per-partition-total offset broadcast back. No unpartitioned window
    * at any scale. Exact for integral/decimal value types. */
  def withRunningSum(
      df: DataFrame,
      out: String,
      valueCol: Column,
      orderCols: Seq[Column],
      numPartitions: Int = 0): DataFrame = {
    val s = df.sparkSession
    val n = if (numPartitions > 0) numPartitions
            else s.conf.get("spark.sql.shuffle.partitions").toInt
    val parted = df.repartitionByRange(n, orderCols: _*)
      .withColumn("__pid", spark_partition_id())
      .localCheckpoint()
    // O(#partitions) rows to the driver — never O(rows).
    val totals: Map[Int, Long] =
      parted.groupBy(col("__pid"))
        .agg(coalesce(sum(valueCol.cast("long")), lit(0L)).as("__t"))
        .collect().map(r => r.getInt(0) -> r.getLong(1)).toMap
    val pids = totals.keys.toSeq.sorted
    val offsetOf: Map[Int, Long] =
      pids.zip(pids.map(totals).scanLeft(0L)(_ + _)).toMap
    import s.implicits._
    val offsetsDf = broadcast(offsetOf.toSeq.toDF("__pid", "__rs_off"))
    val w = Window.partitionBy(col("__pid")).orderBy(orderCols: _*)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    parted
      .join(offsetsDf, Seq("__pid"))
      .withColumn(out, sum(valueCol.cast("long")).over(w) + col("__rs_off"))
      .drop("__pid", "__rs_off")
  }

  /** Exact `ntile(b)` over a global order, built on [[withRowNumber]]
    * (same first-(n%b)-buckets-get-one-extra semantics as SQL ntile).
    */
  def withNtile(
      df: DataFrame,
      out: String,
      buckets: Int,
      orderCols: Seq[Column]): DataFrame = {
    val rn = "__gr_rn"
    val (ranked, counts) = rank(df, rn, orderCols, 0)
    val total = counts.values.sum
    val q = total / buckets
    val r = total % buckets
    // rank ≤ (q+1)·r → one of the r buckets holding one extra row.
    val tile =
      when(lit(r) > 0 && col(rn) <= lit((q + 1) * r),
        floor((col(rn) - 1) / lit(q + 1)) + 1)
      .otherwise(floor((col(rn) - 1 - lit((q + 1) * r)) / lit(math.max(q, 1L)))
        + lit(r) + 1)
    ranked.withColumn(out, tile.cast("int")).drop(rn)
  }
}
