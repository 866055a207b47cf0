package graft.operators

import org.apache.spark.sql.{Column, DataFrame, Row}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.LongType

/** Distributed exact global ranking / prefix sums without a
  * single-reducer sort — the classic two-pass scan:
  *
  *   1. range-partition on the order key (ascending partition ids hold
  *      ascending value ranges) and sort within partitions — ONE
  *      exchange, all sorts parallel;
  *   2. per-partition totals: a tiny O(#partitions) collect;
  *   3. per-row rank/cumsum via `mapPartitionsWithIndex`, adding the
  *      partition's prefix offset — ZERO further shuffle.
  *
  * Pass 3 is deliberately an RDD `mapPartitions` (the sanctioned
  * per-partition imperative case): the alternative — a window over a
  * `__pid` column — forces Catalyst to insert a SECOND full-data hash
  * exchange, because the checkpointed range partitioning is invisible
  * to the planner. At 100 TB that second shuffle is the dominant cost
  * of the whole operator; per-row `Row` boxing is not.
  *
  * `Window.orderBy(...)` with no partition clause ("WindowExec: No
  * Partition Defined") would move EVERY row to one reducer — the
  * scale-killer this operator exists to avoid.
  *
  * Ties across the order key get an arbitrary-but-consistent rank among
  * equals (the range partitioner maps equal keys to one partition and
  * both passes read the same materialized layout — `localCheckpoint`,
  * GC-cleaned unlike `cache`). Pass a unique tiebreak column for fully
  * deterministic ranks, as with any `row_number`.
  */
object GlobalRank {

  /** (augmented frame, per-partition row counts). `valueCol` None →
    * every row weighs 1 (row_number); Some(v) → running sum of v (null
    * values weigh 0, matching SQL sum's null-skipping). */
  private def scan(
      df: DataFrame,
      out: String,
      orderCols: Seq[Column],
      valueCol: Option[Column],
      numPartitions: Int): (DataFrame, Map[Int, Long]) = {
    val s = df.sparkSession
    require(!df.columns.contains(out),
      s"output column '$out' already exists (the scan appends, never replaces)")
    val n = if (numPartitions > 0) numPartitions
            else s.conf.get("spark.sql.shuffle.partitions").toInt
    val prepared = df.withColumn("__gr_v",
      valueCol.fold(lit(1L))(v => coalesce(v.cast("long"), lit(0L))))
    val parted = prepared
      .repartitionByRange(n, orderCols: _*)
      .sortWithinPartitions(orderCols: _*)
      .localCheckpoint()
    val vIdx = parted.schema.fieldIndex("__gr_v")
    // Pass 2: O(#partitions) (sum, count) pairs to the driver. Narrow
    // projection first — deserializing the full row width to read one
    // long would box every column of a wide table (a projection over
    // checkpointed blocks keeps partition indices).
    val stats: Array[(Int, (Long, Long))] =
      parted.select(col("__gr_v")).rdd.mapPartitionsWithIndex { (pid, it) =>
        var sum = 0L; var cnt = 0L
        it.foreach { r => sum += r.getLong(0); cnt += 1 }
        Iterator.single(pid -> (sum, cnt))
      }.collect()
    val pids = stats.map(_._1).sorted
    val sumOf = stats.toMap
    val offsetOf: Map[Int, Long] =
      pids.zip(pids.map(p => sumOf(p)._1).scanLeft(0L)(_ + _)).toMap
    val counts: Map[Int, Long] = stats.map { case (p, (_, c)) => p -> c }.toMap
    // Pass 3: running accumulate + offset, partition-local.
    val outSchema = parted.schema.add(out, LongType, nullable = false)
    val dropIdx = vIdx
    val augmented = parted.rdd.mapPartitionsWithIndex { (pid, it) =>
      var acc = offsetOf.getOrElse(pid, 0L)
      it.map { r =>
        acc += r.getLong(dropIdx)
        Row.fromSeq(r.toSeq :+ acc)
      }
    }
    (s.createDataFrame(augmented, outSchema).drop("__gr_v"), counts)
  }

  def withRowNumber(
      df: DataFrame,
      out: String,
      orderCols: Seq[Column],
      numPartitions: Int = 0): DataFrame =
    scan(df, out, orderCols, None, numPartitions)._1

  /** Exact GLOBAL running sum of `valueCol` over a total order — the
    * distributed prefix sum. Integral value columns only (a double
    * would silently truncate per-row — rejected instead). NULL values
    * weigh 0 (unlike a SQL window sum, which stays NULL until the
    * first non-null value). */
  def withRunningSum(
      df: DataFrame,
      out: String,
      valueCol: Column,
      orderCols: Seq[Column],
      numPartitions: Int = 0): DataFrame = {
    import org.apache.spark.sql.types._
    val dt = df.select(valueCol).schema.head.dataType
    require(Seq(ByteType, ShortType, IntegerType, LongType).contains(dt),
      s"withRunningSum needs an integral value column, got ${dt.simpleString}")
    scan(df, out, orderCols, Some(valueCol), numPartitions)._1
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
    val (ranked, counts) = scan(df, rn, orderCols, None, 0)
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
