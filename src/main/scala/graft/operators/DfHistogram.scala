package graft.operators

import org.apache.spark.sql.{DataFrame, Column}
import org.apache.spark.sql.functions._

/** Distributed numeric histogram with numpy.histogram bucket semantics.
  *
  * The reference computes `(counts, edges)` via a 2-pass RDD histogram
  * (ref: oarphpy/plotting.py:104-116). We keep the exact bucket-edge
  * semantics — `numBins` equal-width buckets over [min, max], all buckets
  * half-open [lo, hi) except the LAST which is closed [lo, hi] (ref:
  * oarphpy/plotting.py:226-230) — but compute it SQL-native:
  *
  *   pass 1: `agg(min, max)` (map-side combined, one tiny row)
  *   pass 2: `groupBy(bucketExpr).count` (partial aggregation,
  *           at most numBins groups shuffle)
  *
  * Both passes are whole-stage-codegen'd column scans; at 100 TB this is
  * two parquet sweeps of a single column with column pruning, vs. the
  * reference's 2 RDD passes that deserialize rows into Python.
  */
object DfHistogram {

  /** Bucket index expression: floor((v-lo)/(hi-lo)*n) clamped to n-1 so the
    * last bucket is closed. NULL/NaN rows are excluded by the caller-side
    * filter below (the reference documents the same NaN caveat). */
  def bucketExpr(c: Column, lo: Double, hi: Double, numBins: Int): Column = {
    if (hi == lo) lit(0)
    else least(
      // multiply BEFORE dividing: (v-lo)/(hi-lo)*n loses ulps in the
      // division and floor-misassigns exact edge values (v=58 of 0..100
      // in 50 bins → 28.999..); (v-lo)*n/(hi-lo) keeps edges exact —
      // same order as Spark RDD.histogram's fastBucketFunction.
      floor((c - lit(lo)) * lit(numBins) / lit(hi - lo)).cast("int"),
      lit(numBins - 1))
  }

  case class Result(counts: Array[Long], edges: Array[Double])

  def apply(df: DataFrame, column: String, numBins: Int = 50): Result = {
    require(numBins > 0, "numBins must be positive")
    val c = col(column).cast("double")
    val clean = df.select(c.as("v")).where(col("v").isNotNull && !isnan(col("v")))
    val Array(lo, hi) = clean
      .agg(min(col("v")), max(col("v")))
      .head() match {
        case r if r.isNullAt(0) => Array(0.0, 0.0) // empty input
        case r => Array(r.getDouble(0), r.getDouble(1))
      }
    val edges = (0 to numBins).map(i => lo + (hi - lo) * i / numBins).toArray
    val grouped = clean
      .groupBy(bucketExpr(col("v"), lo, hi, numBins).as("bucket"))
      .agg(count(lit(1)).as("n"))
      .collect()
      .map(r => r.getInt(0) -> r.getLong(1))
      .toMap
    val counts = Array.tabulate(numBins)(i => grouped.getOrElse(i, 0L))
    Result(counts, edges)
  }

  /** DataFrame-shaped variant for the correctness harness: one row per
    * non-empty bucket, with its closed/half-open edges. */
  def asDf(df: DataFrame, column: String, numBins: Int = 50): DataFrame = {
    val spark = df.sparkSession
    import spark.implicits._
    val r = apply(df, column, numBins)
    r.counts.zipWithIndex.map { case (n, i) =>
      (i, r.edges(i), r.edges(i + 1), n)
    }.toSeq.toDF("bucket", "lo", "hi", "n")
  }
}
