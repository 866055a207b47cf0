package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Bucketed range (interval) join.
  *
  * `left JOIN right ON keys AND r.ts ∈ [l.ts + lowerUs, l.ts + upperUs]`
  * planned naively by Spark becomes a BroadcastNestedLoopJoin (the range
  * predicate is not an equi-condition) — O(|L| × |R|) comparisons and a
  * broadcast of a whole side: the classic interval-join scale-killer.
  *
  * This operator makes it an EQUI-join: time is cut into buckets of
  * width `upperUs - lowerUs` (so any left row's interval spans at most
  * TWO buckets), the left row is exploded to its ≤ 2 distinct probe
  * buckets, the right row gets its single home bucket, and the join key
  * becomes (keys..., bucket) with the exact range predicate applied as a
  * post-join filter. Each (l, r) match is produced exactly once (a right
  * row's single bucket matches at most one of the left row's distinct
  * probe buckets).
  *
  * Shuffle volume: |L|·≤2 + |R| rows hashed on (keys, bucket) — a plain
  * shuffled equi-join that AQE can skew-split, vs. the nested-loop's
  * full cross product. Floor division uses the pmod identity so
  * negative timestamps bucket correctly.
  */
object RangeJoin {

  /** Bucket id = the bucket's START (x - x mod w): pure long arithmetic,
    * exact over the whole long domain. Dividing by w would be Spark's
    * IEEE double `/`, only exact while |x| < 2^53 µs (~year 2255) —
    * and the join key needs uniqueness per bucket, not density. */
  private def bucketStart(x: Column, w: Long): Column =
    x - pmod(x, lit(w))

  /** @param tsCols (left ts col, right ts col), µs-precision timestamps.
    * @param lowerUs,upperUs right.ts − left.ts bounds (inclusive), µs.
    */
  def apply(
      left: DataFrame, right: DataFrame, keyCols: Seq[String],
      tsCols: (String, String), lowerUs: Long, upperUs: Long): DataFrame = {
    require(upperUs >= lowerUs,
      s"inverted interval: [$lowerUs, $upperUs]")
    require(tsCols._1 != tsCols._2,
      "rename the ts columns apart (both sides survive into the output)")
    // Degenerate single-point interval (lower == upper) still buckets
    // correctly with width 1: both probe buckets collapse to the same
    // value and the exact filter keeps only the single offset.
    val w = math.max(1L, upperUs - lowerUs)
    val lUs = unix_micros(col(tsCols._1))
    val rUs = unix_micros(col(tsCols._2))
    val l = left
      .withColumn("__b", explode(array_distinct(array(
        bucketStart(lUs + lowerUs, w), bucketStart(lUs + upperUs, w)))))
    val r = right.withColumn("__b", bucketStart(rUs, w))
    l.join(r, keyCols :+ "__b")
      .where(rUs.between(lUs + lowerUs, lUs + upperUs))
      .drop("__b")
  }
}
