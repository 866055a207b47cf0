package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Bloom-filtered semi-join reduction: build a bloom filter over the
  * filtering side's keys, broadcast it, and drop non-matching rows
  * from the LARGE side map-side — BEFORE the large side's shuffle.
  * The exact join then runs on the survivors, so false positives
  * (bounded by `fpp`) are removed and the result is EXACTLY the plain
  * semi/anti join; the bloom contract (no false negatives) is what
  * makes the pre-filter safe.
  *
  * When it pays: |large| >> |matches| and the filtering side's KEY
  * CARDINALITY is bloom-sized (~1.2 bytes/key at 1% fpp — 100M keys
  * ≈ 120 MB broadcast; beyond that, fall back to the plain shuffle
  * join). The large side's shuffle writes shrink by the non-matching
  * fraction, which is the dominant cost of a selective join at 100 TB.
  *
  * Spark's own runtime filter does this automatically
  * (`spark.sql.optimizer.runtime.bloomFilter.*`) when its size
  * thresholds and stats line up; this operator is the EXPLICIT form —
  * guaranteed regardless of estimates, usable when the filtering side
  * is an arbitrary sub-pipeline whose cardinality Catalyst can't see,
  * and deterministic in plan shape (spec-pinned).
  */
object BloomPrune {

  /** large ⋉ small (left-semi) with a bloom pre-filter on the large
    * side. Keys must be integral (long-castable); `expectedKeys` ≤ 0
    * means "count the small side first" (one extra cheap job). */
  def semiJoin(
      large: DataFrame, small: DataFrame,
      largeKey: String, smallKey: String,
      fpp: Double = 0.01, expectedKeys: Long = -1L): DataFrame =
    pruneAndJoin(large, small, largeKey, smallKey, fpp, expectedKeys,
      "left_semi")

  /** large ▷ small (left-anti): the bloom filter KEEPS probable
    * matches for the exact anti join and everything it rules out is a
    * guaranteed non-match — emitted directly, no shuffle. */
  def antiJoin(
      large: DataFrame, small: DataFrame,
      largeKey: String, smallKey: String,
      fpp: Double = 0.01, expectedKeys: Long = -1L): DataFrame = {
    val (definiteNo, maybe, keys) =
      split(large, small, largeKey, smallKey, fpp, expectedKeys)
    definiteNo.unionByName(
      maybe.join(keys, maybe(largeKey) === keys("__bp_key"), "left_anti"))
  }

  private def pruneAndJoin(
      large: DataFrame, small: DataFrame, largeKey: String,
      smallKey: String, fpp: Double, expectedKeys: Long,
      joinType: String): DataFrame = {
    val (_, maybe, keys) =
      split(large, small, largeKey, smallKey, fpp, expectedKeys)
    maybe.join(keys, maybe(largeKey) === keys("__bp_key"), joinType)
  }

  /** (definite non-matches, probable matches, distinct small keys). */
  private def split(
      large: DataFrame, small: DataFrame, largeKey: String,
      smallKey: String, fpp: Double, expectedKeys: Long) = {
    val spark = large.sparkSession
    val keys = small.select(col(smallKey).cast("long").as("__bp_key"))
      .where(col("__bp_key").isNotNull).distinct()
      .localCheckpoint() // the bloom build and the exact join share it
    val n = if (expectedKeys > 0) expectedKeys else keys.count()
    if (n == 0) {
      // empty filtering side: semi = empty, anti = everything
      (large, large.limit(0), keys)
    } else {
      val bf = keys.stat.bloomFilter("__bp_key", n, fpp)
      val bc = spark.sparkContext.broadcast(bf)
      val might = udf { k: java.lang.Long =>
        k != null && bc.value.mightContainLong(k)
      }
      val pred: Column = might(col(largeKey).cast("long"))
      (large.where(!pred), large.where(pred), keys)
    }
  }
}
