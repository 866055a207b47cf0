package graft.operators

import org.apache.spark.sql.{DataFrame, Column}
import org.apache.spark.sql.functions._

/** Skew-resistant equi-join via key salting.
  *
  * When a handful of hot keys dominate a shuffle join, their partitions
  * straggle (or OOM) while the rest of the cluster idles. Salting splits
  * every hot left-side key into `saltFactor` sub-keys and replicates the
  * matching right-side rows across all sub-keys — the classic remedy the
  * build mandate calls for alongside AQE's runtime skew-join splitting
  * (AQE only handles sort-merge joins post-hoc; explicit salting also
  * covers hash joins and lets the factor be sized from known key stats).
  *
  *   left:  salt = pmod(hash(salt seed cols…), saltFactor)  (any
  *          deterministic per-row scatter works; xxhash64 of all columns)
  *   right: exploded over salt = 0..saltFactor-1
  *
  * Join condition becomes (key, salt) — the shuffle spreads each hot key
  * over `saltFactor` reducers. Correctness: every (l, r) key match still
  * meets on exactly one salt value (the left row's), so the result
  * multiset is IDENTICAL to the unsalted join (asserted in SaltedJoinSpec).
  */
object SaltedJoin {

  def apply(
      left: DataFrame, right: DataFrame,
      keyCols: Seq[String], saltFactor: Int,
      joinType: String = "inner"): DataFrame = {
    require(saltFactor > 1, "saltFactor must be > 1")
    // Right/full outer would emit saltFactor null-padded copies of every
    // unmatched right row (each replica misses the left's single salt
    // value) — reject rather than silently corrupt.
    val safe = Set("inner", "left", "left_outer", "leftouter", "cross",
      "left_semi", "leftsemi", "left_anti", "leftanti")
    require(safe(joinType.toLowerCase),
      s"salted $joinType would duplicate unmatched right rows; " +
        "only inner/left/semi/anti/cross are salt-safe")
    val saltL = pmod(
      xxhash64(left.columns.map(col).toIndexedSeq: _*), lit(saltFactor))
      .cast("int")
    val l = left.withColumn("__salt", saltL)
    // generators can't nest inside expressions (no cast around explode)
    val r = right.withColumn("__salt",
      explode(sequence(lit(0), lit(saltFactor - 1))))
    l.join(r, keyCols :+ "__salt", joinType).drop("__salt")
  }
}
