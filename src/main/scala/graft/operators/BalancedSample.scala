package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Stratified, class-balanced sampling.
  *
  * Semantics from the reference's balanced sampler
  * (ref: oarphpy/spark.py:195-213): count rows per category, derive a
  * per-category fraction `target / count` where `target` is the minimum
  * category count (optionally capped by `nPerCategory`), then one
  * distributed Bernoulli pass via `stat.sampleBy`.
  *
  * Scale notes: two jobs — a map-side-combined groupBy-count (tiny
  * result: one row per category, collected to the driver as the fractions
  * map) and a single scan with per-row Bernoulli draws. No shuffle of the
  * data itself; fractions map is O(#categories), never O(rows).
  */
object BalancedSample {
  val DefaultSeed = 1337L // ref: oarphpy/spark.py:195

  def apply(
      df: DataFrame,
      categoryCol: String,
      nPerCategory: Option[Long] = None,
      seed: Long = DefaultSeed): DataFrame = {
    val counts: Map[Any, Long] =
      df.groupBy(col(categoryCol)).agg(count(lit(1)).as("__n"))
        .collect()
        .map(r => r.get(0) -> r.getLong(1))
        .toMap
    if (counts.isEmpty) return df
    val minCount = counts.values.min
    val target = nPerCategory.fold(minCount)(cap => math.min(minCount, cap))
    val fractions: Map[Any, Double] =
      counts.map { case (k, n) =>
        k -> math.min(1.0, target.toDouble / math.max(1L, n)) }
    df.stat.sampleBy(categoryCol, fractions, seed)
  }
}
