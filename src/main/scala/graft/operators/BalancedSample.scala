package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Stratified, class-balanced sampling.
  *
  * Semantics from the reference's balanced sampler
  * (ref: oarphpy/spark.py:195-213): count rows per category, derive a
  * per-category fraction `target / count` where `target` is the minimum
  * category count (optionally capped by `nPerCategory`), then one
  * distributed Bernoulli pass.
  *
  * Unlike the reference (engine RNG via `sampleBy`), the Bernoulli draw
  * here is a PORTABLE hash threshold: a row is kept iff the top 60 bits
  * of `md5(concat_ws(':', idCols..., seed))`, read as an integer, fall
  * under `fraction * 2^60`. Any engine that can md5 a string reproduces
  * the exact same sample — which makes the operator oracle-checkable —
  * and the same seed always returns the same rows (the reference's RNG
  * draw is only deterministic per partition layout).
  *
  * Scale notes: two jobs — a map-side-combined groupBy-count (tiny
  * result: one row per category, collected to the driver as the
  * thresholds map) and a single codegen'd filter scan. No shuffle of the
  * data itself; thresholds map is O(#categories), never O(rows).
  */
object BalancedSample {
  val DefaultSeed = 1337L // ref: oarphpy/spark.py:195

  private val TwoPow60 = math.pow(2.0, 60) // 15 hex digits of md5

  /** Uniform 60-bit draw in [0, 2^60) from the row's id columns + seed.
    * Equivalent DuckDB: `CAST(('0x' || substr(md5(concat_ws(':',
    * coalesce(CAST(id AS VARCHAR), chr(1))..., 'seed')), 1, 15)) AS
    * UBIGINT)::DOUBLE`. Integer→double conversion and string parsing
    * both round-to-nearest, so the two engines see bit-identical
    * doubles. NULL id values are marked with a U+0001 sentinel rather
    * than silently skipped (concat_ws drops NULLs, which would give
    * ('a', NULL) and (NULL, 'a') the same draw); U+0001 cannot appear
    * in a cast of a numeric/date key, keeping draws independent.
    */
  def hash60(idCols: Seq[Column], seed: Long): Column =
    // hex60_to_double is the codegen'd hex-prefix parser — conv()'s
    // arbitrary-base string path measured ~2 us/row, dominating every
    // hash-threshold scan.
    graft.functions.VectorFunctions.hex60_to_double(
      md5(concat_ws(":",
        idCols.map(c => coalesce(c.cast("string"), lit("\u0001")))
          :+ lit(seed.toString): _*)))

  /** @param idCols columns identifying a row for the hash draw; empty →
    *               all columns of `df` (safe default; pass the table's
    *               key columns to keep the hash input small).
    */
  def apply(
      df: DataFrame,
      categoryCol: String,
      nPerCategory: Option[Long] = None,
      seed: Long = DefaultSeed,
      idCols: Seq[String] = Nil): DataFrame = {
    val counts: Map[Any, Long] =
      df.groupBy(col(categoryCol)).agg(count(lit(1)).as("__n"))
        .collect()
        .map(r => r.get(0) -> r.getLong(1))
        .toMap
    if (counts.isEmpty) return df
    val minCount = counts.values.min
    val target = nPerCategory.fold(minCount)(cap => math.min(minCount, cap))
    // Per-category acceptance threshold, resolved as one when-chain (a
    // handful of categories — the collect above is O(#categories)).
    // <=> so a null category still matches its own threshold.
    val thresholds: Map[Any, Double] =
      counts.map { case (k, n) =>
        k -> math.min(1.0, target.toDouble / math.max(1L, n)) * TwoPow60 }
    val thresholdCol = thresholds.foldLeft(lit(Double.NegativeInfinity)) {
      case (acc, (k, thr)) =>
        when(col(categoryCol) <=> lit(k), lit(thr)).otherwise(acc)
    }
    val ids = if (idCols.nonEmpty) idCols.map(col) else df.columns.toSeq.map(col)
    // The md5 draw is the per-row CPU cost of this operator: it must run
    // at full parallelism, not at the input's scan-split count (a single
    // small parquet file is ONE split → a serial draw stage). Guarded so
    // cluster-scale inputs — which already carry >= defaultParallelism
    // splits — never pay a data shuffle for a filter.
    val p = df.sparkSession.sparkContext.defaultParallelism
    val src = if (df.rdd.getNumPartitions < p) df.repartition(p) else df
    src.where(hash60(ids, seed) < thresholdCol)
  }
}
