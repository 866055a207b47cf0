package graft.ext

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import graft.operators.BalancedSample

/** Data mixing with fractional epochs: resample every SOURCE of a
  * corpus to a per-source token budget — the mixture-reweighting step
  * of LLM data curation (domain weights, "epochs per source"). For
  * each source s with actual token mass T(s) and budget B(s):
  *
  *   rate(s) = B(s) / T(s)
  *   rate < 1  → downsample: keep each row with probability rate
  *   rate ≥ 1  → upsample: every row appears floor(rate) times, plus
  *               one more with probability rate − floor(rate)
  *
  * so E[output tokens per source] = B(s) exactly, including fractional
  * epochs (rate 2.3 = the whole source twice + a 30% sample more).
  * Sources absent from the budget map get rate 0 (excluded) — mixing
  * is also how sources are dropped.
  *
  * Every Bernoulli draw is the portable md5 threshold
  * ([[BalancedSample.hash60]] — top 60 md5 bits under rate × 2⁶⁰), one
  * draw per input row, so the exact output MULTISET is reproducible by
  * any engine that can md5 a string (the driver oracle replays it in
  * SQL) and is independent of partitioning. The output carries
  * `mix_epoch` (1..copies) so downstream order shuffling
  * (`GlobalRank`) can interleave epochs instead of replaying a source
  * back-to-back.
  *
  * Scale: two jobs — a map-side-combined per-source token sum
  * (O(#sources) rows collected; sources are a handful by contract) and
  * ONE codegen'd scan (rate lookup is a when-chain over #sources,
  * copies = integer arithmetic + explode). No shuffle of the data.
  */
object Mixture {

  private val TwoPow60 = 1152921504606846976.0

  /** @param idCols   columns identifying a row for the hash draw
    *                 (pass the table's key; must be stable across runs)
    * @param budgets  source → target token count; absent sources drop
    */
  def apply(
      df: DataFrame, sourceCol: String, tokenCol: String,
      idCols: Seq[String], budgets: Map[String, Long],
      seed: Long = BalancedSample.DefaultSeed): DataFrame = {
    require(budgets.nonEmpty, "mixture needs at least one source budget")
    val totals = df.groupBy(col(sourceCol)).agg(sum(col(tokenCol)))
      .collect().map(r => r.getAs[String](0) -> r.getLong(1)).toMap
    val rates: Map[String, Double] = budgets.flatMap { case (s, b) =>
      totals.get(s) match {
        case Some(t) if t > 0 => Some(s -> b.toDouble / t.toDouble)
        case _ => None // empty or unknown source: nothing to emit
      }
    }
    if (rates.isEmpty) return withEpoch(df).limit(0)
    // rate lookup: a when-chain over #sources (codegen'd; sources are
    // few by contract — a thousand-source mixture would swap this for
    // a broadcast join without changing the draw)
    val rateCol = rates.foldLeft(null.asInstanceOf[Column]) {
      case (acc, (s, r)) =>
        val cond = col(sourceCol) === lit(s)
        if (acc == null) when(cond, lit(r)) else acc.when(cond, lit(r))
    }.otherwise(lit(0.0))
    val u = BalancedSample.hash60(idCols.map(col), seed)
    val base = floor(col("__mix_rate")).cast("long")
    val frac = col("__mix_rate") - floor(col("__mix_rate"))
    val copies = (base +
      when(u < frac * lit(TwoPow60), lit(1L)).otherwise(lit(0L)))
    df.withColumn("__mix_rate", rateCol)
      .withColumn("__mix_copies", copies)
      .where(col("__mix_copies") >= 1)
      .withColumn("mix_epoch",
        explode(sequence(lit(1L), col("__mix_copies"))))
      .drop("__mix_rate", "__mix_copies")
  }

  private def withEpoch(df: DataFrame): DataFrame =
    df.withColumn("mix_epoch", lit(1L))
}
