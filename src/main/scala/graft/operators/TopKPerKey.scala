package graft.operators

import org.apache.spark.sql.{Column, DataFrame, Encoder, Encoders}
import org.apache.spark.sql.expressions.Aggregator
import org.apache.spark.sql.functions._

/** Bounded top-k per key WITHOUT sorting whole partitions.
  *
  * The window formulation (`row_number().over(partitionBy(key).orderBy
  * (score)) <= k`) shuffles every row and SORTS every partition —
  * O(n log n) per key and full materialization, which is exactly what
  * hurts when a key holds millions of rows at 100 TB. This aggregator
  * keeps a k-bounded buffer per key through map-side partial
  * aggregation: each input partition contributes at most k rows per key
  * to the shuffle, total work O(n log k), shuffle volume O(keys × k).
  *
  * Result parity with the window form (same rows for a unique tiebreak)
  * is asserted in ScaleOpsSpec.
  */
object TopKPerKey {

  /** One scored row: ordering by (score desc, tiebreak asc). */
  case class Scored(score: Double, tiebreak: Long)

  private class TopKAgg(k: Int)
      extends Aggregator[Scored, Seq[Scored], Seq[Scored]] {
    private def ord: Ordering[Scored] =
      Ordering.by((s: Scored) => (-s.score, s.tiebreak))
    override def zero: Seq[Scored] = Seq.empty
    override def reduce(buf: Seq[Scored], a: Scored): Seq[Scored] =
      insert(buf, a)
    override def merge(a: Seq[Scored], b: Seq[Scored]): Seq[Scored] =
      b.foldLeft(a)(insert)
    private def insert(buf: Seq[Scored], a: Scored): Seq[Scored] = {
      // buf kept sorted ascending in rank order, capped at k
      if (buf.size < k) (buf :+ a).sorted(ord)
      else if (ord.lt(a, buf.last)) ((buf :+ a).sorted(ord)).take(k)
      else buf
    }
    override def finish(r: Seq[Scored]): Seq[Scored] = r
    override def bufferEncoder: Encoder[Seq[Scored]] =
      org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[Seq[Scored]]()
    override def outputEncoder: Encoder[Seq[Scored]] = bufferEncoder
  }

  /** Top-k rows per key: output (keyCols…, tiebreak, score, rank).
    * `tiebreakCol` must be unique per row (deterministic ranking). */
  def apply(
      df: DataFrame, keyCols: Seq[String],
      scoreCol: String, tiebreakCol: String, k: Int): DataFrame = {
    val spark = df.sparkSession
    import spark.implicits._
    val agg = udaf(new TopKAggregatorRows(k))
    // Null scores/tiebreaks would decode as 0.0/0L in the primitive
    // input tuple and silently compete; the window formulation ranks
    // null scores last. Drop them — a null score is unrankable.
    df.where(col(scoreCol).isNotNull && col(tiebreakCol).isNotNull)
      .groupBy(keyCols.map(col): _*)
      .agg(agg(col(scoreCol).cast("double"), col(tiebreakCol).cast("long"))
        .as("__top"))
      .select((keyCols.map(col) :+ posexplode(col("__top"))
        .as(Seq("__rank0", "__row"))): _*)
      .select((keyCols.map(col) :+
        col("__row.tiebreak").as(tiebreakCol) :+
        col("__row.score").as(scoreCol) :+
        (col("__rank0") + 1).as("rank")): _*)
  }

  /** Bounded FIRST-k-by-rank with a STRING payload: keeps the k
    * smallest ranks seen (unique ranks — e.g. monotonically increasing
    * ids) with their payloads, k-bounded through map-side partial
    * aggregation like [[TopKAgg]]. The fused histogram example
    * collector ([[graft.viz.HistogramWithExamples]]) uses it to avoid
    * a whole-partition window sort: shuffle is O(keys × k) payloads. */
  class FirstKByRank(k: Int)
      extends Aggregator[(Long, String), Seq[(Long, String)], Seq[String]] {
    private def ins(buf: Seq[(Long, String)],
        a: (Long, String)): Seq[(Long, String)] =
      if (buf.size < k) (buf :+ a).sortBy(_._1)
      else if (a._1 < buf.last._1) ((buf :+ a).sortBy(_._1)).take(k)
      else buf
    override def zero: Seq[(Long, String)] = Seq.empty
    override def reduce(b: Seq[(Long, String)],
        a: (Long, String)): Seq[(Long, String)] = ins(b, a)
    override def merge(a: Seq[(Long, String)],
        b: Seq[(Long, String)]): Seq[(Long, String)] = b.foldLeft(a)(ins)
    override def finish(r: Seq[(Long, String)]): Seq[String] = r.map(_._2)
    override def bufferEncoder: Encoder[Seq[(Long, String)]] =
      org.apache.spark.sql.catalyst.encoders
        .ExpressionEncoder[Seq[(Long, String)]]()
    override def outputEncoder: Encoder[Seq[String]] =
      org.apache.spark.sql.catalyst.encoders
        .ExpressionEncoder[Seq[String]]()
  }

  /** udaf-friendly variant taking (score, tiebreak) columns. */
  class TopKAggregatorRows(k: Int)
      extends Aggregator[(Double, Long), Seq[Scored], Seq[Scored]] {
    private val inner = new TopKAgg(k)
    override def zero: Seq[Scored] = inner.zero
    override def reduce(b: Seq[Scored], a: (Double, Long)): Seq[Scored] =
      inner.reduce(b, Scored(a._1, a._2))
    override def merge(a: Seq[Scored], b: Seq[Scored]): Seq[Scored] =
      inner.merge(a, b)
    override def finish(r: Seq[Scored]): Seq[Scored] = inner.finish(r)
    override def bufferEncoder: Encoder[Seq[Scored]] = inner.bufferEncoder
    override def outputEncoder: Encoder[Seq[Scored]] = inner.outputEncoder
  }
}
