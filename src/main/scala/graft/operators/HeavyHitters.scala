package graft.operators

import org.apache.spark.sql.{Column, DataFrame, Encoder, Encoders}
import org.apache.spark.sql.expressions.Aggregator
import org.apache.spark.sql.functions._

import scala.collection.mutable

/** Exact heavy hitters at scale via the two-pass Misra-Gries pattern.
  *
  * Naive exact heavy hitters (`groupBy(item).count.having(n > N/t)`)
  * shuffles one record per DISTINCT item — at 100 TB of tokens that is
  * a shuffle of billions of keys to answer a question whose output is
  * at most `t` rows. The classic fix:
  *
  *   pass 1  Misra-Gries sketch, capacity m ≥ t: a bounded map that is
  *           map-side partially aggregated — each input partition
  *           contributes ≤ m entries to a single merge. GUARANTEE
  *           (Misra-Gries '82, and for merges Agarwal et al. '12): every
  *           item with true frequency > N/m survives in the merged
  *           sketch, including merged sketches (merge = counter sum,
  *           then subtract the (m+1)-th largest and drop ≤ 0).
  *   pass 2  exact counts for the ≤ m surviving candidates only: the
  *           corpus is semi-joined against the BROADCAST candidate set
  *           before the groupBy, so the shuffle carries ≤ m keys.
  *
  * With m ≥ t, pass 2's `count·t > N` filter makes the composite EXACT —
  * identical to the naive query — which is why the entry can carry a
  * plain SQL oracle. The sketch's superset guarantee (not just the
  * composite) is asserted differentially in OperatorSpec.
  */
object HeavyHitters {

  /** Misra-Gries sketch: IN = item, BUF = bounded counter map,
    * OUT = surviving candidate items. The buffer is mutated in place
    * (Spark's object-hash aggregation keeps it deserialized within a
    * partition; kryo only at the partial/final boundary). The
    * decrement-on-overflow touches all m entries but is amortized O(1)
    * per input: total decrements never exceed total increments. */
  class MisraGries(m: Int)
      extends Aggregator[String, mutable.HashMap[String, Long], Seq[String]] {
    require(m >= 1)
    override def zero: mutable.HashMap[String, Long] = mutable.HashMap.empty

    override def reduce(buf: mutable.HashMap[String, Long], item: String)
        : mutable.HashMap[String, Long] = {
      buf.get(item) match {
        case Some(c) => buf.update(item, c + 1L)
        case None if buf.size < m => buf.update(item, 1L)
        case None => // full + miss: decrement all, evict zeros
          // snapshot keys: no structural mutation mid-iteration
          buf.keys.toArray.foreach { k =>
            val c = buf(k) - 1L
            if (c <= 0L) buf.remove(k) else buf.update(k, c)
          }
      }
      buf
    }

    override def merge(a: mutable.HashMap[String, Long],
                       b: mutable.HashMap[String, Long])
        : mutable.HashMap[String, Long] = {
      b.foreach { case (k, v) => a.update(k, a.getOrElse(k, 0L) + v) }
      if (a.size > m) {
        // subtract the (m+1)-th largest counter from all, drop ≤ 0 —
        // the merge rule that preserves the > N/m survival guarantee
        val cut = a.values.toArray.sorted(Ordering[Long].reverse).apply(m)
        a.keys.toArray.foreach { k =>
          val c = a(k) - cut
          if (c <= 0L) a.remove(k) else a.update(k, c)
        }
      }
      a
    }

    override def finish(buf: mutable.HashMap[String, Long]): Seq[String] =
      buf.keys.toSeq.sorted
    override def bufferEncoder: Encoder[mutable.HashMap[String, Long]] =
      Encoders.kryo[mutable.HashMap[String, Long]]
    override def outputEncoder: Encoder[Seq[String]] =
      org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[Seq[String]]()
  }

  /** Sketch pass only: candidate items (superset of all with freq > N/m). */
  def candidates(items: DataFrame, itemCol: String, m: Int): DataFrame = {
    val mg = udaf(new MisraGries(m))
    items.select(col(itemCol).cast("string").as("__it"))
      .where(col("__it").isNotNull)
      .agg(mg(col("__it")).as("cand"))
      .select(explode(col("cand")).as("item"))
  }

  /** Exact items with frequency·t > N (i.e. freq > N/t), two-pass.
    * Capacity m = 2·t keeps the sketch guarantee comfortably inside the
    * final threshold. Output: (item, n) exact. */
  def apply(items: DataFrame, itemCol: String, t: Int): DataFrame = {
    val cand = candidates(items, itemCol, m = 2 * t)
    val it = items.select(col(itemCol).cast("string").as("item"))
      .where(col("item").isNotNull)
    val total = it.agg(count(lit(1)).as("__N"))
    it.join(broadcast(cand), Seq("item"), "left_semi")
      .groupBy("item").agg(count(lit(1)).as("n"))
      .crossJoin(broadcast(total))
      .where(col("n") * t > col("__N"))
      .select(col("item"), col("n"))
  }
}
