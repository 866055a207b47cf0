package graft.operators

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Range-predicate bucketing: value → bucket id over explicit edges.
  *
  * The reference builds a CASE WHEN chain over histogram edges and leans
  * on Catalyst codegen ("Spark will compile it to native code on-the-fly",
  * ref: oarphpy/plotting.py:213-239). Same here: a fold of `when()`
  * clauses compiles to one codegen'd conditional chain; out-of-range
  * values map to -1; the last bucket is closed by extending its upper
  * edge by 1e-9 (ref: oarphpy/plotting.py:226-230).
  */
object Bucketize {

  def apply(c: Column, edges: Seq[Double]): Column = {
    require(edges.size >= 2, "need at least 2 edges")
    val pairs = edges.sliding(2).toSeq.zipWithIndex
    val n = pairs.size
    pairs.foldLeft(null.asInstanceOf[Column]) {
      case (acc, (Seq(lo, hiRaw), i)) =>
        val hi = if (i == n - 1) hiRaw + 1e-9 else hiRaw
        val cond = c >= lit(lo) && c < lit(hi)
        if (acc == null) when(cond, lit(i)) else acc.when(cond, lit(i))
    }.otherwise(lit(-1))
  }
}
