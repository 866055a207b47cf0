package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Engine-deterministic fixed-point rounding.
  *
  * `round(x, n)` half-way tie behavior is implementation-defined (Spark
  * HALF_UP over the decimal rendering vs DuckDB's scaled float round) —
  * dyadic-rational inputs (integer ratios with power-of-two denominators,
  * ubiquitous in token statistics and Jaccard scores) land exactly on
  * ties and hash-diverge across engines. `floor(x·10ⁿ + 0.5)/10ⁿ` is
  * pure IEEE arithmetic: identical inputs → identical outputs in every
  * engine that evaluates doubles. Use for all double outputs that feed
  * the cross-engine correctness gate. Valid for non-negative values
  * (all current uses: ratios, scores, cosines on this data).
  */
object DetRound {
  def det(c: Column, digits: Int): Column = {
    val scale = math.pow(10, digits)
    floor(c * scale + 0.5) / scale
  }
  def det6(c: Column): Column = det(c, 6)
  /** DuckDB SQL text form of det(x, digits) for oracle authoring. */
  def sql(expr: String, digits: Int): String = {
    val scale = "1" + "0" * digits
    s"floor(($expr) * $scale + 0.5) / $scale"
  }
}
