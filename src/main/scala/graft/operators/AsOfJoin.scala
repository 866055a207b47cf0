package graft.operators

import org.apache.spark.sql.{DataFrame, Column}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window

/** As-of (most-recent-prior) join — a time-series operator Spark lacks
  * natively (SURVEY §2.3 lists the join family as built-in; as-of is the
  * one genuinely missing member, called out in the build mandate).
  *
  * Composition strategy (preference (a) of the custom-operator ladder:
  * compose built-ins before writing a SparkPlan): tag both sides, UNION
  * them, and carry the latest right-side payload forward with
  * `last(_, ignoreNulls)` over a (key, time) window. One shuffle + one
  * sort per input — crucially NO range-expanded join: a naive
  * `l.join(r, l.ts >= r.ts)` is O(|L|·|R|) per key before aggregation,
  * which is exactly the blow-up that kills at 100 TB. This plan is
  * O((|L|+|R|) log) via sort-merge, AQE-skew-splittable, and needs no
  * driver-side state.
  *
  * Tie semantics: a right row at exactly left.ts IS visible (inclusive),
  * ordered before the left row via the side tag — matching DuckDB's
  * ASOF JOIN (`ON l.k = r.k AND l.ts >= r.ts`), which the correctness
  * oracle uses.
  */
object AsOfJoin {

  /** For every left row, append `payloadCols` from the matched right
    * row: direction "backward" (default) takes the most recent right
    * row with right(tsCol) <= left(tsCol); "forward" the EARLIEST right
    * row with right(tsCol) >= left(tsCol) — forward is backward on
    * reversed time, so it reuses the same union+window plan with the
    * sort order flipped (ties stay inclusive on both directions: the
    * side tag orders the right row into the frame at equal ts). Nulls
    * when no matching right row exists. */
  def apply(
      left: DataFrame, right: DataFrame,
      keyCol: String, tsCol: String,
      payloadCols: Seq[String],
      direction: String = "backward"): DataFrame = {
    require(direction == "backward" || direction == "forward",
      s"direction must be backward|forward, got $direction")
    val leftCols = left.columns.toSeq
    val lTagged = left
      .withColumn("__payload",
        lit(null).cast(right.select(payloadCols.map(col): _*).schema.catalogString))
      .withColumn("__side", lit(1))
    val rTagged = right
      .select((Seq(col(keyCol), col(tsCol)) :+
        struct(payloadCols.map(col): _*).as("__payload")): _*)
      .withColumn("__side", lit(0))
    // Align schemas: left keeps all columns; right contributes only
    // key/ts/payload (null-padded for the rest).
    val unioned = lTagged.unionByName(
      leftCols.filterNot(c => c == keyCol || c == tsCol)
        .foldLeft(rTagged)((df, c) =>
          df.withColumn(c, lit(null).cast(lTagged.schema(c).dataType))),
      allowMissingColumns = false)
    val tsOrd =
      if (direction == "backward") col(tsCol).asc else col(tsCol).desc
    val w = Window.partitionBy(col(keyCol))
      .orderBy(tsOrd, col("__side"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val carried = unioned
      .withColumn("__asof", last(col("__payload"), ignoreNulls = true).over(w))
      .where(col("__side") === 1)
    payloadCols.foldLeft(carried) { (df, c) =>
      df.withColumn(s"asof_$c", col(s"__asof.$c"))
    }.select((leftCols.map(col) ++ payloadCols.map(c => col(s"asof_$c"))): _*)
  }
}
