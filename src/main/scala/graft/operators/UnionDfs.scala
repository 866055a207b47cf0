package graft.operators

import org.apache.spark.sql.{DataFrame, Column}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.StructField

/** N-ary union with schema reconciliation.
  *
  * Semantics from the reference's schema-merging union
  * (ref: oarphpy/spark.py:149-192): the result schema is the union of all
  * input columns; frames missing a column get it null-padded; a column
  * present in two frames with conflicting dtype is an error (the
  * reference raises TypeError — we throw IllegalArgumentException with
  * the same information). Documented divergence: the reference ALSO
  * errors on nullability conflicts (spark.py:184-189); this engine
  * widens nullability instead (Spark's unionByName semantics) — strictly
  * more permissive, never changes values.
  *
  * Scale notes: union is a pure logical concat — no shuffle. Null-pad
  * projections are codegen'd `Project` nodes; Catalyst prunes them if the
  * padded column is never read downstream.
  */
object UnionDfs {

  def apply(dfs: DataFrame*): DataFrame = {
    require(dfs.nonEmpty, "unionDfs of zero frames")
    // Conflict pre-check replicating the reference's error contract
    // (ref: oarphpy/spark.py:172-177,184-189).
    val byName = scala.collection.mutable.LinkedHashMap[String, StructField]()
    for (df <- dfs; f <- df.schema.fields) {
      byName.get(f.name) match {
        case Some(prev) =>
          // compare modulo nullability at every nesting level — nested
          // containsNull/valueContainsNull differences are widened by
          // unionByName, not conflicts
          if (org.apache.spark.sql.graftbridge.Bridge.asNullable(prev.dataType) !=
              org.apache.spark.sql.graftbridge.Bridge.asNullable(f.dataType))
            throw new IllegalArgumentException(
              s"Conflicting types for column ${f.name}: " +
                s"${prev.dataType.simpleString} vs ${f.dataType.simpleString}")
        case None => byName(f.name) = f
      }
    }
    // unionByName(allowMissingColumns) does the null-padding + positional
    // alignment natively (no extra Project per frame needed).
    dfs.reduce(_.unionByName(_, allowMissingColumns = true))
  }

  /** Explicit null-pad projection, exposed for callers that want to align
    * a single frame to a target column set (ref: oarphpy/spark.py:178,190). */
  def nullPad(df: DataFrame, target: Seq[StructField]): DataFrame = {
    val have = df.columns.toSet
    val cols: Seq[Column] = target.map { f =>
      if (have(f.name)) col(f.name) else lit(null).cast(f.dataType).as(f.name)
    }
    df.select(cols: _*)
  }
}
