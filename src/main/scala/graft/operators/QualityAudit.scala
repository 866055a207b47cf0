package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Declarative data-quality audit: a rule set compiled into ONE scan.
  *
  * Every row-level rule is a boolean `Column` (TRUE = row passes); the
  * audit folds all of them into a single map-side-combined aggregate —
  * one pass over the table, one output row per rule, regardless of how
  * many rules run. A NULL predicate counts as a VIOLATION (data-quality
  * semantics: "don't know" is not "ok" — the opposite of SQL CHECK,
  * documented here because the difference bites exactly on the dirty
  * rows an audit exists to find).
  *
  * Uniqueness constraints aren't row-local; [[uniqueness]] audits them
  * with one groupBy(keys) pass whose output is rolled into the same
  * report shape (violations = rows carrying a duplicated key).
  *
  * Scale shape: the row-level audit is a 1-row aggregate (partial
  * aggregation does the work map-side; the "unpivot" to report rows
  * operates on that single row — free). Uniqueness shuffles once on
  * the key — the same cost as the dedup it polices. At 100 TB the
  * whole N-rule audit reads the table ONCE; the naive
  * one-query-per-rule formulation reads it N times.
  */
object QualityAudit {

  /** One report row per rule: (rule, n_rows, n_violations, pass). */
  def audit(df: DataFrame, rules: Seq[(String, Column)]): DataFrame = {
    require(rules.nonEmpty, "empty rule set")
    require(rules.map(_._1).distinct.size == rules.size,
      s"duplicate rule names: ${rules.map(_._1)}")
    val aggs = rules.map { case (name, pred) =>
      sum(when(coalesce(pred, lit(false)), 0L).otherwise(1L))
        .as(s"__v_$name")
    }
    val one = df.agg(count(lit(1)).as("__n"), aggs: _*)
    // unpivot the single aggregate row into one row per rule — a stack
    // over a 1-row frame, not a table-scale operation
    val stacked = rules.map { case (name, _) =>
      struct(lit(name).as("rule"), col("__n").as("n_rows"),
        col(s"__v_$name").as("n_violations"))
    }
    one.select(explode(array(stacked: _*)).as("r"))
      .select(col("r.rule"), col("r.n_rows"), col("r.n_violations"),
        (col("r.n_violations") === 0).as("pass"))
  }

  /** Uniqueness constraint in the same report shape: violations = rows
    * whose key value occurs more than once (both copies count — they
    * are all rows a dedup would have to adjudicate). NULL keys are
    * exempt (SQL UNIQUE semantics: NULLs never collide). */
  def uniqueness(df: DataFrame, keys: Seq[String],
      ruleName: String): DataFrame = {
    require(keys.nonEmpty, "empty key set")
    val nonNull = keys.map(col(_).isNotNull).reduce(_ && _)
    val perKey = df.where(nonNull).groupBy(keys.map(col): _*)
      .agg(count(lit(1)).as("__c"))
    val total = df.agg(count(lit(1)).as("n_rows"))
    perKey.agg(
        coalesce(sum(when(col("__c") > 1, col("__c"))), lit(0L))
          .as("n_violations"))
      .crossJoin(broadcast(total))
      .select(lit(ruleName).as("rule"), col("n_rows"),
        col("n_violations"), (col("n_violations") === 0).as("pass"))
  }
}
