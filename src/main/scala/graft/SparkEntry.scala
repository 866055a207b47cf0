package graft

import org.apache.spark.sql.{SparkSession, DataFrame}
import org.apache.spark.sql.functions._

/** Driver contract — see /root/repo/SURVEY.md §7 + the builder prompt.
  *
  * `queries` maps operator names (SURVEY §2 inventory + training-pipeline
  * extensions) to DataFrame builders over the driver's testdata; each
  * SQL-expressible entry has a matching DuckDB oracle in `oracleSql`
  * (same column names + aliases on both sides — the driver sorts columns
  * by name before hashing).
  */
object SparkEntry {

  /** Flagship query on /root/testdata/sf0.001; driver smoke-checks rows>0. */
  def entry(spark: SparkSession): DataFrame =
    graft.queries.Relational.q1PricingSummary(spark, "/root/testdata/sf0.001")

  def queryGroups: Seq[(Map[String, (SparkSession, String) => DataFrame],
                        Map[String, String])] = Seq(
    (graft.queries.Relational.queries, graft.queries.Relational.oracles),
    (graft.queries.Ops.queries, graft.queries.Ops.oracles),
    (graft.queries.Ext.queries, graft.queries.Ext.oracles),
    (graft.queries.Events.queries, graft.queries.Events.oracles),
    (graft.queries.Sources.queries, graft.queries.Sources.oracles),
    (graft.queries.Streams.queries, graft.queries.Streams.oracles))

  def queries: Map[String, (SparkSession, String) => DataFrame] =
    queryGroups.map(_._1).reduce(_ ++ _)

  def oracleSql: Map[String, String] =
    queryGroups.map(_._2).reduce(_ ++ _)
}
