package graft.operators

import org.apache.spark.sql.{DataFrame, SaveMode, SparkSession}

/** Bucketed-table helpers: co-located joins without a per-query shuffle.
  *
  * At 100 TB the dominant cost of a fact-fact join is shuffling both
  * sides on the key. Writing both tables bucketed by the join key (same
  * bucket count) lets Spark plan a sort-merge join with NO Exchange —
  * each bucket pair joins locally. This is the standard physical-design
  * lever for repeated joins on stable keys; verified shuffle-free in
  * BucketingSpec via the executed plan.
  */
object Bucketing {

  /** Write `df` as a bucketed managed table (bucketBy requires the
    * table catalog, not a bare path — Spark limitation). Idempotent
    * ACROSS JVMs: a previous session may have left the managed location
    * on disk while this session's catalog (fresh in-memory/derby) has no
    * entry for it — saveAsTable then fails LOCATION_ALREADY_EXISTS, so
    * drop the catalog entry AND any orphaned location first. */
  def writeBucketed(
      df: DataFrame, table: String,
      bucketCols: Seq[String], numBuckets: Int,
      sortCols: Seq[String] = Seq.empty): Unit = {
    val spark = df.sparkSession
    spark.sql(s"DROP TABLE IF EXISTS `$table`")
    val loc = new org.apache.hadoop.fs.Path(
      spark.conf.get("spark.sql.warehouse.dir"), table.toLowerCase)
    val fs = loc.getFileSystem(spark.sparkContext.hadoopConfiguration)
    if (fs.exists(loc)) fs.delete(loc, true)
    var w = df.write.mode(SaveMode.Overwrite)
      .format("parquet")
      .bucketBy(numBuckets, bucketCols.head, bucketCols.tail: _*)
    if (sortCols.nonEmpty) w = w.sortBy(sortCols.head, sortCols.tail: _*)
    w.saveAsTable(table)
  }

  /** Join two same-bucketed tables on their bucket columns; the plan
    * contains no Exchange when bucket specs line up. */
  def bucketedJoin(
      spark: SparkSession, leftTable: String, rightTable: String,
      on: Seq[String], joinType: String = "inner"): DataFrame =
    spark.table(leftTable).join(spark.table(rightTable), on, joinType)
}
