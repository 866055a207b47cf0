package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Table loading helpers for the driver's testdata layout
  * (one parquet file per table under the sf dir — see TESTDATA.md). */
object Tables {
  def t(spark: SparkSession, sfDir: String, name: String): DataFrame =
    spark.read.parquet(s"$sfDir/$name.parquet")

  def lineitem(s: SparkSession, d: String): DataFrame = t(s, d, "lineitem")
  def orders(s: SparkSession, d: String): DataFrame = t(s, d, "orders")
  def customer(s: SparkSession, d: String): DataFrame = t(s, d, "customer")
  def supplier(s: SparkSession, d: String): DataFrame = t(s, d, "supplier")
  def part(s: SparkSession, d: String): DataFrame = t(s, d, "part")
  def nation(s: SparkSession, d: String): DataFrame = t(s, d, "nation")
  def region(s: SparkSession, d: String): DataFrame = t(s, d, "region")
  /** Conf key letting Spark read TIMESTAMP(NANOS) parquet columns as raw
    * longs. Preferably set once at session construction (GraftSession /
    * Bench / Verify do); [[events]] only falls back to a runtime set when
    * the session missed it, and never re-sets an already-correct value —
    * a per-call `conf.set` invalidates cached relation plans. */
  val NanosAsLongKey = "spark.sql.legacy.parquet.nanosAsLong"
  def ensureNanosAsLong(s: SparkSession): Unit =
    if (!s.conf.getOption(NanosAsLongKey).contains("true"))
      s.conf.set(NanosAsLongKey, "true")

  /** The events table carries TIMESTAMP(NANOS) parquet timestamps, which
    * Spark's vectorized reader rejects; read them as raw nanos and
    * convert to µs timestamps (the data is whole-µs, no precision loss). */
  def events(s: SparkSession, d: String): DataFrame = {
    ensureNanosAsLong(s)
    t(s, d, "events").withColumn("ts",
      org.apache.spark.sql.functions.timestamp_micros(
        org.apache.spark.sql.functions.expr("ts div 1000")))
  }
  def documents(s: SparkSession, d: String): DataFrame = t(s, d, "documents")
  def embeddings(s: SparkSession, d: String): DataFrame = t(s, d, "embeddings")

  /** Scoped shuffle-partition override for fixture-scale multi-job
    * entries (streaming state stores, index upserts): tiny per-task
    * state makes 32-task stages pure scheduling overhead, so cap the
    * parallelism for the scope and restore the session conf after.
    * Production sizing goes the other way — enough partitions that
    * per-task state fits an executor — which is a deploy-time conf,
    * not a query-shape change. */
  private[queries] def withShufflePartitions[T](
      s: SparkSession, n: Int)(f: => T): T = {
    val key = "spark.sql.shuffle.partitions"
    val old = s.conf.get(key)
    s.conf.set(key, n.toString)
    try f finally s.conf.set(key, old)
  }
}
