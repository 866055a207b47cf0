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

  /** Normalize the events `ts` column to a session-TZ TimestampType
    * whatever the fixture stores. The testdata generator has shipped two
    * layouts: TIMESTAMP(NANOS) — which Spark's vectorized reader rejects,
    * so [[ensureNanosAsLong]] reads it as raw long nanos and we convert
    * (the data is whole-µs, no precision loss) — and plain timestamp[µs]
    * with no zone, which Spark reads as TIMESTAMP_NTZ; the session runs
    * UTC, so the NTZ→LTZ cast is µs-value-preserving and keeps every
    * downstream window/watermark/unix_micros call (and the naive-reading
    * DuckDB oracle) on identical epoch micros. */
  private[queries] def normalizeEventTs(df: DataFrame): DataFrame = {
    import org.apache.spark.sql.functions.{col, expr, timestamp_micros}
    import org.apache.spark.sql.types.{LongType, TimestampNTZType, TimestampType}
    df.schema("ts").dataType match {
      case LongType => df.withColumn("ts", timestamp_micros(expr("ts div 1000")))
      case TimestampNTZType => df.withColumn("ts", col("ts").cast(TimestampType))
      case _ => df
    }
  }

  def events(s: SparkSession, d: String): DataFrame = {
    ensureNanosAsLong(s)
    normalizeEventTs(t(s, d, "events"))
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
