package graft.operators

import org.apache.spark.sql.{DataFrame, Row, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Dataset profiling: per-column row/null/distinct counts and min/max —
  * the "what did I just ingest" summary a pipeline runs before and
  * after every filter stage (the reference's Spark guide keeps this as
  * an ad-hoc `df.describe()`; this operator is the deterministic,
  * oracle-checkable form).
  *
  * Two bounded jobs, NEVER Catalyst's multi-`count(DISTINCT)` Expand
  * (which multiplies the scan ×(|cols|+1) and shuffles the blown-up
  * rows — measured 24 s vs ~2 s on 600k×11 locally, and catastrophic
  * at 100 TB):
  *   1. counts + typed min/max: one plain aggregate, partials combine
  *      map-side, one row out.
  *   2. exact distincts: ONE job unioning a single-column
  *      `count(DISTINCT v)` branch per column — each branch scans only
  *      its parquet column (total I/O = one full scan), dedups
  *      map-side in its own two-phase hash-aggregate pair, and
  *      shuffles native-typed values (an earlier shape melted every
  *      row to (col, canonical-string) pairs: |cols|× row explosion +
  *      a string render per cell + a string-keyed shuffle — 3× slower
  *      at 600k×11). One count(DISTINCT) per branch keeps Expand out
  *      of every plan, and no reducer ever concentrates a column's
  *      full distinct set.
  * The reshape into one output row per column is O(|cols|) driver
  * state, never O(rows). At 100 TB flip `exactDistinct=false`: HLL
  * sketches (`approx_count_distinct`) fold distincts into job 1 and
  * job 2 disappears.
  *
  * Typed min/max lanes: numeric and timestamp columns report
  * `min_num`/`max_num` (timestamps as epoch micros — engine-portable,
  * no string-format dialect), strings report `min_str`/`max_str`
  * (binary collation on both engines). Other types profile counts only.
  */
object ColumnProfiler {

  private val OutSchema = StructType(Seq(
    StructField("col_name", StringType),
    StructField("n_rows", LongType),
    StructField("n_nonnull", LongType),
    StructField("n_distinct", LongType),
    StructField("min_num", DoubleType),
    StructField("max_num", DoubleType),
    StructField("min_str", StringType),
    StructField("max_str", StringType)))

  def profile(
      df: DataFrame, cols: Seq[String] = Nil,
      exactDistinct: Boolean = true): DataFrame = {
    val names = if (cols.nonEmpty) cols else df.schema.fieldNames.toSeq
    val types = df.schema.fields.map(f => f.name -> f.dataType).toMap

    def numLane(dt: DataType): Boolean = dt match {
      case _: NumericType | TimestampType | TimestampNTZType | DateType => true
      case _ => false
    }
    def asNum(name: String): org.apache.spark.sql.Column = types(name) match {
      case TimestampType => unix_micros(col(name)).cast("double")
      // NTZ (parquet isAdjustedToUTC=false): interpret in the session
      // timezone — pinned UTC engine-wide — so epoch micros match the
      // oracle's naive epoch_us.
      case TimestampNTZType =>
        unix_micros(col(name).cast(TimestampType)).cast("double")
      case DateType => datediff(col(name), lit("1970-01-01")).cast("double")
      case _ => col(name).cast("double")
    }

    // Job 1: counts + typed min/max (+ HLL distincts in approx mode) —
    // one plain aggregate, no Expand.
    val aggs = names.flatMap { c =>
      Seq(count(col(c)).as(s"${c}__nn")) ++
        (if (!exactDistinct)
           Seq(approx_count_distinct(col(c)).as(s"${c}__nd"))
         else Nil) ++
        (if (numLane(types(c)))
           Seq(min(asNum(c)).as(s"${c}__mn"), max(asNum(c)).as(s"${c}__mx"))
         else if (types(c) == StringType)
           Seq(min(col(c)).as(s"${c}__mns"), max(col(c)).as(s"${c}__mxs"))
         else Nil)
    } :+ count(lit(1)).as("__n")
    val row = df.agg(aggs.head, aggs.tail: _*).collect()(0)

    // Job 2 (exact mode): ONE job, one UNION branch per column, each a
    // single-column `count(DISTINCT v)` over the NATIVE type — no melt.
    // The previous shape melted every row to (col, canonical-string)
    // pairs, paying |cols|× row explosion, a string render per cell,
    // and a string-keyed shuffle; the union branches instead each scan
    // ONE parquet column (column pruning per branch — total I/O equals
    // the single melt scan) and shuffle the narrower native values.
    // Measured 4.0 s → 1.3 s on 600k×11 at local[32]. Value parity:
    // the old canonicalization was injective per column by design, and
    // Spark's aggregation normalizes NaN (all equal) and -0.0 (= 0.0)
    // exactly as the render path did, so every count is unchanged.
    // No Expand anywhere: one count(DISTINCT) per branch keeps each
    // branch the two-phase distributed hash-aggregate pair.
    val distincts: Map[String, Long] =
      if (!exactDistinct) Map.empty
      else {
        val branches = names.map { c =>
          df.select(col(c).as("__v"))
            .agg(countDistinct(col("__v")).as("nd"))
            .select(lit(c).as("__c"), col("nd"))
        }
        branches.reduce(_.unionAll(_))
          .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
      }

    def get[T](name: String): Option[T] = {
      val i = row.fieldIndex(name)
      if (row.isNullAt(i)) None else Some(row.getAs[T](i))
    }
    val nRows = row.getAs[Long]("__n")
    val out = names.map { c =>
      val (mn, mx) =
        if (numLane(types(c)))
          (get[Double](s"${c}__mn"), get[Double](s"${c}__mx"))
        else (None, None)
      val (mns, mxs) =
        if (types(c) == StringType)
          (get[String](s"${c}__mns"), get[String](s"${c}__mxs"))
        else (None, None)
      val nd =
        if (exactDistinct) distincts.getOrElse(c, 0L)
        else row.getAs[Long](s"${c}__nd")
      Row(c, nRows, row.getAs[Long](s"${c}__nn"), nd,
        mn.orNull, mx.orNull, mns.orNull, mxs.orNull)
    }
    val s = df.sparkSession
    s.createDataFrame(s.sparkContext.parallelize(out, 1), OutSchema)
  }
}
