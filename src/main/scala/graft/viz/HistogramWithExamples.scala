package graft.viz

import org.apache.spark.sql.{DataFrame, Row}
import org.apache.spark.sql.functions._
import graft.operators.{DfHistogram, Bucketize}
import graft.functions.StableHash

/** Distributed histogram with per-bucket example drill-down — the
  * reference's most complex query DAG (ref: oarphpy/plotting.py:104-365,
  * stage walk in SURVEY §3.2), recomposed Spark-native:
  *
  *   1. distinct sub-pivot values (one Aggregate, collected — small)
  *   2. per pivot: filter → min/max agg → bucket-count agg (SQL-native
  *      one-pass replacement for the 2-pass RDD histogram)
  *   3. bucket column via the codegen'd CASE chain (Bucketize)
  *   4. optional per-bucket example sampling cap — the reference's OOM
  *      guard (ref: oarphpy/plotting.py:158-169,241-253), sampleBy with
  *      seed 1337
  *   5. per-bucket example collection via groupBy + collect_list over a
  *      LIMITED sample (never all rows — 100 TB-safe)
  *
  * Output is data + a static HTML emitter (the reference's bokeh
  * dependency is replaced by a self-contained HTML/SVG template with the
  * same information contract: quads per bucket, per-pivot color from
  * hashToRgb, per-bucket example display).
  */
object HistogramWithExamples {

  val NumBins = 50            // ref: oarphpy/plotting.py:147
  val DefaultSeed = 1337L     // ref: oarphpy/plotting.py:158-169
  val MaxExamplesPerBucket = 10

  case class Bucket(pivot: String, bucket: Int, lo: Double, hi: Double,
      count: Long, examples: Seq[String])
  case class Result(column: String, buckets: Seq[Bucket])

  def run(
      df: DataFrame, column: String,
      subPivotCol: Option[String] = None,
      numBins: Int = NumBins,
      maxRowsPerBucket: Int = -1,
      displayRow: Row => String = _.toString): Result = {
    // The caller may want to cache() df — same contract as the reference
    // (ref: oarphpy/plotting.py:276-279).
    val pivots: Seq[(String, DataFrame)] = subPivotCol match {
      case None => Seq(("ALL", df))
      case Some(p) =>
        df.select(col(p)).distinct().collect().map(_.get(0))
          // null-safe equality: a null pivot value must select its rows
          // (plain === never matches null and silently drops them)
          .map(v => (String.valueOf(v), df.filter(col(p) <=> lit(v))))
          .sortBy(_._1).toSeq
    }
    val buckets = pivots.flatMap { case (pivotName, pdf) =>
      val hist = DfHistogram(pdf, column, numBins)
      val edges = hist.edges
      val withBucket = pdf.withColumn("__bucket",
        Bucketize(col(column).cast("double"), edges.toSeq))
      // OOM guard: cap rows per bucket before collecting examples.
      val capped =
        if (maxRowsPerBucket <= 0) withBucket
        else {
          val fractions = hist.counts.zipWithIndex.map { case (n, i) =>
            (i: Any) -> math.min(1.0, maxRowsPerBucket.toDouble / math.max(1L, n))
          }.toMap
          withBucket.stat.sampleBy("__bucket", fractions, DefaultSeed)
        }
      // Bounded example collection: per-bucket row_number limit, then
      // stringify executor-side so only display strings move.
      val exCol = struct(capped.columns.filter(_ != "__bucket").map(col): _*)
      val w = org.apache.spark.sql.expressions.Window
        .partitionBy(col("__bucket")).orderBy(monotonically_increasing_id())
      val examples = capped
        .withColumn("__rn", row_number().over(w))
        .where(col("__rn") <= MaxExamplesPerBucket)
        .select(col("__bucket"), exCol.cast("string").as("__ex"))
        .groupBy(col("__bucket"))
        .agg(collect_list(col("__ex")).as("__exs"))
        .collect()
        .map(r => r.getInt(0) -> r.getSeq[String](1))
        .toMap
      hist.counts.zipWithIndex.map { case (n, i) =>
        Bucket(pivotName, i, edges(i), edges(i + 1), n,
          examples.getOrElse(i, Seq.empty))
      }
    }
    Result(column, buckets)
  }

  /** Self-contained HTML rendering (information contract of the
    * reference's bokeh figure: per-pivot colored quads + hover counts +
    * per-bucket examples; ref: oarphpy/plotting.py:305-365). */
  def toHtml(r: Result): String = {
    val pivots = r.buckets.map(_.pivot).distinct
    val maxCount = math.max(1L, r.buckets.map(_.count).max)
    val width = 900; val height = 260
    val bw = width.toDouble / math.max(1, r.buckets.count(_.pivot == pivots.head))
    val svg = new StringBuilder
    pivots.zipWithIndex.foreach { case (p, pi) =>
      val (cr, cg, cb) = StableHash.hashToRgb(p)
      r.buckets.filter(_.pivot == p).foreach { b =>
        val h = (b.count.toDouble / maxCount) * (height - 20)
        val x = b.bucket * bw
        val y = height - h
        svg.append(
          f"""<rect x="$x%.1f" y="$y%.1f" width="${bw * 0.9}%.1f" height="$h%.1f"
             | fill="rgb($cr,$cg,$cb)" fill-opacity="0.6"
             | data-pivot="$p" data-bucket="${b.bucket}">
             |<title>$p [${b.lo}%.3f, ${b.hi}%.3f): ${b.count}</title></rect>
             |""".stripMargin)
      }
    }
    val examples = r.buckets.filter(_.examples.nonEmpty).map { b =>
      s"""<div class="bucket" id="ex-${b.pivot}-${b.bucket}">
         |<h4>${escape(b.pivot)} bucket ${b.bucket} [${b.lo}, ${b.hi}) — ${b.count} rows</h4>
         |<ul>${b.examples.map(e => s"<li><code>${escape(e)}</code></li>").mkString}</ul>
         |</div>""".stripMargin
    }.mkString("\n")
    s"""<!DOCTYPE html><html><head><meta charset="utf-8">
       |<title>Histogram: ${escape(r.column)}</title></head><body>
       |<h2>Histogram of ${escape(r.column)}</h2>
       |<svg width="$width" height="$height">${svg.toString}</svg>
       |<div class="legend">${pivots.map { p =>
        val (cr, cg, cb) = StableHash.hashToRgb(p)
        s"""<span style="color:rgb($cr,$cg,$cb)">■ ${escape(p)}</span>"""
      }.mkString(" ")}</div>
       |$examples
       |</body></html>""".stripMargin
  }

  private def escape(s: String): String =
    s.replace("&", "&amp;").replace("<", "&lt;").replace(">", "&gt;")
}
