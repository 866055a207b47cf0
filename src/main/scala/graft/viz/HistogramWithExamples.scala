package graft.viz

import org.apache.spark.sql.{DataFrame, Row}
import org.apache.spark.sql.functions._
import graft.operators.{DfHistogram, Bucketize}
import graft.functions.StableHash

/** Distributed histogram with per-bucket example drill-down — the
  * reference's most complex query DAG (ref: oarphpy/plotting.py:104-365,
  * stage walk in SURVEY §3.2), recomposed Spark-native as TWO jobs
  * total, independent of the pivot count (the reference — and this
  * operator's first cut — looped pivots driver-side at 2-3 jobs each):
  *
  *   1. per-pivot min/max: one groupBy(pivot) agg, O(pivots) collected
  *   2. per-(pivot, bucket) counts AND bounded examples in ONE
  *      aggregate: bucket index from the per-pivot edges (stats
  *      broadcast-joined back, so the expression stays ONE plan shape
  *      at any pivot count), counts via count(1), examples via a
  *      k-BOUNDED heap aggregate (first K rows by monotonic id —
  *      map-side partials, O(buckets × K) display strings shuffled,
  *      never a whole-partition window sort), O(pivots × bins)
  *      collected. With the optional deterministic hash-threshold cap
  *      (the reference's OOM guard, ref:
  *      oarphpy/plotting.py:158-169,241-253) the counts must land
  *      before the per-bucket keep fraction, so that path stays a
  *      count job + a capped example job (three total).
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
    val spark = df.sparkSession
    import spark.implicits._
    // The caller may want to cache() df — same contract as the reference
    // (ref: oarphpy/plotting.py:276-279).
    // NULL pivots map to the "\u0001null" sentinel; a GENUINE U+0001 in
    // a string-typed pivot value is first escaped by doubling, so the
    // sentinel is unforgeable (a real "\u0001null" becomes
    // "\u0001\u0001null" != sentinel) — no value conflates with NULL.
    // Consumers translating back to SQL NULL must unescape (see
    // Ops.vizHistogram). Casts of non-string types never produce control
    // characters, so the escape is an identity for them.
    val pivotExpr = subPivotCol
      .map(p => coalesce(
        regexp_replace(col(p).cast("string"), "\u0001", "\u0001\u0001"),
        lit("\u0001null")))
      .getOrElse(lit("ALL"))
    val vExpr = col(column).cast("double")
    val base = df
      .withColumn("__pivot", pivotExpr)
      // null/NaN values are histogram-invisible (reference's NaN caveat);
      // a pivot with NO usable values at all is dropped from the result
      // (there is nothing to bin — emitting 50 empty [0,0) buckets would
      // fabricate edges).
      .withColumn("__v", when(!isnan(vExpr), vExpr))

    // Job 1: per-pivot [lo, hi]. O(pivots) rows to the driver.
    val stats: Seq[(String, Option[(Double, Double)])] =
      base.groupBy(col("__pivot"))
        .agg(min(col("__v")).as("__lo"), max(col("__v")).as("__hi"))
        .collect()
        .map { r =>
          r.getString(0) -> (if (r.isNullAt(1)) None
                             else Some((r.getDouble(1), r.getDouble(2))))
        }
        .sortBy(_._1).toSeq
    val edgesOf: Map[String, Array[Double]] = stats.map { case (p, st) =>
      val (lo, hi) = st.getOrElse((0.0, 0.0))
      p -> (0 to numBins).map(i => lo + (hi - lo) * i / numBins).toArray
    }.toMap

    // Per-pivot bounds rejoin as a broadcast, so bucket assignment is one
    // plan-stable expression regardless of how many pivots exist —
    // multiply before dividing, exactly like DfHistogram.bucketExpr.
    val statsDf = broadcast(stats.collect {
      case (p, Some((lo, hi))) => (p, lo, hi)
    }.toDF("__pivot", "__lo", "__hi"))
    val withBucket = base
      .where(col("__v").isNotNull)
      .join(statsDf, Seq("__pivot"))
      .withColumn("__bucket",
        when(col("__hi") === col("__lo"), lit(0)).otherwise(least(
          floor((col("__v") - col("__lo")) * numBins
            / (col("__hi") - col("__lo"))).cast("int"),
          lit(numBins - 1))))

    // Bounded example collection rides a k-BOUNDED heap aggregate
    // ([[graft.operators.TopKPerKey.FirstKByRank]]: first K rows by
    // monotonic id, payload = the display string) instead of the old
    // row_number window — no whole-partition sort, map-side partials,
    // O(buckets × K) shuffle of display strings only. That makes the
    // example pass a plain aggregate, so in the UNCAPPED path it FUSES
    // with the count pass: ONE job where there were two scans of the
    // bucketed frame (guide: remove passes before tuning them).
    val exCol = struct(df.columns.toSeq.map(col): _*)
    val exAgg = udaf(new graft.operators.TopKPerKey.FirstKByRank(
      MaxExamplesPerBucket))
    def aggExamples(in: DataFrame): Map[(String, Int), Seq[String]] = in
      .select(col("__pivot"), col("__bucket"),
        monotonically_increasing_id().as("__mid"),
        exCol.cast("string").as("__ex"))
      .groupBy(col("__pivot"), col("__bucket"))
      .agg(exAgg(col("__mid"), col("__ex")).as("__exs"))
      .collect()
      .map(r => (r.getString(0), r.getInt(1)) -> r.getSeq[String](2))
      .toMap

    val (countOf, examples): (Map[(String, Int), Long],
        Map[(String, Int), Seq[String]]) =
      if (maxRowsPerBucket <= 0) {
        // FUSED job 2: counts + bounded examples in one aggregate.
        val rows = withBucket
          .select(col("__pivot"), col("__bucket"),
            monotonically_increasing_id().as("__mid"),
            exCol.cast("string").as("__ex"))
          .groupBy(col("__pivot"), col("__bucket"))
          .agg(count(lit(1)).as("__n"),
            exAgg(col("__mid"), col("__ex")).as("__exs"))
          .collect()
        (rows.map(r => (r.getString(0), r.getInt(1)) -> r.getLong(2)).toMap,
          rows.map(r => (r.getString(0), r.getInt(1)) -> r.getSeq[String](3))
            .toMap)
      } else {
        // Capping needs the counts BEFORE the example draw (the
        // per-bucket keep fraction), so this path stays two jobs.
        // Job 2: (pivot, bucket) → count. O(pivots × bins) driver rows.
        val counts: Map[(String, Int), Long] =
          withBucket.groupBy(col("__pivot"), col("__bucket"))
            .agg(count(lit(1)).as("__n"))
            .collect()
            .map(r => (r.getString(0), r.getInt(1)) -> r.getLong(2))
            .toMap
        // OOM guard: cap rows per bucket BEFORE collecting examples, via
        // the portable deterministic hash-threshold Bernoulli (same
        // scheme as BalancedSample — seed 1337 like the reference's
        // sampleBy).
        val fracDf = broadcast(counts.toSeq.map { case ((p, b), n) =>
          (p, b, math.min(1.0, maxRowsPerBucket.toDouble / math.max(1L, n))
            * math.pow(2.0, 60))
        }.toDF("__pivot", "__bucket", "__thr"))
        val draw = graft.operators.BalancedSample.hash60(
          df.columns.toSeq.map(col), DefaultSeed)
        val capped = withBucket.join(fracDf, Seq("__pivot", "__bucket"))
          .where(draw < col("__thr")).drop("__thr")
        (counts, aggExamples(capped))
      }

    val buckets = stats.flatMap {
      case (_, None) => Nil // value-less pivot: nothing to bin
      case (p, Some(_)) =>
        val edges = edgesOf(p)
        (0 until numBins).map { i =>
          Bucket(p, i, edges(i), edges(i + 1),
            countOf.getOrElse((p, i), 0L),
            examples.getOrElse((p, i), Seq.empty))
        }
    }
    Result(column, buckets)
  }

  /** Self-contained HTML rendering with the reference bokeh figure's
    * interaction contract (ref: oarphpy/plotting.py:305-365) —
    * per-pivot colored quads, hover counts, TAP-a-bar drill-down to its
    * examples, legend click to show/hide a pivot — as dependency-free
    * inline SVG + vanilla JS (no bokeh/CDN; renders offline). */
  def toHtml(r: Result): String = {
    val pivots = r.buckets.map(_.pivot).distinct
    val maxCount = math.max(1L, r.buckets.map(_.count).max)
    val width = 900; val height = 260
    val bw = width.toDouble / math.max(1, r.buckets.count(_.pivot == pivots.head))
    val pivotIdx = pivots.zipWithIndex.toMap
    val svg = new StringBuilder
    pivots.foreach { p =>
      val (cr, cg, cb) = StableHash.hashToRgb(p)
      val pi = pivotIdx(p)
      r.buckets.filter(_.pivot == p).foreach { b =>
        val h = (b.count.toDouble / maxCount) * (height - 20)
        val x = b.bucket * bw
        val y = height - h
        svg.append(
          f"""<rect x="$x%.1f" y="$y%.1f" width="${bw * 0.9}%.1f" height="$h%.1f"
             | fill="rgb($cr,$cg,$cb)" fill-opacity="0.6" class="bar bar-p$pi"
             | data-ex="ex-p$pi-b${b.bucket}" onclick="drill(this)">
             |<title>${escape(b.pivot)} [${b.lo}%.3f, ${b.hi}%.3f): ${b.count}</title></rect>
             |""".stripMargin)
      }
    }
    val examples = r.buckets.filter(_.examples.nonEmpty).map { b =>
      val pi = pivotIdx(b.pivot)
      s"""<div class="bucket" id="ex-p$pi-b${b.bucket}">
         |<h4>${escape(b.pivot)} bucket ${b.bucket} [${b.lo}, ${b.hi}) — ${b.count} rows</h4>
         |<ul>${b.examples.map(e => s"<li><code>${escape(e)}</code></li>").mkString}</ul>
         |</div>""".stripMargin
    }.mkString("\n")
    val legend = pivots.map { p =>
      val (cr, cg, cb) = StableHash.hashToRgb(p)
      val pi = pivotIdx(p)
      s"""<span style="color:rgb($cr,$cg,$cb);cursor:pointer"
         | id="leg-p$pi" onclick="toggle($pi)">■ ${escape(p)}</span>"""
        .stripMargin.replace("\n", "")
    }.mkString(" ")
    s"""<!DOCTYPE html><html><head><meta charset="utf-8">
       |<title>Histogram: ${escape(r.column)}</title>
       |<style>
       |.bar:hover { fill-opacity: 1; cursor: pointer; }
       |.hidden { display: none; }
       |.bucket.hit { background: #ffffcc; }
       |.legend span.off { text-decoration: line-through; opacity: 0.4; }
       |</style></head><body>
       |<h2>Histogram of ${escape(r.column)}</h2>
       |<svg width="$width" height="$height">${svg.toString}</svg>
       |<div class="legend">$legend</div>
       |$examples
       |<script>
       |function toggle(pi) {
       |  document.querySelectorAll('.bar-p' + pi).forEach(function(e) {
       |    e.classList.toggle('hidden'); });
       |  document.getElementById('leg-p' + pi).classList.toggle('off');
       |}
       |function drill(rect) {
       |  var ex = document.getElementById(rect.getAttribute('data-ex'));
       |  if (!ex) return;
       |  document.querySelectorAll('.bucket.hit').forEach(function(e) {
       |    e.classList.remove('hit'); });
       |  ex.classList.add('hit');
       |  ex.scrollIntoView({behavior: 'smooth', block: 'nearest'});
       |}
       |</script>
       |</body></html>""".stripMargin
  }

  private def escape(s: String): String =
    // The U+0001 null-pivot sentinel is display-invisible.
    s.replace("\u0001", "")
      .replace("&", "&amp;").replace("<", "&lt;").replace(">", "&gt;")
}
