package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Z-order (Morton-curve) data layout: cluster a table on MULTIPLE
  * dimensions at once so parquet min/max statistics prune files and
  * row groups for predicates on ANY of the dimensions — the standard
  * 100 TB scan-reduction lever for multi-dimensional workloads (a
  * linear sort clusters only its leading column; the curve trades a
  * little locality on each dimension for locality on all of them).
  *
  * Mechanics (all codegen'd, two jobs total):
  *   1. ONE aggregate computes `buckets`-quantile boundaries per
  *      dimension (`approx_percentile`, mergeable sketch — no sort).
  *      Quantile bucketing (vs min/max linear scaling) makes the curve
  *      robust to skew: each bucket holds ~1/buckets of the rows even
  *      when values cluster. Boundary count is `buckets - 1` per dim —
  *      driver-side cost O(dims × buckets), data-size-independent.
  *   2. Each dimension maps to its bucket id (a codegen'd CASE chain,
  *      the [[Bucketize]] pattern), the ids' bits are interleaved into
  *      the Morton code — a pure bitwise expression, no UDF — and the
  *      frame is range-repartitioned + sorted on that code before the
  *      partitioned-file write.
  *
  * `numFiles` sizes output files directly (range partition = one file);
  * at scale it is total-bytes / target-file-size (128 MB-1 GB). Nulls
  * map to bucket 0 (curve origin) so they cluster together and never
  * widen other files' stats.
  *
  * The write is plain parquet: readers need no library support — file
  * skipping happens in any parquet reader (Spark, DuckDB, Trino) via
  * the standard column statistics.
  */
object ZOrder {

  /** Bits per dimension for `buckets` quantile buckets. */
  private def bitsFor(buckets: Int): Int = {
    require(buckets >= 2 && (buckets & (buckets - 1)) == 0,
      s"buckets must be a power of two >= 2, got $buckets")
    java.lang.Integer.numberOfTrailingZeros(buckets)
  }

  /** Morton code of pre-bucketed int columns (each in [0, buckets)):
    * bit b of dim d lands at position b*k + d. Pure bitwise arithmetic
    * over longs — stays inside whole-stage codegen. */
  def interleaveBits(dims: Seq[Column], buckets: Int): Column = {
    val bits = bitsFor(buckets)
    val k = dims.size
    val terms = for {
      (dim, d) <- dims.zipWithIndex
      b <- 0 until bits
    } yield shiftleft(
      shiftright(dim.cast("long"), b).bitwiseAND(lit(1L)), b * k + d)
    terms.reduce(_.bitwiseOR(_))
  }

  /** Quantile boundaries per dimension — ONE pass, one mergeable
    * sketch per dim. Returns `buckets - 1` interior boundaries. */
  private def quantileEdges(
      df: DataFrame, cols: Seq[String], buckets: Int): Map[String, Seq[Double]] = {
    val probs = (1 until buckets).map(_.toDouble / buckets)
    val aggs = cols.map { c =>
      approx_percentile(col(c).cast("double"),
        array(probs.map(lit): _*), lit(10000)).as(c)
    }
    val row = df.agg(aggs.head, aggs.tail: _*).collect()(0)
    cols.zipWithIndex.map { case (c, i) =>
      val v = row.getSeq[Double](i)
      // zero-row / all-null input: no boundaries -> every value maps
      // to bucket 0 and the layout degrades to a plain write
      c -> (if (v == null) Seq.empty[Double] else v)
    }.toMap
  }

  /** Bucket id of `c` against sorted interior `edges` (upper-bound
    * semantics: #edges <= value; null -> 0, NaN -> last). Open-ended —
    * every value gets a bucket; layout must not drop rows.
    *
    * Two lanes: a codegen'd CASE chain (the [[Bucketize]] pattern) for
    * few edges, and a compiled binary-search kernel beyond that — a
    * 255-arm CASE per dimension overflows whole-stage codegen's method
    * budget and degrades to interpreted Janino fallback (measured 6+ s
    * per pass at sf0.1), while the kernel is O(log buckets) per row. */
  private def bucketId(c: Column, edges: Seq[Double]): Column =
    if (edges.isEmpty) lit(0)
    else if (edges.size <= 32) {
      // null test FIRST: a null comparison is null, which would fall
      // through every when() to the otherwise (last bucket) — the
      // kernel lane sends nulls to bucket 0, and the lanes must agree
      val chain = edges.zipWithIndex.foldLeft(
          when(c.isNull, lit(0))) {
        case (acc, (e, i)) =>
          acc.when(c.cast("double") < lit(e), lit(i))
      }
      chain.otherwise(lit(edges.size))
    } else {
      val arr = edges.toArray
      val kernel = udf { v: java.lang.Double =>
        if (v == null) 0
        else if (v.isNaN) arr.length // CASE-chain parity: falls through
        else {
          // upper bound: first index with edges(i) > v
          var lo = 0
          var hi = arr.length
          while (lo < hi) {
            val m = (lo + hi) >>> 1
            if (arr(m) <= v) lo = m + 1 else hi = m
          }
          lo
        }
      }
      kernel(c.cast("double"))
    }

  /** The z-value column for `df` over `cols` (quantile-bucketed,
    * bit-interleaved). Exposed for tests and for callers that want to
    * cluster without writing (e.g. zorder + bucketed table). */
  def zValue(df: DataFrame, cols: Seq[String], buckets: Int): Column = {
    val edges = quantileEdges(df, cols, buckets)
    interleaveBits(cols.map(c => bucketId(col(c), edges(c))), buckets)
  }

  /** Z-order `df` by `cols` into `numFiles` range-partitioned files at
    * `path`. Two jobs: the quantile aggregate, then the range exchange
    * + in-partition sort + write. */
  def write(
      df: DataFrame, cols: Seq[String], path: String,
      numFiles: Int = 32, buckets: Int = 256): Unit = {
    require(cols.nonEmpty && cols.size <= 4,
      s"z-order supports 1-4 dimensions, got ${cols.size}")
    df.withColumn("__z", zValue(df, cols, buckets))
      .repartitionByRange(numFiles, col("__z"))
      .sortWithinPartitions("__z")
      .drop("__z")
      .write.mode("overwrite").parquet(path)
  }
}
