package org.apache.spark.sql.graftbridge

import scala.collection.mutable

import org.apache.spark.internal.io.FileCommitProtocol
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.execution.SQLExecution
import org.apache.spark.sql.execution.datasources.{FileFormatWriter,
  WriteJobStatsTracker, WriteTaskStats, WriteTaskStatsTracker}
import org.apache.spark.sql.execution.datasources.parquet.ParquetFileFormat

/** IN-WRITE statistics harvest for the versioned-table layer: per-file
  * row counts, min/max spans, null counts and exact integral/decimal
  * sums collected WHILE the write job streams rows into parquet — the
  * Delta OSS `DataSkippingStatsTracker` posture (public knowledge:
  * Spark's own `WriteTaskStatsTracker` seam, the same one
  * `BasicWriteJobStatsTracker` rides). Replaces a post-commit pass
  * that re-read every just-written file (per-file footer RPCs from the
  * driver plus one column-pruned scan job): at 100 TB a commit's stats
  * must cost zero extra reads, because the write itself already saw
  * every value exactly once.
  *
  * The tracker records VALUES-AS-WRITTEN semantics identical to what a
  * parquet footer harvest of the same file would yield (same span
  * normalization units, same all-null/not-collected distinction, same
  * NaN decline, same Σ-overflow decline), so entries built here and
  * entries built from footers coexist in one manifest and every
  * downstream consumer (pruning, metadata folds) stays representation-
  * blind. Lives in the sql namespace shim because
  * [[FileFormatWriter]]/[[WriteTaskStatsTracker]] are internal seams —
  * the same placement every Spark-native lakehouse layer uses.
  */
object WriteHarvest {

  /** Span/side-stat kinds, resolved DRIVER-side from the written
    * schema + session conf so executors run a flat dispatch. */
  final val KByte = 0
  final val KShort = 1
  final val KInt = 2
  final val KLong = 3
  /** DATE: span through the physical int32 (epoch days) as Long. */
  final val KDate = 4
  /** TIMESTAMP written as INT64 micros: span is the raw micros Long
    * (the caller tags it as a timestamp value when building entries). */
  final val KTsMicros = 5
  /** TIMESTAMP written as INT64 millis: the writer floor-truncates
    * micros→millis, so the FILE's values (and hence the span) are the
    * truncated ones re-widened to micros. */
  final val KTsMillis = 6
  final val KFloat = 7
  final val KDouble = 8
  final val KString = 9
  final val KDecimal = 10
  /** Atomic but not span-normalizable (boolean, binary, int96
    * timestamps, intervals): null count only — exactly what a footer
    * harvest records for such chunks. */
  final val KNullsOnly = 11

  /** One stats column of the staged frame: logical manifest name, the
    * column's ordinal in the WRITTEN schema, its kind, (decimals)
    * precision/scale, and — when an NDV sketch is requested — the
    * column's exact Catalyst type (`ndvType`, null = no sketch) plus
    * the sketch precision (`ndvRsd`). The type matters: the sketch
    * must hash values EXACTLY as the read side's
    * `approx_count_distinct` does, and Spark's hash dispatches on the
    * DataType (a byte hashes differently from the same value widened
    * to long). */
  final case class ColSpec(logical: String, ordinal: Int, kind: Int,
      precision: Int = 0, scale: Int = 0,
      ndvType: org.apache.spark.sql.types.DataType = null,
      ndvRsd: Double = 0.0) extends Serializable

  /** Distinct-set cap: a column whose file exceeds this many distinct
    * non-null values records NO set (unknown) — bounded memory and
    * near-zero cost on high-cardinality columns (the set stops
    * growing after cap+1 inserts). Low-cardinality columns (status
    * flags, categories, partitions-by-another-name) keep their exact
    * per-file value sets, upgrading `count(DISTINCT)` from
    * point-file-only to set-union metadata folds. */
  final val DsetCap = 64

  /** Per-column harvest result. `nulls` < 0 = not tracked. `span`:
    * None = not collected (unsupported kind / NaN seen); Some(None) =
    * provably all-null; Some(Some((mn, mx))) = the span, holding
    * Long / Double / String / java.math.BigDecimal (timestamp kinds
    * hold the micros Long — the caller re-tags). `sum`: None =
    * ineligible or overflowed past DECIMAL(38) (unknown); Some(None) =
    * no non-null rows; Some(Some(σ)) = the exact sum. `dset`: None =
    * not tracked or past [[DsetCap]]; Some(vs) = the file's EXACT
    * non-null distinct values (±0.0 collapsed to +0.0, matching
    * Spark's distinct normalization; same value domain as spans). */
  final case class ColResult(nulls: Long,
      span: Option[Option[(Any, Any)]],
      sum: Option[Option[java.math.BigDecimal]],
      dset: Option[Seq[Any]] = None,
      ndv: Option[Seq[Long]] = None) extends Serializable

  /** One written file's harvest: physical row count + per-logical-
    * column results (keys = the spec'd columns present in the written
    * schema). */
  final case class FileHarvest(rows: Long,
      cols: Map[String, ColResult]) extends Serializable

  /** Task→driver payload (rides Spark's existing stats-tracker
    * channel, keyed by written file BASENAME — stable across the
    * committer's temp→final rename). */
  final case class HarvestStats(byFile: Map[String, FileHarvest])
    extends WriteTaskStats

  // ---- per-column accumulators (executor-side, never serialized) ----

  private sealed trait Acc {
    def update(row: InternalRow): Unit
    def result(): ColResult
  }

  /** Bounded exact distinct-set collector: stops (→ unknown) past
    * [[DsetCap]], so high-cardinality columns cost ~cap inserts and
    * then nothing. */
  private final class DSet {
    private var set: java.util.HashSet[Any] = new java.util.HashSet[Any]
    def add(v: Any): Unit = if (set != null) {
      set.add(v)
      if (set.size > DsetCap) set = null
    }
    /** Membership probe without insert — lets callers defer an
      * allocation (string clone) to genuinely-new values. */
    def wouldAdd(v: Any): Boolean = set != null && !set.contains(v)
    def alive: Boolean = set != null
    def result: Option[Seq[Any]] =
      Option(set).map(_.toArray.toIndexedSeq)
  }

  private val Ten38 = java.math.BigInteger.TEN.pow(38)

  /** Per-column HLL++ NDV SKETCH collector: the exact register state
    * Spark's own `approx_count_distinct` accumulates — built by
    * feeding every non-null value through
    * [[org.apache.spark.sql.catalyst.util.HyperLogLogPlusPlusHelper
    * .update]] with the column's true Catalyst type, so the hash, the
    * register index and the rho are BIT-IDENTICAL to what a scan-side
    * aggregate over the same file would compute. Register merge is a
    * per-register max (an idempotent semilattice join), so per-file
    * register words recorded in the manifest union into exactly the
    * single-pass whole-table buffer — the metadata fold is
    * indistinguishable from the scan, not "approximately equal" to
    * it. ~0.4 KB per column per file at the default rsd 0.05. */
  private final class HllCol(dt: org.apache.spark.sql.types.DataType,
      rsd: Double) {
    private val helper =
      new org.apache.spark.sql.catalyst.util.HyperLogLogPlusPlusHelper(rsd)
    private val buf = new org.apache.spark.sql.catalyst.expressions
      .SpecificInternalRow(
        Seq.fill(helper.numWords)(org.apache.spark.sql.types.LongType))
    locally { var i = 0; while (i < helper.numWords) { buf.setLong(i, 0L); i += 1 } }
    def add(v: Any): Unit = helper.update(buf, 0, v, dt)
    def words: Seq[Long] =
      (0 until helper.numWords).map(buf.getLong)
  }

  private def mkHll(spec: ColSpec): HllCol =
    if (spec.ndvType == null || spec.ndvRsd <= 0.0) null
    else new HllCol(spec.ndvType, spec.ndvRsd)

  /** Integral + date + timestamp kinds: Long min/max, exact Σ in a
    * long that widens to BigInteger on overflow (Σ stays exact for
    * any file size; only the DECIMAL(38) bound declines it). */
  private final class LongAcc(ord: Int, kind: Int, sumEligible: Boolean,
      hll: HllCol) extends Acc {
    private var nulls = 0L
    private var n = 0L
    private var mn = Long.MaxValue
    private var mx = Long.MinValue
    private var s = 0L
    private var big: java.math.BigInteger = null
    private val ds = new DSet
    def update(row: InternalRow): Unit = {
      if (row.isNullAt(ord)) { nulls += 1; return }
      var v: Long = kind match {
        case KByte => row.getByte(ord).toLong
        case KShort => row.getShort(ord).toLong
        case KInt | KDate => row.getInt(ord).toLong
        case _ => row.getLong(ord)
      }
      if (kind == KTsMillis) v = Math.floorDiv(v, 1000L) * 1000L
      // sketch the value at its ORIGINAL width/type — Spark's hash
      // dispatches on DataType, so a byte must enter as a byte; the
      // millis kind sketches the truncated micros (what the file
      // holds and the scan re-reads)
      if (hll != null) hll.add(kind match {
        case KByte => java.lang.Byte.valueOf(row.getByte(ord))
        case KShort => java.lang.Short.valueOf(row.getShort(ord))
        case KInt | KDate => java.lang.Integer.valueOf(row.getInt(ord))
        case _ => java.lang.Long.valueOf(v)
      })
      n += 1
      if (v < mn) mn = v
      if (v > mx) mx = v
      ds.add(v)
      if (sumEligible) {
        if (big == null) {
          val ns = s + v
          if (((s ^ ns) & (v ^ ns)) < 0)
            big = java.math.BigInteger.valueOf(s)
              .add(java.math.BigInteger.valueOf(v))
          else s = ns
        } else big = big.add(java.math.BigInteger.valueOf(v))
      }
    }
    def result(): ColResult = {
      val span =
        if (n == 0) Some(None)
        else Some(Some((mn: Any, mx: Any)))
      val sum =
        if (!sumEligible) None
        else if (n == 0) Some(None)
        else {
          val tot = if (big != null) big else java.math.BigInteger.valueOf(s)
          if (tot.abs.compareTo(Ten38) >= 0) None // > DECIMAL(38,0)
          else Some(Some(new java.math.BigDecimal(tot)))
        }
      ColResult(nulls, span, sum, ds.result,
        Option(hll).map(_.words))
    }
  }

  /** Float/double: Double span under [[java.lang.Double.compare]]
    * order (what parquet's double statistics use, −0.0 < +0.0); any
    * NaN declines the whole file's span — exactly the footer outcome,
    * where parquet omits bounds on NaN-carrying chunks. Never summed
    * (IEEE Σ is order-dependent). */
  private final class DoubleAcc(ord: Int, isFloat: Boolean,
      hll: HllCol) extends Acc {
    private var nulls = 0L
    private var n = 0L
    private var nan = false
    private var mn = 0.0d
    private var mx = 0.0d
    private val ds = new DSet
    def update(row: InternalRow): Unit = {
      if (row.isNullAt(ord)) { nulls += 1; return }
      val v = if (isFloat) row.getFloat(ord).toDouble else row.getDouble(ord)
      // sketch the RAW value at its own width (float as float): the
      // helper applies exactly the scan side's NaN/zero normalization
      if (hll != null) hll.add(
        if (isFloat) java.lang.Float.valueOf(row.getFloat(ord))
        else java.lang.Double.valueOf(v))
      // dset: NaN IS a distinct value (one canonical value — boxed
      // Double.equals already collapses NaNs, matching Spark's
      // normalization) and +-0.0 collapse like Spark's group keys
      ds.add(if (java.lang.Double.isNaN(v)) java.lang.Double.NaN
        else if (v == 0.0d) 0.0d else v)
      if (java.lang.Double.isNaN(v)) { nan = true; return }
      if (n == 0) { mn = v; mx = v }
      else {
        if (java.lang.Double.compare(v, mn) < 0) mn = v
        if (java.lang.Double.compare(v, mx) > 0) mx = v
      }
      n += 1
    }
    def result(): ColResult = {
      val span =
        if (nan) None
        else if (n == 0) Some(None)
        // parquet-mr finalizes float/double column stats by widening a
        // zero min to -0.0 and a zero max to +0.0 (PARQUET-1246's ±0.0
        // ordering hedge) — mirror it so write-harvested spans are
        // byte-identical to footer-harvested ones
        else Some(Some((
          (if (mn == 0.0d) -0.0d else mn): Any,
          (if (mx == 0.0d) 0.0d else mx): Any)))
      ColResult(nulls, span, None, ds.result,
        Option(hll).map(_.words))
    }
  }

  /** Strings: UTF8String (unsigned byte order — parquet's binary
    * order and Spark's UTF8_BINARY collation). Extremes are CLONED:
    * the incoming row buffer is reused by the writer loop. */
  private final class StringAcc(ord: Int, hll: HllCol) extends Acc {
    private var nulls = 0L
    private var n = 0L
    private var mn: org.apache.spark.unsafe.types.UTF8String = null
    private var mx: org.apache.spark.unsafe.types.UTF8String = null
    private val ds = new DSet
    def update(row: InternalRow): Unit = {
      if (row.isNullAt(ord)) { nulls += 1; return }
      val v = row.getUTF8String(ord)
      if (hll != null) hll.add(v) // hash consumes, never retains
      if (n == 0) { mn = v.clone(); mx = v.clone() }
      else {
        if (v.compareTo(mn) < 0) mn = v.clone()
        if (v.compareTo(mx) > 0) mx = v.clone()
      }
      if (ds.wouldAdd(v)) ds.add(v.clone()) // clone only new values
      n += 1
    }
    def result(): ColResult = {
      val span =
        if (n == 0) Some(None)
        else Some(Some((mn.toString: Any, mx.toString: Any)))
      ColResult(nulls, span, None,
        ds.result.map(_.map(_.asInstanceOf[
          org.apache.spark.unsafe.types.UTF8String].toString)),
        Option(hll).map(_.words))
    }
  }

  /** Decimals: span + exact Σ as java.math.BigDecimal at the column's
    * scale; a Σ that no longer fits DECIMAL(38, s) is declined to
    * unknown (same contract as the scan-side harvest: recorded sums
    * are exact-or-absent, never clamped). */
  private final class DecimalAcc(ord: Int, precision: Int, scale: Int,
      hll: HllCol) extends Acc {
    private var nulls = 0L
    private var n = 0L
    private var mn: java.math.BigDecimal = null
    private var mx: java.math.BigDecimal = null
    private var s: java.math.BigDecimal = null
    private val ds = new DSet
    def update(row: InternalRow): Unit = {
      if (row.isNullAt(ord)) { nulls += 1; return }
      val d = row.getDecimal(ord, precision, scale)
      if (d == null) { nulls += 1; return }
      if (hll != null) hll.add(d)
      val v = d.toJavaBigDecimal
      ds.add(v) // all values share the column scale: value == repr
      if (n == 0) { mn = v; mx = v; s = v }
      else {
        if (v.compareTo(mn) < 0) mn = v
        if (v.compareTo(mx) > 0) mx = v
        s = s.add(v)
      }
      n += 1
    }
    def result(): ColResult = {
      val span =
        if (n == 0) Some(None)
        else Some(Some((mn.setScale(scale): Any, mx.setScale(scale): Any)))
      val sum =
        if (n == 0) Some(None)
        else {
          val t = s.setScale(scale)
          if (t.precision > 38) None else Some(Some(t))
        }
      ColResult(nulls, span, sum, ds.result,
        Option(hll).map(_.words))
    }
  }

  /** Null count only — atomic kinds a footer harvest also records
    * numNulls for but whose bounds it cannot normalize. */
  private final class NullsAcc(ord: Int) extends Acc {
    private var nulls = 0L
    def update(row: InternalRow): Unit =
      if (row.isNullAt(ord)) nulls += 1
    def result(): ColResult = ColResult(nulls, None, None)
  }

  private def mkAcc(spec: ColSpec): Acc = spec.kind match {
    case KByte | KShort | KInt | KLong =>
      new LongAcc(spec.ordinal, spec.kind, sumEligible = true, mkHll(spec))
    case KDate | KTsMicros | KTsMillis =>
      new LongAcc(spec.ordinal, spec.kind, sumEligible = false, mkHll(spec))
    case KFloat => new DoubleAcc(spec.ordinal, isFloat = true, mkHll(spec))
    case KDouble => new DoubleAcc(spec.ordinal, isFloat = false, mkHll(spec))
    case KString => new StringAcc(spec.ordinal, mkHll(spec))
    case KDecimal =>
      new DecimalAcc(spec.ordinal, spec.precision, spec.scale, mkHll(spec))
    case _ => new NullsAcc(spec.ordinal)
  }

  // ---- trackers -------------------------------------------------------

  private final class HarvestTaskTracker(specs: Seq[ColSpec])
      extends WriteTaskStatsTracker {
    private val done = mutable.Map.empty[String, FileHarvest]
    private var curFile: String = null
    private var curRows = 0L
    private var accs: Array[Acc] = null

    private def basename(p: String): String = {
      val i = p.lastIndexOf('/')
      if (i < 0) p else p.substring(i + 1)
    }
    private def flush(): Unit = if (curFile != null) {
      val cols = specs.iterator.zip(accs.iterator)
        .map { case (s, a) => s.logical -> a.result() }.toMap
      done(basename(curFile)) = FileHarvest(curRows, cols)
      curFile = null
      accs = null
    }
    override def newPartition(partitionValues: InternalRow): Unit = ()
    override def newFile(filePath: String): Unit = {
      flush()
      curFile = filePath
      curRows = 0L
      accs = specs.map(mkAcc).toArray
    }
    override def closeFile(filePath: String): Unit = flush()
    override def newRow(filePath: String, row: InternalRow): Unit = {
      curRows += 1
      var i = 0
      while (i < accs.length) { accs(i).update(row); i += 1 }
    }
    override def getFinalStats(taskCommitTime: Long): WriteTaskStats = {
      flush()
      HarvestStats(done.toMap)
    }
  }

  final class HarvestJobTracker(specs: Seq[ColSpec])
      extends WriteJobStatsTracker {
    @volatile private var collected: Map[String, FileHarvest] = Map.empty
    override def newTaskInstance(): WriteTaskStatsTracker =
      new HarvestTaskTracker(specs)
    override def processStats(stats: Seq[WriteTaskStats],
        jobCommitTime: Long): Unit =
      collected = stats.iterator
        .collect { case h: HarvestStats => h.byFile }
        .foldLeft(Map.empty[String, FileHarvest])(_ ++ _)
    /** Driver-side result after the job committed. */
    def byFile: Map[String, FileHarvest] = collected
  }

  // ---- the write ------------------------------------------------------

  /** Write `df` as parquet into `outDir` (fresh directory) through
    * Spark's own committer — same task-retry/speculation semantics as
    * `df.write.parquet` (it is the same code path underneath) — while
    * harvesting per-file stats for `specs` in the write tasks.
    * `options` reach both the hadoop conf (column-specific parquet
    * keys like bloom filters) and the format's prepareWrite, exactly
    * as the DataFrameWriter path plumbs them. Returns the harvest
    * keyed by written file basename. */
  def stageWrite(df: DataFrame, outDir: String,
      options: Map[String, String],
      specs: Seq[ColSpec]): Map[String, FileHarvest] = {
    val cds = df.asInstanceOf[org.apache.spark.sql.classic.Dataset[_]]
    val spark = cds.sparkSession
    val hadoopConf = spark.sessionState.newHadoopConfWithOptions(options)
    val committer = FileCommitProtocol.instantiate(
      spark.sessionState.conf.fileCommitProtocolClass,
      jobId = java.util.UUID.randomUUID().toString,
      outputPath = outDir)
    val tracker = new HarvestJobTracker(specs)
    SQLExecution.withNewExecutionId(cds.queryExecution) {
      FileFormatWriter.write(
        spark,
        cds.queryExecution.executedPlan,
        new ParquetFileFormat(),
        committer,
        FileFormatWriter.OutputSpec(outDir, Map.empty,
          cds.queryExecution.analyzed.output),
        hadoopConf,
        Seq.empty,
        None,
        Seq(tracker),
        options)
    }
    tracker.byFile
  }
}
