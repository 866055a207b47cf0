package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** File-level zone maps: a tiny at-rest manifest of per-file min/max
  * spans that lets a range-predicate scan decide WHICH FILES TO OPEN
  * before touching any parquet footer — the manifest-based scan
  * planning of the lakehouse table formats (Delta `stats`, Iceberg
  * manifests), rebuilt here over plain immutable parquet dirs.
  *
  * Parquet row-group stats already prune *row groups*, but only after
  * the reader has listed and opened every file's footer; at 100 TB a
  * table is millions of files and the footer-open round trips become
  * the scan-planning bottleneck. A zone-map sidecar is O(#files) rows
  * — KBs per million files per column — read in one tiny scan, and
  * the main read plans over just the surviving file list (footer
  * pruning still applies within them). Complements [[BloomPrune]]
  * (point-key sets) with range predicates, and [[ZOrder]] writes the
  * layout that makes these spans tight on multiple dimensions.
  *
  * Correctness contract: pruning is result-invisible. A file is
  * dropped only when its span PROVABLY excludes the predicate
  * (`max < lo` or `min > hi`, or the file has no non-null values);
  * the exact predicate is re-applied to the survivors, so rows can
  * never be added, only scans avoided. Staleness is loud, not silent:
  * the pruned read re-lists the dir and refuses to plan from a
  * manifest whose file set no longer matches.
  */
object ZoneMapIndex {

  /** Sidecar subdir name. The `_` prefix keeps Spark's own dir reads
    * from picking the manifest up as data. */
  val SidecarName = "_zonemap"

  /** Build (or rebuild) the manifest for `cols` over every file of a
    * parquet dir: ONE distributed aggregate grouped by file — no
    * driver-side footer walking — writing one row per file with
    * `n_rows` and `min_<c>`/`max_<c>` per indexed column. Re-run after
    * any layout change ([[Compact]], [[TargetedDelete]], appends). */
  def build(spark: SparkSession, dir: String, cols: Seq[String]): Unit = {
    require(cols.nonEmpty, "ZoneMapIndex: no columns to index")
    val live = listLive(spark, dir)
    val manifest = spans(spark,
      live.map(n => s"$dir/$n"), cols, live)
    manifest.coalesce(1).write.mode("overwrite")
      .parquet(s"$dir/$SidecarName")
  }

  /** INCREMENTAL maintenance for append-mostly dirs: index only the
    * files the manifest doesn't know (reading just their bytes) and
    * drop rows for vanished files — never rescanning already-indexed
    * data. The steady-state cost of keeping zone maps fresh is thus
    * O(delta bytes) + an O(#files) listing, not a full-table rebuild;
    * after a REWRITING layout change ([[Compact]], [[TargetedDelete]],
    * [[ZOrder]]) the file names change, which this sees as
    * vanished+new — correct, and automatically a full rebuild exactly
    * when one is warranted. Returns (newlyIndexed, dropped). */
  def refresh(spark: SparkSession, dir: String): (Int, Int) = {
    val m = spark.read.parquet(s"$dir/$SidecarName")
    val cols = m.columns.filter(_.startsWith("min_"))
      .map(_.stripPrefix("min_")).toSeq
    val live = listLive(spark, dir)
    val indexed = m.select(col("file")).collect()
      .map(_.getString(0)).toSet
    val fresh = live.filterNot(indexed)
    val vanished = indexed -- live.toSet
    if (fresh.isEmpty && vanished.isEmpty) return (0, 0)
    val kept = m.where(!col("file").isInCollection(vanished))
    val full =
      if (fresh.isEmpty) kept
      else kept.unionByName(
        spans(spark, fresh.map(n => s"$dir/$n"), cols, fresh))
    // same temp+rename discipline as the engine's other swaps: the
    // sidecar dir is replaced only after the new manifest is complete
    val out = full.coalesce(1).localCheckpoint() // sever the self-read
    out.write.mode("overwrite").parquet(s"$dir/$SidecarName")
    (fresh.size, vanished.size)
  }

  /** One row per file of `paths`: n_rows + min/max per indexed column.
    * ONE distributed aggregate grouped by file — no driver footer
    * walking. `expected` backfills ZERO-ROW part files (no group from
    * the agg, but the file exists) with a null span, so the staleness
    * check can tell "empty file" from "file written after the build". */
  private def spans(spark: SparkSession, paths: Seq[String],
      cols: Seq[String], expected: Seq[String]): DataFrame = {
    val aggs = cols.flatMap { c =>
      Seq(min(col(c)).as(s"min_$c"), max(col(c)).as(s"max_$c"))
    }
    val manifest = spark.read.parquet(paths: _*)
      .groupBy(input_file_name().as("__uri"))
      .agg(count(lit(1)).as("n_rows"), aggs: _*)
      .withColumn("file", udf(fileNameOf _).apply(col("__uri")))
      .drop("__uri")
    val have = manifest.select(col("file")).collect()
      .map(_.getString(0)).toSet
    val empties = expected.filterNot(have)
    if (empties.isEmpty) manifest else {
      val rows = empties.map { name =>
        org.apache.spark.sql.Row.fromSeq(
          0L +: Seq.fill(2 * cols.size)(null) :+ name)
      }
      manifest.unionByName(spark.createDataFrame(
        new java.util.ArrayList(java.util.Arrays.asList(rows: _*)),
        manifest.schema))
    }
  }

  private def listLive(spark: SparkSession, dir: String): Seq[String] = {
    import org.apache.hadoop.fs.Path
    val root = new Path(dir)
    val fs = root.getFileSystem(spark.sessionState.newHadoopConf())
    fs.listStatus(root).filter(_.isFile).map(_.getPath.getName)
      .filterNot(n => n.startsWith("_") || n.startsWith(".")).toSeq
  }

  /** input_file_name() is a URI (percent-escaped); manifest rows store
    * the DECODED simple name so they compare equal to FileSystem
    * listings (the [[TargetedDelete]] discipline). */
  private def fileNameOf(uri: String): String =
    try new org.apache.hadoop.fs.Path(new java.net.URI(uri)).getName
    catch {
      case _: java.net.URISyntaxException =>
        new org.apache.hadoop.fs.Path(uri).getName
    }

  /** The file names whose spans overlap [lo, hi] on `column` — the
    * manifest-side half of [[prunedRead]], exposed for specs and for
    * callers composing their own reads. Files with a NULL span (no
    * non-null values of `column`) cannot satisfy a range predicate and
    * are pruned. The collect is O(#surviving files) — the same class
    * of driver state as any scan's file listing. */
  def candidateFiles(
      spark: SparkSession, dir: String, column: String,
      lo: Any, hi: Any): Seq[String] = {
    val m = spark.read.parquet(s"$dir/$SidecarName")
    require(m.columns.contains(s"min_$column"),
      s"ZoneMapIndex: column $column is not indexed in $dir/$SidecarName")
    m.where(col(s"min_$column").isNotNull &&
        col(s"max_$column") >= lit(lo) && col(s"min_$column") <= lit(hi))
      .select(col("file")).collect().map(_.getString(0)).toSeq
  }

  /** Range scan planned from the manifest: read the sidecar, prune the
    * file list, read ONLY the surviving files, re-apply the exact
    * predicate. Refuses a stale manifest (file set drifted from the
    * dir) with a loud error — silent staleness could drop rows. */
  def prunedRead(
      spark: SparkSession, dir: String, column: String,
      lo: Any, hi: Any): DataFrame = {
    import org.apache.hadoop.fs.Path
    val root = new Path(dir)
    val fs = root.getFileSystem(spark.sessionState.newHadoopConf())
    val live = fs.listStatus(root).filter(_.isFile).map(_.getPath.getName)
      .filterNot(n => n.startsWith("_") || n.startsWith(".")).toSet
    val indexed = spark.read.parquet(s"$dir/$SidecarName")
      .select(col("file")).collect().map(_.getString(0)).toSet
    if (indexed != live)
      throw new IllegalStateException(
        s"ZoneMapIndex: manifest at $dir/$SidecarName is stale " +
          s"(${(live -- indexed).size} unindexed / " +
          s"${(indexed -- live).size} vanished files) — rebuild first")
    val pred = col(column).isNotNull &&
      col(column) >= lit(lo) && col(column) <= lit(hi)
    val files = candidateFiles(spark, dir, column, lo, hi)
    if (files.isEmpty) spark.read.parquet(dir).where(pred).limit(0)
    else spark.read.parquet(files.map(f => s"$dir/$f"): _*).where(pred)
  }
}
