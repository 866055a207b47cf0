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
    val aggs = cols.flatMap { c =>
      Seq(min(col(c)).as(s"min_$c"), max(col(c)).as(s"max_$c"))
    }
    val manifest = spark.read.parquet(dir)
      .groupBy(input_file_name().as("__uri"))
      .agg(count(lit(1)).as("n_rows"), aggs: _*)
      .withColumn("file", udf(fileNameOf _).apply(col("__uri")))
      .drop("__uri")
    // A ZERO-ROW part file produces no group above but still exists on
    // disk; index it with an empty span (n_rows 0, null min/max — which
    // prunedRead prunes) so the staleness check can tell "empty file"
    // from "file written after the build". The name collect is
    // O(#files), the same driver state as the staleness listing.
    import org.apache.hadoop.fs.Path
    val root = new Path(dir)
    val fs = root.getFileSystem(spark.sessionState.newHadoopConf())
    val live = fs.listStatus(root).filter(_.isFile).map(_.getPath.getName)
      .filterNot(n => n.startsWith("_") || n.startsWith("."))
    val have = manifest.select(col("file")).collect()
      .map(_.getString(0)).toSet
    val empties = live.filterNot(have).toSeq
    val full = if (empties.isEmpty) manifest else {
      val rows = empties.map { name =>
        org.apache.spark.sql.Row.fromSeq(
          0L +: Seq.fill(2 * cols.size)(null) :+ name)
      }
      manifest.unionByName(spark.createDataFrame(
        new java.util.ArrayList(java.util.Arrays.asList(rows: _*)),
        manifest.schema))
    }
    full.coalesce(1).write.mode("overwrite")
      .parquet(s"$dir/$SidecarName")
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
