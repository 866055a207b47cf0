package graft.operators

import org.apache.hadoop.conf.Configuration
import org.apache.hadoop.fs.{FileSystem, Path}
import org.apache.parquet.hadoop.ParquetFileReader
import org.apache.parquet.hadoop.util.HadoopInputFile
import org.apache.parquet.schema.LogicalTypeAnnotation
import org.apache.parquet.schema.PrimitiveType.PrimitiveTypeName
import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Versioned parquet table with a commit log and time-travel reads —
  * the manifest/transaction layer [[TargetedDelete]]'s scaladoc defers
  * to ("snapshot isolation across files needs a manifest/transaction
  * log (Delta/Iceberg-style) layered above"). A table directory holds
  * immutable data files plus a `_graft_log/` of full-snapshot
  * manifests; readers resolve a version's exact file list from ONE
  * manifest and never race a writer.
  *
  * Layout:
  * {{{
  *   table/
  *     v00000-part-....parquet     // data files, immutable once committed
  *     v00001-part-....parquet
  *     _graft_log/
  *       v00000.manifest           // full file list of version 0
  *       v00001.manifest           // full file list of version 1
  * }}}
  *
  * Commit protocol (the ACID story, same discipline as the engine's
  * other at-rest ops):
  *   1. STAGE — write the batch with Spark's own committer into a
  *      hidden sibling dir (unique per attempt), so task retries/
  *      speculation are already handled below us, and two concurrent
  *      committers can never collide in staging.
  *   2. PUBLISH — per-file metadata renames into the table root under
  *      the version prefix. Data files are invisible to versioned
  *      readers until a manifest references them.
  *   3. COMMIT — write the manifest to a temp name and rename it into
  *      `_graft_log/`. The rename IS the commit point: a crash before
  *      it leaves orphaned data files (cleaned by [[vacuumUnreferenced]]
  *      after a TTL) and the table state unchanged; after it, the
  *      version is durable.
  *
  * CONCURRENCY is optimistic (Delta's check-and-retry on a
  * rename-detecting filesystem): a committer that loses the manifest
  * race re-resolves the new latest version, re-prefixes its already
  * published files to the next version number (O(#files) metadata
  * renames — the data never moves), recomputes the carried file list
  * against the winner's manifest, and retries, bounded by
  * `maxRetries`. Blind appends/overwrites are commutative so the
  * retry is serializable; predicate deletes ([[deleteWhere]]) instead
  * restart their whole discovery — their carried set depends on data
  * a concurrent winner may have changed.
  *
  * Manifests are FULL snapshots (every live file of that version), so
  * a read resolves from exactly one manifest — no log replay. Each
  * file line also carries its row count and per-column min/max spans
  * harvested from the parquet FOOTER at commit time (no extra data
  * scan — the writer already put the stats there): [[prunedRead]]
  * plans a range scan from the manifest alone, the Delta `stats` /
  * Iceberg-manifest design, composing time travel with
  * [[ZoneMapIndex]]-style file skipping without a separately
  * refreshed sidecar. The log grows O(versions × files-per-version);
  * [[expire]] drops old versions and deletes the files only they
  * reference. At 100 TB the listing cost a reader pays is ONE
  * small-file read instead of a recursive directory walk.
  *
  * Reads go through [[read]]: a bare `spark.read.parquet(table/)`
  * would see the union of ALL versions' files. The manifest's file
  * list feeds a plain parquet scan, so column pruning and predicate
  * pushdown are untouched.
  */
object VersionedTable {

  private val LogDir = "_graft_log"
  private val Header = "graft-vt-v3"
  private val HeaderV2 = "graft-vt-v2"

  /** One manifest line: file name, row count (−1 when unknown — files
    * carried from a pre-v3 manifest), and per-stats-column span.
    * `stats` key absent → stats were never collected for that column
    * (the file can never be pruned on it); `None` → collected and the
    * column is entirely null in the file (provably excluded from any
    * range predicate); `Some((min, max))` → the span, normalized to
    * Long / Double / String. */
  final case class FileEntry(name: String, nRows: Long,
      stats: Map[String, Option[(Any, Any)]])

  /** Commit `df` as the next version. `overwrite=true` makes the new
    * version exactly `df`; `overwrite=false` appends to the previous
    * version's files (zero data movement for history — the new
    * manifest lists old + new files). Returns the committed version.
    *
    * `txnId` makes the commit IDEMPOTENT: if any manifest already
    * carries the same id, the data is not even staged and that version
    * is returned. This is what closes the streaming exactly-once gap —
    * a micro-batch replayed after its commit landed but before Spark's
    * checkpoint advanced (the crash window foreachBatch docs call out)
    * re-offers the same batchId and becomes a no-op instead of a
    * double-append. The id check is O(versions) against the already-
    * listed log — no extra I/O class.
    *
    * `statsCols` are the columns whose per-file min/max go into the
    * manifest (harvested from parquet footers — O(#new files) driver
    * metadata reads, no data scan). Empty = inherit the previous
    * manifest's stats columns, so one declaration at table creation
    * keeps every later append/compaction/delete pruned the same way. */
  def commit(df: DataFrame, path: String, overwrite: Boolean,
      txnId: Option[String] = None, statsCols: Seq[String] = Seq.empty,
      maxRetries: Int = 5): Int =
    commitImpl(df, path, overwrite, txnId, statsCols, maxRetries, () => ())

  /** [[commit]] with a fault-injection seam invoked between PUBLISH
    * and COMMIT — the window where a concurrent committer can win the
    * manifest race. Specs use it to interleave two writers
    * deterministically. */
  private[graft] def commitImpl(df: DataFrame, path: String,
      overwrite: Boolean, txnId: Option[String], statsCols: Seq[String],
      maxRetries: Int, onBeforeManifestCommit: () => Unit): Int = {
    require(txnId.forall(t => t.nonEmpty && !t.exists(_ < ' ')),
      s"txnId must be non-empty printable text: $txnId")
    val spark = df.sparkSession
    val root = new Path(path)
    val conf = spark.sessionState.newHadoopConf()
    val fs = root.getFileSystem(conf)
    fs.mkdirs(new Path(root, LogDir))
    val committed = versions(spark, path)
    txnId.foreach { t =>
      committed.find(_.txnId.contains(t)).foreach(v => return v.version)
    }
    val prev = committed.lastOption.map(_.version)
    val v0 = prev.map(_ + 1).getOrElse(0)
    val published = stageAndPublish(df, fs, root, v0)
    val cols = resolveStatsCols(spark, path, prev, statsCols)
    val newEntries = published.map(n =>
      footerEntry(fs, conf, new Path(root, n), cols))

    // not @tailrec: the non-local txn-idempotence return blocks the
    // optimization; depth is bounded by maxRetries (tiny)
    def attempt(v: Int, entries: Seq[FileEntry],
        triesLeft: Int): Int = {
      val latest = versions(spark, path).lastOption
      // Idempotence must hold across the retry too: if the same txnId
      // landed concurrently, our staged files are debris — drop them.
      txnId.foreach { t =>
        versions(spark, path).find(_.txnId.contains(t)).foreach { w =>
          entries.foreach(e => fs.delete(new Path(root, e.name), false))
          return w.version
        }
      }
      val carried =
        if (overwrite) Seq.empty
        else latest.map(l => readEntries(spark, path, l.version))
          .getOrElse(Seq.empty)
      onBeforeManifestCommit()
      if (tryWriteManifest(fs, root, v,
          if (overwrite) "overwrite" else "append", txnId, cols,
          carried ++ entries)) v
      else if (triesLeft <= 0)
        throw new IllegalStateException(
          s"versioned commit at $path lost the manifest race " +
            s"$maxRetries times — giving up (staged files remain for " +
            "vacuumUnreferenced)")
      else {
        val v2 = versions(spark, path).lastOption.map(_.version + 1)
          .getOrElse(0)
        attempt(v2, reprefix(fs, root, entries, v, v2), triesLeft - 1)
      }
    }
    attempt(v0, newEntries, maxRetries)
  }

  /** Row-level DELETE as a NEW VERSION (the [[TargetedDelete]]
    * semantics lifted onto the commit log): rewrite ONLY the files
    * that contain a matching row, carry every untouched file forward
    * BY REFERENCE (no data movement, stats intact), and commit the
    * result as the next version. The prior version stays
    * time-travelable until [[expire]]; a crash anywhere leaves the
    * table at the old version with orphaned staging debris for
    * [[vacuumUnreferenced]] — there is no in-place mutation to repair.
    *
    * Rows where `predicate` is TRUE are removed (SQL WHERE-delete
    * semantics: a NULL predicate keeps the row). Discovery is one scan
    * of the current version projecting only the predicate's columns —
    * parquet footer stats and bloom filters prune it the same way they
    * prune any read. Returns the new version, or the CURRENT version
    * untouched when nothing matches (a no-op delete commits nothing).
    *
    * On a manifest-race loss the whole delete restarts (bounded):
    * unlike a blind append, its carried set and rewrites depend on
    * data a concurrent winner may have changed, so re-running
    * discovery is the only serializable retry. */
  def deleteWhere(spark: SparkSession, path: String, predicate: Column,
      txnId: Option[String] = None, maxRetries: Int = 5): Int = {
    val root = new Path(path)
    val conf = spark.sessionState.newHadoopConf()
    val fs = root.getFileSystem(conf)
    var triesLeft = maxRetries
    while (true) {
      val committed = versions(spark, path)
      txnId.foreach { t =>
        committed.find(_.txnId.contains(t)).foreach(v => return v.version)
      }
      val v = committed.lastOption.map(_.version).getOrElse(
        throw new IllegalStateException(s"no committed versions at $path"))
      val entries = readEntries(spark, path, v)
      if (entries.isEmpty) return v
      val all = entries.map(e => s"$path/${e.name}")
      val touched = spark.read.parquet(all: _*)
        .where(predicate)
        .select(input_file_name().as("f"))
        .distinct().collect().map(r => uriFileName(r.getString(0))).toSet
      if (touched.isEmpty) return v
      val (rewrite, carried) = entries.partition(e => touched(e.name))
      val survivors = spark.read
        .parquet(rewrite.map(e => s"$path/${e.name}"): _*)
        .where(!coalesce(predicate, lit(false)))
      val v2 = v + 1
      val published = stageAndPublish(survivors, fs, root, v2)
      val cols = resolveStatsCols(spark, path, Some(v), Seq.empty)
      val newEntries = published.map(n =>
        footerEntry(fs, conf, new Path(root, n), cols))
      if (tryWriteManifest(fs, root, v2, "delete", txnId, cols,
          carried ++ newEntries)) return v2
      // lost the race: drop our rewrites (vacuum-class debris swept
      // eagerly) and re-run discovery against the winner's version
      published.foreach(n => fs.delete(new Path(root, n), false))
      triesLeft -= 1
      if (triesLeft < 0) throw new IllegalStateException(
        s"versioned delete at $path lost the manifest race " +
          s"$maxRetries times — giving up")
    }
    -1 // unreachable
  }

  /** Read a version (default: latest). Fails loudly on a version that
    * was never committed — an uncommitted crash leaves no manifest. */
  def read(spark: SparkSession, path: String,
      asOfVersion: Option[Int] = None): DataFrame = {
    val v = asOfVersion.orElse(latestVersion(spark, path)).getOrElse(
      throw new IllegalStateException(s"no committed versions at $path"))
    val fl = files(spark, path, v)
    if (fl.isEmpty) spark.emptyDataFrame
    else spark.read.parquet(fl.map(n => s"$path/$n"): _*)
  }

  /** Range scan planned from the MANIFEST alone: resolve the version's
    * file entries, drop every file whose recorded span provably
    * excludes `[lo, hi]` on `column` (or whose column is entirely
    * null), read ONLY the survivors, and re-apply the exact predicate
    * — result-invisible by construction, composable with time travel
    * (`asOfVersion`), zero sidecar refresh (stats live in the commit
    * that wrote the files). Files committed without stats for `column`
    * are conservatively kept. */
  def prunedRead(spark: SparkSession, path: String, column: String,
      lo: Any, hi: Any, asOfVersion: Option[Int] = None): DataFrame = {
    val v = asOfVersion.orElse(latestVersion(spark, path)).getOrElse(
      throw new IllegalStateException(s"no committed versions at $path"))
    val entries = readEntries(spark, path, v)
    val pred = col(column).isNotNull &&
      col(column) >= lit(lo) && col(column) <= lit(hi)
    val keep = pruneEntries(entries, column, lo, hi)
    if (entries.isEmpty) spark.emptyDataFrame
    else if (keep.isEmpty)
      read(spark, path, Some(v)).where(pred).limit(0)
    else spark.read.parquet(keep.map(e => s"$path/${e.name}"): _*)
      .where(pred)
  }

  /** The manifest-side pruning decision of [[prunedRead]], exposed for
    * specs and for callers composing their own reads: the entries of
    * `entries` a range predicate `[lo, hi]` on `column` might match. */
  def pruneEntries(entries: Seq[FileEntry], column: String,
      lo: Any, hi: Any): Seq[FileEntry] =
    entries.filter { e =>
      e.stats.get(column) match {
        case None => true // stats never collected: cannot prune
        case Some(None) => false // all-null column: no range match
        case Some(Some((mn, mx))) =>
          // conservative on any comparison we cannot make
          cmp(mx, lo).forall(_ >= 0) && cmp(mn, hi).forall(_ <= 0)
      }
    }

  final case class VersionInfo(version: Int, mode: String,
      txnId: Option[String], nFiles: Int)

  /** All committed versions, ascending, with mode, transaction id and
    * file count — the audit listing (`DESCRIBE HISTORY` analog). */
  def versions(spark: SparkSession, path: String): Seq[VersionInfo] = {
    val root = new Path(path)
    val fs = root.getFileSystem(spark.sessionState.newHadoopConf())
    val log = new Path(root, LogDir)
    if (!fs.exists(log)) return Seq.empty
    fs.listStatus(log).map(_.getPath.getName)
      .filter(_.matches("v\\d{5}\\.manifest")).sorted.map { n =>
        val v = n.stripPrefix("v").stripSuffix(".manifest").toInt
        val lines = readLines(fs, new Path(log, n))
        val headerLines = if (lines.head == Header) 4 else 3
        VersionInfo(v, lines(1),
          Option(lines(2).stripPrefix("txn:")).filter(_ != "-"),
          lines.size - headerLines)
      }.toSeq
  }

  /** Drop all but the last `keepLast` versions: delete their manifests
    * and every data file no RETAINED version references. Time travel
    * to an expired version then fails loudly (manifest gone) instead
    * of returning partial data. */
  def expire(spark: SparkSession, path: String, keepLast: Int): Unit = {
    require(keepLast >= 1, s"keepLast must be >= 1: $keepLast")
    val root = new Path(path)
    val fs = root.getFileSystem(spark.sessionState.newHadoopConf())
    val all = versions(spark, path).map(_.version)
    val (drop, keep) = all.splitAt(math.max(0, all.size - keepLast))
    if (drop.isEmpty) return
    val retained = keep.flatMap(v => files(spark, path, v)).toSet
    val dead = drop.flatMap(v => files(spark, path, v)).toSet -- retained
    dead.foreach(n => fs.delete(new Path(root, n), false))
    drop.foreach(v => fs.delete(
      new Path(root, f"$LogDir/v$v%05d.manifest"), false))
  }

  /** OPTIMIZE: rewrite the latest version's (typically many small,
    * per-batch) files into ~`targetFileBytes` files, committed as a
    * new OVERWRITE version — so compaction is ROLLBACK-ABLE (the
    * pre-compaction version stays time-travelable until [[expire]])
    * and never races readers (they hold a manifest). The streaming
    * sink's natural failure mode — one small file per micro-batch —
    * is repaired by running this periodically; [[Compact]] is the
    * equivalent for plain dirs, where the swap must be in-place.
    *
    * `clusterBy` is OPTIMIZE ... ZORDER BY as a versioned commit: one
    * column range-clusters + sorts (tight single-dim spans, any
    * orderable type), 2-4 columns route through [[ZOrder]]'s
    * bit-interleaved curve (NUMERIC dimensions — ZOrder's quantile
    * bucketing contract) so the per-file spans stay tight on EVERY
    * listed dimension. Because the
    * manifest re-harvests footer stats for the rewritten files, a
    * clustered compaction directly upgrades [[prunedRead]]'s file
    * skipping — the Delta OPTIMIZE ZORDER loop, commit-logged and
    * rollback-able here. */
  def compact(spark: SparkSession, path: String,
      targetFileBytes: Long = 128L * 1024 * 1024,
      clusterBy: Seq[String] = Seq.empty): Int = {
    require(targetFileBytes > 0, s"bad target: $targetFileBytes")
    val root = new Path(path)
    val fs = root.getFileSystem(spark.sessionState.newHadoopConf())
    val v = latestVersion(spark, path).getOrElse(
      throw new IllegalStateException(s"no committed versions at $path"))
    val bytes = files(spark, path, v)
      .map(n => fs.getFileStatus(new Path(root, n)).getLen).sum
    val nOut = math.max(1, math.ceil(bytes.toDouble / targetFileBytes).toInt)
    val base = read(spark, path, Some(v))
    val clustered =
      if (clusterBy.isEmpty) base.repartition(nOut)
      else if (clusterBy.size == 1)
        base.repartitionByRange(nOut, col(clusterBy.head))
          .sortWithinPartitions(clusterBy.head)
      else
        base.withColumn("__z", ZOrder.zValue(base, clusterBy, 256))
          .repartitionByRange(nOut, col("__z"))
          .sortWithinPartitions("__z")
          .drop("__z")
    commit(clustered, path, overwrite = true)
  }

  /** INCREMENTAL consumption: the rows ADDED after `fromVersion` (up
    * to `toVersion`, default latest) — resolved as the FILE DIFF of
    * the two manifests, so the read costs O(delta), never a rescan of
    * history. This is what a downstream pipeline polls between runs
    * ("give me what landed since my last watermark version") and what
    * a backfill replays commit by commit.
    *
    * Sound only while every intervening commit is an APPEND (files
    * strictly accumulate, so new files ⇔ new rows); an overwrite,
    * delete, or compaction in the window makes the file diff no
    * longer row-level adds, and the call refuses LOUDLY rather than
    * return wrong rows — re-baseline from a full read of the newer
    * version instead. */
  def readAppendsSince(spark: SparkSession, path: String,
      fromVersion: Int, toVersion: Option[Int] = None): DataFrame = {
    val to = toVersion.orElse(latestVersion(spark, path)).getOrElse(
      throw new IllegalStateException(s"no committed versions at $path"))
    require(to >= fromVersion,
      s"toVersion $to precedes fromVersion $fromVersion")
    val window = versions(spark, path)
      .filter(v => v.version > fromVersion && v.version <= to)
    val nonAppend = window.filterNot(_.mode == "append")
    require(nonAppend.isEmpty,
      s"readAppendsSince($fromVersion, $to) at $path crosses " +
        s"non-append commits ${nonAppend.map(v => s"v${v.version}:${v.mode}")
          .mkString(",")} — the file diff is not row-level adds; " +
        "re-baseline from a full read")
    val before = files(spark, path, fromVersion).toSet
    val added = files(spark, path, to).filterNot(before)
    if (added.isEmpty) read(spark, path, Some(to)).limit(0)
    else spark.read.parquet(added.map(n => s"$path/$n"): _*)
  }

  /** Delete data files referenced by NO manifest and older than
    * `ttlMs` — the debris of a crash between PUBLISH and COMMIT. TTL
    * semantics as in [[Vacuum]]: age is the only signal that no
    * writer is coming back. */
  def vacuumUnreferenced(spark: SparkSession, path: String,
      ttlMs: Long): Seq[String] = {
    val root = new Path(path)
    val fs = root.getFileSystem(spark.sessionState.newHadoopConf())
    val referenced = versions(spark, path)
      .flatMap(v => files(spark, path, v.version)).toSet
    val now = System.currentTimeMillis()
    fs.listStatus(root).filter(_.isFile).filter { st =>
      val n = st.getPath.getName
      n.matches("v\\d{5}-.*") && !referenced.contains(n) &&
        now - st.getModificationTime > ttlMs
    }.map { st =>
      fs.delete(st.getPath, false); st.getPath.getName
    }.toSeq
  }

  private def latestVersion(spark: SparkSession, path: String): Option[Int] =
    versions(spark, path).lastOption.map(_.version)

  /** The exact file list of a committed version. */
  def files(spark: SparkSession, path: String, version: Int): Seq[String] =
    readEntries(spark, path, version).map(_.name)

  /** The file entries (names + row counts + stats spans) of a
    * committed version. Pre-v3 manifests yield entries with unknown
    * row counts and no stats — readable, never prunable. */
  def readEntries(spark: SparkSession, path: String,
      version: Int): Seq[FileEntry] = {
    val root = new Path(path)
    val fs = root.getFileSystem(spark.sessionState.newHadoopConf())
    val mf = new Path(root, f"$LogDir/v$version%05d.manifest")
    require(fs.exists(mf),
      s"version $version was never committed (or expired) at $path")
    val lines = readLines(fs, mf)
    lines.headOption match {
      case Some(Header) =>
        val cols = lines(3).stripPrefix("stats:") match {
          case "-" => Seq.empty[String]
          case s => s.split(',').toSeq
        }
        lines.drop(4).map(parseEntry(_, cols))
      case Some(HeaderV2) =>
        lines.drop(3).map(FileEntry(_, -1L, Map.empty))
      case _ => throw new IllegalStateException(s"bad manifest $mf")
    }
  }

  // ---- commit internals ----------------------------------------------

  /** STAGE df via Spark's committer into a unique hidden sibling, then
    * PUBLISH each part under the `v<N>-` prefix in the table root.
    * Returns the published names. */
  private def stageAndPublish(df: DataFrame, fs: FileSystem, root: Path,
      v: Int): Seq[String] = {
    val stage = new Path(root.getParent,
      s".${root.getName}__vt_stage_${java.util.UUID.randomUUID}")
    df.write.mode("overwrite").parquet(stage.toString)
    val staged = fs.listStatus(stage).filter(_.isFile)
      .map(_.getPath).filterNot(p =>
        p.getName.startsWith("_") || p.getName.startsWith("."))
    val published = staged.map { p =>
      val name = f"v$v%05d-${p.getName}"
      require(fs.rename(p, new Path(root, name)),
        s"versioned commit: publish $p -> $name failed")
      name
    }.toSeq.sorted
    fs.delete(stage, true)
    published
  }

  /** Move already-published files from version prefix `from` to `to`
    * after a lost manifest race — O(#files) metadata renames. */
  private def reprefix(fs: FileSystem, root: Path, entries: Seq[FileEntry],
      from: Int, to: Int): Seq[FileEntry] =
    entries.map { e =>
      val bare = e.name.stripPrefix(f"v$from%05d-")
      val name = f"v$to%05d-$bare"
      require(fs.rename(new Path(root, e.name), new Path(root, name)),
        s"versioned commit: reprefix ${e.name} -> $name failed")
      e.copy(name = name)
    }

  /** Stats columns for a commit: explicit wins; otherwise inherit from
    * the previous manifest so the table's index stays live across
    * appends/compactions/deletes without re-declaration. */
  private def resolveStatsCols(spark: SparkSession, path: String,
      prev: Option[Int], statsCols: Seq[String]): Seq[String] = {
    require(statsCols.forall(c => c.nonEmpty &&
        !c.exists(ch => ch == ',' || ch == '\t' || ch < ' ')),
      s"bad stats column names: $statsCols")
    if (statsCols.nonEmpty) statsCols
    else prev.map { v =>
      val root = new Path(path)
      val fs = root.getFileSystem(spark.sessionState.newHadoopConf())
      val lines = readLines(fs, new Path(root, f"$LogDir/v$v%05d.manifest"))
      if (lines.head == Header && lines(3) != "stats:-")
        lines(3).stripPrefix("stats:").split(',').toSeq
      else Seq.empty
    }.getOrElse(Seq.empty)
  }

  /** Build a [[FileEntry]] from the parquet FOOTER of a just-published
    * file: row count plus min/max per stats column, merged across row
    * groups. Metadata-only — the footer is read, never the data (the
    * Iceberg design: the writer already computed these stats). Columns
    * whose physical type we do not normalize (nested, decimal, int96)
    * or whose chunks lack statistics are recorded as not-collected —
    * readable, never prunable. */
  private def footerEntry(fs: FileSystem, conf: Configuration, p: Path,
      cols: Seq[String]): FileEntry = {
    if (cols.isEmpty) {
      // row count still comes from the footer; skip column stats work
      val r = ParquetFileReader.open(HadoopInputFile.fromPath(p, conf))
      try return FileEntry(p.getName, r.getRecordCount, Map.empty)
      finally r.close()
    }
    val reader = ParquetFileReader.open(HadoopInputFile.fromPath(p, conf))
    try {
      val footer = reader.getFooter
      val schema = footer.getFileMetaData.getSchema
      val blocks = footer.getBlocks
      import scala.jdk.CollectionConverters._
      val nRows = blocks.asScala.map(_.getRowCount).sum
      val stats = cols.flatMap { c =>
        if (!schema.containsField(c) ||
            !schema.getType(Seq(c): _*).isPrimitive)
          None
        else {
          val prim = schema.getType(Seq(c): _*).asPrimitiveType
          val chunks = blocks.asScala.map(_.getColumns.asScala
            .find(_.getPath.toDotString == c))
          if (chunks.exists(_.isEmpty)) None
          else {
            val sts = chunks.map(_.get.getStatistics)
            if (sts.exists(s => s == null ||
                (!s.hasNonNullValue && !s.isNumNullsSet))) None
            else {
              val spans = sts.filter(_.hasNonNullValue).flatMap { s =>
                for {
                  mn <- normalize(prim, s.genericGetMin.asInstanceOf[AnyRef])
                  mx <- normalize(prim, s.genericGetMax.asInstanceOf[AnyRef])
                } yield (mn, mx)
              }
              if (sts.exists(s => s.hasNonNullValue) &&
                  spans.size != sts.count(_.hasNonNullValue))
                None // some chunk's type we cannot normalize
              else if (spans.isEmpty) Some(c -> None) // all-null column
              else Some(c -> Some((
                spans.map(_._1).reduce((a, b) =>
                  if (cmp(a, b).exists(_ <= 0)) a else b),
                spans.map(_._2).reduce((a, b) =>
                  if (cmp(a, b).exists(_ >= 0)) a else b))))
            }
          }
        }
      }.toMap
      FileEntry(p.getName, nRows, stats)
    } finally reader.close()
  }

  /** Normalize a parquet statistics value to Long / Double / String.
    * DATE (epoch days) and TIMESTAMP (epoch micros) columns normalize
    * through their physical ints — pruning on them compares in those
    * units. Decimals and int96 are not normalized (None → stat not
    * collected). */
  private def normalize(prim: org.apache.parquet.schema.PrimitiveType,
      v: AnyRef): Option[Any] = {
    val logical = prim.getLogicalTypeAnnotation
    prim.getPrimitiveTypeName match {
      case _ if logical.isInstanceOf[
        LogicalTypeAnnotation.DecimalLogicalTypeAnnotation] => None
      case PrimitiveTypeName.INT32 => Some(v.asInstanceOf[Number].longValue)
      case PrimitiveTypeName.INT64 => Some(v.asInstanceOf[Number].longValue)
      case PrimitiveTypeName.FLOAT =>
        Some(v.asInstanceOf[Number].doubleValue)
      case PrimitiveTypeName.DOUBLE =>
        Some(v.asInstanceOf[Number].doubleValue)
      case PrimitiveTypeName.BINARY if logical.isInstanceOf[
          LogicalTypeAnnotation.StringLogicalTypeAnnotation] =>
        Some(v.asInstanceOf[org.apache.parquet.io.api.Binary]
          .toStringUsingUTF8)
      case _ => None
    }
  }

  /** Three-way compare of normalized span values against a caller
    * bound; None when the pair is incomparable (pruning then keeps the
    * file — conservative). Numeric cross-type compares go through
    * BigDecimal so `Long` spans test correctly against `Int`/`Double`
    * bounds. */
  private def cmp(a: Any, b: Any): Option[Int] = (a, b) match {
    case (x: String, y: String) => Some(x.compareTo(y))
    case (x: Number, y: Number) =>
      Some(new java.math.BigDecimal(x.toString)
        .compareTo(new java.math.BigDecimal(y.toString)))
    case _ => None
  }

  private def encode(v: Any): String = v match {
    case l: Long => s"L$l"
    case d: Double => s"D$d"
    case s: String =>
      "S" + java.net.URLEncoder.encode(s, "UTF-8")
    case other => throw new IllegalStateException(
      s"unencodable span value: $other")
  }

  private def decode(s: String): Any = s.charAt(0) match {
    case 'L' => s.drop(1).toLong
    case 'D' => s.drop(1).toDouble
    case 'S' => java.net.URLDecoder.decode(s.drop(1), "UTF-8")
    case _ => throw new IllegalStateException(s"bad span field: $s")
  }

  /** v3 entry line: `name TAB nRows TAB min1 TAB max1 ...` — two
    * fields per stats column; `- -` = not collected, `N N` = all-null
    * column. */
  private def formatEntry(e: FileEntry, cols: Seq[String]): String = {
    val fields = cols.flatMap { c =>
      e.stats.get(c) match {
        case None => Seq("-", "-")
        case Some(None) => Seq("N", "N")
        case Some(Some((mn, mx))) => Seq(encode(mn), encode(mx))
      }
    }
    (Seq(e.name, e.nRows.toString) ++ fields).mkString("\t")
  }

  private def parseEntry(line: String, cols: Seq[String]): FileEntry = {
    val f = line.split('\t')
    val stats = cols.zipWithIndex.flatMap { case (c, i) =>
      (f.lift(2 + 2 * i), f.lift(3 + 2 * i)) match {
        case (Some("-"), _) | (None, _) => None
        case (Some("N"), _) => Some(c -> None)
        case (Some(mn), Some(mx)) => Some(c -> Some((decode(mn), decode(mx))))
        case _ => None
      }
    }.toMap
    FileEntry(f(0), f(1).toLong, stats)
  }

  /** Write + rename the manifest — the commit point. Returns false on
    * a lost race (a manifest for this version already exists, or the
    * rename itself lost to one that appeared in between) so the caller
    * can re-resolve and retry; any other failure throws. */
  private def tryWriteManifest(fs: FileSystem, root: Path, v: Int,
      mode: String, txnId: Option[String], cols: Seq[String],
      entries: Seq[FileEntry]): Boolean = {
    val tmp = new Path(root,
      f"$LogDir/.v$v%05d.manifest.${java.util.UUID.randomUUID}.tmp")
    val out = fs.create(tmp, true)
    try out.write((Seq(Header, mode, s"txn:${txnId.getOrElse("-")}",
      s"stats:${if (cols.isEmpty) "-" else cols.mkString(",")}")
      ++ entries.map(formatEntry(_, cols)))
      .mkString("", "\n", "\n").getBytes("UTF-8"))
    finally out.close()
    val dest = new Path(root, f"$LogDir/v$v%05d.manifest")
    if (fs.exists(dest)) { fs.delete(tmp, false); return false }
    val won = fs.rename(tmp, dest)
    if (!won) fs.delete(tmp, false)
    won
  }

  /** Decoded file name of an `input_file_name()` value (URI-escaped —
    * the [[TargetedDelete]] discipline). */
  private def uriFileName(f: String): String =
    try new Path(new java.net.URI(f)).getName
    catch { case _: java.net.URISyntaxException => new Path(f).getName }

  private def readLines(fs: FileSystem, p: Path): Seq[String] = {
    val in = fs.open(p)
    try scala.io.Source.fromInputStream(in, "UTF-8").getLines().toList
    finally in.close()
  }
}
