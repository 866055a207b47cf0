package graft.operators

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.{DataFrame, SparkSession}

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
  *      hidden sibling dir (`.<table>__vt_stage_v<N>`), so task
  *      retries/speculation are already handled below us.
  *   2. PUBLISH — per-file metadata renames into the table root under
  *      the version prefix. Data files are invisible to versioned
  *      readers until a manifest references them.
  *   3. COMMIT — write the manifest to a temp name and rename it into
  *      `_graft_log/`. The rename IS the commit point: a crash before
  *      it leaves orphaned data files (cleaned by [[vacuumUnreferenced]]
  *      after a TTL) and the table state unchanged; after it, the
  *      version is durable. An existing manifest for the same version
  *      aborts the commit (lost-rename detection) — concurrent writers
  *      to ONE table need an external lock, the same single-writer
  *      contract Delta has on S3 without a locking service.
  *
  * Manifests are FULL snapshots (every live file of that version), so
  * a read resolves from exactly one manifest — no log replay. The log
  * grows O(versions × files-per-version); [[expire]] drops old
  * versions and deletes the files only they reference. At 100 TB the
  * listing cost a reader pays is ONE small-file read instead of a
  * recursive directory walk — manifests are the scan-planning sidecar,
  * exactly the [[ZoneMapIndex]] argument applied to table state.
  *
  * Reads go through [[read]]: a bare `spark.read.parquet(table/)`
  * would see the union of ALL versions' files. The manifest's file
  * list feeds a plain parquet scan, so column pruning and predicate
  * pushdown are untouched.
  */
object VersionedTable {

  private val LogDir = "_graft_log"
  private val Header = "graft-vt-v2"

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
    * listed log — no extra I/O class. */
  def commit(df: DataFrame, path: String, overwrite: Boolean,
      txnId: Option[String] = None): Int = {
    require(txnId.forall(t => t.nonEmpty && !t.exists(_ < ' ')),
      s"txnId must be non-empty printable text: $txnId")
    val spark = df.sparkSession
    val root = new Path(path)
    val fs = root.getFileSystem(spark.sessionState.newHadoopConf())
    fs.mkdirs(new Path(root, LogDir))
    val committed = versions(spark, path)
    txnId.foreach { t =>
      committed.find(_.txnId.contains(t)).foreach(v => return v.version)
    }
    val prev = committed.lastOption.map(_.version)
    val v = prev.map(_ + 1).getOrElse(0)
    val stage = new Path(root.getParent,
      s".${root.getName}__vt_stage_v$v")
    fs.delete(stage, true)
    df.write.mode("overwrite").parquet(stage.toString)
    // PUBLISH: move each staged part under the version prefix. O(#new
    // files) driver metadata ops — the same class as Compact's swap.
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
    val carried =
      if (overwrite || prev.isEmpty) Seq.empty
      else files(spark, path, prev.get)
    writeManifest(fs, root, v,
      if (overwrite) "overwrite" else "append", txnId,
      carried ++ published)
    v
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
        VersionInfo(v, lines(1),
          Option(lines(2).stripPrefix("txn:")).filter(_ != "-"),
          lines.size - 3)
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
    * equivalent for plain dirs, where the swap must be in-place. */
  def compact(spark: SparkSession, path: String,
      targetFileBytes: Long = 128L * 1024 * 1024): Int = {
    require(targetFileBytes > 0, s"bad target: $targetFileBytes")
    val root = new Path(path)
    val fs = root.getFileSystem(spark.sessionState.newHadoopConf())
    val v = latestVersion(spark, path).getOrElse(
      throw new IllegalStateException(s"no committed versions at $path"))
    val bytes = files(spark, path, v)
      .map(n => fs.getFileStatus(new Path(root, n)).getLen).sum
    val nOut = math.max(1, math.ceil(bytes.toDouble / targetFileBytes).toInt)
    commit(read(spark, path, Some(v)).repartition(nOut), path,
      overwrite = true)
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
  def files(spark: SparkSession, path: String, version: Int): Seq[String] = {
    val root = new Path(path)
    val fs = root.getFileSystem(spark.sessionState.newHadoopConf())
    val mf = new Path(root, f"$LogDir/v$version%05d.manifest")
    require(fs.exists(mf),
      s"version $version was never committed (or expired) at $path")
    val lines = readLines(fs, mf)
    require(lines.headOption.contains(Header), s"bad manifest $mf")
    lines.drop(3)
  }

  private def writeManifest(fs: org.apache.hadoop.fs.FileSystem,
      root: Path, v: Int, mode: String, txnId: Option[String],
      fileNames: Seq[String]): Unit = {
    val tmp = new Path(root, f"$LogDir/.v$v%05d.manifest.tmp")
    val out = fs.create(tmp, true)
    try out.write((Seq(Header, mode, s"txn:${txnId.getOrElse("-")}")
      ++ fileNames)
      .mkString("", "\n", "\n").getBytes("UTF-8"))
    finally out.close()
    val dest = new Path(root, f"$LogDir/v$v%05d.manifest")
    // The commit point. A concurrent committer of the same version
    // would have renamed first — detect and abort rather than clobber.
    require(!fs.exists(dest),
      s"concurrent commit detected for version $v at $root")
    require(fs.rename(tmp, dest), s"manifest commit $tmp -> $dest failed")
  }

  private def readLines(fs: org.apache.hadoop.fs.FileSystem,
      p: Path): Seq[String] = {
    val in = fs.open(p)
    try scala.io.Source.fromInputStream(in, "UTF-8").getLines().toList
    finally in.close()
  }
}
