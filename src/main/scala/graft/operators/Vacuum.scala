package graft.operators

import org.apache.spark.sql.SparkSession
import org.apache.hadoop.fs.{FileStatus, Path}

/** Crash-debris vacuum for this engine's at-rest directories. Every
  * swap-based operator here ([[Compact]], [[TargetedDelete]],
  * [[SnapshotMerge]], [[IncrementalAgg]], the
  * [[graft.sources.TarShards]]/[[graft.sources.AvroFiles]] sinks)
  * commits via hidden temp names + rename; a crashed or zombie task
  * leaves `.…tmp`-style debris that is invisible to readers (dot
  * prefix) but accumulates storage forever. Vacuum deletes KNOWN
  * debris patterns older than a TTL — and nothing else.
  *
  * Safety contract, in order of precedence:
  *   1. NEVER a live data file: only dot-prefixed names matching the
  *      engine's own temp/backup patterns are candidates. Unknown
  *      hidden files are left alone (some other tool's state).
  *   2. NEVER fresh debris: a temp younger than `ttlMs` may belong to
  *      an in-flight write or an open crash-recovery window — age is
  *      the only signal that no writer will come back for it. The TTL
  *      must exceed the longest plausible job, same rule as Delta's
  *      `VACUUM ... RETAIN`.
  *   3. NEVER a recovery backup that is still needed: `__snap_old` /
  *      `__agg_old` backups are deleted only when the live sibling
  *      EXISTS (swap completed — the backup is stale garbage). A
  *      backup whose live sibling is missing is the crash-recovery
  *      source and is kept at any age.
  *
  * Driver cost is the directory listing, O(#files) — the same state
  * any scan's planning holds; deletes are metadata ops.
  */
object Vacuum {

  /** Temp-file patterns owned by this engine's writers. */
  private val TempPatterns = Seq(
    ".*__snap_tmp$", ".*__agg_tmp$", ".*__compact_tmp$",
    ".*__vt_stage_v\\d+$", ".*\\.manifest\\.tmp$",
    "\\.shard-\\d+-\\d+\\.tar\\.tmp$", "\\.part-\\d+-\\d+\\.avro\\.tmp$",
    "\\..*\\.parquet\\.tmp$").map(_.r)

  /** Backup patterns: removable only when the live sibling exists. */
  private val BackupSuffixes = Seq("__snap_old", "__agg_old")

  final case class Report(deleted: Seq[String], kept: Seq[String])

  /** Vacuum `dir` (and its subdirectories when `recursive`). Returns
    * what was deleted and which CANDIDATES were kept (fresh temps,
    * recovery-needed backups) — live data files are never candidates
    * and never reported. */
  def apply(spark: SparkSession, dir: String, ttlMs: Long,
      recursive: Boolean = true): Report = {
    require(ttlMs >= 0, s"negative ttl: $ttlMs")
    val root = new Path(dir)
    val fs = root.getFileSystem(spark.sessionState.newHadoopConf())
    val now = System.currentTimeMillis()
    val deleted = Seq.newBuilder[String]
    val kept = Seq.newBuilder[String]
    def walk(p: Path): Unit = fs.listStatus(p).foreach { st =>
      val name = st.getPath.getName
      // temps and backups may be FILES (sink part temps) or whole
      // DIRECTORIES (the swap ops' parquet temp/backup snapshots)
      if (isBackupDir(name)) handleBackup(st)
      else if (name.startsWith(".") &&
          TempPatterns.exists(_.findFirstIn(name).isDefined)) {
        if (now - st.getModificationTime > ttlMs) {
          fs.delete(st.getPath, true); deleted += pathOf(st)
        } else kept += pathOf(st)
      } else if (st.isDirectory && recursive &&
          !name.startsWith("_spark_metadata")) walk(st.getPath)
      // anything else: live data or foreign state — not a candidate
    }
    def isBackupDir(name: String): Boolean =
      name.startsWith(".") && BackupSuffixes.exists(name.endsWith)
    def handleBackup(st: FileStatus): Unit = {
      val name = st.getPath.getName
      val live = new Path(st.getPath.getParent,
        name.stripPrefix(".").replaceAll("__(snap|agg)_old$", ""))
      if (fs.exists(live) &&
          System.currentTimeMillis() - st.getModificationTime > ttlMs) {
        fs.delete(st.getPath, true); deleted += pathOf(st)
      } else kept += pathOf(st)
    }
    def pathOf(st: FileStatus): String = st.getPath.toUri.getPath
    walk(root)
    Report(deleted.result(), kept.result())
  }
}
