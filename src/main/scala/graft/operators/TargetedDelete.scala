package graft.operators

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Targeted at-rest delete: remove the rows matching a small key set
  * from a parquet table, rewriting ONLY the files that contain a
  * matching key — the right-to-be-forgotten / takedown shape. At
  * 100 TB the whole point is what does NOT happen: deleting a few
  * thousand keys must not rewrite (or even read) the other ~all of
  * the table.
  *
  * Mechanics:
  *   1. DISCOVER — filter the table on `key IN (...)` with the keys as
  *      literals: the parquet reader prunes via row-group min/max
  *      stats (and column bloom filters where written), and column
  *      pruning reads only the key column, so discovery touches a few
  *      footers plus the candidate row groups — not the data. Matching
  *      rows surface their file via `input_file_name()`.
  *   2. REWRITE — read only the affected files, anti-filter the keys,
  *      write to a temp sibling. Cost is proportional to the affected
  *      bytes. Clustered layouts (ZOrder / range-sorted writes)
  *      minimize affected files for clustered key sets.
  *   3. SWAP — same two-rename discipline as [[Compact]]; untouched
  *      files MOVE (metadata rename, no data copied) into the new
  *      directory. Per-file old-or-new is guaranteed; a reader racing
  *      the whole-table swap can see a partially-moved listing —
  *      snapshot isolation across files needs a manifest/transaction
  *      log (Delta/Iceberg-style) layered above, which is out of scope
  *      for a plain-parquet directory by design.
  *
  * DURABILITY: the rewrite ships a `_delete_manifest` (the affected
  * file names) inside the new directory, so a crash anywhere in the
  * swap is recoverable by [[recover]] — before the first rename the
  * original is untouched; after it, the manifest says exactly which
  * backup files are stale rewrites (never restored — that would
  * resurrect deleted rows) and which are unmoved survivors.
  *
  * Null-key rows never match a delete key (SQL IN semantics) and are
  * always preserved. Null delete keys are rejected.
  */
object TargetedDelete {

  /** filesTouched/totalFiles is the pruning ratio the layout earned. */
  case class Stats(filesTouched: Long, totalFiles: Long, rowsDeleted: Long)

  def apply(
      spark: SparkSession, path: String, keyCol: String,
      keys: Seq[Any], maxKeys: Int = 100000): Stats = {
    require(keys.nonEmpty, "empty delete key set")
    require(!keys.contains(null), "null delete keys are not allowed")
    // Literal-inlined keys are what lets the scan prune: a join-shaped
    // delete set can't reach the parquet reader's stats filters. The
    // cap keeps the plan (and driver memory) bounded — batches of
    // deletes beyond it should loop, or use an anti-join full rewrite.
    require(keys.size <= maxKeys,
      s"${keys.size} delete keys > maxKeys=$maxKeys: batch the deletes " +
        "or fall back to a full anti-join rewrite")
    val src = new Path(path)
    val fs = src.getFileSystem(spark.sessionState.newHadoopConf())
    // Flat directories only (ZOrder.write / Compact flat output): the
    // per-file move-back below flattens subdirectory structure, and a
    // hive-partitioned read of bare file paths would drop the partition
    // columns. Partitioned tables: delete per-partition (the partition
    // dirs ARE the file-pruning there).
    require(!fs.listStatus(src).exists(s =>
      s.isDirectory && s.getPath.getName.contains("=")),
      s"$path is hive-partitioned: run TargetedDelete per partition dir")
    // A surviving backup dir is a CRASH STATE, not debris: it may hold
    // the only copy of files a crashed move-back never returned.
    // Deleting it would lose them — refuse up front, route to recover.
    val bak = new Path(src.getParent, s".${src.getName}__delete_old")
    require(!fs.exists(bak),
      s"delete: $bak exists — a previous delete crashed mid-swap; " +
        s"run TargetedDelete.recover(spark, \"$path\") first")
    val isMatch = col(keyCol).isin(keys: _*)
    val affected = spark.read.parquet(path)
      .where(isMatch)
      .select(input_file_name().as("f"))
      .distinct().collect().map(_.getString(0)).sorted
    def dataFiles(p: Path): Seq[Path] = {
      val it = fs.listFiles(p, true)
      val out = Seq.newBuilder[Path]
      while (it.hasNext) {
        val f = it.next().getPath
        if (!f.getName.startsWith("_") && !f.getName.startsWith("."))
          out += f
      }
      out.result()
    }
    val total = dataFiles(src).size.toLong
    if (affected.isEmpty) return Stats(0L, total, 0L)

    val affectedDf = spark.read.parquet(affected.toIndexedSeq: _*)
    val rowsDeleted = affectedDf.where(isMatch).count()
    val tmp = new Path(src.getParent, s".${src.getName}__delete_tmp")
    if (fs.exists(tmp)) fs.delete(tmp, true)
    // One output file per affected input file keeps the layout's file
    // sizing; survivors of a sparse delete stay where their neighbors
    // are. (Not a repartition by file — survivors are few enough per
    // file that coalesce preserves input splits well at this shape.)
    affectedDf
      .where(col(keyCol).isNull || !isMatch)
      .coalesce(affected.length)
      .write.parquet(tmp.toString)

    val affectedNames = affected.map(f => new Path(f).getName).toSet
    // Manifest rides INSIDE the new directory (underscore name: data
    // readers skip it) so recovery after any crash knows which backup
    // files are stale rewrites vs unmoved survivors.
    writeManifest(fs, tmp, affectedNames)
    require(fs.rename(src, bak), s"delete: rename $src -> $bak failed")
    require(fs.rename(tmp, src), s"delete: rename $tmp -> $src failed")
    // untouched files MOVE back in — metadata renames, no data copy
    dataFiles(bak)
      .filterNot(f => affectedNames.contains(f.getName))
      .foreach { f =>
        require(fs.rename(f, new Path(src, f.getName)),
          s"delete: rename $f -> $src failed")
      }
    fs.delete(bak, true)
    Stats(affected.length.toLong, total, rowsDeleted)
  }

  private val ManifestName = "_delete_manifest"

  private def writeManifest(fs: org.apache.hadoop.fs.FileSystem,
      dir: Path, names: Set[String]): Unit = {
    val out = fs.create(new Path(dir, ManifestName), true)
    try out.write(("v1\n" + names.toSeq.sorted.mkString("\n") + "\n")
      .getBytes("UTF-8"))
    finally out.close()
  }

  /** Crash recovery for an interrupted [[apply]] swap. Idempotent; safe
    * to run when nothing crashed (no-op without a backup dir). Returns
    * true if it repaired anything.
    *
    *   - crash BEFORE the first rename: the table is untouched; only
    *     temp debris exists — removed.
    *   - crash between the renames: table dir missing, backup complete
    *     → the backup renames straight back (the delete never
    *     happened; rerun it).
    *   - crash during the move-back: table dir holds the rewrites +
    *     manifest; every backup file NOT in the manifest moves in
    *     (stale rewritten originals are never restored — they hold the
    *     deleted rows), then the backup drops.
    */
  def recover(spark: SparkSession, path: String): Boolean = {
    val src = new Path(path)
    val fs = src.getFileSystem(spark.sessionState.newHadoopConf())
    val tmp = new Path(src.getParent, s".${src.getName}__delete_tmp")
    val bak = new Path(src.getParent, s".${src.getName}__delete_old")
    val hadTmp = fs.exists(tmp)
    if (hadTmp) fs.delete(tmp, true)
    if (!fs.exists(bak)) return hadTmp
    if (!fs.exists(src)) {
      require(fs.rename(bak, src), s"recover: rename $bak -> $src failed")
      return true
    }
    val mf = new Path(src, ManifestName)
    require(fs.exists(mf),
      s"recover: $bak exists but $src has no $ManifestName — " +
        "not a TargetedDelete crash state; refusing to guess")
    val in = fs.open(mf)
    val lines = try scala.io.Source.fromInputStream(in, "UTF-8")
      .getLines().toVector finally in.close()
    require(lines.headOption.contains("v1"), s"recover: bad manifest $mf")
    val stale = lines.drop(1).toSet
    val it = fs.listFiles(bak, true)
    while (it.hasNext) {
      val f = it.next().getPath
      if (!f.getName.startsWith("_") && !f.getName.startsWith(".") &&
          !stale.contains(f.getName) && !fs.exists(new Path(src, f.getName)))
        require(fs.rename(f, new Path(src, f.getName)),
          s"recover: rename $f -> $src failed")
    }
    fs.delete(bak, true)
    true
  }
}
