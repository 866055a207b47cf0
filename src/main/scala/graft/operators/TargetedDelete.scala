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
      s"$path is hive-partitioned: use TargetedDelete.applyPartitioned " +
        "(runs this delete per affected partition dir)")
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

    // input_file_name() returns URI-ESCAPED paths; the listing names
    // they are compared against below (move-back) and in recover() are
    // raw. Decode via URI so a name needing percent-encoding (space,
    // '%', '#') still matches — an undecoded mismatch would move the
    // original affected file (deleted rows included) back in alongside
    // its rewrite.
    val affectedNames = affected.map(uriFileName).toSet
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

  /** Decoded file name of an `input_file_name()` value (URI-escaped). */
  private def uriFileName(f: String): String =
    try new Path(new java.net.URI(f)).getName
    catch { case _: java.net.URISyntaxException => new Path(f).getName }

  /** [[apply]] over a HIVE-PARTITIONED table: one global discovery scan
    * finds which leaf partition directories hold matching keys (row-
    * group stats prune exactly as in the flat case — the scan reads the
    * key column's footers, not the data), then the flat delete runs
    * per AFFECTED leaf only. Untouched partitions are never listed,
    * read, or renamed.
    *
    * `keyCol` must be a DATA column in the leaf files (deleting by a
    * partition column is a directory drop, not a rewrite — out of
    * scope here and rejected).
    *
    * Crash story: each leaf swap keeps the flat operator's manifest +
    * two-rename discipline, and leaves are processed sequentially, so
    * a crash leaves AT MOST ONE partition in a crash state — walk with
    * [[recoverPartitioned]], then rerun (already-deleted partitions
    * no-op: their keys are gone, so discovery skips them). */
  def applyPartitioned(
      spark: SparkSession, path: String, keyCol: String,
      keys: Seq[Any], maxKeys: Int = 100000): Stats = {
    val src = new Path(path)
    val fs = src.getFileSystem(spark.sessionState.newHadoopConf())
    def leafDirs(p: Path): Seq[Path] = {
      val parts = fs.listStatus(p).filter(st => st.isDirectory &&
        st.getPath.getName.contains("="))
      if (parts.isEmpty) Seq(p)
      else parts.toSeq.flatMap(st => leafDirs(st.getPath))
    }
    val leaves = leafDirs(src)
    require(leaves != Seq(src),
      s"$path is not hive-partitioned: use TargetedDelete(...) directly")
    val partCols = leaves.flatMap(_.toString.stripPrefix(src.toString)
      .split('/').filter(_.contains('=')).map(_.takeWhile(_ != '='))).toSet
    require(!partCols.contains(keyCol),
      s"$keyCol is a partition column: deleting by it is a partition " +
        "DROP (delete the directory), not a row rewrite")
    require(keys.nonEmpty, "empty delete key set")
    require(!keys.contains(null), "null delete keys are not allowed")
    require(keys.size <= maxKeys,
      s"${keys.size} delete keys > maxKeys=$maxKeys")
    // ONE discovery job over the whole table; affected leaf dirs are
    // the distinct parents of the matching files.
    val affectedDirs = spark.read.parquet(path)
      .where(col(keyCol).isin(keys: _*))
      .select(input_file_name().as("f"))
      .distinct().collect()
      .map(r => new Path(new java.net.URI(r.getString(0))).getParent)
      .distinct.sortBy(_.toString)
    val totalAll = leaves.map(l =>
      fs.listStatus(l).count(st => !st.isDirectory &&
        !st.getPath.getName.startsWith("_") &&
        !st.getPath.getName.startsWith(".")).toLong).sum
    val perDir = affectedDirs.map(dir =>
      apply(spark, dir.toString, keyCol, keys, maxKeys))
    Stats(perDir.map(_.filesTouched).sum, totalAll,
      perDir.map(_.rowsDeleted).sum)
  }

  /** [[recover]] across a partitioned table: walks the tree for leaf
    * crash states (backup/tmp siblings live INSIDE the partition
    * structure) and repairs each. Idempotent; returns true if any
    * partition needed repair. */
  def recoverPartitioned(spark: SparkSession, path: String): Boolean = {
    val src = new Path(path)
    val fs = src.getFileSystem(spark.sessionState.newHadoopConf())
    def walk(p: Path): Seq[Path] = {
      val subs = fs.listStatus(p).filter(_.isDirectory).map(_.getPath)
      subs.toSeq ++ subs.flatMap(walk)
    }
    val marks = (walk(src) :+ src).filter { d =>
      val n = d.getName
      n.startsWith(".") && (n.endsWith("__delete_old") ||
        n.endsWith("__delete_tmp"))
    }
    marks.map { d =>
      val orig = d.getName.stripPrefix(".")
        .stripSuffix("__delete_old").stripSuffix("__delete_tmp")
      recover(spark, new Path(d.getParent, orig).toString)
    }.exists(identity)
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
