package graft.operators

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.SparkSession

/** Small-file compaction: rewrite a parquet directory (optionally
  * hive-partitioned) into size-targeted files. The operational
  * complement to `plans/ScaleLint`'s `unclustered-partitioned-write`
  * finding: streaming sinks, frequent CDC upserts and over-parallel
  * writers all accrete small files, and at 100 TB the cost is real —
  * driver-side listing/footer overhead per file, one scheduled task
  * per file, and row groups too small for effective min/max pruning or
  * vectorized reads.
  *
  * Mechanics: measure on-disk bytes per partition directory (driver
  * walks the listing — O(#files) names, no data), compute the file
  * count from `targetFileBytes`, and rewrite each partition with
  * exactly that many files. Unpartitioned directories compact as one
  * unit via `repartition(n)`; partitioned directories rewrite with
  * one job (repartition on the partition columns + a uniform salt
  * sized for the LARGEST partition, so small partitions still get few
  * files while the write stays a single job). The rewrite lands in a
  * temp sibling directory and swaps in with two renames — readers
  * racing the swap see the old complete layout or the new one, never
  * a half-written mix (same temp+rename discipline as the index
  * sidecar's meta file).
  *
  * Compaction is layout-only by contract: row multiset, schema, and
  * partition values are unchanged (driver-oracled by
  * `op_compact_roundtrip` and spec'd file counts).
  */
object Compact {

  /** Bytes in `dir` counting only data files (skips _SUCCESS etc.). */
  private def dataBytes(fs: org.apache.hadoop.fs.FileSystem,
      dir: Path): Long = {
    val it = fs.listFiles(dir, true)
    var total = 0L
    while (it.hasNext) {
      val f = it.next()
      if (!f.getPath.getName.startsWith("_") &&
          !f.getPath.getName.startsWith("."))
        total += f.getLen
    }
    total
  }

  /** Compact the parquet directory at `path`. Returns the file count
    * written. `partitionCols` empty = flat directory. `zorderBy`
    * re-clusters the data on those dimensions during the rewrite (the
    * compact-and-optimize shape: small-file accretion destroys
    * clustering too, so the maintenance pass restores both) — flat
    * directories only; a hive-partitioned dir already clusters on its
    * partition values. */
  def apply(
      spark: SparkSession, path: String,
      partitionCols: Seq[String] = Nil,
      targetFileBytes: Long = 128L * 1024 * 1024,
      zorderBy: Seq[String] = Nil): Long = {
    import org.apache.spark.sql.functions._
    require(targetFileBytes > 0, "targetFileBytes must be positive")
    require(zorderBy.isEmpty || partitionCols.isEmpty,
      "zorderBy applies to flat directories only")
    val src = new Path(path)
    val fs = src.getFileSystem(spark.sessionState.newHadoopConf())
    val tmp = new Path(src.getParent, s".${src.getName}__compact_tmp")
    if (fs.exists(tmp)) fs.delete(tmp, true)
    val df = spark.read.parquet(path)
    if (partitionCols.isEmpty) {
        val n = math.max(1L,
          (dataBytes(fs, src) + targetFileBytes - 1) / targetFileBytes)
        if (zorderBy.isEmpty)
          df.repartition(n.toInt).write.parquet(tmp.toString)
        else
          ZOrder.write(df, zorderBy, tmp.toString, numFiles = n.toInt)
      } else {
        // Files per partition sized for the largest LEAF partition dir
        // (multi-level partitioning sizes by the leaves, where the
        // files actually live): one listing walk, no data read. A salt
        // in [0, perPart) appended to the repartition key caps files
        // per partition at perPart while keeping the rewrite ONE job.
        def leafDirs(p: Path): Seq[Path] = {
          val dirs = fs.listStatus(p).filter(s =>
            s.isDirectory && s.getPath.getName.contains("="))
          if (dirs.isEmpty) Seq(p)
          else dirs.toSeq.flatMap(d => leafDirs(d.getPath))
        }
        val maxPart = leafDirs(src).filter(_ != src)
          .map(dataBytes(fs, _)).foldLeft(0L)(math.max)
        val perPart = math.max(1L,
          (maxPart + targetFileBytes - 1) / targetFileBytes).toInt
        // layout-only salt (values unaffected): caps files per
        // partition dir at perPart while the rewrite stays ONE job
        val keys = partitionCols.map(col) :+
          pmod(spark_partition_id() + monotonically_increasing_id(),
            lit(perPart))
        df.repartition(keys: _*)
          .write.partitionBy(partitionCols: _*).parquet(tmp.toString)
      }
    // atomic-enough swap: old dir moves aside, new dir takes its name,
    // old dir deleted. Both renames are metadata ops on the same FS.
    val bak = new Path(src.getParent, s".${src.getName}__compact_old")
    if (fs.exists(bak)) fs.delete(bak, true)
    require(fs.rename(src, bak), s"compact: rename $src -> $bak failed")
    require(fs.rename(tmp, src), s"compact: rename $tmp -> $src failed")
    fs.delete(bak, true)
    // actual data-file count after the swap (the salt caps files per
    // dir; sparse (dir, salt) groups may produce fewer)
    val it = fs.listFiles(src, true)
    var n = 0L
    while (it.hasNext) {
      val f = it.next()
      if (!f.getPath.getName.startsWith("_") &&
          !f.getPath.getName.startsWith(".")) n += 1
    }
    n
  }
}
