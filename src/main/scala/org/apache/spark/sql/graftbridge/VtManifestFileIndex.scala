package org.apache.spark.sql.graftbridge

import org.apache.hadoop.fs.{FileStatus, Path}
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.execution.datasources.{PartitionSpec, PartitioningAwareFileIndex}

/** LISTING-FREE [[PartitioningAwareFileIndex]] over a versioned
  * table's manifest entries — what the catalog's DSv2 parquet table
  * plans from instead of an [[org.apache.spark.sql.execution
  * .datasources.InMemoryFileIndex]], whose CONSTRUCTOR eagerly lists
  * every path (a distributed 10000-task job at 60k files, fired the
  * first time V2 scan pushdown builds the scan — measured ~20 s per
  * statement in `ScaleProbe vtanalyze`; at 800k files on an object
  * store it would be the whole query). File statuses are synthesized
  * from the manifest's recorded byte lengths (v5+); entries without a
  * recorded size fall back to one `getFileStatus` each — still
  * O(version's files), never a directory walk.
  *
  * Lives in the spark.sql namespace because
  * [[PartitioningAwareFileIndex]]'s constructor and [[PartitionSpec]]
  * are package-private to sql. Tables are unpartitioned file sets by
  * design, so the partition spec is permanently empty. */
final class VtManifestFileIndex(spark: SparkSession, tablePath: String,
    files: Seq[(String, Long)])
    extends PartitioningAwareFileIndex(spark, Map.empty, None) {

  // QUALIFIED root: allFiles() looks leaf directories up by the
  // fs-qualified root path (scheme + authority), so unqualified map
  // keys would silently list nothing
  private lazy val fs = new Path(tablePath)
    .getFileSystem(spark.sessionState.newHadoopConf())
  private lazy val root = fs.makeQualified(new Path(tablePath))

  private lazy val statuses: Array[FileStatus] = {
    files.map { case (name, size) =>
      val p = new Path(root, name)
      if (size >= 0) new FileStatus(size, false, 1, 128L << 20, 0L, p)
      else fs.getFileStatus(p)
    }.toArray
  }

  override def partitionSpec(): PartitionSpec = PartitionSpec.emptySpec

  override protected def leafFiles
      : scala.collection.mutable.LinkedHashMap[Path, FileStatus] = {
    val m = scala.collection.mutable.LinkedHashMap.empty[Path, FileStatus]
    statuses.foreach(s => m += (s.getPath -> s))
    m
  }

  override protected def leafDirToChildrenFiles
      : Map[Path, Array[FileStatus]] = Map(root -> statuses)

  override def rootPaths: Seq[Path] = Seq(root)

  override def refresh(): Unit = () // a committed manifest is immutable

  override def toString: String = s"VtManifestFileIndex[$tablePath]"
}
