package graft.sources

import java.util

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.analysis.NoSuchTableException
import org.apache.spark.sql.connector.catalog.{Identifier, Table, TableCatalog, TableChange}
import org.apache.spark.sql.util.CaseInsensitiveStringMap

import graft.operators.VersionedTable

/** SQL-SURFACE TIME TRAVEL for versioned tables — a minimal
  * Spark `TableCatalog` so the first thing a Delta-habituated user
  * types just works, with no Scala glue:
  *
  * {{{
  *   spark.conf.set("spark.sql.catalog.graft", "graft.sources.VtCatalog")
  *   spark.sql("SELECT * FROM graft.`/data/events` VERSION AS OF 3")
  *   spark.sql("SELECT * FROM graft.`/data/events` " +
  *     "TIMESTAMP AS OF '2026-08-01 00:00:00'")
  *   spark.sql("SELECT * FROM graft.sales.orders")  // <root>/sales/orders
  * }}}
  *
  * Identifier → path: a backticked name starting with `/` is an
  * absolute table path; otherwise namespace + name resolve under the
  * catalog's `root` option (`spark.sql.catalog.graft.root = /warehouse`).
  *
  * Resolution reads the commit log (latest version, `VERSION AS OF` =
  * an exact manifest, `TIMESTAMP AS OF` = [[VersionedTable.versionAsOf]]
  * on the commit wall clock — micros from Spark, millis in the log)
  * and hands Spark a DSv2 parquet table over EXACTLY that version's
  * file list with the manifest's recorded schema — so a dropped or
  * added column reads with the shape its version committed, and SQL
  * filter/column pushdown work as for any parquet scan. This surface
  * is READ-ONLY by design: every mutation verb (commit, merge, delete,
  * replaceWhere, restore, …) is a log-aware transaction that must go
  * through [[VersionedTable]] or the `graft-vt` format sink, so
  * `createTable`/`dropTable`/`alterTable`/`renameTable` refuse loudly
  * rather than offering a second, weaker write path.
  *
  * Scale note: the SQL path plans through Spark's file-listing index
  * over the version's file list (O(version's files) planning, still
  * never a directory walk); the manifest-SPAN-pruned planning path
  * ([[VtFileIndex]], the entry checkpoint) stays on the Scala/
  * `graft-vt` read surface.
  */
final class VtCatalog extends TableCatalog {

  private var catalogName: String = "graft"
  private var root: Option[String] = None

  override def initialize(name: String,
      options: CaseInsensitiveStringMap): Unit = {
    catalogName = name
    root = Option(options.get("root"))
  }

  override def name(): String = catalogName

  private def pathOf(ident: Identifier): String =
    if (ident.name.startsWith("/")) {
      require(ident.namespace.isEmpty,
        s"absolute-path table names take no namespace: $ident")
      ident.name
    } else root match {
      case Some(r) => (r +: (ident.namespace :+ ident.name)).mkString("/")
      case None => throw new IllegalArgumentException(
        s"$catalogName: relative table name '$ident' needs the catalog " +
          s"option spark.sql.catalog.$catalogName.root (or use an " +
          "absolute backticked path)")
    }

  private def spark: SparkSession = SparkSession.active

  private def tableAt(ident: Identifier, version: Int): Table = {
    val path = pathOf(ident)
    val files = VersionedTable.files(spark, path, version)
      .map(n => s"$path/$n")
    val schema = VersionedTable.schemaOf(spark, path, version)
      .getOrElse(VersionedTable.read(spark, path, Some(version)).schema)
    new org.apache.spark.sql.execution.datasources.v2.parquet.ParquetTable(
      s"$catalogName.$ident@v$version", spark,
      CaseInsensitiveStringMap.empty(), files, Some(schema),
      classOf[org.apache.spark.sql.execution.datasources
        .parquet.ParquetFileFormat])
  }

  private def latestOrThrow(ident: Identifier): Int =
    VersionedTable.latestVersion(spark, pathOf(ident)).getOrElse(
      throw new NoSuchTableException(ident))

  override def loadTable(ident: Identifier): Table =
    tableAt(ident, latestOrThrow(ident))

  /** `VERSION AS OF <v>` — an exact committed manifest. */
  override def loadTable(ident: Identifier, version: String): Table = {
    latestOrThrow(ident): Unit // table existence first, for clean errors
    val v = try version.toInt catch {
      case _: NumberFormatException => throw new IllegalArgumentException(
        s"$catalogName: VERSION AS OF takes an integer commit version, " +
          s"got '$version'")
    }
    tableAt(ident, v)
  }

  /** `TIMESTAMP AS OF <t>` — Spark hands micros; the commit log
    * stamps millis. */
  override def loadTable(ident: Identifier, timestampMicros: Long): Table = {
    latestOrThrow(ident): Unit
    tableAt(ident, VersionedTable.versionAsOf(spark, pathOf(ident),
      timestampMicros / 1000L))
  }

  override def tableExists(ident: Identifier): Boolean =
    try VersionedTable.latestVersion(spark, pathOf(ident)).nonEmpty
    catch { case _: IllegalArgumentException => false }

  /** Directories under `root`/namespace holding a `_graft_log`. */
  override def listTables(namespace: Array[String]): Array[Identifier] =
    root match {
      case None => Array.empty
      case Some(r) =>
        val base = new org.apache.hadoop.fs.Path(
          (r +: namespace.toSeq).mkString("/"))
        val fs = base.getFileSystem(spark.sessionState.newHadoopConf())
        if (!fs.exists(base)) Array.empty
        else fs.listStatus(base).filter(_.isDirectory)
          .filter(st => fs.exists(
            new org.apache.hadoop.fs.Path(st.getPath, "_graft_log")))
          .map(st => Identifier.of(namespace, st.getPath.getName))
    }

  private def readOnly(verb: String): Nothing =
    throw new UnsupportedOperationException(
      s"$catalogName is a read-only SQL surface; $verb goes through " +
        "the VersionedTable API or the graft-vt format sink (every " +
        "mutation is a commit-logged transaction)")

  override def createTable(ident: Identifier,
      schema: org.apache.spark.sql.types.StructType,
      partitions: Array[org.apache.spark.sql.connector.expressions.Transform],
      properties: util.Map[String, String]): Table = readOnly("CREATE")

  override def alterTable(ident: Identifier,
      changes: TableChange*): Table = readOnly("ALTER")

  override def dropTable(ident: Identifier): Boolean = readOnly("DROP")

  override def renameTable(oldIdent: Identifier,
      newIdent: Identifier): Unit = readOnly("RENAME")
}
