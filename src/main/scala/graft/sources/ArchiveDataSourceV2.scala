package graft.sources

import java.util
import org.apache.spark.sql.connector.catalog.{SupportsRead, Table, TableCapability, TableProvider}
import org.apache.spark.sql.connector.expressions.Transform
import org.apache.spark.sql.connector.read._
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.GenericInternalRow
import org.apache.spark.sql.sources.DataSourceRegister
import org.apache.spark.sql.types._
import org.apache.spark.sql.util.CaseInsensitiveStringMap
import org.apache.spark.unsafe.types.UTF8String
import scala.jdk.CollectionConverters._

/** DataSource V2 for zip/tar archives: `spark.read.format("graft-archive")
  * .load("/path/a.zip")` → rows of (archive_path, name, content).
  *
  * Upgrades the ArchiveSource flyweight dataset (SURVEY §2.1 S1/S2) to a
  * first-class Spark source:
  *   - planning lists entry NAMES only (archive central directory —
  *     O(#entries), driver never touches payload bytes);
  *   - entries are packed into input partitions by count, so a large
  *     archive fans out across executors;
  *   - each partition reader opens its archive ONCE and streams its
  *     assigned entries (the flyweight contract, per-task handle).
  *
  * Options: `entriesPerPartition` (default 64).
  */
class ArchiveDataSourceV2 extends TableProvider with DataSourceRegister {
  override def shortName(): String = "graft-archive"

  override def inferSchema(options: CaseInsensitiveStringMap): StructType =
    ArchiveDataSourceV2.schema

  override def getTable(
      schema: StructType, partitioning: Array[Transform],
      properties: util.Map[String, String]): Table = {
    val path = Option(properties.get("path")).getOrElse(
      throw new IllegalArgumentException("graft-archive needs a path"))
    val epp = Option(properties.get("entriesPerPartition"))
      .map(_.toInt).getOrElse(64)
    new ArchiveTable(path, epp)
  }
}

object ArchiveDataSourceV2 {
  val schema: StructType = StructType(Seq(
    StructField("archive_path", StringType, nullable = false),
    StructField("name", StringType, nullable = false),
    StructField("content", BinaryType, nullable = false)))
}

class ArchiveTable(path: String, entriesPerPartition: Int)
    extends Table with SupportsRead {
  override def name(): String = s"graft-archive($path)"
  override def schema(): StructType = ArchiveDataSourceV2.schema
  override def capabilities(): util.Set[TableCapability] =
    Set(TableCapability.BATCH_READ).asJava

  override def newScanBuilder(options: CaseInsensitiveStringMap): ScanBuilder =
    new ScanBuilder with Scan with Batch {
      override def build(): Scan = this
      override def readSchema(): StructType = ArchiveDataSourceV2.schema
      override def toBatch: Batch = this

      override def planInputPartitions(): Array[InputPartition] = {
        val names = ArchiveSource.withArchive(path)(_.entryNames)
        names.grouped(entriesPerPartition)
          .map(g => ArchivePartition(path, g.toArray): InputPartition)
          .toArray
      }
      override def createReaderFactory(): PartitionReaderFactory =
        new ArchiveReaderFactory
    }
}

case class ArchivePartition(path: String, names: Array[String])
    extends InputPartition

class ArchiveReaderFactory extends PartitionReaderFactory {
  override def createReader(p: InputPartition): PartitionReader[InternalRow] = {
    val ap = p.asInstanceOf[ArchivePartition]
    new PartitionReader[InternalRow] {
      private val archive = ArchiveSource.openArchive(ap.path)
      // readMany: one central-directory lookup per entry for zip, one
      // sequential scan for the WHOLE partition for tar (per-entry
      // random access would re-scan the stream per entry).
      private val it = archive.readMany(ap.names.toSet)
      private var cur: (String, Array[Byte]) = _
      override def next(): Boolean = {
        if (it.hasNext) { cur = it.next(); true } else false
      }
      override def get(): InternalRow =
        new GenericInternalRow(Array[Any](
          UTF8String.fromString(ap.path),
          UTF8String.fromString(cur._1),
          cur._2))
      override def close(): Unit = archive.close()
    }
  }
}
