package graft.sources

import java.io.{BufferedInputStream, EOFException, FileInputStream, InputStream}
import java.util.zip.{ZipFile, GZIPInputStream}
import org.apache.spark.sql.{Dataset, SparkSession}

/** Zip/tar archives as a distributed dataset of lazy file flyweights.
  *
  * Capability from the reference's archive source
  * (ref: oarphpy/spark.py:457-459 + oarphpy/util/archive_flyweight.py):
  * a row is `{archive_path, name}` — the flyweight serializes only the
  * pointer (ref: archive_flyweight.py:111-115, 34-41); bytes are fetched
  * lazily on the executor that owns the partition, with a per-partition
  * archive handle (open once per task, not once per row).
  *
  * Scale notes: entry listing happens once on the driver (archive
  * central directories are O(#entries), not O(bytes)); the data itself
  * never moves through the driver. For a directory of many archives, map
  * archives → entries per-partition instead.
  */
final case class ArchiveEntry(archive_path: String, name: String) {
  /** Fetch this entry's bytes (opens + closes the archive; for bulk reads
    * use ArchiveSource.readBytes which amortizes the handle per partition). */
  def data: Array[Byte] = ArchiveSource.withArchive(archive_path) { a =>
    a.read(name)
  }
}

object ArchiveSource {

  /** Minimal archive abstraction over zip and tar[.gz]
    * (mirrors the reference's `_IArchive` shim, ref: archive_flyweight.py:16-41). */
  trait Archive extends AutoCloseable {
    def entryNames: Seq[String]
    def read(name: String): Array[Byte]
    /** Bulk read: zip resolves each name via the central directory;
      * tar overrides with a SINGLE sequential scan (random access per
      * entry would re-scan — and re-gunzip — the whole stream). Order
      * of the returned pairs is archive order, not `names` order. */
    def readMany(names: Set[String]): Iterator[(String, Array[Byte])] =
      names.iterator.map(n => n -> read(n))
  }

  private final class Zip(path: String) extends Archive {
    private val zf = new ZipFile(path)
    def entryNames: Seq[String] = {
      val it = zf.entries()
      val b = Seq.newBuilder[String]
      while (it.hasMoreElements) {
        val e = it.nextElement()
        if (!e.isDirectory) b += e.getName
      }
      b.result()
    }
    def read(name: String): Array[Byte] = {
      val e = zf.getEntry(name)
      require(e != null, s"no entry $name in $path")
      val in = zf.getInputStream(e)
      try in.readAllBytes() finally in.close()
    }
    def close(): Unit = zf.close()
  }

  /** Read-based skip: InputStream.skip is unusable for truncation
    * detection — GZIP streams return 0 at EOF (infinite loop in a naive
    * skip loop) and FileInputStream SEEKS PAST EOF silently. Reading is
    * sequential-scan speed (the stream is buffered and, for .gz, being
    * decompressed anyway) and fails loudly on truncation. */
  private def skipFully(in: InputStream, n: Long): Unit = {
    val buf = new Array[Byte](8192)
    var left = n
    while (left > 0) {
      val r = in.read(buf, 0, math.min(left, buf.length.toLong).toInt)
      if (r < 0)
        throw new EOFException(s"truncated archive: $left bytes missing")
      left -= r
    }
  }

  /** Dependency-free USTAR reader (Commons Compress is not on the
    * classpath in this build; tar framing is 512-byte headers + padded
    * payloads — simple enough to parse directly). */
  private final class Tar(path: String) extends Archive {
    private def open(): InputStream = {
      val raw = new BufferedInputStream(new FileInputStream(path))
      if (path.endsWith(".gz") || path.endsWith(".tgz")) new GZIPInputStream(raw)
      else raw
    }
    private def scan[T](f: (String, Long, InputStream) => Option[T]): Seq[T] = {
      val in = open()
      val out = Seq.newBuilder[T]
      try {
        val hdr = new Array[Byte](512)
        var done = false
        while (!done) {
          var got = 0
          while (got < 512) {
            val r = in.read(hdr, got, 512 - got)
            if (r < 0) { done = true; got = 512 } else got += r
          }
          if (!done && hdr.exists(_ != 0)) {
            val name = new String(hdr, 0, 100, "UTF-8").takeWhile(_ != 0)
            val size = java.lang.Long.parseLong(
              new String(hdr, 124, 12, "UTF-8").trim.takeWhile(_ != 0), 8)
            val typeFlag = hdr(156).toChar
            f(name, size, in).foreach(out += _)
            // f must consume exactly `size` bytes if it reads; skip pad.
            skipFully(in, (512 - (size % 512)) % 512)
            if (typeFlag == '5') () // directory: size 0, nothing to do
          } else done = true
        }
      } finally in.close()
      out.result()
    }
    def entryNames: Seq[String] = scan { (name, size, in) =>
      skipFully(in, size)
      if (name.nonEmpty && !name.endsWith("/")) Some(name) else None
    }
    def read(target: String): Array[Byte] = {
      val hits = scan { (name, size, in) =>
        if (name == target) {
          val buf = new Array[Byte](size.toInt)
          var got = 0
          while (got < size) {
            val r = in.read(buf, got, size.toInt - got)
            require(r >= 0, s"truncated tar entry $name")
            got += r
          }
          Some(buf)
        } else {
          skipFully(in, size)
          None
        }
      }
      require(hits.nonEmpty, s"no entry $target in $path")
      hits.head
    }
    /** Single sequential pass for a whole name set. */
    override def readMany(names: Set[String]): Iterator[(String, Array[Byte])] =
      scan { (name, size, in) =>
        if (names.contains(name)) {
          val buf = new Array[Byte](size.toInt)
          var got = 0
          while (got < size) {
            val r = in.read(buf, got, size.toInt - got)
            require(r >= 0, s"truncated tar entry $name")
            got += r
          }
          Some(name -> buf)
        } else {
          skipFully(in, size)
          None
        }
      }.iterator
    def close(): Unit = ()
  }

  def openArchive(path: String): Archive =
    if (path.endsWith(".zip")) new Zip(path)
    else if (path.endsWith(".tar") || path.endsWith(".tar.gz") || path.endsWith(".tgz"))
      new Tar(path)
    else throw new IllegalArgumentException(s"unsupported archive: $path")

  def withArchive[T](path: String)(f: Archive => T): T = {
    val a = openArchive(path)
    try f(a) finally a.close()
  }

  /** List entries and build the flyweight dataset
    * (ref: archive_flyweight.py:117-137 fws_from + spark.py:457-459 archive_rdd). */
  def archiveDs(spark: SparkSession, path: String): Dataset[ArchiveEntry] = {
    import spark.implicits._
    val names = withArchive(path)(_.entryNames)
    spark.createDataset(names.map(n => ArchiveEntry(path, n)))
  }

  /** Bulk read: one archive handle per partition, not per row. */
  def readBytes(ds: Dataset[ArchiveEntry]): Dataset[(String, Array[Byte])] = {
    val spark = ds.sparkSession
    import spark.implicits._
    ds.mapPartitions { it =>
      // Group this partition's entries by archive, then one readMany
      // per archive (single pass for tar, directory lookups for zip).
      it.toSeq.groupBy(_.archive_path).iterator.flatMap {
        case (path, entries) =>
          withArchive(path)(_.readMany(entries.map(_.name).toSet).toSeq)
            .iterator
      }
    }
  }
}
