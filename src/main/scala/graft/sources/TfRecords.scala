package graft.sources

import java.io.{DataInputStream, EOFException, InputStream}
import java.nio.{ByteBuffer, ByteOrder}
import java.util.zip.CRC32C
import org.apache.spark.sql.{Dataset, SparkSession}

/** Dependency-free TFRecord framing parser
  * (ref: oarphpy/util/tfutil.py:305-398 TFRecordsFileAsListOfStrings).
  *
  * TFRecord framing (public format, tensorflow.org):
  *   uint64 length · uint32 masked_crc32c(length) ·
  *   byte[length] data · uint32 masked_crc32c(data)
  * mask(crc) = ((crc >> 15) | (crc << 17)) + 0xa282ead8
  *
  * JDK 9+ ships CRC32C, so no external dependency. Exposed as a
  * mapPartitions source over binaryFile rows: each executor parses its
  * own files; record payloads never pass through the driver.
  */
object TfRecords {

  def maskedCrc(bytes: Array[Byte]): Int = {
    val c = new CRC32C
    c.update(bytes)
    val crc = c.getValue.toInt
    ((crc >>> 15) | (crc << 17)) + 0xa282ead8
  }

  /** Iterate raw record payloads from one stream; validates CRCs. */
  def records(in: InputStream, verifyCrc: Boolean = true): Iterator[Array[Byte]] =
    new Iterator[Array[Byte]] {
      private val din = new DataInputStream(in)
      private var nextRec: Array[Byte] = _
      private var done = false

      private def advance(): Unit = {
        if (done) return
        val header = new Array[Byte](12)
        val first = din.read(header, 0, 12)
        if (first < 0) { done = true; return }
        var got = first
        while (got < 12) {
          val r = din.read(header, got, 12 - got)
          if (r < 0) throw new EOFException("truncated TFRecord header")
          got += r
        }
        val bb = ByteBuffer.wrap(header).order(ByteOrder.LITTLE_ENDIAN)
        val len = bb.getLong(0)
        val lenCrc = bb.getInt(8)
        if (verifyCrc) {
          val lenBytes = java.util.Arrays.copyOfRange(header, 0, 8)
          require(maskedCrc(lenBytes) == lenCrc, "length crc mismatch")
        }
        val data = new Array[Byte](len.toInt)
        din.readFully(data)
        val dataCrc = new Array[Byte](4)
        din.readFully(dataCrc)
        if (verifyCrc) {
          val expect = ByteBuffer.wrap(dataCrc)
            .order(ByteOrder.LITTLE_ENDIAN).getInt
          require(maskedCrc(data) == expect, "data crc mismatch")
        }
        nextRec = data
      }

      advance()
      def hasNext: Boolean = !done
      def next(): Array[Byte] = {
        val r = nextRec; advance(); r
      }
    }

  /** Write records to a stream with TFRecord framing (test fixture +
    * sink parity). */
  def write(out: java.io.OutputStream, recs: Iterator[Array[Byte]]): Unit = {
    recs.foreach { data =>
      val header = ByteBuffer.allocate(12).order(ByteOrder.LITTLE_ENDIAN)
      header.putLong(data.length.toLong)
      val lenBytes = java.util.Arrays.copyOfRange(header.array(), 0, 8)
      header.putInt(maskedCrc(lenBytes))
      out.write(header.array())
      out.write(data)
      val footer = ByteBuffer.allocate(4).order(ByteOrder.LITTLE_ENDIAN)
      footer.putInt(maskedCrc(data))
      out.write(footer.array())
    }
  }

  /** Distributed scan: every file under `path` parsed per-partition.
    * `recursive` descends into subdirectories (the tfevents layout:
    * run dirs nest an `eval/` split, ref oarphpy/util/tfutil.py:266). */
  def readDs(spark: SparkSession, path: String,
             recursive: Boolean = false): Dataset[(String, Array[Byte])] = {
    import spark.implicits._
    spark.read.format("binaryFile")
      .option("recursiveFileLookup", recursive.toString).load(path)
      .select("path", "content").as[(String, Array[Byte])]
      .mapPartitions { it =>
        it.flatMap { case (p, content) =>
          records(new java.io.ByteArrayInputStream(content)).map(r => (p, r))
        }
      }
  }
}
