package graft.sources

import java.io.OutputStream
import java.nio.{ByteBuffer, ByteOrder}
import org.apache.spark.sql.{DataFrame, SparkSession}

/** S6: TensorFlow event-log ("tfevents") reader — the reference's
  * TFSummaryReader (ref: oarphpy/util/tfutil.py:199-302), re-expressed
  * as a distributed Spark scan with ZERO TensorFlow dependency.
  *
  * A tfevents file is TFRecord framing ([[TfRecords]]) around serialized
  * `tensorflow.Event` protobuf messages. Both the framing and the
  * message schemas are public (tensorflow/core/util/event.proto,
  * tensorflow/core/framework/summary.proto + tensor.proto), and the
  * protobuf wire format is an open spec (protobuf.dev/programming-guides
  * /encoding) — so this file carries a minimal hand-rolled wire codec
  * instead of a protobuf runtime. Only the fields the reference reads
  * are modeled:
  *
  *   Event:          1 wall_time (double) · 2 step (int64) ·
  *                   5 summary (Summary)
  *   Summary:        1 value (repeated Value)
  *   Summary.Value:  1 tag (string) · 2 simple_value (float) ·
  *                   4 image (Image) · 8 tensor (TensorProto)
  *   Summary.Image:  1 height · 2 width · 3 colorspace ·
  *                   4 encoded_image_string (bytes)
  *   TensorProto:    1 dtype · 2 tensor_shape{2 dim{1 size}} ·
  *                   4 tensor_content · 6 float_val · 7 double_val
  *
  * Unknown fields are skipped by wire type, so real TF-written files
  * (which carry many more fields) parse fine. Like the reference, events
  * without summary values (e.g. the `file_version` header record every
  * TF writer emits first) yield no rows; image pixels stay ENCODED bytes
  * (the reference decodes via imageio — the decode stub lives in
  * [[graft.ext.Multimodal]], per the container constraint); tensors
  * decode to doubles for DT_FLOAT/DT_DOUBLE via `tensor_content` or the
  * packed `float_val`/`double_val` fields.
  *
  * Scale: the scan is [[TfRecords.readDs]] — per-file partitions, proto
  * parse executor-side, nothing data-proportional on the driver.
  */
object TfEventLogs {

  /** One summary datum — the reference's TFSummaryRow
    * (oarphpy/util/tfutil.py:199-221), with image kept encoded and the
    * tensor decoded to doubles. `simpleValue` is NaN when absent
    * (reference default). */
  case class SummaryRow(
      path: String,
      split: String,
      step: Long,
      wall_time: Double,
      tag: String,
      simple_value: Float,
      image_encoded: Array[Byte],
      image_height: Int,
      image_width: Int,
      tensor: Array[Double])

  // ---------------------------------------------------------------
  // protobuf wire primitives (public spec: protobuf.dev encoding doc)
  // ---------------------------------------------------------------

  /** Cursor over one serialized message. Not thread-safe; one per parse. */
  private final class Reader(val buf: Array[Byte], var pos: Int, val end: Int) {
    def this(buf: Array[Byte]) = this(buf, 0, buf.length)
    def hasMore: Boolean = pos < end

    def readVarint(): Long = {
      var shift = 0
      var result = 0L
      var b = 0
      do {
        require(pos < end && shift < 64, "malformed varint")
        b = buf(pos) & 0xff
        pos += 1
        result |= (b & 0x7fL) << shift
        shift += 7
      } while ((b & 0x80) != 0)
      result
    }

    def readFixed64(): Long = {
      require(pos + 8 <= end, "truncated fixed64")
      val v = ByteBuffer.wrap(buf, pos, 8).order(ByteOrder.LITTLE_ENDIAN).getLong
      pos += 8
      v
    }

    def readFixed32(): Int = {
      require(pos + 4 <= end, "truncated fixed32")
      val v = ByteBuffer.wrap(buf, pos, 4).order(ByteOrder.LITTLE_ENDIAN).getInt
      pos += 4
      v
    }

    /** Returns (start, length) of a length-delimited payload and skips it.
      * Bounds-checked in LONG space: a huge declared length must fail
      * loudly, not wrap Int and alias to a small/negative slice. */
    def readBytesSlice(): (Int, Int) = {
      val lenL = readVarint()
      require(lenL >= 0 && lenL <= (end - pos).toLong,
        s"truncated length-delimited field (declared $lenL, ${end - pos} left)")
      val len = lenL.toInt
      val start = pos
      pos += len
      (start, len)
    }

    def subReader(): Reader = {
      val (start, len) = readBytesSlice()
      new Reader(buf, start, start + len)
    }

    def bytes(): Array[Byte] = {
      val (start, len) = readBytesSlice()
      java.util.Arrays.copyOfRange(buf, start, start + len)
    }

    def string(): String = {
      val (start, len) = readBytesSlice()
      new String(buf, start, len, "UTF-8")
    }

    def skip(wireType: Int): Unit = wireType match {
      case 0 => readVarint()
      case 1 => readFixed64()
      case 2 => readBytesSlice()
      case 5 => readFixed32()
      case w => throw new IllegalArgumentException(s"unsupported wire type $w")
    }

    /** Iterate (fieldNumber, wireType); caller must consume or skip. */
    def nextTag(): (Int, Int) = {
      val t = readVarint()
      ((t >>> 3).toInt, (t & 7).toInt)
    }
  }

  private final class Writer {
    private val out = new java.io.ByteArrayOutputStream(64)

    def varint(v: Long): Unit = {
      var x = v
      while ((x & ~0x7fL) != 0) {
        out.write(((x & 0x7f) | 0x80).toInt)
        x >>>= 7
      }
      out.write(x.toInt)
    }

    private def tag(field: Int, wire: Int): Unit = varint((field.toLong << 3) | wire)

    def doubleField(field: Int, v: Double): Unit = {
      tag(field, 1)
      val bb = ByteBuffer.allocate(8).order(ByteOrder.LITTLE_ENDIAN)
      bb.putDouble(v)
      out.write(bb.array())
    }

    def floatField(field: Int, v: Float): Unit = {
      tag(field, 5)
      val bb = ByteBuffer.allocate(4).order(ByteOrder.LITTLE_ENDIAN)
      bb.putFloat(v)
      out.write(bb.array())
    }

    def int64Field(field: Int, v: Long): Unit = { tag(field, 0); varint(v) }

    def bytesField(field: Int, v: Array[Byte]): Unit = {
      tag(field, 2); varint(v.length.toLong); out.write(v, 0, v.length)
    }

    def stringField(field: Int, v: String): Unit =
      bytesField(field, v.getBytes("UTF-8"))

    def messageField(field: Int, m: Writer): Unit = bytesField(field, m.toBytes)

    def toBytes: Array[Byte] = out.toByteArray
  }

  // ---------------------------------------------------------------
  // Event encode (fixture writer / sink parity)
  // ---------------------------------------------------------------

  /** One scalar summary datum to encode. `imagePng`/`tensor` optional. */
  case class EventValue(
      tag: String,
      simpleValue: Option[Float] = None,
      imageEncoded: Option[(Array[Byte], Int, Int)] = None, // bytes, h, w
      tensor: Option[Array[Double]] = None)

  def encodeEvent(wallTime: Double, step: Long, values: Seq[EventValue]): Array[Byte] = {
    val summary = new Writer
    values.foreach { v =>
      val value = new Writer
      value.stringField(1, v.tag)
      v.simpleValue.foreach(value.floatField(2, _))
      v.imageEncoded.foreach { case (bytes, h, w) =>
        val img = new Writer
        img.int64Field(1, h.toLong)
        img.int64Field(2, w.toLong)
        img.int64Field(3, 4L) // colorspace RGBA, matches png payloads
        img.bytesField(4, bytes)
        value.messageField(4, img)
      }
      v.tensor.foreach { arr =>
        val tp = new Writer
        tp.int64Field(1, 2L) // dtype = DT_DOUBLE
        val shape = new Writer
        val dim = new Writer
        dim.int64Field(1, arr.length.toLong)
        shape.messageField(2, dim)
        tp.messageField(2, shape)
        val content = ByteBuffer.allocate(arr.length * 8).order(ByteOrder.LITTLE_ENDIAN)
        arr.foreach(content.putDouble)
        tp.bytesField(4, content.array())
        value.messageField(8, tp)
      }
      summary.messageField(1, value)
    }
    val event = new Writer
    event.doubleField(1, wallTime)
    event.int64Field(2, step)
    event.messageField(5, summary)
    event.toBytes
  }

  /** The `file_version` header record real TF writers emit first
    * (field 3 of Event); readers must skip it — ours does, by the
    * no-summary-values rule. */
  def fileVersionEvent(): Array[Byte] = {
    val event = new Writer
    event.doubleField(1, 0.0)
    event.stringField(3, "brain.Event:2")
    event.toBytes
  }

  /** Write a tfevents file: TFRecord framing around encoded Events,
    * prefixed with the standard file_version header. */
  def write(out: OutputStream, events: Iterator[Array[Byte]]): Unit =
    TfRecords.write(out, Iterator(fileVersionEvent()) ++ events)

  // ---------------------------------------------------------------
  // Event decode
  // ---------------------------------------------------------------

  /** Parse one serialized Event into summary rows (path/split filled by
    * the caller). Events with no summary values yield nothing. */
  def parseEvent(bytes: Array[Byte]): Seq[(Long, Double, String, Float, Array[Byte], Int, Int, Array[Double])] = {
    var wallTime = 0.0
    var step = -1L // reference default (tfutil.py:216)
    val rows = Seq.newBuilder[(Long, Double, String, Float, Array[Byte], Int, Int, Array[Double])]
    val r = new Reader(bytes)
    var summaries: List[Reader] = Nil
    while (r.hasMore) {
      r.nextTag() match {
        case (1, 1) => wallTime = java.lang.Double.longBitsToDouble(r.readFixed64())
        case (2, 0) => step = r.readVarint()
        case (5, 2) => summaries ::= r.subReader()
        case (_, w) => r.skip(w)
      }
    }
    summaries.reverse.foreach { s =>
      while (s.hasMore) {
        s.nextTag() match {
          case (1, 2) =>
            val v = s.subReader()
            var tag = ""
            var simple = Float.NaN
            var imgBytes: Array[Byte] = null
            var imgH = -1
            var imgW = -1
            var tensor: Array[Double] = null
            while (v.hasMore) {
              v.nextTag() match {
                case (1, 2) => tag = v.string()
                case (2, 5) => simple = java.lang.Float.intBitsToFloat(v.readFixed32())
                case (4, 2) =>
                  val img = v.subReader()
                  while (img.hasMore) {
                    img.nextTag() match {
                      case (1, 0) => imgH = img.readVarint().toInt
                      case (2, 0) => imgW = img.readVarint().toInt
                      case (4, 2) => imgBytes = img.bytes()
                      case (_, w) => img.skip(w)
                    }
                  }
                case (8, 2) => tensor = parseTensor(v.subReader())
                case (_, w) => v.skip(w)
              }
            }
            rows += ((step, wallTime, tag, simple, imgBytes, imgH, imgW, tensor))
          case (_, w) => s.skip(w)
        }
      }
    }
    rows.result()
  }

  private val DtFloat = 1L
  private val DtDouble = 2L

  /** TensorProto → doubles; DT_FLOAT/DT_DOUBLE via tensor_content or the
    * packed value fields. Other dtypes return null (reference parses via
    * tf.make_ndarray, which we don't carry). */
  private def parseTensor(r: Reader): Array[Double] = {
    var dtype = 0L
    var content: Array[Byte] = null
    val packed = Array.newBuilder[Double]
    var sawPacked = false
    while (r.hasMore) {
      r.nextTag() match {
        case (1, 0) => dtype = r.readVarint()
        case (4, 2) => content = r.bytes()
        case (6, 2) => // packed repeated float
          val (start, len) = r.readBytesSlice()
          require(len % 4 == 0, s"packed float_val length $len not /4")
          val bb = ByteBuffer.wrap(r.buf, start, len).order(ByteOrder.LITTLE_ENDIAN)
          while (bb.remaining() >= 4) { packed += bb.getFloat.toDouble; sawPacked = true }
        case (6, 5) =>
          packed += java.lang.Float.intBitsToFloat(r.readFixed32()).toDouble
          sawPacked = true
        case (7, 2) => // packed repeated double
          val (start, len) = r.readBytesSlice()
          require(len % 8 == 0, s"packed double_val length $len not /8")
          val bb = ByteBuffer.wrap(r.buf, start, len).order(ByteOrder.LITTLE_ENDIAN)
          while (bb.remaining() >= 8) { packed += bb.getDouble; sawPacked = true }
        case (7, 1) => packed += java.lang.Double.longBitsToDouble(r.readFixed64()); sawPacked = true
        case (_, w) => r.skip(w)
      }
    }
    if (content != null && (dtype == DtFloat || dtype == DtDouble)) {
      val elem = if (dtype == DtDouble) 8 else 4
      require(content.length % elem == 0,
        s"tensor_content length ${content.length} not /$elem for dtype $dtype")
      val bb = ByteBuffer.wrap(content).order(ByteOrder.LITTLE_ENDIAN)
      if (dtype == DtDouble) {
        val out = new Array[Double](content.length / 8)
        var i = 0
        while (i < out.length) { out(i) = bb.getDouble; i += 1 }
        out
      } else {
        val out = new Array[Double](content.length / 4)
        var i = 0
        while (i < out.length) { out(i) = bb.getFloat.toDouble; i += 1 }
        out
      }
    } else if (sawPacked) packed.result()
    else null
  }

  // ---------------------------------------------------------------
  // distributed scan
  // ---------------------------------------------------------------

  /** The reference tags rows from an `eval` path component as the eval
    * split (tfutil.py:274-278 — its `os.pathsep` there is a typo for the
    * path separator; the INTENT is "TF estimators put eval summaries in
    * the 'eval' subdir", which is what we implement). */
  def splitOf(path: String): String =
    if (path.split('/').contains("eval")) "eval" else ""

  /** Distributed read: every tfevents file under `path` (dir or glob)
    * parsed per-partition into summary rows. */
  def readSummaries(spark: SparkSession, path: String): DataFrame = {
    import spark.implicits._
    TfRecords.readDs(spark, path, recursive = true)
      .mapPartitions { it =>
        it.flatMap { case (p, rec) =>
          val split = splitOf(p)
          parseEvent(rec).iterator.map {
            case (step, wallTime, tag, simple, img, h, w, tensor) =>
              SummaryRow(p, split, step, wallTime, tag, simple, img, h, w, tensor)
          }
        }
      }
      .toDF()
  }
}
