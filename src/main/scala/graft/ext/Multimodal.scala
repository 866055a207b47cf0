package graft.ext

import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.functions._
import graft.codec.Tensor

/** Multimodal (image/audio/video) column plumbing.
  *
  * Media travels as opaque `binary` columns with typed metadata structs;
  * decode / feature-extraction / resize / frame-sampling run as
  * `mapPartitions` batch transforms (the JVM analog of the Python-side
  * `mapInPandas` pattern — one decoder instantiation per partition, not
  * per row). The actual codec call is STUBBED (no image/audio libraries
  * in this container): `DecodeStub` derives a deterministic fake raster
  * from the bytes, so the Spark-side contract — schema, batching,
  * partitioning, output shapes — is fully real and tested, and swapping
  * in a real decoder is a one-function change.
  *
  * The reference's image utilities (header-only JPEG dims, ref:
  * oarphpy/util/misc.py:305-329; image→bytes helpers, ref:
  * oarphpy/util/misc.py:281-302) inform the schema: dimensions are
  * extractable WITHOUT decoding, so `withImageMeta` is a cheap
  * header-scan, not a decode.
  */
object Multimodal {

  case class ImageMeta(width: Int, height: Int, format: String, nBytes: Long)
  case class MediaRow(media_id: Long, content: Array[Byte], meta: ImageMeta)
  case class Feature(media_id: Long, embedding: Tensor)

  /** Header-only JPEG dimension scan (ref: oarphpy/util/misc.py:305-329
    * get_jpeg_size — SOF-marker walk, no decode). Returns (w, h) or None
    * if not a parseable JPEG. */
  def jpegSize(bytes: Array[Byte]): Option[(Int, Int)] = {
    if (bytes.length < 4 ||
      (bytes(0) & 0xff) != 0xff || (bytes(1) & 0xff) != 0xd8) return None
    var i = 2
    while (i + 9 < bytes.length) {
      if ((bytes(i) & 0xff) != 0xff) return None
      val marker = bytes(i + 1) & 0xff
      val len = ((bytes(i + 2) & 0xff) << 8) | (bytes(i + 3) & 0xff)
      if (marker >= 0xc0 && marker <= 0xcf &&
        marker != 0xc4 && marker != 0xc8 && marker != 0xcc) {
        val h = ((bytes(i + 5) & 0xff) << 8) | (bytes(i + 6) & 0xff)
        val w = ((bytes(i + 7) & 0xff) << 8) | (bytes(i + 8) & 0xff)
        return Some((w, h))
      }
      i += 2 + len
    }
    None
  }

  /** STUB decoder: deterministic fake "raster" summary derived from the
    * bytes — stands in for a real image decode (library absent in this
    * container). Replace the body with e.g. javax.imageio for real use;
    * the signature and batch shape are the contract. */
  object DecodeStub {
    def decodeToGray(bytes: Array[Byte], w: Int, h: Int): Array[Float] = {
      val out = new Array[Float](w * h)
      if (bytes.isEmpty) return out // empty media → zero raster
      var i = 0
      while (i < out.length) {
        out(i) = ((bytes(i % bytes.length) & 0xff) / 255.0f)
        i += 1
      }
      out
    }
  }

  /** Attach metadata from the binary header (cheap scan, no decode). */
  def withImageMeta(df: DataFrame, idCol: String, binCol: String): Dataset[MediaRow] = {
    val spark = df.sparkSession
    import spark.implicits._
    df.select(col(idCol).cast("long"), col(binCol)).as[(Long, Array[Byte])]
      .map { case (id, bytes) =>
        val (w, h) = jpegSize(bytes).getOrElse((0, 0))
        val fmt = if (w > 0) "jpeg" else "unknown"
        MediaRow(id, bytes, ImageMeta(w, h, fmt, bytes.length.toLong))
      }
  }

  /** Batched feature extraction: decode (stubbed) + mean-pool to a fixed
    * grid, one decoder per partition. Output is a Tensor column (packed
    * binary above 2 KiB — see graft.codec.Tensor). */
  def extractFeatures(
      media: Dataset[MediaRow], gridW: Int = 8, gridH: Int = 8): Dataset[Feature] = {
    val spark = media.sparkSession
    import spark.implicits._
    media.mapPartitions { it =>
      // Per-partition decoder init goes here (real impl: codec handles,
      // model weights); the stub needs none.
      it.map { row =>
        val gray = DecodeStub.decodeToGray(row.content, gridW, gridH)
        Feature(row.media_id, Tensor.fromFloats(gray, Seq(gridH.toLong, gridW.toLong)))
      }
    }
  }

  /** Deterministic frame-sampling plan for video columns: given a frame
    * count and a target, the selected frame indices (uniform stride).
    * The decode of each frame is the same stubbed boundary. */
  def sampleFrameIndices(nFrames: Int, target: Int): Seq[Int] = {
    require(target > 0)
    if (nFrames <= target) 0 until nFrames
    else (0 until target).map(i => (i.toLong * nFrames / target).toInt)
  }
}
