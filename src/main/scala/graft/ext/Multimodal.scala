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
  * per row). The decode is REAL: `decodeGray` reads any JDK-supported
  * container (PNG/JPEG/GIF/BMP) via `javax.imageio` — the same decode
  * the reference performs with imageio (ref: oarphpy/util/misc.py:281-302
  * and its imagenet fixtures). Gray PNG is byte-exact through the
  * encode→decode round trip (lossless format, identity raster), which is
  * what the pixel-sum driver oracle (`mm_decode`) pins; JPEG decode is
  * exercised in CodecSpec with a tolerance check (lossy by design, so
  * never hash-oracled).
  *
  * The reference's image utilities (header-only JPEG dims, ref:
  * oarphpy/util/misc.py:305-329; image→bytes helpers, ref:
  * oarphpy/util/misc.py:281-302) inform the schema: dimensions are
  * extractable WITHOUT decoding, so `withImageMeta` is a cheap
  * header-scan (JPEG SOF walk / PNG IHDR read), not a decode.
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

  private val PngSig =
    Array(0x89, 0x50, 0x4e, 0x47, 0x0d, 0x0a, 0x1a, 0x0a).map(_.toByte)

  /** Header-only PNG dimension scan: signature + IHDR (always the first
    * chunk per the PNG spec), width/height big-endian at bytes 16-23. */
  def pngSize(bytes: Array[Byte]): Option[(Int, Int)] = {
    if (bytes.length < 24) return None
    var i = 0
    while (i < 8) { if (bytes(i) != PngSig(i)) return None; i += 1 }
    if (!(bytes(12) == 'I' && bytes(13) == 'H' &&
      bytes(14) == 'D' && bytes(15) == 'R')) return None
    def be32(o: Int): Int =
      ((bytes(o) & 0xff) << 24) | ((bytes(o + 1) & 0xff) << 16) |
        ((bytes(o + 2) & 0xff) << 8) | (bytes(o + 3) & 0xff)
    Some((be32(16), be32(20)))
  }

  // ImageIO's default stream cache spills every decode through a temp
  // FILE (create/write/delete per image) even when the bytes are
  // already in memory — pure I/O waste in a per-row decode loop.
  // JVM-global, safe on executors (each JVM flips it once).
  javax.imageio.ImageIO.setUseCache(false)

  /** REAL image decode to an 8-bit gray raster via `javax.imageio`
    * (JDK-built-in readers: PNG, JPEG, GIF, BMP, WBMP). 8-bit
    * NON-INDEXED single-band images read their raster samples directly
    * (gray PNG is therefore byte-exact); everything else — RGB(A),
    * palette/indexed (whose single band holds colormap INDICES, not
    * gray values), 16-bit gray — converts through sRGB `getRGB` with
    * integer BT.601 luma `(299r + 587g + 114b + 500) / 1000`, a pinned
    * deterministic reduction, same on every JVM. Undecodable or empty
    * bytes → None (the caller's defined-degradation contract). */
  def decodeGray(bytes: Array[Byte]): Option[(Int, Int, Array[Int])] = {
    if (bytes == null || bytes.length == 0) return None
    try {
      val img = javax.imageio.ImageIO.read(
        new java.io.ByteArrayInputStream(bytes))
      if (img == null) None
      else {
        val w = img.getWidth
        val h = img.getHeight
        val out = new Array[Int](w * h)
        val raster = img.getRaster
        val directGray = raster.getNumBands == 1 &&
          img.getColorModel.getPixelSize == 8 &&
          !img.getColorModel.isInstanceOf[java.awt.image.IndexColorModel]
        if (directGray) {
          raster.getSamples(0, 0, w, h, 0, out)
        } else {
          // Bulk conversion: one getRGB pass (per-pixel getRGB dispatches
          // through the ColorModel w*h times).
          val argb = img.getRGB(0, 0, w, h, null, 0, w)
          var i = 0
          while (i < argb.length) {
            val a = argb(i)
            out(i) = (299 * ((a >> 16) & 0xff) + 587 * ((a >> 8) & 0xff) +
              114 * (a & 0xff) + 500) / 1000
            i += 1
          }
        }
        Some((w, h, out))
      }
    } catch { case _: Exception => None }
  }

  /** Encode an 8-bit gray raster (row-major, values 0-255) as PNG —
    * lossless, so decodeGray(encodeGrayPng(px)) == px exactly. Fixture
    * synthesis + the image→bytes lane (ref: oarphpy/util/misc.py:281-302
    * to_png_bytes). */
  def encodeGrayPng(w: Int, h: Int, pixels: Array[Int]): Array[Byte] = {
    require(pixels.length == w * h, s"raster must be $w x $h")
    val img = new java.awt.image.BufferedImage(
      w, h, java.awt.image.BufferedImage.TYPE_BYTE_GRAY)
    img.getRaster.setSamples(0, 0, w, h, 0, pixels)
    val bos = new java.io.ByteArrayOutputStream()
    javax.imageio.ImageIO.write(img, "png", bos)
    bos.toByteArray
  }

  /** Encode an 8-bit gray raster as JPEG (JDK writer, default quality).
    * Lossy — used by specs to exercise the JPEG read path; exact-value
    * oracles use the PNG lane. */
  def encodeGrayJpeg(w: Int, h: Int, pixels: Array[Int]): Array[Byte] = {
    require(pixels.length == w * h, s"raster must be $w x $h")
    val img = new java.awt.image.BufferedImage(
      w, h, java.awt.image.BufferedImage.TYPE_BYTE_GRAY)
    img.getRaster.setSamples(0, 0, w, h, 0, pixels)
    val bos = new java.io.ByteArrayOutputStream()
    javax.imageio.ImageIO.write(img, "jpg", bos)
    bos.toByteArray
  }

  /** Attach metadata from the binary header (cheap scan, no decode):
    * JPEG SOF walk, then PNG IHDR; anything else → (0, 0, unknown). */
  def withImageMeta(df: DataFrame, idCol: String, binCol: String): Dataset[MediaRow] = {
    val spark = df.sparkSession
    import spark.implicits._
    df.select(col(idCol).cast("long"), col(binCol)).as[(Long, Array[Byte])]
      .map { case (id, bytes) =>
        val (w, h, fmt) = jpegSize(bytes) match {
          case Some((jw, jh)) => (jw, jh, "jpeg")
          case None => pngSize(bytes) match {
            case Some((pw, ph)) => (pw, ph, "png")
            case None => (0, 0, "unknown")
          }
        }
        MediaRow(id, bytes, ImageMeta(w, h, fmt, bytes.length.toLong))
      }
  }

  /** Batched feature extraction: REAL decode + mean-pool to a fixed
    * gridH x gridW luma grid, one partition = one decoder scope. Cell of
    * pixel (x, y) is (y*gridH/h, x*gridW/w) — integer floor, the
    * standard adaptive-average-pool binning; cell value = mean luma of
    * its pixels / 255 (double accumulate, float store), empty cells
    * (image smaller than the grid) 0.0f. Undecodable media → the zero
    * tensor of grid shape (defined degradation, keeps the pipeline
    * total). Output is a Tensor column (packed binary above 2 KiB — see
    * graft.codec.Tensor). */
  def extractFeatures(
      media: Dataset[MediaRow], gridW: Int = 8, gridH: Int = 8): Dataset[Feature] = {
    val spark = media.sparkSession
    import spark.implicits._
    media.mapPartitions { it =>
      // Per-partition decoder scope (real codecs/model weights would
      // init here once; ImageIO readers are instantiated per call).
      it.map { row =>
        val vals = new Array[Float](gridW * gridH)
        decodeGray(row.content).foreach { case (w, h, px) =>
          val sums = new Array[Double](gridW * gridH)
          val counts = new Array[Int](gridW * gridH)
          var y = 0
          while (y < h) {
            val cy = y.toLong * gridH / h
            var x = 0
            while (x < w) {
              val cell = (cy * gridW + x.toLong * gridW / w).toInt
              sums(cell) += px(y * w + x)
              counts(cell) += 1
              x += 1
            }
            y += 1
          }
          var i = 0
          while (i < vals.length) {
            if (counts(i) > 0)
              vals(i) = ((sums(i) / counts(i)) / 255.0).toFloat
            i += 1
          }
        }
        Feature(row.media_id, Tensor.fromFloats(vals, Seq(gridH.toLong, gridW.toLong)))
      }
    }
  }

  /** Deterministic frame-sampling plan for video columns: given a frame
    * count and a target, the selected frame indices (uniform stride).
    * Per-frame decode uses the same decodeGray boundary. */
  def sampleFrameIndices(nFrames: Int, target: Int): Seq[Int] = {
    require(target > 0)
    if (nFrames <= target) 0 until nFrames
    else (0 until target).map(i => (i.toLong * nFrames / target).toInt)
  }

  // ------------------------------------------------- audio (PCM16 WAV)

  /** Decoded mono/interleaved PCM16 audio. */
  case class WavPcm(sampleRate: Int, channels: Int, samples: Array[Short])

  /** Dependency-free RIFF/WAVE writer: 16-bit little-endian PCM, the
    * canonical 44-byte header. The audio twin of [[encodeGrayPng]] —
    * real bytes in the binary column, not a stub. */
  def wavEncode(
      samples: Array[Short], sampleRate: Int, channels: Int = 1): Array[Byte] = {
    require(channels > 0 && sampleRate > 0)
    val dataLen = samples.length * 2
    val bb = java.nio.ByteBuffer.allocate(44 + dataLen)
      .order(java.nio.ByteOrder.LITTLE_ENDIAN)
    bb.put("RIFF".getBytes("US-ASCII")).putInt(36 + dataLen)
      .put("WAVE".getBytes("US-ASCII"))
      .put("fmt ".getBytes("US-ASCII")).putInt(16)
      .putShort(1) // PCM
      .putShort(channels.toShort)
      .putInt(sampleRate)
      .putInt(sampleRate * channels * 2) // byte rate
      .putShort((channels * 2).toShort)  // block align
      .putShort(16)                      // bits/sample
      .put("data".getBytes("US-ASCII")).putInt(dataLen)
    samples.foreach(bb.putShort)
    bb.array()
  }

  /** RIFF/WAVE chunk-walking parser for 16-bit PCM (None for anything
    * that isn't a well-formed PCM16 WAV — same total-Option contract as
    * the image decoders). Walks chunks rather than assuming the 44-byte
    * layout, so LIST/INFO metadata chunks between fmt and data parse
    * fine. */
  def wavDecode(bytes: Array[Byte]): Option[WavPcm] = {
    if (bytes == null || bytes.length < 44) return None
    val bb = java.nio.ByteBuffer.wrap(bytes)
      .order(java.nio.ByteOrder.LITTLE_ENDIAN)
    def tag4(): String = {
      val b = new Array[Byte](4); bb.get(b); new String(b, "US-ASCII")
    }
    if (tag4() != "RIFF") return None
    bb.getInt // riff size (ignored; truncated files fail chunk reads)
    if (tag4() != "WAVE") return None
    var fmt: Option[(Int, Int, Int)] = None // (channels, rate, bits)
    while (bb.remaining() >= 8) {
      val id = tag4()
      val len = bb.getInt
      if (len < 0 || len > bb.remaining()) return None
      id match {
        case "fmt " =>
          if (len < 16) return None
          val pos = bb.position()
          val audioFormat = bb.getShort
          val ch = bb.getShort.toInt
          val rate = bb.getInt
          bb.getInt; bb.getShort
          val bits = bb.getShort.toInt
          if (audioFormat != 1) return None // PCM only
          fmt = Some((ch, rate, bits))
          bb.position(pos + len + (len & 1))
        case "data" =>
          val (ch, rate, bits) = fmt.getOrElse(return None)
          if (bits != 16 || len % 2 != 0) return None
          val n = len / 2
          val out = new Array[Short](n)
          var i = 0
          while (i < n) { out(i) = bb.getShort; i += 1 }
          return Some(WavPcm(rate, ch, out))
        case _ =>
          bb.position(bb.position() + len + (len & 1))
      }
    }
    None
  }

  /** Per-frame energy features over PCM samples: (frame_idx, n, Σs²).
    * The sum of squares of int16 samples is an EXACT long (≤ 2^30 per
    * sample, so frames up to 2^23 samples stay under 2^53) — the audio
    * feature stays integer-oracle-exact the way the image lane's pixel
    * sums do; RMS = sqrt(Σs²/n) is then one correctly-rounded op per
    * engine. */
  def frameSumSquares(
      samples: Array[Short], frame: Int): Seq[(Int, Int, Long)] = {
    require(frame > 0)
    if (samples.isEmpty) return Nil
    val nFrames = (samples.length + frame - 1) / frame
    (0 until nFrames).map { f =>
      val lo = f * frame
      val hi = math.min(lo + frame, samples.length)
      var s = 0L
      var i = lo
      while (i < hi) { val v = samples(i).toLong; s += v * v; i += 1 }
      (f, hi - lo, s)
    }
  }
}
