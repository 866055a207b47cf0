package graft.functions

import java.awt.image.BufferedImage
import java.io.ByteArrayOutputStream
import java.util.Base64
import javax.imageio.ImageIO

/** Image display helpers (ref: oarphpy/util/misc.py:281-302
  * to_png_bytes / img_to_data_uri; oarphpy/plotting.py:38-94
  * img_to_img_tag / get_hw_in_viewport) — pure-JDK (javax.imageio), used
  * by the viz layer to embed per-bucket example images in HTML. */
object ImageFunctions {

  /** Grayscale float raster [0,1] row-major → PNG bytes. */
  def grayToPng(pixels: Array[Float], width: Int, height: Int): Array[Byte] = {
    require(pixels.length == width * height, "raster size mismatch")
    val img = new BufferedImage(width, height, BufferedImage.TYPE_BYTE_GRAY)
    val raster = img.getRaster
    var i = 0
    while (i < pixels.length) {
      raster.setSample(i % width, i / width, 0,
        math.max(0, math.min(255, (pixels(i) * 255).round)))
      i += 1
    }
    val bos = new ByteArrayOutputStream()
    ImageIO.write(img, "png", bos)
    bos.toByteArray
  }

  /** RGB packed ints (0xRRGGBB) row-major → PNG bytes. */
  def rgbToPng(pixels: Array[Int], width: Int, height: Int): Array[Byte] = {
    require(pixels.length == width * height, "raster size mismatch")
    val img = new BufferedImage(width, height, BufferedImage.TYPE_INT_RGB)
    img.setRGB(0, 0, width, height, pixels, 0, width)
    val bos = new ByteArrayOutputStream()
    ImageIO.write(img, "png", bos)
    bos.toByteArray
  }

  def toDataUri(bytes: Array[Byte], format: String = "png"): String =
    s"data:image/$format;base64,${Base64.getEncoder.encodeToString(bytes)}"

  def toImgTag(bytes: Array[Byte], displayW: Int = 128, displayH: Int = 128,
      format: String = "png"): String =
    s"""<img src="${toDataUri(bytes, format)}" width="$displayW" height="$displayH"/>"""

  /** Fit (h, w) into a viewport preserving aspect ratio
    * (ref: oarphpy/plotting.py:78-94 get_hw_in_viewport). */
  def hwInViewport(h: Int, w: Int, maxH: Int, maxW: Int): (Int, Int) = {
    var (ch, cw) = (h.toDouble, w.toDouble)
    if (ch > maxH) { cw = cw * maxH / ch; ch = maxH }
    if (cw > maxW) { ch = ch * maxW / cw; cw = maxW }
    (math.max(1, ch.round).toInt, math.max(1, cw.round).toInt)
  }
}
