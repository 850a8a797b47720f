package graft.imaging

import java.awt.image.{BufferedImage, DataBufferByte, DataBufferUShort}
import java.io.{ByteArrayInputStream, ByteArrayOutputStream}
import javax.imageio.ImageIO

/** 16-bit grayscale PNG/TIFF slice codec (reference reads via
  * pims/skimage — io/readers.py:129-145, png_to_zarr.py:490-496; the
  * fixture stacks are 16-bit grayscale PNGs, colortype 0). JDK 9+
  * ImageIO handles both formats natively — no extra dependency.
  *
  * Pixel payloads travel as little-endian uint16 bytes (zarr "<u2"),
  * so a decoded slice is directly a row-major (y, x) byte block.
  */
object ImageCodec {

  final case class Decoded(width: Int, height: Int, data: Array[Byte])

  /** Decode PNG/TIFF bytes to LE uint16. 8-bit inputs are widened. */
  def decode(content: Array[Byte]): Decoded = {
    val img = ImageIO.read(new ByteArrayInputStream(content))
    require(img != null, "undecodable image payload")
    val w = img.getWidth; val h = img.getHeight
    val out = new Array[Byte](w * h * 2)
    img.getRaster.getDataBuffer match {
      case us: DataBufferUShort =>
        val px = us.getData
        var i = 0
        while (i < px.length) {
          out(2 * i) = (px(i) & 0xFF).toByte
          out(2 * i + 1) = ((px(i) >> 8) & 0xFF).toByte
          i += 1
        }
      case b: DataBufferByte if img.getRaster.getNumBands == 1 =>
        val px = b.getData
        var i = 0
        while (i < px.length) {
          out(2 * i) = px(i)
          i += 1
        }
      case _ =>
        // fall back through the sample model (handles other layouts)
        val raster = img.getRaster
        var i = 0
        var y = 0
        while (y < h) {
          var x = 0
          while (x < w) {
            val v = raster.getSample(x, y, 0)
            out(2 * i) = (v & 0xFF).toByte
            out(2 * i + 1) = ((v >> 8) & 0xFF).toByte
            i += 1; x += 1
          }
          y += 1
        }
    }
    Decoded(w, h, out)
  }

  /** Encode LE uint16 pixels as a 16-bit grayscale PNG (test fixtures). */
  def encodePng16(width: Int, height: Int, leBytes: Array[Byte]): Array[Byte] = {
    require(leBytes.length == width * height * 2, "pixel buffer size mismatch")
    val img = new BufferedImage(width, height, BufferedImage.TYPE_USHORT_GRAY)
    val px = img.getRaster.getDataBuffer.asInstanceOf[DataBufferUShort].getData
    var i = 0
    while (i < px.length) {
      px(i) = (((leBytes(2 * i + 1) & 0xFF) << 8) | (leBytes(2 * i) & 0xFF)).toShort
      i += 1
    }
    val bos = new ByteArrayOutputStream()
    require(ImageIO.write(img, "png", bos), "no PNG writer available")
    bos.toByteArray
  }
}
