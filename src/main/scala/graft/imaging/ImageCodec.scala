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

  /** Decode PNG/TIFF bytes to LE uint16. 8-bit inputs are widened.
    * 16-bit grayscale non-interlaced PNG (the SmartSPIM slice format,
    * colortype 0 / bitdepth 16) takes a direct inflate + unfilter +
    * byteswap path — several times faster than ImageIO's sample-by-
    * sample conversion; everything else falls back to ImageIO. */
  def decode(content: Array[Byte]): Decoded = {
    val fast = decodePng16Fast(content)
    if (fast != null) return fast
    decodeViaImageIO(content)
  }

  private val PNG_SIG = Array[Byte](0x89.toByte, 'P', 'N', 'G', '\r', '\n', 0x1a, '\n')

  /** Fast path for 16-bit grayscale non-interlaced PNG; returns null if
    * the payload is anything else (wrong signature, bit depth, color
    * type, or interlacing). Implements all five PNG scanline filters. */
  private[imaging] def decodePng16Fast(c: Array[Byte]): Decoded = {
    if (c.length < 33 || !java.util.Arrays.equals(
        java.util.Arrays.copyOf(c, 8), PNG_SIG)) return null
    def be32(o: Int): Int =
      ((c(o) & 0xFF) << 24) | ((c(o + 1) & 0xFF) << 16) |
      ((c(o + 2) & 0xFF) << 8) | (c(o + 3) & 0xFF)
    // IHDR is always the first chunk
    if (be32(8) != 13 || c(12) != 'I' || c(13) != 'H' || c(14) != 'D' || c(15) != 'R')
      return null
    val w = be32(16); val h = be32(20)
    val bitDepth = c(24); val colorType = c(25); val interlace = c(28)
    if (bitDepth != 16 || colorType != 0 || interlace != 0) return null
    // sane-dimension guard: w*h*2 and h*(2w+1) must fit an Int with
    // headroom (adversarial headers would otherwise overflow the
    // allocation arithmetic below)
    if (w <= 0 || h <= 0 || w.toLong * h.toLong * 2L > Int.MaxValue - 16 ||
        h.toLong * (w.toLong * 2L + 1L) > Int.MaxValue - 16) return null
    // concatenate IDAT payloads; every chunk must lie fully inside the
    // buffer (truncated/corrupt files fall back to ImageIO, not throw)
    val idat = new ByteArrayOutputStream(c.length)
    var off = 33
    var ok = true
    while (ok && off + 8 <= c.length) {
      val len = be32(off)
      if (len < 0 || off + 8 + len.toLong + 4 > c.length) return null
      val typ = new String(c, off + 4, 4, "US-ASCII")
      if (typ == "IDAT") idat.write(c, off + 8, len)
      if (typ == "IEND") ok = false
      off += 8 + len + 4
    }
    val stride = w * 2
    val raw = new Array[Byte](h * (stride + 1))
    val inf = new java.util.zip.Inflater()
    var filled = 0
    try {
      inf.setInput(idat.toByteArray)
      while (filled < raw.length && !inf.finished()) {
        val n = inf.inflate(raw, filled, raw.length - filled)
        if (n == 0 && inf.needsInput()) return null // truncated stream
        filled += n
      }
    } catch {
      case _: java.util.zip.DataFormatException => return null
    } finally inf.end() // release native memory on every exit path
    if (filled != raw.length) return null
    // unfilter scanlines in place into the output (bpp = 2)
    val out = new Array[Byte](h * stride)
    var y = 0
    while (y < h) {
      val f = raw(y * (stride + 1))
      val src = y * (stride + 1) + 1
      val dst = y * stride
      val prv = dst - stride
      f match {
        case 0 => System.arraycopy(raw, src, out, dst, stride)
        case 1 => // Sub: left neighbor (2 bytes back)
          out(dst) = raw(src); out(dst + 1) = raw(src + 1)
          var x = 2
          while (x < stride) {
            out(dst + x) = (raw(src + x) + out(dst + x - 2)).toByte
            x += 1
          }
        case 2 => // Up
          var x = 0
          if (y == 0) System.arraycopy(raw, src, out, dst, stride)
          else while (x < stride) {
            out(dst + x) = (raw(src + x) + out(prv + x)).toByte
            x += 1
          }
        case 3 => // Average
          var x = 0
          while (x < stride) {
            val left = if (x >= 2) out(dst + x - 2) & 0xFF else 0
            val up = if (y > 0) out(prv + x) & 0xFF else 0
            out(dst + x) = (raw(src + x) + ((left + up) >> 1)).toByte
            x += 1
          }
        case 4 => // Paeth
          var x = 0
          while (x < stride) {
            val a = if (x >= 2) out(dst + x - 2) & 0xFF else 0
            val b = if (y > 0) out(prv + x) & 0xFF else 0
            val cc = if (x >= 2 && y > 0) out(prv + x - 2) & 0xFF else 0
            val p = a + b - cc
            val pa = math.abs(p - a); val pb = math.abs(p - b); val pc = math.abs(p - cc)
            val pred = if (pa <= pb && pa <= pc) a else if (pb <= pc) b else cc
            out(dst + x) = (raw(src + x) + pred).toByte
            x += 1
          }
        case _ => return null
      }
      y += 1
    }
    // big-endian samples → little-endian payload
    var i = 0
    while (i < out.length) {
      val t = out(i); out(i) = out(i + 1); out(i + 1) = t
      i += 2
    }
    Decoded(w, h, out)
  }

  private def decodeViaImageIO(content: Array[Byte]): Decoded = {
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
