package graft.imaging

import org.scalatest.funsuite.AnyFunSuite
import org.scalacheck.Gen
import graft.PropSupport

class CodecSpec extends AnyFunSuite with PropSupport {

  private val byteArrays: Gen[Array[Byte]] = for {
    n <- Gen.choose(0, 4096)
    even = n - (n % 2)
    bytes <- Gen.containerOfN[Array, Byte](even, Gen.choose(Byte.MinValue, Byte.MaxValue))
  } yield bytes

  // ---- Blosc/zstd framing (C1)

  test("blosc roundtrip: decompress(compress(x)) == x") {
    forAllN2(byteArrays, Gen.oneOf(true, false), 60) { (data, shuf) =>
      val frame = BloscCodec.compress(data, 2, 3, shuf)
      assert(BloscCodec.decompress(frame).sameElements(data))
    }
  }

  test("blosc shuffle/unshuffle are inverses and shuffle groups byte planes") {
    forAllN(byteArrays, 60) { data =>
      assert(BloscCodec.unshuffle(BloscCodec.shuffle(data, 2), 2).sameElements(data))
    }
    val data = Array[Byte](1, 2, 3, 4, 5, 6) // 3 uint16 LE
    assert(BloscCodec.shuffle(data, 2).sameElements(Array[Byte](1, 3, 5, 2, 4, 6)))
  }

  test("blosc header fields: version, flags, typesize, nbytes") {
    val data = Array.tabulate[Byte](256)(i => (i % 7).toByte) // compressible
    val frame = BloscCodec.compress(data, 2, 3, true)
    assert(frame(0) == 2)                    // version
    assert((frame(2) & 0x01) == 0x01)        // shuffle flag
    assert(((frame(2) & 0xE0) >> 5) == 5)    // zstd compressor id
    assert(frame(3) == 2)                    // typesize
    val nbytes = java.nio.ByteBuffer.wrap(frame, 4, 4)
      .order(java.nio.ByteOrder.LITTLE_ENDIAN).getInt
    assert(nbytes == 256)
    assert(frame.length < 256 + 20, "compressible data must actually compress")
  }

  test("blosc memcpy fallback for incompressible data") {
    val rnd = new scala.util.Random(7)
    val data = Array.fill[Byte](512)(rnd.nextInt().toByte)
    val frame = BloscCodec.compress(data, 2, 3, false)
    assert(BloscCodec.decompress(frame).sameElements(data))
    assert(frame.length <= 512 + 20)
  }

  // ---- 16-bit PNG codec (C2/S2)

  test("png16 roundtrip is voxel-exact across the full uint16 range") {
    val w = 64; val h = 32
    val px = new Array[Byte](w * h * 2)
    var i = 0
    while (i < w * h) {
      val v = (i * 977) % 65536 // hits values > 32767 (sign handling)
      px(2 * i) = (v & 0xFF).toByte
      px(2 * i + 1) = ((v >> 8) & 0xFF).toByte
      i += 1
    }
    val png = ImageCodec.encodePng16(w, h, px)
    val dec = ImageCodec.decode(png)
    assert(dec.width == w && dec.height == h)
    assert(dec.data.sameElements(px))
  }

  test("fast PNG path handles all five scanline filters, matching ImageIO") {
    val w = 9; val h = 7 // odd sizes to hit edge columns
    val px = Array.tabulate(w * h)(i => (i * 4099 + 17) % 65536)
    // big-endian sample bytes per scanline
    def rowBytes(y: Int): Array[Byte] = {
      val r = new Array[Byte](w * 2)
      for (x <- 0 until w) {
        val v = px(y * w + x)
        r(2 * x) = ((v >> 8) & 0xFF).toByte; r(2 * x + 1) = (v & 0xFF).toByte
      }
      r
    }
    def filtered(ftype: Int): Array[Byte] = {
      val stride = w * 2
      val out = new java.io.ByteArrayOutputStream()
      var prev = new Array[Byte](stride)
      for (y <- 0 until h) {
        val cur = rowBytes(y)
        val f = new Array[Byte](stride)
        for (x <- 0 until stride) {
          val a = if (x >= 2) cur(x - 2) & 0xFF else 0
          val b = prev(x) & 0xFF
          val c0 = if (x >= 2) prev(x - 2) & 0xFF else 0
          val raw = cur(x) & 0xFF
          f(x) = (ftype match {
            case 0 => raw
            case 1 => raw - a
            case 2 => raw - b
            case 3 => raw - ((a + b) >> 1)
            case 4 =>
              val p = a + b - c0
              val pa = math.abs(p - a); val pb = math.abs(p - b); val pc = math.abs(p - c0)
              val pred = if (pa <= pb && pa <= pc) a else if (pb <= pc) b else c0
              raw - pred
          }).toByte
        }
        out.write(ftype); out.write(f)
        prev = cur
      }
      // wrap in a minimal PNG
      def chunk(typ: String, data: Array[Byte]): Array[Byte] = {
        val bb = java.nio.ByteBuffer.allocate(12 + data.length)
        bb.putInt(data.length).put(typ.getBytes("US-ASCII")).put(data)
        val crc = new java.util.zip.CRC32()
        crc.update(typ.getBytes("US-ASCII")); crc.update(data)
        bb.putInt(crc.getValue.toInt)
        bb.array()
      }
      val ihdr = java.nio.ByteBuffer.allocate(13)
        .putInt(w).putInt(h).put(16.toByte).put(0.toByte)
        .put(0.toByte).put(0.toByte).put(0.toByte).array()
      val deflater = new java.util.zip.Deflater()
      deflater.setInput(out.toByteArray); deflater.finish()
      val comp = new java.io.ByteArrayOutputStream()
      val buf = new Array[Byte](4096)
      while (!deflater.finished()) comp.write(buf, 0, deflater.deflate(buf))
      Array[Byte](0x89.toByte, 'P', 'N', 'G', '\r', '\n', 0x1a, '\n') ++
        chunk("IHDR", ihdr) ++ chunk("IDAT", comp.toByteArray) ++
        chunk("IEND", Array.empty)
    }
    for (f <- 0 to 4) {
      val png = filtered(f)
      val dec = ImageCodec.decode(png)
      assert(dec.width == w && dec.height == h, s"filter $f")
      for (i <- 0 until w * h) {
        val got = ((dec.data(2 * i + 1) & 0xFF) << 8) | (dec.data(2 * i) & 0xFF)
        assert(got == px(i), s"filter $f pixel $i")
      }
      // and ImageIO agrees on the same bytes
      val img = javax.imageio.ImageIO.read(new java.io.ByteArrayInputStream(png))
      assert(img != null && img.getRaster.getSample(w - 1, h - 1, 0) == px(w * h - 1),
        s"filter $f ImageIO cross-check")
    }
  }

  test("16-bit grayscale TIFF decodes voxel-exact (JDK ImageIO plugin)") {
    val w = 40; val h = 24
    val img = new java.awt.image.BufferedImage(w, h,
      java.awt.image.BufferedImage.TYPE_USHORT_GRAY)
    val expect = new Array[Byte](w * h * 2)
    for (y <- 0 until h; x <- 0 until w) {
      val v = (x * 1789 + y * 63) % 65536
      img.getRaster.setSample(x, y, 0, v)
      val i = y * w + x
      expect(2 * i) = (v & 0xFF).toByte
      expect(2 * i + 1) = ((v >> 8) & 0xFF).toByte
    }
    val bos = new java.io.ByteArrayOutputStream()
    assert(javax.imageio.ImageIO.write(img, "TIFF", bos), "no TIFF writer")
    val dec = ImageCodec.decode(bos.toByteArray)
    assert(dec.width == w && dec.height == h)
    assert(dec.data.sameElements(expect))
  }

  test("windowedMean: 2x2x2 mean with floor (dtype-preserving)") {
    // 2x2x2 block of values 0..7 → mean 3.5 → floor 3
    val data = new Array[Byte](8 * 2)
    (0 until 8).foreach { i => data(2 * i) = i.toByte }
    val (oz, oy, ox, out) = SmartSpimPipeline.windowedMean(2, 2, 2, data, Seq(2, 2, 2))
    assert((oz, oy, ox) == ((1, 1, 1)))
    assert(out(0) == 3 && out(1) == 0)
  }

  test("windowedMean: partial windows average over present voxels") {
    // 3x1x1 array [10, 20, 40] with factor 2 → [15, 40]
    val data = Array[Byte](10, 0, 20, 0, 40, 0)
    val (oz, oy, ox, out) = SmartSpimPipeline.windowedMean(3, 1, 1, data, Seq(2, 2, 2))
    assert((oz, oy, ox) == ((2, 1, 1)))
    assert(out(0) == 15 && out(2) == 40)
  }

  test("windowedMean handles values above Short.MaxValue (unsigned)") {
    // all voxels = 65000 → mean 65000 must survive the unsigned range
    val data = new Array[Byte](8 * 2)
    (0 until 8).foreach { i =>
      data(2 * i) = (65000 & 0xFF).toByte
      data(2 * i + 1) = ((65000 >> 8) & 0xFF).toByte
    }
    val (_, _, _, out) = SmartSpimPipeline.windowedMean(2, 2, 2, data, Seq(2, 2, 2))
    val v = ((out(1) & 0xFF) << 8) | (out(0) & 0xFF)
    assert(v == 65000)
  }
}
