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

  test("blosc lz4 encode roundtrips and frames with the lz4 FORMAT id") {
    forAllN2(byteArrays, Gen.oneOf(true, false), 40) { (data, shuf) =>
      val frame = BloscCodec.compress(data, 2, 3, shuf, "lz4")
      assert(BloscCodec.decompress(frame).sameElements(data))
    }
    val compressible = Array.tabulate[Byte](4096)(i => (i % 5).toByte)
    val frame = BloscCodec.compress(compressible, 2, 3, true, "lz4")
    assert(((frame(2) & 0xE0) >> 5) == 1, "lz4 FORMAT id is 1 (BLOSC_LZ4_LIB)")
    assert((frame(2) & 0x10) == 0x10, "encoder emits NOSPLIT frames")
    assert(frame.length < compressible.length, "repetitive payload must compress")
    intercept[IllegalArgumentException](
      BloscCodec.compress(compressible, 2, 3, true, "zlib"))
  }

  test("blosc shuffle/unshuffle are inverses and shuffle groups byte planes") {
    forAllN(byteArrays, 60) { data =>
      assert(BloscCodec.unshuffle(BloscCodec.shuffle(data, 2), 2).sameElements(data))
    }
    val data = Array[Byte](1, 2, 3, 4, 5, 6) // 3 uint16 LE
    assert(BloscCodec.shuffle(data, 2).sameElements(Array[Byte](1, 3, 5, 2, 4, 6)))
  }

  test("blosc roundtrip holds for any typesize, length and tail remainder") {
    forAllN2(Gen.choose(0, 50000), Gen.choose(1, 9), 40) { (n, ts) =>
      // deterministic mildly-compressible payload; lengths NOT aligned
      // to the typesize exercise the raw-tail shuffle path
      val data = Array.tabulate[Byte](n)(i => ((i * 7 + i / 31) % 113).toByte)
      for (shuf <- Seq(true, false)) {
        val frame = BloscCodec.compress(data, ts, 3, shuf)
        assert(BloscCodec.decompress(frame).sameElements(data),
          s"n=$n ts=$ts shuffle=$shuf")
      }
    }
  }

  test("blosc header fields match the c-blosc1 spec (README_HEADER.rst)") {
    val data = Array.tabulate[Byte](256)(i => (i % 7).toByte) // compressible
    val frame = BloscCodec.compress(data, 2, 3, true)
    def le32(o: Int): Int = java.nio.ByteBuffer.wrap(frame, o, 4)
      .order(java.nio.ByteOrder.LITTLE_ENDIAN).getInt
    assert(frame(0) == 2)                    // version
    assert((frame(2) & 0x01) == 0x01)        // shuffle flag
    // zstd FORMAT id is 4 (BLOSC_ZSTD_FORMAT = BLOSC_ZSTD_LIB), NOT the
    // compressor code 5 — real consumers dispatch on this field
    assert(((frame(2) & 0xE0) >> 5) == 4)
    assert((frame(2) & 0x10) == 0x10)        // zstd frames never split
    assert(frame(3) == 2)                    // typesize
    assert(le32(4) == 256)                   // nbytes
    assert(le32(12) == frame.length)         // cbytes spans the frame
    // single block: bstarts = [20]; stream token precedes the payload
    assert(le32(16) == 20)
    val csize = le32(20)
    assert(24 + csize == frame.length, "stream token must size the payload")
    assert(frame.length < 256 + 20, "compressible data must actually compress")
  }

  test("blosc multi-block frames (> 4 MiB payload) roundtrip for zstd and lz4") {
    // 9 MiB: 3 blocks at the 4 MiB encoder block size — exercises the
    // bstarts table and per-block shuffle/tail handling, which every
    // other test (all < 4 MiB, single-block) never reaches
    val n = 9 * 1024 * 1024 + 6 // + tail not divisible by typesize
    val data = Array.tabulate[Byte](n)(i => ((i * 31 + i / 4093) % 251).toByte)
    for (cname <- Seq("zstd", "lz4"); shuf <- Seq(true, false)) {
      val frame = BloscCodec.compress(data, 2, 3, shuf, cname)
      def le32(o: Int): Int = java.nio.ByteBuffer.wrap(frame, o, 4)
        .order(java.nio.ByteOrder.LITTLE_ENDIAN).getInt
      assert(le32(8) == 4 * 1024 * 1024, s"header blocksize ($cname)")
      assert(BloscCodec.decompress(frame).sameElements(data),
        s"multi-block roundtrip cname=$cname shuffle=$shuf")
    }
  }

  test("blosc memcpy fallback for incompressible data") {
    val rnd = new scala.util.Random(7)
    val data = Array.fill[Byte](512)(rnd.nextInt().toByte)
    val frame = BloscCodec.compress(data, 2, 3, false)
    assert(BloscCodec.decompress(frame).sameElements(data))
    assert(frame.length <= 512 + 20)
    assert((frame(2) & 0x02) == 0x02, "memcpy flag set")
  }

  test("blosc memcpy frames carry the ORIGINAL bytes even when shuffle was requested") {
    val rnd = new scala.util.Random(11)
    val data = Array.fill[Byte](512)(rnd.nextInt().toByte)
    val frame = BloscCodec.compress(data, 2, 3, true) // incompressible + shuffle
    assert((frame(2) & 0x02) == 0x02, "memcpy flag set")
    // c-blosc stores the unshuffled source in memcpy mode; a decoder
    // that unshuffles here corrupts every real-world incompressible chunk
    assert(java.util.Arrays.equals(
      java.util.Arrays.copyOfRange(frame, 16, 16 + 512), data))
    assert(BloscCodec.decompress(frame).sameElements(data))
  }

  test("blosc multi-block roundtrip (> blocksize input, leftover block)") {
    // 2 full 4 MiB blocks + a leftover with an odd element tail
    val n = 2 * 4 * 1024 * 1024 + 600_001
    val data = Array.tabulate[Byte](n)(i => ((i * 31 + i / 997) % 251).toByte)
    for (shuf <- Seq(true, false)) {
      val frame = BloscCodec.compress(data, 2, 3, shuf)
      // header blocksize × declared block count must cover nbytes
      val bs = java.nio.ByteBuffer.wrap(frame, 8, 4)
        .order(java.nio.ByteOrder.LITTLE_ENDIAN).getInt
      assert((n + bs - 1) / bs == 3, "expected a 3-block frame")
      assert(BloscCodec.decompress(frame).sameElements(data))
    }
  }

  /** Independently constructed c-blosc1 frame (NOT via BloscCodec
    * .compress): per-block shuffle, per-stream tokens, bstarts table —
    * the layout a foreign writer (numcodecs/zarr-python) produces. */
  private def foreignFrame(data: Array[Byte], typesize: Int, blocksize: Int,
      formatId: Int, split: Boolean, shuffle: Boolean,
      encode: Array[Byte] => Array[Byte]): Array[Byte] = {
    val nblocks = (data.length + blocksize - 1) / blocksize
    val body = new java.io.ByteArrayOutputStream()
    val bstarts = new Array[Int](nblocks)
    var pos = 16 + 4 * nblocks
    for (i <- 0 until nblocks) {
      bstarts(i) = pos
      val off = i * blocksize
      val neblock = math.min(blocksize, data.length - off)
      val leftover = neblock != blocksize
      val block0 = java.util.Arrays.copyOfRange(data, off, off + neblock)
      val tmp = if (shuffle) BloscCodec.shuffle(block0, typesize) else block0
      val nstreams =
        if (split && typesize <= 16 && blocksize / typesize >= 128 && !leftover)
          typesize
        else 1
      val streamLen = neblock / nstreams
      for (s <- 0 until nstreams) {
        val stream = java.util.Arrays.copyOfRange(tmp, s * streamLen, (s + 1) * streamLen)
        val comp = encode(stream)
        val store = if (comp.length >= streamLen) stream else comp
        val tok = java.nio.ByteBuffer.allocate(4)
          .order(java.nio.ByteOrder.LITTLE_ENDIAN).putInt(store.length).array()
        body.write(tok); body.write(store)
        pos += 4 + store.length
      }
    }
    val bodyBytes = body.toByteArray
    val out = java.nio.ByteBuffer.allocate(16 + 4 * nblocks + bodyBytes.length)
      .order(java.nio.ByteOrder.LITTLE_ENDIAN)
    var flags = (formatId << 5) | (if (shuffle) 0x01 else 0) | (if (split) 0 else 0x10)
    out.put(2.toByte).put(1.toByte).put(flags.toByte).put(typesize.toByte)
      .putInt(data.length).putInt(blocksize)
      .putInt(16 + 4 * nblocks + bodyBytes.length)
    bstarts.foreach(out.putInt)
    out.put(bodyBytes)
    out.array()
  }

  test("decode a foreign multi-block zstd frame (per-block shuffle, leftover)") {
    val data = Array.tabulate[Byte](3000)(i => ((i / 3) % 200).toByte)
    val frame = foreignFrame(data, 2, 1024, formatId = 4, split = false,
      shuffle = true, b => com.github.luben.zstd.Zstd.compress(b, 3))
    assert(BloscCodec.decompress(frame).sameElements(data))
  }

  test("decode a foreign SPLIT lz4 frame (numcodecs default cname)") {
    // lz4 frames from c-blosc < 1.14-style writers split each full block
    // into `typesize` byte-plane streams
    val comp = net.jpountz.lz4.LZ4Factory.fastestInstance().fastCompressor()
    val data = Array.tabulate[Byte](2048)(i => ((i / 2) % 100).toByte)
    val frame = foreignFrame(data, 2, 512, formatId = 1, split = true,
      shuffle = true, b => {
        val out = comp.compress(b)
        out
      })
    assert(BloscCodec.decompress(frame).sameElements(data))
  }

  test("decode a foreign snappy frame") {
    val data = Array.tabulate[Byte](1500)(i => (i % 50).toByte)
    val frame = foreignFrame(data, 2, 1500, formatId = 2, split = false,
      shuffle = false, b => org.xerial.snappy.Snappy.compress(b))
    assert(BloscCodec.decompress(frame).sameElements(data))
  }

  test("blosc rejects bit-shuffled and unknown-format frames loudly") {
    val ok = BloscCodec.compress(Array.tabulate[Byte](64)(_.toByte), 2, 3, false)
    val bitshuf = ok.clone(); bitshuf(2) = (bitshuf(2) | 0x04).toByte
    intercept[IllegalArgumentException](BloscCodec.decompress(bitshuf))
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

  test("corrupt/truncated PNGs fail cleanly, never with a bounds error") {
    val px = new Array[Byte](16 * 16 * 2)
    val good = ImageCodec.encodePng16(16, 16, px)
    // truncations at every region: header, IHDR, mid-IDAT, tail. The
    // contract: decode returns an image (ImageIO tolerates some
    // truncation) or fails cleanly — never a bounds/allocation error
    // from the fast path.
    for (cut <- Seq(4, 20, 40, good.length / 2, good.length - 3)) {
      val bad = java.util.Arrays.copyOf(good, cut)
      try ImageCodec.decode(bad)
      catch {
        case e @ (_: IndexOutOfBoundsException | _: NegativeArraySizeException) =>
          fail(s"cut=$cut escaped as ${e.getClass.getSimpleName}")
        case _: Exception => () // clean failure
      }
    }
    // bit-flipped IDAT payload: either decodes (bad pixels) or fails
    // cleanly — never IndexOutOfBounds/NegativeArraySize
    val flipped = good.clone()
    flipped(good.length / 2) = (flipped(good.length / 2) ^ 0x55).toByte
    try ImageCodec.decode(flipped)
    catch {
      case _: IndexOutOfBoundsException | _: NegativeArraySizeException =>
        fail("corrupt PNG must not escape as a bounds error")
      case _: Exception => () // clean failure is fine
    }
    // adversarial IHDR: absurd dimensions must be rejected before allocation
    val evil = good.clone()
    // w and h fields at offsets 16/20 (big-endian)
    for (o <- Seq(16, 20); i <- 0 until 4) evil(o + i) = 0x7F.toByte
    try ImageCodec.decode(evil)
    catch { case _: OutOfMemoryError => fail("adversarial header caused allocation")
            case _: Exception => () }
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
