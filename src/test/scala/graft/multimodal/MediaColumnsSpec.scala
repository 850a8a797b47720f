package graft.multimodal

import org.scalatest.funsuite.AnyFunSuite
import graft.SparkSessionTestWrapper
import graft.imaging.ImageCodec
import MediaColumns._

class MediaColumnsSpec extends AnyFunSuite {
  private lazy val spark = SparkSessionTestWrapper.spark

  private def png(w: Int, h: Int, f: (Int, Int) => Int): Array[Byte] = {
    val px = new Array[Byte](w * h * 2)
    for (y <- 0 until h; x <- 0 until w) {
      val v = f(x, y); val i = y * w + x
      px(2 * i) = (v & 0xFF).toByte; px(2 * i + 1) = ((v >> 8) & 0xFF).toByte
    }
    ImageCodec.encodePng16(w, h, px)
  }

  test("decodeImages extracts real features from real PNG bytes") {
    import spark.implicits._
    val media = Seq(
      MediaRow(1, "image/png", png(8, 4, (x, y) => 100)),
      MediaRow(2, "image/png", png(4, 4, (x, y) => x * 1000))).toDS()
    val feats = decodeImages(media).collect().sortBy(_.id)
    assert(feats(0) == ImageFeatures(1, 8, 4, 100.0, 100, feats(0).nBytes))
    assert(feats(1).width == 4 && feats(1).meanIntensity == 1500.0 &&
      feats(1).maxIntensity == 3000)
  }

  test("fakeAudioFeatures is deterministic on byte payloads") {
    import spark.implicits._
    val media = Seq(MediaRow(1, "audio/pcm", Array[Byte](0, 0, 0, 0))).toDS()
    val f = fakeAudioFeatures(media).collect().head
    assert(f.nSamples == 4 && f.rms == 128.0)
  }

  test("WAV PCM16 round-trips through the real RIFF encoder/decoder") {
    import spark.implicits._
    val samples = Array[Short](0, 1000, -1000, 32767, -32768, 5)
    val media = Seq(MediaRow(7, "audio/wav", encodeWavPcm16(8000, samples))).toDS()
    val f = decodeWavFeatures(media).collect().head
    assert(f.sampleRate == 8000 && f.channels == 1 && f.nSamples == 6)
    assert(f.durationMs == 6 * 1000.0 / 8000)
    val expectRms = math.sqrt(samples.map(s => s.toDouble * s).sum / 6)
    assert(math.abs(f.rms - expectRms) < 1e-9)
  }

  test("WAV decoder skips unknown chunks and rejects non-RIFF / non-PCM16") {
    import spark.implicits._
    val good = encodeWavPcm16(8000, Array[Short](3, 4))
    // splice a LIST chunk (odd length → even padding) between fmt and data
    val fmtEnd = 12 + 8 + 16
    val list = "LIST".getBytes("US-ASCII") ++
      Array[Byte](5, 0, 0, 0) ++ "INFOx".getBytes("US-ASCII") ++ Array[Byte](0)
    val spliced = good.take(fmtEnd) ++ list ++ good.drop(fmtEnd)
    // patch the RIFF size field
    val bb = java.nio.ByteBuffer.wrap(spliced).order(java.nio.ByteOrder.LITTLE_ENDIAN)
    bb.putInt(4, spliced.length - 8)
    val f = decodeWavFeatures(Seq(MediaRow(1, "audio/wav", spliced)).toDS())
      .collect().head
    assert(f.nSamples == 2 && f.sampleRate == 8000)
    // non-RIFF payload rejected
    intercept[Exception] {
      decodeWavFeatures(Seq(MediaRow(2, "audio/wav", "nope".getBytes)).toDS()).collect()
    }
    // 8-bit wav rejected (bits field patched)
    val bad8 = good.clone()
    java.nio.ByteBuffer.wrap(bad8).order(java.nio.ByteOrder.LITTLE_ENDIAN)
      .putShort(34, 8)
    intercept[Exception] {
      decodeWavFeatures(Seq(MediaRow(3, "audio/wav", bad8)).toDS()).collect()
    }
  }

  test("AVI round-trips through the real RIFF container walker") {
    import spark.implicits._
    val frames = (0 until 5).map(i => Array.tabulate[Byte](9)(j => (i * 10 + j).toByte))
    val avi = encodeAvi(3, 3, frames)
    val out = sampleFramesAvi(Seq(MediaRow(9, "video/avi", avi)).toDS(), everyN = 2)
      .collect().sortBy(_.frameIdx)
    assert(out.map(_.frameIdx).toSeq == Seq(0, 2, 4))
    assert(out.forall(f => f.width == 3 && f.height == 3))
    assert(out(1).bytes.sameElements(frames(2)))
    // odd frame length exercised the even-padding path above; non-AVI rejected
    intercept[Exception] {
      sampleFramesAvi(Seq(MediaRow(1, "video/avi", "RIFFxxxxWAVE".getBytes)).toDS(), 1)
        .collect()
    }
  }

  test("RLE8 round-trips arbitrary frames (runs, literals, all-equal, ramp)") {
    val rnd = new scala.util.Random(42)
    val cases = Seq(
      (8, 4, Array.tabulate[Byte](32)(j => if ((j / 4) % 3 == 0) j.toByte else 7)),
      (5, 3, Array.fill[Byte](15)(0)), // all-equal: one run per row
      (7, 2, Array.tabulate[Byte](14)(_.toByte)), // ramp: pure absolute mode
      (1, 1, Array[Byte](99)), // single pixel: too short for absolute mode
      (6, 5, Array.fill[Byte](30)(0).map(_ => (rnd.nextInt(4)).toByte)))
    cases.foreach { case (w, h, px) =>
      val enc = encodeRle8(w, h, px)
      assert(decodeRle8(w, h, enc).sameElements(px), s"round-trip failed at ${w}x$h")
    }
  }

  test("RLE8 decoder handles delta escapes and rejects truncated streams") {
    // hand-built stream for a 4x2 bitmap (bottom-up): run of 2 'A',
    // delta right 1 up 1, run of 1 'B', EOB. Skipped pixels stay 0.
    val stream = Array[Byte](2, 'A', 0, 2, 1, 1, 1, 'B', 0, 1)
    val px = decodeRle8(4, 2, stream)
    // bottom row (y=0) = top-down row 1: A A . .   (delta skips x=2)
    assert(px(4) == 'A' && px(5) == 'A' && px(6) == 0 && px(7) == 0)
    // after delta: x=3, y=1 → top-down row 0, col 3 = B
    assert(px(0) == 0 && px(1) == 0 && px(2) == 0 && px(3) == 'B')
    // missing EOB
    intercept[Exception] { decodeRle8(2, 2, Array[Byte](2, 'A', 0, 0)) }
    // truncated absolute run
    intercept[Exception] { decodeRle8(4, 1, Array[Byte](0, 4, 1, 2)) }
    // overflow: more pixels than the row holds
    intercept[Exception] { decodeRle8(2, 1, Array[Byte](3, 'A', 0, 1)) }
  }

  test("RLE8 AVI: strf declares BI_RLE8 and the walker decodes 00dc frames") {
    import spark.implicits._
    val frames = (0 until 4).map { i =>
      Array.tabulate[Byte](12)(j => if (j < 6) (i * 3).toByte else (i * 3 + j).toByte)
    }
    val avi = encodeAvi(4, 3, frames, compression = BI_RLE8)
    // container-level check: 00dc chunks present, 00db absent
    val s = new String(avi, "ISO-8859-1")
    assert(s.contains("00dc") && !s.contains("00db") && s.contains("strf"))
    val out = sampleFramesAvi(Seq(MediaRow(5, "video/avi", avi)).toDS(), everyN = 1)
      .collect().sortBy(_.frameIdx)
    assert(out.length == 4)
    out.zipWithIndex.foreach { case (f, i) =>
      assert(f.bytes.sameElements(frames(i)), s"decoded frame $i mismatch")
    }
  }

  test("multi-stream AVI: audio strf after the video stream cannot clobber biCompression") {
    import spark.implicits._
    val frames = (0 until 3).map { i =>
      Array.tabulate[Byte](12)(j => if (j < 6) (i * 3).toByte else (i * 3 + j).toByte)
    }
    // video ('vids' strl, BI_RLE8) + trailing 'auds' strl whose 40-byte
    // strf carries non-bitmap bytes at offset 16 — a walker that takes
    // biCompression from any strf reads garbage and skips RLE8 decode.
    val avi = encodeAvi(4, 3, frames, compression = BI_RLE8, withAudioStream = true)
    val s = new String(avi, "ISO-8859-1")
    assert(s.contains("auds") && s.contains("00dc"))
    val out = sampleFramesAvi(Seq(MediaRow(6, "video/avi", avi)).toDS(), everyN = 1)
      .collect().sortBy(_.frameIdx)
    assert(out.length == 3)
    out.zipWithIndex.foreach { case (f, i) =>
      assert(f.bytes.sameElements(frames(i)),
        s"frame $i not RLE8-decoded: audio strf clobbered the video compression id")
    }
  }

  test("withMediaMeta adds digest and length columns") {
    import spark.implicits._
    val df = Seq((1L, "abc".getBytes("UTF-8"))).toDF("id", "payload")
    val out = withMediaMeta(df, "payload").collect().head
    assert(out.getAs[String]("media_digest") == "900150983cd24fb0d6963f7d28e17f72")
    assert(out.getAs[Int]("media_bytes") == 3)
  }

  test("resizeImages box-means with floor, clamping partial edge windows") {
    import spark.implicits._
    // 5×3 image, factor 2 → 3×2; value = y*10 + x
    val media = Seq(MediaRow(7, "image/png", png(5, 3, (x, y) => y * 10 + x))).toDS()
    val r = resizeImages(media, 2).collect().head
    assert(r.width == 3 && r.height == 2)
    def px(i: Int) = ((r.bytes(2 * i + 1) & 0xFF) << 8) | (r.bytes(2 * i) & 0xFF)
    // full window (0,0): mean(0,1,10,11) = 5 (floor of 5.5 → 22/4 = 5)
    assert(px(0) == (0 + 1 + 10 + 11) / 4)
    // right edge (x=2): mean(4,14) = 9
    assert(px(2) == (4 + 14) / 2)
    // bottom edge (y=1,x=0): mean(20,21) = 20
    assert(px(3) == (20 + 21) / 2)
    // corner (y=1,x=2): single pixel 24
    assert(px(5) == 24)
  }

  test("sampleFrames emits every Nth complete frame with source index") {
    import spark.implicits._
    val bytes = (0 until 26).map(_.toByte).toArray // 3 complete 8-byte frames
    val media = Seq(MediaRow(3, "video/fake", bytes)).toDS()
    val frames = sampleFrames(media, frameBytes = 8, everyN = 2)
      .collect().sortBy(_.frameIdx)
    assert(frames.map(_.frameIdx).toSeq == Seq(0, 2))
    assert(frames(0).bytes.toSeq == (0 until 8).map(_.toByte))
    assert(frames(1).bytes.toSeq == (16 until 24).map(_.toByte))
  }
}
