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

  test("withMediaMeta adds digest and length columns") {
    import spark.implicits._
    val df = Seq((1L, "abc".getBytes("UTF-8"))).toDF("id", "payload")
    val out = withMediaMeta(df, "payload").collect().head
    assert(out.getAs[String]("media_digest") == "900150983cd24fb0d6963f7d28e17f72")
    assert(out.getAs[Int]("media_bytes") == 3)
  }
}
