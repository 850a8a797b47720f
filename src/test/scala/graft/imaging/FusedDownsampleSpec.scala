package graft.imaging

import org.scalatest.funsuite.AnyFunSuite
import graft.SparkSessionTestWrapper
import graft.imaging.SmartSpimPipeline.{ChunkRow, SliceRow}

/** Fused multi-level downsample (SURVEY §4's optional operator fusion):
  * `downsampleToLevel(k)` must be bit-identical to `downsampleLevel`
  * iterated k times — the nested floor-of-floor truncation, edge-chunk
  * clamping and chunk-grid regrouping all included. The fixture uses
  * deliberately non-divisible dims so edge chunks exercise clamped
  * windows at every level.
  */
class FusedDownsampleSpec extends AnyFunSuite {
  private lazy val spark = SparkSessionTestWrapper.spark

  private val NZ = 9; private val NY = 70; private val NX = 96
  private val CHUNK = Seq(8, 32, 32)

  private def voxel(z: Int, y: Int, x: Int): Int = (z * 10007 + y * 101 + x) % 65536

  private def level0: org.apache.spark.sql.Dataset[ChunkRow] = {
    import spark.implicits._
    val slices = (0 until NZ).map { z =>
      val px = new Array[Byte](NY * NX * 2)
      for (y <- 0 until NY; x <- 0 until NX) {
        val v = voxel(z, y, x); val i = y * NX + x
        px(2 * i) = (v & 0xFF).toByte
        px(2 * i + 1) = ((v >> 8) & 0xFF).toByte
      }
      SliceRow("s", z, NY, NX, px)
    }
    SmartSpimPipeline.rechunk(spark.createDataset(slices), CHUNK)
  }

  private def collectChunks(ds: org.apache.spark.sql.Dataset[ChunkRow])
      : Map[(Int, Int, Int), (Int, Int, Int, Seq[Byte])] =
    ds.collect().map(c => (c.zc, c.yc, c.xc) -> ((c.dz, c.dy, c.dx, c.data.toSeq))).toMap

  test("fused level-2 equals downsampleLevel iterated twice, bit-for-bit") {
    val l0 = level0.cache()
    try {
      val iter = SmartSpimPipeline.downsampleLevel(
        SmartSpimPipeline.downsampleLevel(l0, CHUNK, Seq(2, 2, 2)), CHUNK, Seq(2, 2, 2))
      val fused = SmartSpimPipeline.downsampleToLevel(l0, CHUNK, Seq(2, 2, 2), 2)
      val (a, b) = (collectChunks(iter), collectChunks(fused))
      assert(a.keySet == b.keySet, "chunk grids differ")
      a.foreach { case (k, v) => assert(b(k) == v, s"chunk $k differs") }
    } finally l0.unpersist(blocking = false)
  }

  test("fused level-3 equals three iterated steps on an anisotropic factor") {
    val l0 = level0.cache()
    try {
      // factor (1,2,2): z untouched (thin stacks downsample in-plane only)
      val f = Seq(1, 2, 2)
      val iter = (1 to 3).foldLeft(l0)((d, _) =>
        SmartSpimPipeline.downsampleLevel(d, CHUNK, f))
      val fused = SmartSpimPipeline.downsampleToLevel(l0, CHUNK, f, 3)
      val (a, b) = (collectChunks(iter), collectChunks(fused))
      assert(a.keySet == b.keySet, "chunk grids differ")
      a.foreach { case (k, v) => assert(b(k) == v, s"chunk $k differs") }
    } finally l0.unpersist(blocking = false)
  }

  test("fused path rejects a chunk size not divisible by factor^levels") {
    intercept[IllegalArgumentException] {
      SmartSpimPipeline.downsampleToLevel(level0, CHUNK, Seq(2, 2, 2), 4)
    }
  }
}
