package graft.imaging

import java.nio.file.{Files, Path}

import scala.jdk.CollectionConverters._

import org.apache.spark.scheduler.{SparkListener, SparkListenerStageCompleted}
import org.scalatest.funsuite.AnyFunSuite

import graft.SparkSessionTestWrapper

/** Single-shuffle v3 sharded write (round-11 verdict item 2): keying
  * the rechunk shuffle by the SHARD grid (a pure function of the chunk
  * key) lets the sharded writer stream whole shard objects
  * per-partition — same bytes as the shard-keyed second shuffle, one
  * exchange fewer.
  */
class FusedShardWriteSpec extends AnyFunSuite {
  private lazy val spark = SparkSessionTestWrapper.spark

  // non-divisible dims: Z=5, Y=70, X=96 with 32³ chunks → 1×3×3 grid;
  // 2×2×2 chunks per shard → 1×2×2 shard objects with partial slots
  private val NZ = 5; private val NY = 70; private val NX = 96
  private val CHUNK = Seq(32, 32, 32)
  private val GRID = Seq(2, 2, 2)

  private def voxel(z: Int, y: Int, x: Int): Int = (z * 9973 + y * 131 + x) % 65536

  private lazy val stack: Path = {
    val root = Files.createTempDirectory("graft-fused-shard")
    val dir = root.resolve("SmartSPIM/Ex_488_Em_525/420000/420000_470000")
    Files.createDirectories(dir)
    for (z <- 0 until NZ) {
      val px = new Array[Byte](NY * NX * 2)
      for (y <- 0 until NY; x <- 0 until NX) {
        val v = voxel(z, y, x); val i = y * NX + x
        px(2 * i) = (v & 0xFF).toByte
        px(2 * i + 1) = ((v >> 8) & 0xFF).toByte
      }
      Files.write(dir.resolve(f"$z%06d.png"), ImageCodec.encodePng16(NX, NY, px))
    }
    dir
  }

  private def slices = SmartSpimPipeline.slices(spark, stack.toString, "png")

  /** Level-0 zarr.json so the DSv2 source can read the store back. */
  private def writeMeta(store: Path): Unit = {
    Files.createDirectories(store.resolve("0"))
    Files.writeString(store.resolve("0/zarr.json"), ZarrMeta.render(
      ZarrMeta.zarrJsonArray(
        Seq(1L, 1L, NZ.toLong, NY.toLong, NX.toLong),
        Seq(1, 1, CHUNK(0), CHUNK(1), CHUNK(2)),
        Some(Seq(1, 1, GRID(0), GRID(1), GRID(2))),
        3, byteShuffle = true, compressed = true)))
    ()
  }

  private def writeFused(store: String): Unit =
    SmartSpimPipeline.writeLevelBy(
      SmartSpimPipeline.rechunk(slices, CHUNK, Some(GRID)), _ => store, 0,
      CHUNK, 3, byteShuffle = true, compressed = true, "zstd", 3, Some(GRID),
      colocated = true)

  private def writeTwoShuffle(store: String): Unit =
    SmartSpimPipeline.writeLevelBy(
      SmartSpimPipeline.rechunk(slices, CHUNK), _ => store, 0,
      CHUNK, 3, byteShuffle = true, compressed = true, "zstd", 3, Some(GRID))

  private def voxels(store: Path): Seq[(Int, Int, Int, Seq[Byte])] =
    spark.read.format("zarr").load(store.toString)
      .select("zc", "yc", "xc", "data").collect().toSeq
      .map(r => (r.getInt(0), r.getInt(1), r.getInt(2),
        r.getAs[Array[Byte]]("data").toSeq))
      .sortBy(t => (t._1, t._2, t._3))

  test("fused colocated write is voxel-identical to the shard-keyed shuffle write") {
    val root = Files.createTempDirectory("graft-fused-cmp")
    val (a, b) = (root.resolve("fused"), root.resolve("twoshuffle"))
    writeFused(a.toString)
    writeTwoShuffle(b.toString)
    writeMeta(a); writeMeta(b)
    val (va, vb) = (voxels(a), voxels(b))
    assert(va.nonEmpty && va == vb)
    // full shard objects: 1×2×2 per the shard grid over the 1×3×3 chunks
    val objects = Files.walk(a.resolve("0/c")).iterator().asScala
      .filter(p => Files.isRegularFile(p) &&
        !p.getFileName.toString.startsWith(".")).toSeq
    assert(objects.size == 4)
    // re-running the fused write is idempotent and leaves no temp files
    writeFused(a.toString)
    assert(voxels(a) == va)
    val temps = Files.walk(a).iterator().asScala
      .filter(_.getFileName.toString.contains(".tmp-")).toSeq
    assert(temps.isEmpty, s"leftover temp files: $temps")
  }

  test("fused write executes one fewer stage than the shard-keyed shuffle path") {
    // pre-build both lineages so the slices() stem-probe jobs run
    // outside the counted window
    val fusedChunks = SmartSpimPipeline.rechunk(slices, CHUNK, Some(GRID))
    val plainChunks = SmartSpimPipeline.rechunk(slices, CHUNK)
    val root = Files.createTempDirectory("graft-fused-stages")
    val fStore = root.resolve("f").toString
    val pStore = root.resolve("p").toString
    def countStages(body: => Unit): Int = {
      val n = new java.util.concurrent.atomic.AtomicInteger
      val l = new SparkListener {
        override def onStageCompleted(e: SparkListenerStageCompleted): Unit = {
          n.incrementAndGet(); ()
        }
      }
      spark.sparkContext.addSparkListener(l)
      try {
        body
        org.apache.spark.ListenerBusProbe.waitUntilEmpty(spark.sparkContext)
      } finally spark.sparkContext.removeSparkListener(l)
      n.get
    }
    val fused = countStages {
      SmartSpimPipeline.writeLevelBy(fusedChunks,
        _ => fStore, 0, CHUNK, 3,
        byteShuffle = true, compressed = true, "zstd", 3, Some(GRID),
        colocated = true)
    }
    val plain = countStages {
      SmartSpimPipeline.writeLevelBy(plainChunks,
        _ => pStore, 0, CHUNK, 3,
        byteShuffle = true, compressed = true, "zstd", 3, Some(GRID))
    }
    // strictly fewer, not an exact delta: stage retries / skipped-stage
    // accounting can shift absolute totals across Spark versions while
    // the one-fewer-exchange property (the thing being pinned) holds
    assert(fused < plain,
      s"expected the colocated write to run fewer stages: fused=$fused plain=$plain")
  }
}
