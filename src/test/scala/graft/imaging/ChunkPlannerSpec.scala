package graft.imaging

import org.scalatest.funsuite.AnyFunSuite
import org.scalacheck.Gen
import graft.PropSupport
import graft.core.JobSettings

class ChunkPlannerSpec extends AnyFunSuite with PropSupport {

  // ---- partitionList laws (reference tests/test_smartspim_job.py:40-54)

  test("partitionList preserves multiset and count") {
    forAllN2(Gen.listOf(Gen.choose(0, 1000)), Gen.choose(1, 16)) { (lst, n) =>
      val parts = JobSettings.partitionList(lst, n)
      assert(parts.length == n)
      assert(parts.flatten.sorted == lst.sorted)
    }
  }

  test("partitionList round-robin index law: item i in partition i mod n") {
    forAllN2(Gen.choose(0, 200), Gen.choose(1, 8)) { (len, n) =>
      val lst = (0 until len).toList
      val parts = JobSettings.partitionList(lst, n)
      lst.foreach(i => assert(parts(i % n).contains(i)))
    }
  }

  // ---- byteSize / closerToTarget (zarr_writer.py:15-48)

  test("byteSize rejects non-positive dims") {
    intercept[IllegalArgumentException](ChunkPlanner.byteSize(Seq(1, 0, 2), 2))
    assert(ChunkPlanner.byteSize(Seq(2, 3, 4), 2) == 48)
  }

  test("closerToTarget picks the nearer shape, ties to second") {
    assert(ChunkPlanner.closerToTarget(Seq(2, 2, 2), Seq(4, 4, 4), 20, 1) == Seq(2, 2, 2))
    assert(ChunkPlanner.closerToTarget(Seq(2, 2, 2), Seq(4, 4, 4), 60, 1) == Seq(4, 4, 4))
    // exact tie: |8-36| == |64-36| → the strict `<` in the reference
    // (zarr_writer.py:46-48) makes shape2 win ties
    assert(ChunkPlanner.closerToTarget(Seq(2, 2, 2), Seq(4, 4, 4), 36, 1) == Seq(4, 4, 4))
  }

  // ---- expandChunks (zarr_writer.py:51-120)

  private val shapes = for {
    d <- Gen.choose(1, 64); h <- Gen.choose(1, 64); w <- Gen.choose(1, 64)
  } yield Seq(d, h, w)

  test("expandChunks yields integer multiples clamped to data shape") {
    forAllN3(shapes, Gen.choose(1L, 1L << 20), Gen.oneOf("cycle", "iso")) {
      (shape, target, mode) =>
        val chunks = shape.map(s => math.max(1, s / 4))
        val out = ChunkPlanner.expandChunks(chunks, shape, target, 2, mode)
        out.zip(shape).foreach { case (o, s) => assert(o >= 1 && o <= s) }
        out.zip(chunks).zip(shape).foreach { case ((o, c), s) =>
          assert(o % c == 0 || o == s, s"$o not multiple of $c nor clamped to $s")
        }
    }
  }

  test("expandChunks never shrinks below the base chunk") {
    forAllN2(shapes, Gen.choose(1L, 1L << 20)) { (shape, target) =>
      val chunks = shape.map(s => math.max(1, s / 4))
      Seq("cycle", "iso").foreach { mode =>
        val out = ChunkPlanner.expandChunks(chunks, shape, target, 2, mode)
        out.zip(chunks).foreach { case (o, c) => assert(o >= c) }
      }
    }
  }

  test("expandChunks matches reference walkthrough (cycle)") {
    // 128³ uint16 chunks growing toward 64 MiB in a large volume:
    // cycle doubles z, then y, then x → 256³ = 32 MiB, then
    // 512×256×256 = 64 MiB exactly
    val out = ChunkPlanner.expandChunks(Seq(128, 128, 128),
      Seq(4096, 4096, 4096), 64L << 20, 2, "cycle")
    assert(out == Seq(512, 256, 256))
  }

  test("expandChunks rejects invalid inputs like the reference") {
    intercept[IllegalArgumentException](
      ChunkPlanner.expandChunks(Seq(0, 1, 1), Seq(4, 4, 4), 10, 2))
    intercept[IllegalArgumentException](
      ChunkPlanner.expandChunks(Seq(8, 1, 1), Seq(4, 4, 4), 10, 2))
    intercept[IllegalArgumentException](
      ChunkPlanner.expandChunks(Seq(1, 1, 1), Seq(4, 4, 4), 0, 2))
    intercept[IllegalArgumentException](
      ChunkPlanner.expandChunks(Seq(1, 1, 1), Seq(4, 4, 4), 10, 2, "bogus"))
  }

  // ---- genSlices (zarr_writer.py:129-186)

  test("genSlices tiles the shape exactly once (partition property)") {
    forAllN2(shapes, shapes) { (shape, blockRaw) =>
      val block = blockRaw.zip(shape).map { case (b, s) => math.min(math.max(b, 1), s) }
      val boxes = ChunkPlanner.genSlices(shape, block).toSeq
      val vol = boxes.map(b => b.shape.map(_.toLong).product).sum
      assert(vol == shape.map(_.toLong).product)
      val expected = shape.zip(block).map { case (s, b) => ((s + b - 1) / b).toLong }.product
      assert(boxes.size.toLong == expected)
    }
  }

  test("genSlices truncates the last block and is row-major") {
    val boxes = ChunkPlanner.genSlices(Seq(5, 3), Seq(2, 2)).toSeq
    assert(boxes.map(_.toString) == Seq(
      "[0,2)x[0,2)", "[0,2)x[2,3)", "[2,4)x[0,2)", "[2,4)x[2,3)",
      "[4,5)x[0,2)", "[4,5)x[2,3)"))
  }

  test("genSlices rejects rank mismatch") {
    intercept[IllegalArgumentException](ChunkPlanner.genSlices(Seq(4, 4), Seq(2)))
  }
}
