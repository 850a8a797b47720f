package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Laws of [[ScaleUp.embeddingCopyExpr]] — the per-copy embedding
  * isometry behind every scale fixture. Round 14 exposed that a raw
  * rotation by the copy index crashes once the factor exceeds the
  * vector dimension (`slice` length goes negative). Round 16 exposed
  * the composition hole: pure rotations compose
  * (rot_j∘rot_i = rot_(i+j)), so a build of a build fabricated
  * bit-identical cross-copy vectors — outer copy j of inner copy 0
  * equals outer copy 0 of inner copy j. Every copy i > 0 therefore
  * now composes a deterministic per-(level, copy, position) Rademacher
  * sign flip with the rotation. These laws pin: every copy is an
  * isometry (norm preserved), large factors evaluate without error,
  * distinct copies and distinct levels decorrelate, and the exact
  * (i, 0)/(0, i) two-level paths that round 15 caught at sf16d no
  * longer coincide. */
class ScaleUpSpec extends AnyFunSuite {
  private lazy val spark = SparkSessionTestWrapper.spark

  private val dim = 8
  private def base = {
    import spark.implicits._
    Seq((1L, Array.tabulate(dim)(d => (d + 1).toFloat)))
      .toDF("vec_id", "embedding")
  }

  private def apply1(df: org.apache.spark.sql.DataFrame, i: Int, lev: Int) =
    df.select(col("vec_id"),
      expr(ScaleUp.embeddingCopyExpr(dim, i, lev)).as("embedding"))

  private def copyVec(i: Int, lev: Int = 1): Array[Float] =
    apply1(base, i, lev).head().getSeq[Float](1).toArray

  /** two-level path: inner copy i at level 1, then outer copy j at level 2 */
  private def pathVec(i: Int, j: Int): Seq[Float] =
    apply1(apply1(base, i, 1), j, 2).head().getSeq[Float](1)

  test("copy 0 is the identity; copy i>0 is a sign-flipped rotation") {
    val src = copyVec(0)
    assert(src.toSeq == base.head().getSeq[Float](1))
    for (i <- 1 until dim) {
      val rot = Array.tabulate(dim)(d => src((d + i) % dim))
      val got = copyVec(i)
      // same magnitudes as the rotation, but not the raw rotation
      // itself (the flip is unconditional for i > 0 since round 16)
      assert(got.map(math.abs).toSeq == rot.map(math.abs).toSeq,
        s"copy $i magnitudes diverge from rotation by $i")
      assert(got.toSeq != rot.toSeq, s"copy $i has no sign flip")
      val flips = got.zip(rot).count { case (x, y) => x == -y && x != 0f }
      assert(flips > 0 && flips < dim, s"degenerate sign pattern: $flips/$dim")
    }
  }

  test("every copy preserves the norm exactly (isometry)") {
    def norm2(v: Array[Float]): Double = v.map(x => x.toDouble * x).sum
    val n0 = norm2(copyVec(0))
    for (i <- Seq(1, dim - 1, dim, dim + 3, 5 * dim + 2, 20 * dim + 7))
      assert(math.abs(norm2(copyVec(i)) - n0) < 1e-6, s"copy $i changed the norm")
  }

  test("factors beyond the dimension evaluate and decorrelate") {
    for (i <- Seq(1, 3)) {
      val a = copyVec(i)
      val b = copyVec(i + dim)
      assert(a.toSeq != b.toSeq, s"copies $i and ${i + dim} are identical")
      assert(a.map(math.abs).toSeq == b.map(math.abs).toSeq)
    }
  }

  test("distinct levels get distinct sign patterns for the same copy") {
    assert(copyVec(3, lev = 1).toSeq != copyVec(3, lev = 2).toSeq,
      "level 1 and level 2 share a sign pattern")
  }

  test("composed (i,0) and (0,i) paths no longer coincide") {
    // the sf16d fabrication shape: with pure rotations both paths were
    // rot_i(base) bit-for-bit; level-keyed flips must separate them
    for (i <- Seq(1, 3, 7))
      assert(pathVec(i, 0) != pathVec(0, i),
        s"two-level paths ($i,0) and (0,$i) are still bit-identical")
    // and composition remains an isometry
    def norm2(v: Seq[Float]): Double = v.map(x => x.toDouble * x).sum
    assert(math.abs(norm2(pathVec(3, 5)) - norm2(copyVec(0).toSeq)) < 1e-6)
  }
}
