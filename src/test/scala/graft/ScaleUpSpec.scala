package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Laws of [[ScaleUp.embeddingCopyExpr]] — the per-copy embedding
  * isometry behind every scale fixture. The round-14 sf16d rebuild
  * exposed that a raw rotation by the copy index crashes once the
  * factor exceeds the vector dimension (`slice` length goes
  * negative); beyond one rotation cycle the transform now composes a
  * deterministic Rademacher sign flip. These laws pin: copies below
  * the dimension stay bit-identical to the pure rotation (existing
  * fixtures unchanged), every copy is an isometry (norm preserved),
  * large factors evaluate without error, and copies one full cycle
  * apart are decorrelated rather than identical. */
class ScaleUpSpec extends AnyFunSuite {
  private lazy val spark = SparkSessionTestWrapper.spark

  private val dim = 8
  private def base = {
    import spark.implicits._
    Seq((1L, Array.tabulate(dim)(d => (d + 1).toFloat)))
      .toDF("vec_id", "embedding")
  }

  private def copyVec(i: Int): Array[Float] =
    base.select(expr(ScaleUp.embeddingCopyExpr(dim, i)).as("e"))
      .head().getSeq[Float](0).toArray

  test("copies below the dimension are the pure rotation") {
    val src = copyVec(0)
    for (i <- 1 until dim) {
      val expected = Array.tabulate(dim)(d => src((d + i) % dim))
      assert(copyVec(i).toSeq == expected.toSeq, s"copy $i is not rotation by $i")
    }
  }

  test("every copy preserves the norm exactly (isometry)") {
    def norm2(v: Array[Float]): Double = v.map(x => x.toDouble * x).sum
    val n0 = norm2(copyVec(0))
    for (i <- Seq(1, dim - 1, dim, dim + 3, 5 * dim + 2, 20 * dim + 7))
      assert(math.abs(norm2(copyVec(i)) - n0) < 1e-6, s"copy $i changed the norm")
  }

  test("factors beyond the dimension evaluate and decorrelate") {
    // i and i + dim share the rotation; the sign flip must separate them
    for (i <- Seq(1, 3)) {
      val a = copyVec(i)
      val b = copyVec(i + dim)
      assert(a.toSeq != b.toSeq, s"copies $i and ${i + dim} are identical")
      // the flip only negates: absolute values match the rotation
      assert(a.map(math.abs).toSeq == b.map(math.abs).toSeq)
      // and some sign actually flipped while others survived, i.e. the
      // pattern is a real Rademacher vector, not a global negation
      val flips = a.zip(b).count { case (x, y) => x == -y && x != 0f }
      assert(flips > 0 && flips < dim, s"degenerate sign pattern: $flips/$dim flipped")
    }
  }

  test("distinct cycles get distinct sign patterns") {
    val one = copyVec(1 + dim)     // cycle 1, rotation 1
    val two = copyVec(1 + 2 * dim) // cycle 2, rotation 1
    assert(one.toSeq != two.toSeq, "cycle 1 and cycle 2 share a sign pattern")
  }
}
