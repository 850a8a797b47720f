package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._

/** Laws of the OPQ Householder rotation (graft.queries.Similarity
  * round 9) checked against the PRODUCTION fit on the real fixture —
  * not a re-derivation in test code:
  *
  *  1. Near-isometry: H is exactly orthogonal in real arithmetic, so
  *     the only norm distortion in the integer evaluation is the
  *     per-component truncating division (error < 1 per component).
  *     For every corpus row, |‖r‖² − ‖q‖²| must stay inside the
  *     first-order truncation envelope 2·Σ|rᵢ| + dim.
  *  2. Direction law: the reflection was BUILT to send the top
  *     eigenvector u to (approximately, to isqrt rounding) the
  *     all-ones diagonal — the whole point of the variance balancing.
  *     Applying the production (v, v·v) to u itself in exact BigInt
  *     arithmetic must land within a few degrees of 1⃗.
  */
class OpqRotationSpec extends AnyFunSuite {
  private lazy val spark = SparkSessionTestWrapper.spark
  private val SF = "/root/testdata/sf0.001"

  test("integer rotation is an isometry up to the truncation envelope") {
    val rot = graft.queries.Similarity.opqRotatedVecs(spark, SF)
      .select(col("vec_id"), col("q"))
    val plain = graft.queries.Similarity.quantizedVecs(spark, SF)
      .select(col("vec_id"), col("q").as("q0"))
    val rows = rot.join(plain, "vec_id").collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val rq = r.getSeq[Long](1)
      val q0 = r.getSeq[Long](2)
      val nr = rq.map(x => BigInt(x) * x).sum
      val n0 = q0.map(x => BigInt(x) * x).sum
      // r = exact + e, |e| < 1 per component and ‖exact‖ = ‖q‖ exactly
      // (real reflection): |‖r‖²−‖q‖²| ≤ 2Σ|exactᵢ| + d ≤ 2Σ|rᵢ| + 3d
      val envelope = rq.map(x => BigInt(x).abs * 2).sum + 3 * rq.size
      assert((nr - n0).abs <= envelope,
        s"vec ${r.getLong(0)}: |${nr} - ${n0}| exceeds truncation envelope $envelope")
    }
  }

  test("the production reflection sends the top eigenvector onto the ones diagonal") {
    val (v, vv) = graft.queries.Similarity.opqRotationV(spark, SF)
    assert(vv > 0, "degenerate fixture: u exactly along the ones diagonal")
    val (u, _) = graft.queries.Similarity.pcaPowerFit(spark, SF)
    // exact reflection of u: r = (v·v)·u − 2(v·u)·v, cos vs 1⃗ in BigInt
    val vu = u.zip(v).map { case (a, b) => BigInt(a) * b }.sum
    val bvv = BigInt(vv)
    val r = u.zip(v).map { case (ui, vi) => bvv * ui - 2 * vu * vi }
    val dotOnes = r.sum
    val n2 = r.map(x => x * x).sum
    val dim = u.length
    // cos²(r, 1⃗) = (Σr)² / (‖r‖²·dim) ≥ 0.98² — within ~11° of the
    // diagonal (isqrt rounding keeps it from being exact)
    assert(dotOnes > 0, "rotated eigenvector points away from the diagonal")
    assert(dotOnes * dotOnes * 10000 >= n2 * dim * 9604, // 0.98² = 0.9604
      s"cos²(r, ones) below 0.9604: (Σr)²=${dotOnes * dotOnes}, ‖r‖²·d=${n2 * dim}")
  }
}
