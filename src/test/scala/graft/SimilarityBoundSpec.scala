package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.queries.Similarity

/** Pins SemDeDup's scale contract (VERDICT r6 item 2): K is derived
  * from the corpus count as ⌈n/W⌉, so the within-cell pair join stays
  * O(n·W) — the REALIZED max cell width must stay within a small
  * constant of the target W as n grows, or the "clustering makes
  * pairs tractable" claim silently inverts into all-pairs. Checked at
  * sf0.1 (the largest local fixture, n=2000 → K=32) and sf0.01
  * (n=500 → K=8): same W, 4× the data, 4× the cells.
  */
class SimilarityBoundSpec extends AnyFunSuite {
  private lazy val spark = SparkSessionTestWrapper.spark

  private def widths(sf: String): (Long, Long, Long) = {
    val cells = Similarity.semDedupCellsOf(spark, sf)
    val r = cells.groupBy("cell").count()
      .agg(max("count").as("maxw"), count(lit(1)).as("k"),
        sum("count").as("n")).collect()(0)
    (r.getLong(0), r.getLong(1), r.getLong(2))
  }

  test("semdedup K derives from corpus count; no cell exceeds 2x target width") {
    val w = Similarity.SEMDEDUP_CELL_W
    for (sf <- Seq("/root/testdata/sf0.01", "/root/testdata/sf0.1")) {
      val (maxw, k, n) = widths(sf)
      assert(k === Similarity.semDedupK(n).toLong,
        s"$sf: realized cell count must equal the derived K = ceil(n/W)")
      assert(maxw <= 2L * w,
        s"$sf: max cell width $maxw exceeds 2*W=${2 * w} — pair join unbounded")
    }
  }

  test("semDedupK is exact integer ceil(n/W)") {
    val w = Similarity.SEMDEDUP_CELL_W
    for (n <- Seq(1L, w.toLong - 1, w.toLong, w.toLong + 1, 500L, 2000L, 1000000L))
      assert(Similarity.semDedupK(n) === math.ceil(n.toDouble / w).toInt)
    assert(Similarity.semDedupK(0L) === 1, "degenerate corpus still fits one cell")
  }
}
