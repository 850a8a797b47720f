package graft.functions

import org.scalatest.funsuite.AnyFunSuite
import org.scalacheck.Gen
import org.apache.spark.sql.functions._
import graft.{PropSupport, SparkSessionTestWrapper}

/** The native codebook expressions must be bit-identical to the
  * DataFrame forms they replaced: ScaledSqDist == the
  * aggregate(zip_with(...)) fold, and NearestCodeword == the argmin
  * min(struct(dist, cid)) over an exploded codebook, including the
  * ties→lower-cid rule. Property-tested over random vectors/codebooks
  * plus a crafted exact-tie case. */
class CodebookExpressionsSpec extends AnyFunSuite with PropSupport {
  private lazy val spark = SparkSessionTestWrapper.spark

  private val smallLong = Gen.chooseNum(-2000L, 2000L)
  private def vecGen(n: Int): Gen[Array[Long]] = Gen.listOfN(n, smallLong).map(_.toArray)

  test("ScaledSqDist == interpreted aggregate(zip_with) fold") {
    import spark.implicits._
    val gen: Gen[(Array[Long], Array[Long])] =
      Gen.chooseNum(1, 16).flatMap(n => Gen.zip(vecGen(n), vecGen(n)))
    forAllN(gen, 20) { case (a, b) =>
      val df = Seq((a, b.map(_ * 1000L))).toDF("x", "y")
      val r = df.select(
        CodebookExpressions.scaledSqDist(col("x"), col("y"), 1000L).as("fast"),
        aggregate(zip_with(col("x"), col("y"),
            (p, q) => (p * lit(1000L) - q) * (p * lit(1000L) - q)),
          lit(0L), (acc, v) => acc + v).as("hof")).collect().head
      assert(r.getLong(0) == r.getLong(1))
    }
  }

  test("NearestCodeword == min(struct(dist, cid)) argmin over the exploded codebook") {
    import spark.implicits._
    val dims = 4
    val cbGen: Gen[Array[Array[Long]]] = for {
      k <- Gen.chooseNum(1, 6)
      rows <- Gen.listOfN(k, vecGen(dims).map(_.map(_ * 1000L)))
    } yield rows.toArray
    forAllN2(Gen.listOfN(5, vecGen(dims)), cbGen, 20) { (vecs, cbRows) =>
      val cents = Array(cbRows.flatten)
      val cids = Array(cbRows.indices.map(_.toLong).toArray)
      val got = vecs.map(Tuple1(_)).toDF("q")
        .select(CodebookExpressions
          .nearestCodeword(col("q"), lit(0), cents, cids, 1000L))
        .collect().map(_.getLong(0))
      val want = vecs.map { v =>
        cbRows.zipWithIndex.map { case (c, cid) =>
          (v.zip(c).map { case (x, y) =>
            val d = x * 1000L - y; d * d }.sum, cid.toLong)
        }.min._2
      }
      assert(got.toSeq == want)
    }
  }

  test("exact distance ties break to the LOWER cid") {
    import spark.implicits._
    // two identical codewords: both at distance 0 from the vector
    val cw = Array(7000L, -3000L)
    val cents = Array(cw ++ cw)
    val cids = Array(Array(0L, 1L))
    val r = Seq(Tuple1(Array(7L, -3L))).toDF("q")
      .select(CodebookExpressions.nearestCodeword(col("q"), lit(0), cents, cids, 1000L))
      .collect().head.getLong(0)
    assert(r == 0L, "tie must resolve to the lower cid")
  }

  test("ScaledSqDist nulls on length mismatch — matching zip_with null-pad propagation") {
    import spark.implicits._
    val df = Seq((Array(1L, 2L, 3L), Array(1000L, 2000L))).toDF("x", "y")
    val r = df.select(
      CodebookExpressions.scaledSqDist(col("x"), col("y"), 1000L).as("fast"),
      aggregate(zip_with(col("x"), col("y"),
          (p, q) => (p * lit(1000L) - q) * (p * lit(1000L) - q)),
        lit(0L), (acc, v) => acc + v).as("hof")).collect().head
    assert(r.isNullAt(0) && r.isNullAt(1), "both forms must null on mismatched lengths")
  }

  test("NearestCodeword nulls on an empty input vector (no divide-by-zero)") {
    import spark.implicits._
    val cents = Array(Array(1000L, 1000L))
    val cids = Array(Array(0L))
    val r = Seq(Tuple1(Array.empty[Long])).toDF("q")
      .select(CodebookExpressions.nearestCodeword(col("q"), lit(0), cents, cids, 1000L))
      .collect().head
    assert(r.isNullAt(0))
  }

  test("per-subspace dispatch selects the right sub-codebook") {
    import spark.implicits._
    // m=0's codebook only matches [1,1]; m=1's only [9,9]
    val cents = Array(Array(1000L, 1000L, 9000L, 9000L), Array(9000L, 9000L, 1000L, 1000L))
    val cids = Array(Array(10L, 11L), Array(20L, 21L))
    val df = Seq((0, Array(1L, 1L)), (1, Array(1L, 1L))).toDF("m", "q")
    val got = df.select(col("m"), CodebookExpressions
        .nearestCodeword(col("q"), col("m"), cents, cids, 1000L).as("cell"))
      .collect().map(r => (r.getInt(0), r.getLong(1))).toMap
    assert(got == Map(0 -> 10L, 1 -> 21L))
  }
}
