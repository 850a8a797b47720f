package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions.col

/** Invariant checks for the UniMax water-filling allocation
  * (queries.Pipeline.unimaxAlloc) against synthetic per-language
  * count tables, including the degenerate shapes the real corpus
  * never exercises (all-saturated, single language, extreme skew).
  *
  * With caps sorted ascending, budget N = ⌊3T/2⌋ and epoch cap E:
  *  - saturation must be a PREFIX of the ascending-cap order (the
  *    exact integer test cap_i·(K−i+1) ≤ N−S_{i−1} is monotone);
  *  - saturated languages get exactly cap; unsaturated all get the
  *    same share r with r < their cap;
  *  - the total allocation never exceeds N, and (floor-maximality)
  *    granting every unsaturated language one more token would.
  */
class UnimaxSpec extends AnyFunSuite {
  private lazy val spark = SparkSessionTestWrapper.spark

  private case class Alloc(lang: String, c: Long, cap: Long, saturated: Int, alloc: Long)

  private def run(counts: Seq[(String, Long)]): Seq[Alloc] = {
    import spark.implicits._
    val df = counts.toDF("lang", "c")
    queries.Pipeline.unimaxAlloc(df)
      .select(col("lang"), col("c"), col("cap"), col("saturated"), col("alloc"))
      .collect().toSeq
      .map(r => Alloc(r.getString(0), r.getLong(1), r.getLong(2), r.getInt(3), r.getLong(4)))
  }

  private def checkInvariants(counts: Seq[(String, Long)]): Unit = {
    val out = run(counts)
    assert(out.size == counts.size)
    val t = counts.map(_._2).sum
    val n = t * 3 / 2
    val asc = out.sortBy(a => (a.cap, a.lang))
    // prefix property: once a language is unsaturated, all larger are
    val flags = asc.map(_.saturated)
    assert(flags.zip(flags.tail).forall { case (a, b) => a >= b },
      s"saturation not a prefix: $asc")
    // saturated get cap; unsaturated share a common r below their cap
    asc.filter(_.saturated == 1).foreach(a => assert(a.alloc == a.cap))
    val unsat = asc.filter(_.saturated == 0)
    if (unsat.nonEmpty) {
      val rs = unsat.map(_.alloc).distinct
      assert(rs.size == 1, s"unsaturated shares differ: $unsat")
      assert(unsat.forall(a => a.alloc < a.cap), s"unsaturated at/over cap: $unsat")
      // budget-exact under floor division: within N, but one more each would exceed
      val totalAlloc = asc.map(_.alloc).sum
      assert(totalAlloc <= n, s"allocated $totalAlloc over budget $n")
      assert(totalAlloc + unsat.size > n,
        s"not floor-maximal: $totalAlloc + ${unsat.size} <= $n")
    } else {
      // everything saturated: the whole corpus fits E epochs in budget
      assert(asc.map(_.alloc).sum == asc.map(_.cap).sum)
      assert(asc.map(_.cap).sum <= n)
    }
  }

  test("corpus-like skew: one head language, several low-resource") {
    checkInvariants(Seq("en" -> 112006L, "de" -> 38406L, "zh" -> 38727L,
      "fr" -> 40521L, "es" -> 41044L))
  }

  test("balanced languages: nobody saturates, all get the equal floor share") {
    checkInvariants(Seq("a" -> 100L, "b" -> 100L, "c" -> 100L))
  }

  test("single language") { checkInvariants(Seq("solo" -> 12345L)) }

  test("extreme skew: head holds ~99% of tokens") {
    checkInvariants(Seq("head" -> 990000L, "t1" -> 4000L, "t2" -> 3000L,
      "t3" -> 2000L, "t4" -> 1000L))
  }

  test("pseudo-random tables keep every invariant") {
    val rnd = new scala.util.Random(421)
    for (_ <- 1 to 12) {
      val k = 1 + rnd.nextInt(8)
      val counts = (0 until k).map(i => s"l$i" -> (1L + rnd.nextInt(100000)))
      checkInvariants(counts)
    }
  }
}
