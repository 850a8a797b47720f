package graft

import org.scalatest.funsuite.AnyFunSuite
import org.scalacheck.Gen

/** Round-16 operator laws: the token-LCP kernel under the rewritten
  * q_dedup_suffix short phase. The suffix rewrite's correctness rests
  * on two facts pinned here: (1) tokenLcp counts exactly the number of
  * whole space-separated tokens two keys share as a prefix, including
  * the truncated-tail cases; (2) on the tokens() alphabet ([a-z0-9]+,
  * every byte > 0x20) byte order of space-joined keys equals
  * lexicographic token-sequence order, which is what makes the
  * rank-adjacent boundary argument sound. The end-to-end operator is
  * separately pinned by Round14OpsSpec's brute-force equality and the
  * sf0.01/sf1 oracle hashes. */
class Round16OpsSpec extends AnyFunSuite with PropSupport {

  private def lcpRef(a: Seq[String], b: Seq[String]): Long =
    a.zip(b).takeWhile { case (x, y) => x == y }.size.toLong

  test("tokenLcp equals the token-sequence common-prefix length (crafted)") {
    def t(a: String, b: String) = queries.Dedup.tokenLcp(a, b)
    assert(t("a b c", "a b c") == 3)      // identical keys
    assert(t("a b c", "a b d") == 2)      // mismatch at token 3
    assert(t("a b", "a b c") == 2)        // exhausted at a boundary
    assert(t("a bc", "a b c") == 1)       // mismatch inside token 2
    assert(t("ab", "a b") == 0)           // token 1 differs though bytes share 'a'
    assert(t("a", "a") == 1)
    assert(t("a", "b") == 0)
    assert(t("", "a b") == 0)             // empty key carries no tokens
    assert(t("xyz", "xy") == 0)           // proper byte prefix, not a token
  }

  test("tokenLcp matches the split-based reference on random token keys") {
    val tok = Gen.nonEmptyListOf(Gen.alphaLowerChar).map(_.take(3).mkString)
    val key = Gen.choose(1, 8).flatMap(n => Gen.listOfN(n, tok))
    forAllN2(key, key, 300) { (a: List[String], b: List[String]) =>
      val (sa, sb) = (a.mkString(" "), b.mkString(" "))
      assert(queries.Dedup.tokenLcp(sa, sb) == lcpRef(a, b),
        s"tokenLcp($sa, $sb)")
    }
  }

  test("byte order of space-joined keys equals token-sequence order on the tokens() alphabet") {
    val tok = Gen.choose(1, 3).flatMap(n =>
      Gen.listOfN(n, Gen.oneOf(('a' to 'z') ++ ('0' to '9'))).map(_.mkString))
    val key = Gen.choose(1, 4).flatMap(n => Gen.listOfN(n, tok))
    // lexicographic order on token sequences (prefix-shorter first)
    def seqLt(a: List[String], b: List[String]): Boolean =
      if (a.isEmpty) b.nonEmpty
      else if (b.isEmpty) false
      else if (a.head != b.head) a.head < b.head
      else seqLt(a.tail, b.tail)
    forAllN2(key, key, 300) { (a: List[String], b: List[String]) =>
      val (sa, sb) = (a.mkString(" "), b.mkString(" "))
      assert((sa < sb) == seqLt(a, b) || sa == sb, s"order($sa, $sb)")
    }
  }

  test("q_agg_kmv: bitmask corpus pass equals the distinct-pair fallback") {
    // the gate only ever exercises the path the fixture's alphabet
    // selects (every fixture fits 62 bits → bitmask); this pins the
    // wide-alphabet fallback to the same frame
    val spark = SparkSessionTestWrapper.spark
    val sf = "/root/testdata/sf0.001"
    val mask = queries.Relational.kmvImpl(spark, sf, forceMask = Some(true))
      .collect().map(_.toSeq).toSeq
    val dist = queries.Relational.kmvImpl(spark, sf, forceMask = Some(false))
      .collect().map(_.toSeq).toSeq
    assert(mask.nonEmpty && mask == dist)
  }
}
