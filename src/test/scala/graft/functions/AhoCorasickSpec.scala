package graft.functions

import org.scalatest.funsuite.AnyFunSuite
import org.scalacheck.Gen
import org.apache.spark.sql.functions._
import org.apache.spark.unsafe.types.UTF8String
import graft.{PropSupport, SparkSessionTestWrapper}

/** The compiled AC DFA must equal the positional definition — for
  * every pattern p, count = |{ i : text[i, i+|p|) = p }| (OVERLAPPING
  * occurrences) — on adversarial dictionaries: patterns that are
  * prefixes/suffixes of each other (failure-link law), self-periodic
  * patterns (overlap counting), and patterns absent from the text. */
class AhoCorasickSpec extends AnyFunSuite with PropSupport {
  private lazy val spark = SparkSessionTestWrapper.spark

  private def naiveCount(text: String, p: String): Long =
    (0 to text.length - p.length).count(i => text.regionMatches(i, p, 0, p.length)).max(0).toLong

  private def acCounts(patterns: Seq[String], text: String): Seq[Long] = {
    val arr = AcAutomaton(patterns).counts(UTF8String.fromString(text))
    (0 until arr.numElements()).map(arr.getLong)
  }

  test("equals the positional definition on prefix/suffix-nested dictionaries") {
    val dict = Seq("a", "ab", "aba", "ba", "bab", "abab")
    for (text <- Seq("ababab", "aaaa", "abba", "", "b", "xyz", "abababa")) {
      assert(acCounts(dict, text) == dict.map(naiveCount(text, _)),
        s"text='$text'")
    }
  }

  test("overlapping occurrences are all counted (self-periodic patterns)") {
    assert(acCounts(Seq("aa"), "aaaa") == Seq(3L))
    assert(acCounts(Seq("batch batch"), "batch batch batch") == Seq(2L))
    assert(acCounts(Seq("aba", "a"), "ababa") == Seq(2L, 3L))
  }

  test("property: DFA == positional definition on random small-alphabet inputs") {
    // small alphabet maximizes pattern self-overlap and shared
    // prefixes — the regime where failure links actually fire
    val word = Gen.choose(1, 4).flatMap(n => Gen.stringOfN(n, Gen.oneOf('a', 'b')))
    val dictGen = Gen.choose(1, 5).flatMap(k => Gen.listOfN(k, word)).map(_.distinct)
    val textGen = Gen.choose(0, 30).flatMap(n => Gen.stringOfN(n, Gen.oneOf('a', 'b', 'c')))
    forAllN2(dictGen, textGen, 200) { (dict, text) =>
      if (dict.nonEmpty)
        assert(acCounts(dict, text) == dict.map(naiveCount(text, _)))
    }
  }

  test("codegen path agrees with eval and handles nulls/multibyte") {
    import spark.implicits._
    val dict = Seq("in", "ine", "err")
    val rows = Seq("window line join", null, "täble inïne", "").toDF("s")
      .select(AhoCorasick.counts(col("s"), dict).as("c"))
      .collect()
    assert(rows(0).getSeq[Long](0) == Seq(3L, 1L, 0L))
    assert(rows(1).isNullAt(0))
    // multi-byte bytes never alias ASCII patterns: "inïne" contains
    // "in" once at the start; 'ï' breaks the second potential match
    assert(rows(2).getSeq[Long](0) == Seq(1L, 0L, 0L))
    assert(rows(3).getSeq[Long](0) == Seq(0L, 0L, 0L))
  }
}
