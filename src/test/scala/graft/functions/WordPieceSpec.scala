package graft.functions

import org.scalatest.funsuite.AnyFunSuite
import org.scalacheck.Gen
import org.apache.spark.sql.functions._
import org.apache.spark.unsafe.types.UTF8String
import graft.{PropSupport, SparkSessionTestWrapper}

/** The native greedy segmenter must equal the positional definition —
  * at each position consume the LONGEST vocab piece starting there,
  * single-char fallback — and always reassemble the input exactly. */
class WordPieceSpec extends AnyFunSuite with PropSupport {
  private lazy val spark = SparkSessionTestWrapper.spark

  private def naive(vocab: Set[String], w: String): List[String] = {
    val maxLen = vocab.map(_.length).max
    def go(pos: Int): List[String] =
      if (pos >= w.length) Nil
      else {
        val len = (math.min(maxLen, w.length - pos) to 2 by -1)
          .find(l => vocab(w.substring(pos, pos + l))).getOrElse(1)
        w.substring(pos, pos + len) :: go(pos + len)
      }
    go(0)
  }

  private def native(vocab: Seq[String], w: String): List[String] = {
    val arr = new WpVocab(vocab.toArray).segment(UTF8String.fromString(w))
    (0 until arr.numElements()).map(arr.getUTF8String(_).toString).toList
  }

  test("greedy longest-match on nested-prefix vocabularies") {
    val vocab = Seq("a", "b", "ab", "abc", "bc", "c")
    assert(native(vocab, "abcabc") == List("abc", "abc"))
    assert(native(vocab, "ababc") == List("ab", "abc"))
    assert(native(vocab, "cba") == List("c", "b", "a"))
    // out-of-vocab char falls back to a single-char piece
    assert(native(vocab, "axb") == List("a", "x", "b"))
    assert(native(vocab, "") == Nil)
  }

  test("property: native == positional definition; pieces reassemble the word") {
    val piece = Gen.choose(1, 4).flatMap(n => Gen.stringOfN(n, Gen.oneOf('a', 'b', 'c')))
    val vocabGen = Gen.choose(2, 8).flatMap(k => Gen.listOfN(k, piece))
      .map(ps => (ps ++ Seq("a", "b", "c")).distinct)
    val wordGen = Gen.choose(0, 12).flatMap(n => Gen.stringOfN(n, Gen.oneOf('a', 'b', 'c', 'd')))
    forAllN2(vocabGen, wordGen, 300) { (vocab, w) =>
      val got = native(vocab, w)
      assert(got == naive(vocab.toSet, w))
      assert(got.mkString == w, "pieces must tile the word exactly")
    }
  }

  test("codegen path agrees with eval and handles null") {
    import spark.implicits._
    val vocab = Seq("st", "mer", "a", "b", "c", "e", "m", "r", "s", "t", "u", "o")
    val rows = Seq("customer", null).toDF("w")
      .select(WordPiece.segment(col("w"), vocab).as("p")).collect()
    assert(rows(0).getSeq[String](0) == Seq("c", "u", "st", "o", "mer"))
    assert(rows(1).isNullAt(0))
  }
}
