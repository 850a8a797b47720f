package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._

/** Round-10 regression tests: independent reimplementations /
  * counter-fixtures for this round's fixes, in the Round9OpsSpec
  * style (a law the DuckDB gate can't see because the fixtures are
  * ASCII-only). */
class Round10OpsSpec extends AnyFunSuite {
  private lazy val spark = SparkSessionTestWrapper.spark
  private val SF = "/root/testdata/sf0.001"

  test("charcov char split is code-point safe: surrogate pairs stay one character") {
    import spark.implicits._
    // non-BMP text: emoji (U+1F600), CJK extension (U+20000), plus ASCII
    val txt = "a😀b𠀀"
    val got = Seq(txt).toDF("text")
      .select(explode(expr("regexp_extract_all(text, '(?s).', 0)")).as("ch"))
      .where(col("ch") =!= "")
      .as[String].collect().toSeq
    assert(got == Seq("a", "😀", "b", "𠀀"))
    // every element is a full code point — no lone surrogates
    assert(got.forall(s => s.codePointCount(0, s.length) == 1))
    assert(got.forall(s => !s.exists(c => Character.isSurrogate(c) && s.length == 1)))
  }

  test("q_text_charcov equals a hand-rolled code-point histogram at sf0.001") {
    val docs = spark.read.parquet(s"$SF/documents.parquet")
      .select("text").collect().map(_.getString(0))
    // independent reimplementation: code-point iteration, exact integer
    // cumulative share at the 10^6 grain, minimal-prefix alphabet
    val hist = scala.collection.mutable.HashMap.empty[String, Long]
    docs.foreach { t =>
      var i = 0
      while (i < t.length) {
        val cp = t.codePointAt(i)
        val s = new String(Character.toChars(cp))
        hist(s) = hist.getOrElse(s, 0L) + 1L
        i += Character.charCount(cp)
      }
    }
    val total = hist.values.sum
    val ranked = hist.toSeq.sortBy { case (ch, n) => (-n, ch) }
    var cum = 0L
    val expect = ranked.zipWithIndex.map { case ((ch, n), idx) =>
      val before = cum
      cum += n
      (idx + 1, ch, n, cum * 1000000L / total, before * 1000000L / total < 999500L)
    }
    val got = graft.queries.TextAnalysis.qTextCharCoverage(spark, SF)
      .collect().toSeq.map(r =>
        (r.getInt(0), r.getString(1), r.getLong(2), r.getLong(3), r.getBoolean(4)))
    assert(got == expect)
  }

  test("q_dedup_soft twin ids live in the negative namespace (collision-free)") {
    // the law the fixture can't show: even if genuine doc_ids reached
    // 10^9, -id-1 re-keys can never collide with them
    val ids = Seq(0L, 5L, 999999999L, 1000000000L, 4000000005L)
    val twins = ids.map(id => -id - 1L)
    assert(twins.forall(_ < 0))
    assert(ids.toSet.intersect(twins.toSet).isEmpty)
    assert(twins.distinct.size == twins.size)
  }
}
