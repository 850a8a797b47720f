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

  test("q_link_records: every twin is classified exactly once (recall conservation)") {
    val rows = graft.queries.Dedup.qLinkRecords(spark, SF).collect()
    val nCust = spark.read.parquet(s"$SF/customer.parquet").count()
    // each customer has exactly one perturbed twin, and blocking never
    // loses it (the block key survives every perturbation), so the
    // per-class twin counts partition the customer set
    assert(rows.map(_.getAs[Long]("twin_pairs")).sum == nCust)
    // candidate pairs are a superset of the twins
    assert(rows.map(_.getAs[Long]("pairs")).sum >= nCust)
  }

  test("q_privacy_kanon: ladder conserves records; risk is monotone down the rungs") {
    val rows = graft.queries.Curation.qPrivacyKanon(spark, SF).collect()
      .map(r => (r.getAs[String]("level"), r.getAs[Long]("n_records"),
        r.getAs[Long]("risk_ppm"), r.getAs[Long]("n_classes"))).sortBy(_._1)
    assert(rows.length == 3)
    // every rung partitions the SAME record set
    assert(rows.map(_._2).distinct.length == 1)
    // generalizing (coarser QI) can only merge classes → fewer classes,
    // lower or equal k<5 exposure
    assert(rows(0)._4 >= rows(1)._4 && rows(1)._4 >= rows(2)._4)
    assert(rows(0)._3 >= rows(1)._3 && rows(1)._3 >= rows(2)._3)
  }

  test("q_agg_cms: estimates never undercount (the CMS one-sided bound)") {
    val rows = graft.queries.Relational.qAggCms(spark, SF).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      assert(r.getAs[Long]("n_cms") >= r.getAs[Long]("n_exact"))
      assert(r.getAs[Long]("over") ==
        r.getAs[Long]("n_cms") - r.getAs[Long]("n_exact"))
    }
  }

  test("q_ann_rq: the residual stage strictly reduces reconstruction error") {
    val rows = graft.queries.Similarity.qAnnRq(spark, SF).collect()
      .map(r => (r.getAs[String]("stage"), r.getAs[Long]("err_sum"))).toMap
    assert(rows.keySet == Set("s1_coarse", "s2_residual"))
    assert(rows("s2_residual") < rows("s1_coarse"))
  }
}
