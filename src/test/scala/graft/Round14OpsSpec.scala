package graft

import org.scalatest.funsuite.AnyFunSuite

/** Law-level gates for the round-14 operator: the exact
  * longest-duplicate-substring (q_dedup_suffix) equals an in-JVM brute
  * force on the fixture, and the multilen doubling ladder's 2× bracket
  * law holds against it — the contract qDedupMultilen's scaladoc has
  * promised since round 8, now certified rather than argued.
  */
class Round14OpsSpec extends AnyFunSuite {
  private lazy val spark = SparkSessionTestWrapper.spark
  private val SF = "/root/testdata/sf0.001"

  private def tokensOf(text: String): Array[String] =
    text.toLowerCase.split("[^a-z0-9]+").filter(_.nonEmpty)

  /** Brute-force per-doc longest shared substring: for every length ℓ,
    * map gram → set of containing docs; doc's L = max ℓ with a gram
    * shared by ≥2 docs. O(Σ n_d · maxlen) gram builds — fine at
    * fixture scale, independent of both the engine's suffix ranks and
    * the oracle's bracketed ladder. */
  private def bruteLongest(docs: Seq[(Long, Array[String])]): Map[Long, Long] = {
    val maxLen = (docs.map(_._2.length) :+ 0).max
    val best = scala.collection.mutable.Map[Long, Long]().withDefaultValue(0L)
    for (l <- 1 to maxLen) {
      val byGram = scala.collection.mutable.Map[String, List[Long]]()
      for ((id, w) <- docs; i <- 0 to w.length - l) {
        val g = w.slice(i, i + l).mkString(" ")
        val cur = byGram.getOrElse(g, Nil)
        if (!cur.contains(id)) byGram(g) = id :: cur
      }
      byGram.valuesIterator.filter(_.lengthCompare(2) >= 0).foreach { ids =>
        ids.foreach(id => if (best(id) < l) best(id) = l.toLong)
      }
    }
    docs.map { case (id, _) => id -> best(id) }.toMap
  }

  test("q_dedup_suffix equals brute force on every document") {
    val got = SparkEntry.queries("q_dedup_suffix")(spark, SF).collect()
      .map(r => r.getAs[Long]("doc_id") -> r.getAs[Long]("l_exact")).toMap
    val docs = Tables.documents(spark, SF)
      .select("doc_id", "text").collect()
      .map(r => r.getAs[Long]("doc_id") -> tokensOf(r.getAs[String]("text")))
      .toSeq
    val brute = bruteLongest(docs)
    assert(got.keySet == brute.keySet)
    assert(brute.values.exists(_ > 0), "fixture must contain shared substrings")
    val diffs = got.collect { case (id, l) if brute(id) != l => (id, l, brute(id)) }
    assert(diffs.isEmpty, s"exact-longest diverged (doc, got, brute): ${diffs.take(10)}")
  }

  test("multilen ladder brackets the exact longest within 2x") {
    val exact = SparkEntry.queries("q_dedup_suffix")(spark, SF).collect()
      .map(r => r.getAs[Long]("doc_id") -> r.getAs[Long]("l_exact")).toMap
    val ladder = SparkEntry.queries("q_dedup_multilen")(spark, SF).collect()
      .map(r => r.getAs[Long]("doc_id") -> r.getAs[Long]("longest_dup")).toMap
    assert(exact.keySet == ladder.keySet)
    assert(ladder.values.exists(_ > 0), "fixture must exercise the ladder")
    ladder.foreach { case (id, g) =>
      val l = exact(id)
      g match {
        case 0L => assert(l < 8, s"doc $id: ladder 0 but exact $l >= 8")
        case 64L => assert(l >= 64, s"doc $id: ladder 64 but exact $l < 64")
        case _ => assert(g <= l && l < 2 * g,
          s"doc $id: exact $l outside ladder bracket [$g, ${2 * g})")
      }
    }
  }
}
