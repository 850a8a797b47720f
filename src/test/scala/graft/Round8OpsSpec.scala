package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._

/** Driver-side independent reimplementations of the round-8 text
  * operators at sf0.001 — the same law the oracle gate checks at
  * sf0.01/sf0.1, but against hand-rolled Scala rather than DuckDB, so
  * a shared misreading of the semantics in BOTH SQL dialects can't
  * slip through (the specs and the SQL were written from the operator
  * definitions independently). */
class Round8OpsSpec extends AnyFunSuite {
  private lazy val spark = SparkSessionTestWrapper.spark
  private val SF = "/root/testdata/sf0.001"

  private def docs(): Seq[(Long, String, String)] =
    spark.read.parquet(s"$SF/documents.parquet")
      .select("doc_id", "lang", "text")
      .collect().toSeq.map(r => (r.getLong(0), r.getString(1), r.getString(2)))

  private def toks(text: String): Array[String] =
    text.toLowerCase.split("[^a-z0-9]+").filter(_.nonEmpty)

  test("q_chunk_sliding: chunks tile each sampled document exactly") {
    val W = 24; val S = 16; val MOD = 5
    val got = SparkEntry.queries("q_chunk_sliding")(spark, SF)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
    val byDoc = got.groupBy(_._1)
    val expected = docs().filter(_._1 % MOD == 0)
      .map { case (id, _, t) => id -> toks(t).length }
      .filter(_._2 > 0).toMap
    assert(byDoc.keySet == expected.keySet)
    byDoc.foreach { case (id, rows) =>
      val n = expected(id)
      val sorted = rows.sortBy(_._2)
      // consecutive indices from 0; starts at idx*S while start < n;
      // len = min(W, n-start). With W > S the last ceil((W-S)/S)+1
      // chunks may all be partial, so "full iff start+W <= n" is the
      // law — NOT "only the final chunk is short".
      assert(sorted.map(_._2).toSeq == sorted.indices.map(_.toLong))
      assert(sorted.size == (n - 1) / S + 1, "one chunk per stride start below n")
      sorted.foreach { case (_, idx, start, len) =>
        assert(start == idx * S)
        assert(len == math.min(W.toLong, n - start))
        assert(len > 0)
        assert((len == W) == (start + W <= n), "full width iff W tokens remain")
      }
      val (_, _, lastStart, lastLen) = sorted.last
      assert(lastStart + lastLen == n, "last chunk must end at the doc end")
    }
  }

  test("q_text_phrase: equals a naive scan for the phrase") {
    val phrase = Seq("data", "line", "join")
    val got = SparkEntry.queries("q_text_phrase")(spark, SF)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    val expect = docs().flatMap { case (id, _, t) =>
      val w = toks(t)
      val hits = w.indices.filter(i => i + phrase.size <= w.length &&
        phrase.indices.forall(k => w(i + k) == phrase(k)))
      if (hits.isEmpty) None
      else Some((id, hits.size.toLong, hits.min.toLong))
    }.toSet
    assert(got == expect)
    assert(got.nonEmpty, "fixture should contain the phrase")
  }

  test("q_memorization: equals a naive split/gram reimplementation") {
    val N = 8
    def hash28(s: String): Long = {
      val md = java.security.MessageDigest.getInstance("MD5")
      val hex = md.digest(s.getBytes("UTF-8")).map("%02x".format(_)).mkString
      java.lang.Long.parseLong(hex.take(7), 16)
    }
    def splitOf(id: Long): String = (hash28(s"split_$id") % 10) match {
      case p if p < 8 => "train"
      case 8          => "val"
      case _          => "test"
    }
    val grams = docs().map { case (id, lang, t) =>
      (id, lang, splitOf(id), toks(t).sliding(N).filter(_.length == N)
        .map(_.mkString(" ")).toSet)
    }
    val train = grams.filter(_._3 == "train").flatMap(_._4).toSet
    val perLang = grams.filter(_._3 != "train").filter(_._4.nonEmpty)
      .groupBy(_._2).map { case (lang, ds) =>
        val per = ds.map(d => (d._4.size.toLong, d._4.count(train).toLong))
        (lang, (per.size.toLong, per.map(_._1).sum, per.map(_._2).sum,
          per.count(p => p._2 * 2 >= p._1).toLong))
      }
    val got = SparkEntry.queries("q_memorization")(spark, SF)
      .collect().map(r => (r.getString(0),
        (r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4)))).toMap
    assert(got == perLang)
    assert(got.values.map(_._3).sum > 0,
      "planted exact dups should leak grams across splits")
  }

  test("q_ann_mrl_recall: shape and bounds") {
    val rows = SparkEntry.queries("q_ann_mrl_recall")(spark, SF).collect()
    assert(rows.length == 4)
    rows.foreach { r =>
      assert(r.getLong(1) == 5L)
      val rec = r.getDouble(3)
      assert(rec >= 0.0 && rec <= 1.0)
      assert(r.getLong(2) == math.round(rec * 5))
    }
  }

  private def embeddings(): Seq[(Long, Array[Double], Int)] =
    spark.read.parquet(s"$SF/embeddings.parquet")
      .collect().toSeq.map(r => (r.getLong(0),
        r.getSeq[Float](1).map(_.toDouble).toArray, r.getInt(2)))

  private def round4(x: Double): Double =
    BigDecimal(x).setScale(4, BigDecimal.RoundingMode.HALF_UP).toDouble

  private def cos4(a: Array[Double], b: Array[Double]): Double = {
    var dot = 0.0; var na = 0.0; var nb = 0.0; var i = 0
    while (i < a.length) { dot += a(i) * b(i); na += a(i) * a(i); nb += b(i) * b(i); i += 1 }
    round4(dot / (math.sqrt(na) * math.sqrt(nb)))
  }

  test("q_eval_retrieval: equals a naive metric reimplementation") {
    val QN = 8; val K = 10
    val vecs = embeddings()
    val byLabel = vecs.groupBy(_._3).map { case (l, vs) => (l, vs.size) }
    val g = (1 to K).map(i => math.floor(1e6 / (math.log(i + 1.0) / math.log(2.0))).toLong)
    val cum = g.scanLeft(0L)(_ + _).tail
    val expect = vecs.filter(_._1 < QN).map { case (qid, qv, qlab) =>
      val top = vecs.filter(_._1 != qid)
        .map { case (id, v, lab) => (id, cos4(qv, v), if (lab == qlab) 1 else 0) }
        .sortBy { case (id, c, _) => (-c, id) }.take(K)
      val hits = top.map(_._3.toLong).sum
      val dcgS = top.zipWithIndex.map { case ((_, _, rel), i) => rel * g(i) }.sum
      val fr = top.indexWhere(_._3 == 1) match { case -1 => None; case i => Some(i + 1) }
      val nRel = byLabel(qlab) - 1L
      (qid, nRel, hits, round4(hits.toDouble / nRel),
        fr.map(r => round4(1.0 / r)).getOrElse(0.0),
        round4(dcgS.toDouble / cum(math.min(K.toLong, nRel).toInt - 1)))
    }.sortBy(_._1)
    val got = SparkEntry.queries("q_eval_retrieval")(spark, SF)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2),
        r.getDouble(3), r.getDouble(4), r.getDouble(5))).toSeq
    assert(got == expect)
    assert(got.exists(_._3 > 0), "label structure should yield hits")
  }

  test("q_tokenize_fertility: equals a naive BPE induce+apply reimplementation") {
    val ROUNDS = 5
    val words = docs().flatMap { case (_, lang, t) => toks(t).map(lang -> _) }
    val byLang = words.groupBy(identity).map { case ((l, w), g) => (l, w, g.size.toLong) }
    var vocab: Map[String, (Long, String)] = byLang.groupBy(_._2)
      .map { case (w, g) => w -> (g.map(_._3).sum, w.toCharArray.mkString(" ")) }
    for (_ <- 1 to ROUNDS) {
      val pairCnt = vocab.values.toSeq.flatMap { case (f, sym) =>
        val a = sym.split(" ")
        a.indices.dropRight(1).map(i => (s"${a(i)} ${a(i + 1)}", f))
      }.groupBy(_._1).map { case (p, g) => (p, g.map(_._2).sum) }
      val (p, _) = pairCnt.toSeq.minBy { case (pp, c) => (-c, pp) }
      val merged = p.replace(" ", "")
      vocab = vocab.map { case (w, (f, sym)) =>
        w -> (f, (" " + sym + " ")
          .replaceAll(" " + java.util.regex.Pattern.quote(p) + " ", " " + merged + " ")
          .trim)
      }
    }
    val expect = byLang.groupBy(_._1).map { case (lang, g) =>
      val rows = g.map { case (_, w, f) =>
        (f, f * vocab(w)._2.split(" ").length, f * w.length) }
      val (nw, nt, nc) = (rows.map(_._1).sum, rows.map(_._2).sum, rows.map(_._3).sum)
      (lang, nw, nt, nc, round4(nt.toDouble / nw), round4(nc.toDouble / nt))
    }.toSeq.sortBy(_._1)
    val got = SparkEntry.queries("q_tokenize_fertility")(spark, SF)
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getDouble(4), r.getDouble(5))).toSeq
    assert(got == expect)
    // merges only ever join symbols: tokens never exceed chars,
    // and at least one word must actually have merged
    got.foreach { case (_, nw, nt, nc, fert, _) =>
      assert(nt <= nc && fert >= 1.0)
    }
    assert(got.map(_._3).sum < got.map(_._4).sum)
  }

  test("q_embed_pca: equals a naive integer power-iteration reimplementation") {
    val DIM = 64; val GRID = 1024L; val ITERS = 12; val QG = 10000L; val TOP = 5
    val vecs = embeddings()
    val n = vecs.size.toLong
    val q = vecs.map { case (id, v, _) =>
      (id, v.map(x => math.floor(x * QG).toLong)) }
    val sv = Array.tabulate(DIM)(i => q.map(_._2(i)).sum)
    val cov = Array.tabulate(DIM, DIM)((i, j) =>
      q.map(t => t._2(i) * t._2(j)).sum - (sv(i) * sv(j)) / n)
    var x = Array.fill(DIM)(1L); var m = 1L
    for (_ <- 1 to ITERS) {
      val y = Array.tabulate(DIM)(i => (0 until DIM).map(j => cov(i)(j) * x(j)).sum)
      m = y.map(math.abs).max
      x = y.map(v => v * GRID / m)
    }
    val lambdaQ = m / GRID
    val compSum = x.zipWithIndex.map { case (v, j) => (j + 1) * v }.sum
    val expect = q.map { case (id, qv) =>
      (id, (0 until DIM).map(j => x(j) * qv(j)).sum) }
      .sortBy { case (id, p) => (-math.abs(p), id) }.take(TOP)
      .map { case (id, p) => (id, p, lambdaQ, compSum) }
    val got = SparkEntry.queries("q_embed_pca")(spark, SF)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3))).toSeq
    assert(got == expect)
    // post-normalization invariant: the grid is saturated every round
    assert(x.map(math.abs).max == GRID)
  }

  test("q_rank_rrf: fuses the two arm rankings with exact integer RRF") {
    val KC = 60; val ARM = 20; val TOPN = 15
    // Lexical arm from the (oracle-gated) BM25 query; dense arm naive.
    val lex = SparkEntry.queries("q_rank_bm25")(spark, SF).collect()
      .map(r => (r.getLong(0), r.getLong(2))).sortBy { case (id, s) => (-s, id) }
      .zipWithIndex.map { case ((id, _), i) => (id, (i + 1).toLong) }
    val vecs = embeddings()
    val qv = vecs.find(_._1 == 0L).get._2
    val den = vecs.filter(_._1 != 0L)
      .map { case (id, v, _) => (id, cos4(qv, v)) }
      .sortBy { case (id, c) => (-c, id) }.take(ARM)
      .zipWithIndex.map { case ((id, _), i) => (id, (i + 1).toLong) }
    val lexM = lex.toMap; val denM = den.toMap
    val expect = (lexM.keySet ++ denM.keySet).toSeq.map { id =>
      val lr = lexM.getOrElse(id, 0L); val dr = denM.getOrElse(id, 0L)
      val s = (if (lr > 0) 1000000000L / (KC + lr) else 0L) +
        (if (dr > 0) 1000000000L / (KC + dr) else 0L)
      (id, lr, dr, s)
    }.sortBy { case (id, _, _, s) => (-s, id) }.take(TOPN)
    val got = SparkEntry.queries("q_rank_rrf")(spark, SF)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3))).toSeq
    assert(got == expect)
    assert(got.exists(t => t._2 > 0 && t._3 > 0) || got.nonEmpty)
  }

  test("q_dedup_cdc: equals a naive string-based CDC reimplementation; chunks tile") {
    val W = 8; val MOD = 64L; val B = 127L; val CPM = 251; val MIN = 16
    val pows = Array.iterate(1L, W)(_ * B).reverse // B^(W-1)..B^0
    def naiveChunks(t: String): Seq[String] = {
      val cps = t.codePoints().toArray
      val L = cps.length
      val bounds = (0 to L - W).filter { i =>
        (0 until W).map(j => (cps(i + j) % CPM).toLong * pows(j)).sum % MOD == 0
      }
      val cuts = (Seq(0, L) ++ bounds.map(_ + W).filter(_ < L)).distinct.sorted
      cuts.zip(cuts.tail).map { case (a, b2) =>
        new String(cps, a, b2 - a)
      }
    }
    // the native Expression must agree with the naive chunker doc by
    // doc, and the chunks must tile the document exactly
    val sparkChunks = spark.read.parquet(s"$SF/documents.parquet")
      .where(length(col("text")) >= 1)
      .select(col("doc_id"), graft.functions.TextExpressions
        .cdcChunksFast(col("text")).as("ch"))
      .collect().map(r => r.getLong(0) -> r.getSeq[String](1)).toMap
    docs().filter(_._3.nonEmpty).foreach { case (id, _, t) =>
      val naive = naiveChunks(t)
      assert(sparkChunks(id) == naive, s"doc $id chunk mismatch")
      assert(naive.mkString == t, s"doc $id chunks must tile the text")
    }
    // and the full profile query must equal the naive aggregate
    def md5hex(s: String): String = java.security.MessageDigest
      .getInstance("MD5").digest(s.getBytes("UTF-8"))
      .map("%02x".format(_)).mkString
    val all = docs().filter(_._3.nonEmpty).flatMap { case (id, _, t) =>
      naiveChunks(t).filter(c => c.codePointCount(0, c.length) >= MIN)
        .map(c => (id, md5hex(c), c.codePoints().count().toInt))
    }
    val expect = all.groupBy(_._2).map { case (h, xs) =>
      (h, xs.size.toLong, xs.map(_._1).distinct.size.toLong,
        xs.map(_._3).min.toLong)
    }.toSeq.filter(_._2 > 1).sortBy { case (h, cnt, _, _) => (-cnt, h) }.take(10)
    val got = SparkEntry.queries("q_dedup_cdc")(spark, SF).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2),
        r.getInt(3).toLong)).toSeq
    assert(got == expect)
  }

  test("q_quality_kn: equals a naive interpolated Kneser-Ney reimplementation") {
    val D = 0.75; val TOPK = 10
    val bigrams = docs().flatMap { case (id, lang, t) =>
      val w = toks(t)
      w.indices.dropRight(1).map(i => (id, lang, s"${w(i)} ${w(i + 1)}"))
    }
    val cbg = bigrams.groupBy(_._3).map { case (bg, xs) => bg -> xs.size.toLong }
    val w1Of = (bg: String) => bg.split(' ')(0)
    val w2Of = (bg: String) => bg.split(' ')(1)
    val cw1 = cbg.groupBy { case (bg, _) => w1Of(bg) }
      .map { case (u, m) => u -> m.values.sum }
    val n1l = cbg.groupBy { case (bg, _) => w1Of(bg) }
      .map { case (u, m) => u -> m.size.toLong }
    val n1r = cbg.groupBy { case (bg, _) => w2Of(bg) }
      .map { case (u, m) => u -> m.size.toLong }
    val nt = cbg.size.toLong
    val surp = cbg.map { case (bg, c) =>
      val p = (math.max(c.toDouble - D, 0.0) / cw1(w1Of(bg)).toDouble) +
        ((D * n1l(w1Of(bg)).toDouble) / cw1(w1Of(bg)).toDouble) *
          (n1r(w2Of(bg)).toDouble / nt.toDouble)
      bg -> math.floor(-math.log(p) * 1e6).toLong
    }
    val expect = bigrams.groupBy { case (id, lang, _) => (id, lang) }.toSeq
      .map { case ((id, lang), xs) =>
        val ssum = xs.map(x => surp(x._3)).sum
        (id, lang, xs.size.toLong,
          BigDecimal(ssum.toDouble / (xs.size * 1e6))
            .setScale(4, BigDecimal.RoundingMode.HALF_UP).toDouble)
      }
      .sortBy { case (id, _, _, sp) => (-sp, id) }.take(TOPK)
      .zipWithIndex.map { case ((id, lang, n, sp), i) => (i + 1L, id, lang, n, sp) }
    val got = SparkEntry.queries("q_quality_kn")(spark, SF).collect()
      .map(r => (r.getInt(0).toLong, r.getLong(1), r.getString(2), r.getLong(3),
        r.getDouble(4)))
      .toSeq
    assert(got == expect)
    // KN must actually diverge from the MLE ranking's scores somewhere
    // (the continuation term redistributes mass), or the smoothing is
    // a no-op and this test proves nothing.
    val mle = SparkEntry.queries("q_quality_bigram")(spark, SF).collect()
      .map(r => (r.getLong(1), r.getDouble(4))).toMap
    assert(got.exists { case (_, id, _, _, sp) => mle.get(id).forall(_ != sp) })
  }
}
