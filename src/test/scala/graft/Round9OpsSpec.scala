package graft

import org.scalatest.funsuite.AnyFunSuite

/** Driver-side independent reimplementations of the round-9 operators
  * at sf0.001 — the same law the oracle gate checks at sf0.01/sf0.1,
  * but against hand-rolled Scala rather than DuckDB, so a shared
  * misreading of the semantics in BOTH SQL dialects can't slip
  * through. */
class Round9OpsSpec extends AnyFunSuite {
  private lazy val spark = SparkSessionTestWrapper.spark
  private val SF = "/root/testdata/sf0.001"

  private def docs(): Seq[(Long, String, String)] =
    spark.read.parquet(s"$SF/documents.parquet")
      .select("doc_id", "lang", "text")
      .collect().toSeq.map(r => (r.getLong(0), r.getString(1), r.getString(2)))

  private def toks(text: String): Array[String] =
    text.toLowerCase.split("[^a-z0-9]+").filter(_.nonEmpty)

  private def hash28(s: String): Long = {
    val md = java.security.MessageDigest.getInstance("MD5")
    val hex = md.digest(s.getBytes("UTF-8")).map(b => f"$b%02x").mkString
    java.lang.Long.parseLong(hex.substring(0, 7), 16)
  }

  test("q_curriculum_order: equals a naive histogram-bucket + seeded-shuffle schedule") {
    val Q = 4; val SHARDS = 4; val HEAD = 2
    val d = docs().map { case (id, _, t) => (id, toks(t).length) }
    val n = d.size
    // docs strictly easier than v, from the full histogram
    val cumBefore: Map[Int, Int] = {
      val h = d.groupBy(_._2).view.mapValues(_.size).toMap
      h.keys.map(v => v -> h.filter(_._1 < v).values.sum).toMap
    }
    val expect = d
      .map { case (id, nt) =>
        val b = math.min(Q - 1, cumBefore(nt).toLong * Q / n)
        (b, (id % SHARDS).toInt, id, nt)
      }
      .groupBy { case (b, sh, _, _) => (b, sh) }
      .flatMap { case ((b, sh), rows) =>
        rows.sortBy { case (_, _, id, _) => (hash28(s"cur_$id"), id) }
          .take(HEAD).zipWithIndex
          .map { case ((_, _, id, nt), i) => (b, sh, i + 1, id, nt.toLong) }
      }.toSet
    val got = SparkEntry.queries("q_curriculum_order")(spark, SF)
      .collect().map(r =>
        (r.getLong(0), r.getInt(1), r.getInt(2), r.getLong(3), r.getLong(4))).toSet
    assert(got == expect)
    // every (bucket, shard) stream present with exactly HEAD rows
    // (sf0.001 has >> Q*SHARDS*HEAD docs, no stream can run short)
    assert(got.groupBy(t => (t._1, t._2)).forall(_._2.size == HEAD))
    assert(got.map(t => (t._1, t._2)).size == Q * SHARDS)
    // buckets are ordered by difficulty: max n_tok of bucket b's head
    // sample cannot undercut min of bucket b+1 by construction of the
    // cut rule — check on the full assignment instead of the sample
    val byBucket = d.groupBy { case (id, nt) =>
      math.min(Q - 1, cumBefore(nt).toLong * Q / n) }
    for (b <- 0L until (Q - 1).toLong)
      assert(byBucket(b).map(_._2).max <= byBucket(b + 1).map(_._2).min)
  }

  test("q_select_rho: equals a naive two-model excess-loss selection") {
    val TOPK = 16
    val d = docs().map { case (id, l, t) => (id, l, toks(t)) }
    val allToks = d.flatMap(_._3)
    val total = allToks.size.toDouble
    val cTok = allToks.groupBy(identity).view.mapValues(_.size).toMap
    val uniSurp: Map[String, Long] =
      cTok.map { case (w, c) => w -> math.floor(-math.log(c / total) * 1e6).toLong }
    val allBg = d.flatMap { case (_, _, w) => w.sliding(2).filter(_.length == 2).map(_.mkString(" ")) }
    val cBg = allBg.groupBy(identity).view.mapValues(_.size).toMap
    val cW1 = allBg.groupBy(_.split(" ")(0)).view.mapValues(_.size).toMap
    val bgSurp: Map[String, Long] = cBg.map { case (b, c) =>
      b -> math.floor(-math.log(c.toDouble / cW1(b.split(" ")(0))) * 1e6).toLong
    }
    def r4(x: Double) = BigDecimal(x).setScale(4, BigDecimal.RoundingMode.HALF_UP).toDouble
    val scored = d.filter(_._3.length >= 2).map { case (id, l, w) =>
      val us = w.map(uniSurp).sum
      val bgs = w.sliding(2).filter(_.length == 2).map(_.mkString(" ")).toSeq
      val bs = bgs.map(bgSurp).sum
      val u = us.toDouble / (w.length * 1e6)
      val b = bs.toDouble / (bgs.size * 1e6)
      (id, l, w.length.toLong, r4(u), r4(b), r4(u - b))
    }
    val expect = scored.sortBy { case (id, _, _, _, _, ex) => (-ex, id) }
      .take(TOPK).zipWithIndex
      .map { case ((id, l, nt, u, b, ex), i) => (i + 1, id, l, nt, u, b, ex) }.toSet
    val got = SparkEntry.queries("q_select_rho")(spark, SF)
      .collect().map(r => (r.getInt(0), r.getLong(1), r.getString(2), r.getLong(3),
        r.getDouble(4), r.getDouble(5), r.getDouble(6))).toSet
    assert(got == expect)
    // the selection law: excess is always >= 0 up to rounding (the
    // bigram conditional can only sharpen the unigram marginal on
    // self-scored data in aggregate... not per-doc — but the TOP
    // selections must be strictly positive for the criterion to mean
    // anything on this corpus)
    assert(got.forall(_._7 > 0), "top-RHO docs must have positive excess")
  }

  test("q_embed_rp: equals a naive sign-projection; norm ratios concentrate near 1") {
    val K = 16; val MOD = 5
    val signs = Array.tabulate(K, 64) { (j, dd) =>
      if (hash28(s"rp_${j}_$dd") % 2 == 0) 1L else -1L
    }
    val vecs = spark.read.parquet(s"$SF/embeddings.parquet")
      .select("vec_id", "embedding").collect()
      .map(r => (r.getLong(0), r.getSeq[Float](1).toArray))
      .filter(_._1 % MOD == 0)
    val expect = vecs.map { case (id, x) =>
      val g = x.map(v => math.floor(v.toDouble * 1e6).toLong)
      val yg = signs.map(row => row.zip(g).map { case (s, gv) => s * gv }.sum)
      val yn2 = yg.map(v => v * v).sum
      val xn2 = g.map(v => v * v).sum
      val ys = yg.take(4).map(v => BigDecimal(v / 4e6)
        .setScale(8, BigDecimal.RoundingMode.HALF_UP).toDouble)
      (id, ys(0), ys(1), ys(2), ys(3),
        if (xn2 > 0) BigDecimal(yn2.toDouble / (xn2 * K))
          .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble else Double.NaN)
    }.toSet
    val got = SparkEntry.queries("q_embed_rp")(spark, SF)
      .collect().map(r => (r.getLong(0), r.getDouble(1), r.getDouble(2),
        r.getDouble(3), r.getDouble(4),
        if (r.isNullAt(5)) Double.NaN else r.getDouble(5))).toSet
    assert(got == expect)
    // the JL guarantee: E[‖y‖²] = ‖x‖² — sample mean of the ratio must
    // sit near 1 (loose band; K=16 has ~1/√8 relative std per vector)
    val ratios = got.toSeq.map(_._6).filterNot(_.isNaN)
    assert(ratios.nonEmpty)
    val mean = ratios.sum / ratios.size
    assert(mean > 0.8 && mean < 1.2, s"JL norm-ratio mean drifted: $mean")
  }

  test("q_mm_scenecut: equals a naive frame-delta scan") {
    val THRESH = 110L; val FB = 8; val MOD = 20
    val expect = docs().filter(_._1 % MOD == 0).map { case (id, _, t) =>
      val bytes = t.getBytes("UTF-8")
      val energies = (0 until bytes.length / FB).map { i =>
        (0 until FB).map(j => (bytes(i * FB + j) & 0xFF).toLong).sum
      }
      val deltas = energies.sliding(2).collect { case Seq(a, b) => math.abs(b - a) }.toSeq
      val cuts = deltas.zipWithIndex.collect { case (d, i) if d >= THRESH => i + 1 }
      (id, energies.size.toLong, cuts.size.toLong,
        if (deltas.isEmpty) None else Some(deltas.max),
        cuts.headOption.map(_.toLong))
    }.filter(_._2 > 0).toSet
    val got = SparkEntry.queries("q_mm_scenecut")(spark, SF)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2),
        if (r.isNullAt(3)) None else Some(r.getLong(3)),
        if (r.isNullAt(4)) None else Some(r.getInt(4).toLong))).toSet
    assert(got == expect)
    assert(got.exists(_._3 > 0) && got.exists(_._3 == 0),
      "threshold must split the corpus into cut and cut-free videos")
  }

  test("q_diff_snapshot: equals a naive simulated-v2 reconcile; statuses partition both snapshots") {
    val DROP = 10; val EDIT = 20; val ADD = 90; val OFF = 1000000000L
    val v1 = docs()
    val pct = v1.map { case (id, _, _) => id -> hash28(s"v2_$id") % 100 }.toMap
    val v2: Map[Long, (String, String)] =
      (v1.collect { case (id, l, t) if pct(id) >= DROP =>
        id -> (l, if (pct(id) < EDIT) t + " rev2" else t) } ++
       v1.collect { case (id, l, t) if pct(id) >= ADD =>
        (id + OFF) -> (l, "new " + t) }).toMap
    val v1m = v1.map { case (id, l, t) => id -> (l, t) }.toMap
    val statuses = (v1m.keySet ++ v2.keySet).toSeq.map { id =>
      val s = (v1m.get(id), v2.get(id)) match {
        case (None, Some(_)) => "added"
        case (Some(_), None) => "removed"
        case (Some((_, t1)), Some((_, t2))) => if (t1 != t2) "changed" else "unchanged"
        case _ => fail("id in neither snapshot")
      }
      val lang = v1m.get(id).orElse(v2.get(id)).get._1
      val c1 = v1m.get(id).map(_._2.length.toLong).getOrElse(0L)
      val c2 = v2.get(id).map(_._2.length.toLong).getOrElse(0L)
      (lang, s, c1, c2)
    }
    val expect = statuses.groupBy(t => (t._1, t._2)).map { case ((l, s), rows) =>
      (l, s, rows.size.toLong, rows.map(_._3).sum, rows.map(_._4).sum)
    }.toSet
    val got = SparkEntry.queries("q_diff_snapshot")(spark, SF)
      .collect().map(r =>
        (r.getString(0), r.getString(1), r.getLong(2), r.getLong(3), r.getLong(4))).toSet
    assert(got == expect)
    // audit must conserve both snapshots exactly: per-status doc
    // counts reassemble |v1| and |v2|
    def tot(ss: Set[String], side: Int) =
      got.filter(t => ss(t._2)).toSeq.map(_._3).sum
    assert(tot(Set("removed", "changed", "unchanged"), 1) == v1.size.toLong)
    assert(tot(Set("added", "changed", "unchanged"), 2) == v2.size.toLong)
    // and the edit marker moves every changed doc's char count by +5
    val chg = got.filter(_._2 == "changed")
    assert(chg.nonEmpty && chg.forall(t => t._5 - t._4 == 5L * t._3))
  }

  test("q_graph_labelprop: equals naive synchronous min-tie-break label propagation") {
    val edges = spark.read.parquet(s"$SF/lineitem.parquet")
      .selectExpr("l_partkey % 100 AS a", "l_suppkey % 100 AS b")
      .collect().map(r => (r.getLong(0), r.getLong(1)))
      .filter { case (a, b) => a != b }.toSet
    val und = edges.flatMap { case (a, b) => Seq((a, b), (b, a)) }
    val adj = und.groupBy(_._1).view.mapValues(_.map(_._2).toSeq).toMap
    var labels: Map[Long, Long] = adj.keys.map(v => v -> v).toMap
    for (_ <- 1 to 3) {
      labels = adj.map { case (v, ns) =>
        val counts = ns.map(labels).groupBy(identity).view.mapValues(_.size)
        v -> counts.toSeq.minBy { case (lb, c) => (-c, lb) }._1
      }
    }
    val got = SparkEntry.queries("q_graph_labelprop")(spark, SF)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toMap
    assert(got == labels)
    // propagation actually merged communities: fewer labels than nodes
    assert(got.values.toSet.size < got.size)
  }

  test("q_select_kcenter: equals naive greedy farthest-point selection") {
    val vecs = spark.read.parquet(s"$SF/embeddings.parquet")
      .selectExpr("vec_id",
        "transform(embedding, x -> CAST(floor(CAST(x AS DOUBLE) * 1000) AS BIGINT)) AS q")
      .collect().map(r => (r.getLong(0), r.getSeq[Long](1).toArray))
      .sortBy(_._1)
    def sq(a: Array[Long], b: Array[Long]): Long =
      a.zip(b).map { case (x, y) => (x - y) * (x - y) }.sum
    val picked = scala.collection.mutable.ArrayBuffer((0, vecs.head._1, 0L))
    var md: Map[Long, Long] = vecs.map { case (id, q) => id -> sq(q, vecs.head._2) }.toMap
    for (step <- 1 until 4) {
      val (cid, dist) = md.toSeq.minBy { case (id, m) => (-m, id) }
      picked += ((step, cid, dist))
      val cq = vecs.find(_._1 == cid).get._2
      md = vecs.map { case (id, q) => id -> math.min(md(id), sq(q, cq)) }.toMap
    }
    val got = SparkEntry.queries("q_select_kcenter")(spark, SF)
      .collect().map(r => (r.getInt(0), r.getLong(1), r.getLong(2)))
    assert(got.toSeq == picked.toSeq)
    // coverage radius is monotone non-increasing after the seed
    val d = got.drop(1).map(_._3)
    assert(d.zip(d.drop(1)).forall { case (x, y) => y <= x })
  }

  test("q_sql_recursive: equals a naive depth-bounded functional-graph walk") {
    val keys = spark.read.parquet(s"$SF/nation.parquet")
      .select("n_nationkey").collect().map(_.getInt(0)).toSet
    val expect = (0 until 5).filter(keys).map { root =>
      // UNION ALL recursion: one frontier ROW per walk per level while
      // any successor resolves; n_reach counts DISTINCT nodes touched
      var frontier = Set(root); var depth = 0; var maxd = 0
      val seen = scala.collection.mutable.Set(root)
      while (frontier.nonEmpty && depth < 6) {
        depth += 1
        frontier = frontier.map(v => (v * 7 + 3) % 25).filter(keys)
        if (frontier.nonEmpty) { maxd = depth; seen ++= frontier }
      }
      (root, seen.size.toLong, maxd)
    }.toSet
    val got = SparkEntry.queries("q_sql_recursive")(spark, SF)
      .collect().map(r => (r.getInt(0), r.getLong(1), r.getInt(2))).toSet
    assert(got == expect)
  }

  test("q_events_funnel: equals a naive staged re-anchoring window walk") {
    val W = 7L * 24 * 3600 * 1000000
    val ev = Tables.events(spark, SF)
      .selectExpr("user_id", "event_type", "unix_micros(ts) AS us")
      .collect().map(r => (r.getLong(0), r.getString(1), r.getLong(2)))
    def firstAfter(tpe: String, anchor: Map[Long, Long]): Map[Long, Long] =
      ev.filter(e => e._2 == tpe && anchor.get(e._1).exists(a =>
          e._3 >= a && e._3 <= a + W))
        .groupBy(_._1).view.mapValues(_.map(_._3).min).toMap
    val tv = ev.filter(_._2 == "view").groupBy(_._1).view.mapValues(_.map(_._3).min).toMap
    val tc = firstAfter("click", tv)
    val tp = firstAfter("purchase", tc)
    val meanSecs = tp.keys.toSeq.map(u => tp(u) - tv(u)).sum / (tp.size.toLong * 1000000)
    val got = SparkEntry.queries("q_events_funnel")(spark, SF).head()
    assert((got.getLong(0), got.getLong(1), got.getLong(2), got.getLong(3)) ==
      (tv.size.toLong, tc.size.toLong, tp.size.toLong, meanSecs))
    // funnel populations are monotone by construction
    assert(got.getLong(0) >= got.getLong(1) && got.getLong(1) >= got.getLong(2))
  }

  test("q_events_anomaly: equals a naive exact-integer trailing z-test") {
    val W = 5; val Z2 = 9L
    val ev = Tables.events(spark, SF)
      .selectExpr("event_id", "user_id", "event_type", "unix_micros(ts) AS us",
        "CAST(floor(value * 100) AS BIGINT) AS vg")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getString(2), r.getLong(3), r.getLong(4)))
    val expect = ev.groupBy(e => (e._2, e._3)).toSeq.flatMap { case ((_, tpe), es) =>
      val sorted = es.sortBy(e => (e._4, e._1)).map(_._5)
      sorted.indices.filter(_ >= W).map { i =>
        val prev = sorted.slice(i - W, i)
        val s = prev.sum; val q = prev.map(v => v * v).sum; val v = sorted(i)
        (tpe, if ((v * W - s) * (v * W - s) > Z2 * (W * q - s * s)) 1L else 0L)
      }
    }.groupBy(_._1).map { case (tpe, fs) =>
      (tpe, fs.size.toLong, fs.map(_._2).sum) }.toSet
    val got = SparkEntry.queries("q_events_anomaly")(spark, SF)
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2))).toSet
    assert(got == expect)
    // the exact test does flag something at sf0.001 (non-vacuous gate)
    assert(got.exists(_._3 > 0))
  }

  test("q_mm_ssim: equals a naive pixel-formula SSIM over consecutive frames") {
    val keys = spark.read.parquet(s"$SF/part.parquet")
      .where("p_partkey % 100 = 0").select("p_partkey")
      .collect().map(_.getLong(0)).sorted
    def frame(pk: Long, i: Int): Array[Long] =
      Array.tabulate(16)(j => (pk * 7 + i * 13 + j) % 251)
    val expect = keys.flatMap { pk =>
      (0 until 5).map { i =>
        val x = frame(pk, i); val y = frame(pk, i + 1)
        val sx = x.sum; val sy = y.sum
        val qx = x.map(v => v * v).sum; val qy = y.map(v => v * v).sum
        val pp = x.zip(y).map { case (a, b) => a * b }.sum
        val cov = 16 * pp - sx * sy
        val a = (2 * sx * sy * 10000 + 65025L * 256).toDouble
        val b = (2 * (16 * pp - sx * sy) * 10000 + 585225L * 256).toDouble
        val c = ((sx * sx + sy * sy) * 10000 + 65025L * 256).toDouble
        val e = ((16 * qx - sx * sx + 16 * qy - sy * sy) * 10000 + 585225L * 256).toDouble
        val ssim = BigDecimal(a * b / (c * e))
          .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
        (pk, i, cov, ssim)
      }
    }.toSet
    val got = SparkEntry.queries("q_mm_ssim")(spark, SF)
      .collect().map(r => (r.getLong(0), r.getInt(1), r.getLong(2), r.getDouble(3))).toSet
    assert(got == expect)
    // SSIM lives in [-1, 1]; anticorrelated frame pairs (negative
    // covariance — the %251 wrap produces them) legitimately go
    // negative, but the luminance term keeps some pairs positive
    assert(got.forall { case (_, _, _, v) => v >= -1.0 && v <= 1.0 })
    assert(got.exists { case (_, _, cov, v) => cov > 0 && v > 0.0 })
  }

  test("q_text_rake: equals a naive RAKE scorer") {
    val stops = Set("the", "a", "of", "and")
    val texts = docs().map(_._3)
    val phrases = texts.flatMap { t =>
      t.toLowerCase.split("\\b(?:the|a|of|and)\\b").map(_.trim).filter(_.nonEmpty)
    }.map(p => (p, p.split(" +"))).filter(_._2.length <= 4)
    val wstat = phrases.flatMap { case (_, w) => w.map(x => (x, w.length - 1L)) }
      .groupBy(_._1).map { case (word, xs) =>
        val freq = xs.size.toLong; val deg = xs.map(_._2).sum
        word -> 1000000L * (freq + deg) / freq
      }
    val scored = phrases.map(_._1).distinct.map { p =>
      val w = p.split(" +")
      (p, w.length, w.map(wstat).sum)
    }
    val top = scored.sortBy { case (p, _, s) => (-s, p) }.take(15).zipWithIndex
      .map { case ((p, nw, s), i) => (i + 1, p, nw, s) }
    val got = SparkEntry.queries("q_text_rake")(spark, SF)
      .collect().map(r => (r.getInt(0), r.getString(1), r.getInt(2), r.getLong(3)))
    assert(got.toSeq == top.toSeq)
  }

  test("q_tokenize_unigram: equals a naive induce + Viterbi") {
    val MAXP = 6; val V = 120; val MAXW = 12
    val d = docs()
    val occ = d.flatMap { case (_, lang, t) => toks(t).filter(_.length <= MAXW).map((lang, _)) }
      .groupBy(identity).map { case ((lang, w), xs) => (lang, w, xs.size.toLong) }
    val types = occ.groupBy(_._2).map { case (w, xs) => (w, xs.map(_._3).sum) }
    val pw = types.toSeq.flatMap { case (w, f) =>
      (0 until w.length).flatMap(i =>
        (1 to MAXP).withFilter(l => i + l <= w.length).map(l => (w.substring(i, i + l), f)))
    }.groupBy(_._1).map { case (p, xs) => (p, xs.map(_._2).sum) }
    val kept = pw.filter(_._1.length >= 2).toSeq
      .sortBy { case (p, wg) => (-wg, p) }.take(V) ++ pw.filter(_._1.length == 1)
    val tot = kept.map(_._2).sum
    val cost = kept.map { case (p, wg) =>
      p -> math.floor(-math.log(wg.toDouble / tot) * 1e6).toLong }.toMap
    def vit(w: String): (Long, Int) = {
      val n = w.length
      val dp = Array.fill(n + 1)((Long.MaxValue, Int.MaxValue))
      dp(0) = (0L, 0)
      for (i <- 1 to n; l <- 1 to math.min(MAXP, i); if dp(i - l)._1 != Long.MaxValue)
        cost.get(w.substring(i - l, i)).foreach { c =>
          val cand = (dp(i - l)._1 + c, dp(i - l)._2 + 1)
          if (cand._1 < dp(i)._1 || (cand._1 == dp(i)._1 && cand._2 < dp(i)._2))
            dp(i) = cand
        }
      dp(n)
    }
    val expect = occ.map { case (lang, w, n) =>
      val (c, np) = vit(w); (lang, w, n, np, c) }.toSet
    val got = SparkEntry.queries("q_tokenize_unigram")(spark, SF)
      .collect().map(r =>
        (r.getString(0), r.getString(1), r.getLong(2), r.getInt(3), r.getLong(4))).toSet
    assert(got == expect)
    // the LM prefers few frequent pieces: nothing segments to per-char
    // unless the word IS rare; common words take ≤ 3 pieces
    assert(got.forall { case (_, w, _, np, _) => np >= 1 && np <= w.length })
  }

  test("q_text_llr: equals a naive Dunning G2 over the bigram contingency table") {
    val pairs = docs().map(_._3).map(toks).filter(_.length >= 2)
      .flatMap(w => w.zip(w.tail))
    val k = pairs.groupBy(identity).view.mapValues(_.size.toLong).toMap
    val ca = pairs.groupBy(_._1).view.mapValues(_.size.toLong).toMap
    val cb = pairs.groupBy(_._2).view.mapValues(_.size.toLong).toMap
    val n = pairs.size.toLong
    def t(o: Long, r: Long, c: Long): Double =
      if (o > 0) o.toDouble * math.log(o.toDouble * n / (r.toDouble * c)) else 0.0
    val scored = k.toSeq.map { case ((a, b), k11) =>
      val g = 2 * (t(k11, ca(a), cb(b)) + t(ca(a) - k11, ca(a), n - cb(b)) +
        t(cb(b) - k11, n - ca(a), cb(b)) + t(n - ca(a) - cb(b) + k11, n - ca(a), n - cb(b)))
      val g4 = BigDecimal(g).setScale(4, BigDecimal.RoundingMode.HALF_UP).toDouble
      (a, b, k11, ca(a), cb(b), g4)
    }
    val top = scored.sortBy { case (a, b, _, _, _, g) => (-g, a, b) }.take(20)
      .zipWithIndex.map { case ((a, b, k11, x, y, g), i) => (i + 1, a, b, k11, x, y, g) }
    val got = SparkEntry.queries("q_text_llr")(spark, SF)
      .collect().map(r => (r.getInt(0), r.getString(1), r.getString(2),
        r.getLong(3), r.getLong(4), r.getLong(5), r.getDouble(6)))
    assert(got.toSeq == top.toSeq)
    // G2 is non-negative up to the 1e-4 rounding grain
    assert(got.forall(_._7 >= -0.0001))
  }

  test("q_events_retention: equals a naive first-purchase cohort walk") {
    val wk = Tables.events(spark, SF)
      .where("event_type = 'purchase'")
      .selectExpr("user_id", "unix_micros(ts) div 604800000000 AS wk")
      .collect().map(r => (r.getLong(0), r.getLong(1)))
    val cohort = wk.groupBy(_._1).view.mapValues(_.map(_._2).min).toMap
    val expect = wk.distinct
      .map { case (u, w) => (cohort(u), (w - cohort(u)).toInt) }
      .filter(_._2 <= 3)
      .groupBy(identity).map { case ((cw, off), xs) => (cw, off, xs.size.toLong) }.toSet
    val got = SparkEntry.queries("q_events_retention")(spark, SF)
      .collect().map(r => (r.getLong(0), r.getInt(1), r.getLong(2))).toSet
    assert(got == expect)
    // offset-0 row of each cohort counts the whole cohort, and is the
    // max across its offsets (retention can only lose members)
    val byC = got.groupBy(_._1)
    assert(byC.forall { case (_, rows) =>
      val o0 = rows.find(_._2 == 0).map(_._3).getOrElse(0L)
      rows.forall(_._3 <= o0)
    })
  }

  test("q_graph_kcore: equals a naive median-k peel") {
    val e = spark.read.parquet(s"$SF/lineitem.parquet")
      .selectExpr("l_partkey % 500 AS a", "l_suppkey % 500 AS b")
      .collect().map(r => (r.getLong(0), r.getLong(1)))
      .filter { case (a, b) => a != b }.toSet
    var und = e.flatMap { case (a, b) => Seq((a, b), (b, a)) }
    def degs(es: Set[(Long, Long)]) = es.groupBy(_._1).view.mapValues(_.size.toLong).toMap
    val d0 = degs(und)
    val sorted = d0.toSeq.sortBy { case (s, dg) => (dg, s) }
    val k = sorted((sorted.size + 1) / 2 - 1)._2
    val rows = scala.collection.mutable.ArrayBuffer((0, d0.size.toLong, und.size.toLong))
    for (r <- 1 to 3) {
      val keep = degs(und).filter(_._2 >= k).keySet
      und = und.filter { case (s, t) => keep(s) && keep(t) }
      rows += ((r, keep.size.toLong, und.size.toLong))
    }
    val got = SparkEntry.queries("q_graph_kcore")(spark, SF)
      .collect().map(r => (r.getInt(0), r.getLong(1), r.getLong(2)))
    assert(got.toSeq == rows.toSeq)
    // peeling is monotone: nodes and edges never grow
    val ns = got.map(_._2); val es2 = got.map(_._3)
    assert(ns.zip(ns.tail).forall { case (x, y) => y <= x })
    assert(es2.zip(es2.tail).forall { case (x, y) => y <= x })
  }

  test("q_events_transitions: equals a naive per-user lag walk; rows sum to 1") {
    val ev = Tables.events(spark, SF)
      .selectExpr("event_id", "user_id", "event_type", "unix_micros(ts) AS us")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getString(2), r.getLong(3)))
    val pairs = ev.groupBy(_._2).toSeq.flatMap { case (_, es) =>
      val sorted = es.sortBy(e => (e._4, e._1)).map(_._3)
      sorted.zip(sorted.tail)
    }
    val cnt = pairs.groupBy(identity).view.mapValues(_.size.toLong).toMap
    val tot = pairs.groupBy(_._1).view.mapValues(_.size.toLong).toMap
    val expect = cnt.map { case ((a, b), n) =>
      (a, b, n, BigDecimal(n.toDouble / tot(a))
        .setScale(4, BigDecimal.RoundingMode.HALF_UP).toDouble)
    }.toSet
    val got = SparkEntry.queries("q_events_transitions")(spark, SF)
      .collect().map(r => (r.getString(0), r.getString(1), r.getLong(2), r.getDouble(3))).toSet
    assert(got == expect)
    // each prev row's probabilities sum to ~1 (rounding grain x |types|)
    got.groupBy(_._1).foreach { case (_, rows) =>
      assert(math.abs(rows.toSeq.map(_._4).sum - 1.0) < 0.001)
    }
  }

  test("q_sql_exists: equals a naive anti-join on the big-order set") {
    val big = spark.read.parquet(s"$SF/orders.parquet")
      .where("o_totalprice > 250000").select("o_custkey")
      .collect().map(_.getLong(0)).toSet
    val cust = spark.read.parquet(s"$SF/customer.parquet")
      .select("c_custkey", "c_mktsegment")
      .collect().map(r => (r.getLong(0), r.getString(1)))
    val expect = cust.filterNot(c => big(c._1)).groupBy(_._2)
      .map { case (seg, rows) => (seg, rows.size.toLong) }.toSet
    val got = SparkEntry.queries("q_sql_exists")(spark, SF)
      .collect().map(r => (r.getString(0), r.getLong(1))).toSet
    assert(got == expect)
  }

  test("q_mix_anneal: equals naive P80-histogram phase split; phases partition the corpus") {
    val rows = spark.read.parquet(s"$SF/documents.parquet")
      .select("source", "n_chars").collect().toSeq
      .map(r => (r.getString(0), r.getLong(1)))
    val nTotal = rows.size.toLong
    // ascending-value cumulative histogram; cut = smallest v with cum ≥ 4/5·N
    val byVal = rows.groupBy(_._2).view.mapValues(_.size.toLong).toSeq.sortBy(_._1)
    val cums = byVal.scanLeft((0L, 0L)) { case ((_, acc), (v, c)) => (v, acc + c) }.drop(1)
    val cut = cums.collectFirst { case (v, cm) if cm * 5 >= nTotal * 4 => v }.get
    val expect = rows.groupBy(t => (t._1, if (t._2 > cut) "anneal" else "main"))
      .map { case ((src, ph), rs) => (src, ph, rs.size.toLong, rs.map(_._2).sum) }.toSet
    val got = SparkEntry.queries("q_mix_anneal")(spark, SF)
      .collect().map(r =>
        (r.getString(0), r.getString(1), r.getLong(2), r.getLong(3))).toSet
    assert(got == expect)
    // phases partition the corpus, and the anneal pool is a strict
    // minority bounded by the quintile rule (ties co-stage into main)
    assert(got.toSeq.map(_._3).sum == nTotal)
    val anneal = got.toSeq.filter(_._2 == "anneal").map(_._3).sum
    assert(anneal > 0 && anneal * 5 <= nTotal)
  }

  test("q_dedup_soft: equals naive group-size reweighting; effective mass conserved") {
    val base = spark.read.parquet(s"$SF/documents.parquet")
      .select("doc_id", "source", "text").collect().toSeq
      .map(r => (r.getLong(0), r.getString(1), r.getString(2)))
    // the in-plan re-ingest twin: every 5th doc appears twice
    val rows = base ++ base.collect {
      case (id, src, t) if id % 5 == 0 => (id + 1000000000L, src, t)
    }
    val n = rows.groupBy(_._3).view.mapValues(_.size.toLong).toMap
    val expect = rows.groupBy(_._2).map { case (src, rs) =>
      (src, rs.size.toLong,
        rs.map(t => 1000000L / n(t._3)).sum,
        rs.map(t => n(t._3)).max,
        rs.count(t => n(t._3) > 1).toLong)
    }.toSet
    val got = SparkEntry.queries("q_dedup_soft")(spark, SF)
      .collect().map(r =>
        (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4))).toSet
    assert(got == expect)
    // the fixture twin must actually exercise duplicate groups
    assert(got.exists(_._4 == 2L))
    // the reweighting law: each duplicate group's summed weight is one
    // expected copy up to the div floor — n·(10⁶ div n) ∈ (10⁶−n, 10⁶] —
    // so corpus effective grain sits within |docs| below 10⁶·|distinct|
    val eff = got.toSeq.map(_._3).sum
    val distinct = n.size.toLong
    assert(eff <= 1000000L * distinct && eff > 1000000L * distinct - rows.size)
  }
}
