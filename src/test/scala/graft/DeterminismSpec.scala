package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.DataFrame

/** Determinism under reconfiguration — the law behind every "exact
  * integer treatment" claim in the inventory: a result must not change
  * when the cluster shape does. Each FP-order-sensitive query runs
  * under three execution geometries (shuffle width 2/4/13, scan-split
  * sizes forcing different per-partition row sets) on isolated child
  * sessions, and all three results must be identical cell-for-cell.
  * A double-sum anywhere in a hot aggregate would fail this the first
  * time partial-aggregation order shifts — exactly the class of bug
  * the integer-grain rules exist to prevent, now pinned structurally
  * rather than by one lucky configuration. */
class DeterminismSpec extends AnyFunSuite {
  private lazy val parent = SparkSessionTestWrapper.spark
  private val SF = "/root/testdata/sf0.001"

  // The queries whose math would drift first if any sum were FP-order
  // dependent or any per-partition structure leaked into the result:
  // surprise/importance scores, PMI, the integer power iteration,
  // bounded-heap top-k rankings, and the integer BM25/RRF ranks.
  private val TARGETS = Seq(
    "q_quality_lm", "q_select_dsir", "q_mix_doremi", "q_quality_bigram",
    "q_quality_kn", "q_quality_kn_tri", "q_quality_kn_mod",
    "q_text_pmi", "q_embed_pca", "q_eval_retrieval", "q_skew_profile",
    "q_rank_bm25", "q_rank_rrf", "q_ann_mrl_recall", "q_tokenize_fertility")

  private val GEOMETRIES = Seq(
    Map("spark.sql.shuffle.partitions" -> "2",
      "spark.sql.files.maxPartitionBytes" -> "16384",
      "spark.sql.files.openCostInBytes" -> "0"),
    Map("spark.sql.shuffle.partitions" -> "4"),
    Map("spark.sql.shuffle.partitions" -> "13",
      "spark.sql.files.maxPartitionBytes" -> "1048576"))

  private def canon(df: DataFrame): Seq[String] =
    df.collect().toSeq.map(_.toSeq.map {
      case null => "NULL"
      case a: Array[_] => a.mkString("[", ",", "]")
      case x => x.toString
    }.mkString("")).sorted

  test("FP-sensitive queries are bit-identical across execution geometries") {
    TARGETS.foreach { name =>
      val results = GEOMETRIES.map { conf =>
        val s = parent.newSession()
        conf.foreach { case (k, v) => s.conf.set(k, v) }
        canon(SparkEntry.queries(name)(s, SF))
      }
      assert(results(0).nonEmpty, s"$name: empty result")
      assert(results(1) == results(0) && results(2) == results(0),
        s"$name: result depends on execution geometry")
    }
  }

  // ------------------------------------------------------------------
  // Overflow-envelope pins (round 9). Every floor(·10⁶)-grain integer
  // formula in the inventory carries a scaladoc'd headroom bound at the
  // 10¹²-token corpus edge; these tests INSTANTIATE each bound so a
  // grain or constant change that silently re-opens the int64 wrap
  // class (the DSIR round-8 bug) fails here, not in production.
  // ------------------------------------------------------------------

  /** surp = floor(ln(T)·10⁶) at T = 10¹² corpus tokens — the max
    * per-token/per-type surprise grain every LM scorer shares. */
  private val MAX_SURP = math.floor(math.log(1e12) * 1e6).toLong

  test("envelope: per-doc surprise sums hold ≥2x int64 headroom at 10^12 tokens") {
    // q_quality_lm / bigram / kn / kn_tri: sum is per-DOC. A 10⁶-token
    // document of maximally-surprising tokens:
    val perDoc = BigInt(1000000L) * BigInt(MAX_SURP)
    assert(perDoc * 2 < BigInt(Long.MaxValue),
      s"per-doc surprise sum $perDoc lost its 2x headroom")
    // and the reason the CORPUS-level sums were widened to decimal —
    // the same grain summed over a 10¹²-token domain DOES wrap:
    assert(BigInt(1000000000000L) * BigInt(MAX_SURP) > BigInt(Long.MaxValue),
      "corpus-level surprise sum no longer exceeds int64 — " +
        "decimal widening in q_mix_doremi/q_quality_buckets may be droppable")
  }

  test("envelope: q_mix_doremi decimal accumulators are exact past int64") {
    val s = parent.newSession()
    import org.apache.spark.sql.functions._
    import s.implicits._
    // Two half-corpus hot tokens at the max grain: the long form wraps
    // (previous assert), the shipped decimal(20,0)·long product + sum
    // must reproduce the BigInt value exactly.
    val n = 500000000000L
    val edge = Seq(("x", n, MAX_SURP), ("x", n, MAX_SURP)).toDF("lang", "n", "surp")
    val got = edge.groupBy("lang")
      .agg(sum(col("n").cast("decimal(20,0)") * col("surp")).as("ssum"))
      .select(col("ssum").cast("string")).collect().head.getString(0)
    assert(BigInt(got) == BigInt(n) * MAX_SURP * 2,
      "decimal accumulator lost exactness at the envelope edge")
  }

  test("envelope: q_quality_buckets decimal ssum sum is exact past int64") {
    val s = parent.newSession()
    import org.apache.spark.sql.functions._
    import s.implicits._
    val near = 8000000000000000000L // per-doc ssum near Long.MaxValue
    val docs = Seq(("x", near), ("x", near)).toDF("lang", "ssum")
    val got = docs.groupBy("lang")
      .agg(sum(col("ssum").cast("decimal(38,0)")).as("t"))
      .select(col("t").cast("string")).collect().head.getString(0)
    assert(BigInt(got) == BigInt(near) * 2,
      "decimal ssum sum lost exactness past int64")
  }

  test("envelope: bounded-sum grains hold their documented headroom") {
    // q_rank_bm25: w ≤ ln(2N)·(k1+1)·10⁶ at N = 10¹² docs, summed over
    // the ≤|q| matched query terms (bounded at 10⁴ even for absurd
    // queries).
    val bm25Max = BigInt(math.floor(math.log(2e12) * 2.2 * 1e6).toLong)
    assert(bm25Max * 10000 * 2 < BigInt(Long.MaxValue), "bm25 envelope")
    // q_skew_profile: entropy term ≤ 10⁶/e per KEY TYPE, summed over
    // ≤ 10¹² types.
    val entMax = BigInt(math.floor(1e6 / math.E).toLong)
    assert(entMax * BigInt(1000000000000L) * 2 < BigInt(Long.MaxValue),
      "skew-profile entropy envelope")
    // q_rank_rrf: each list contributes ≤ 10⁹/(K_C+1); two lists.
    assert(BigInt(1000000000L / 61) * 2 * 2 < BigInt(Long.MaxValue), "rrf envelope")
    // q_dedup_lines / multilen keeper packing: doc_id·10⁶ + pos valid
    // to the documented ~9.2·10¹² docs with pos < 10⁶.
    assert(BigInt(9200000000000L) * 1000000 + 999999 < BigInt(Long.MaxValue),
      "keeper-packing envelope")
    // q_mix_doremi ew: e^excess·10⁶ per domain at the ~28-nat worst
    // spread (the TOTAL across domains is decimal-summed).
    val ewMax = BigInt(math.floor(math.exp(28.0) * 1e6).toLong)
    assert(ewMax * 2 < BigInt(Long.MaxValue), "doremi ew per-domain envelope")
    // q_embed_pca: the scaladoc'd matvec bound — |C| ≤ Σq² ≤ 1.4·10¹⁴
    // per dim keeps y = C·x inside int64 at the 10⁴ grain, grid 1024.
    assert(BigInt(140000000000000L) * 64 * 1024 < BigInt(Long.MaxValue),
      "pca matvec envelope")
    // q_text_pmi: pmi_raw is an ordering grain (never summed) bounded
    // by ±56 nats; the ln argument's factor products live in doubles
    // (≤ 10³⁶ ≪ double max).
    assert(BigInt(56000000L) * 2 < BigInt(Long.MaxValue), "pmi grain envelope")
    assert(1e36 < Double.MaxValue, "pmi double product envelope")
  }
}
