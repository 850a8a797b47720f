package graft.queries

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window
import graft.Tables
import graft.functions.GraftFunctions._

/** Training-data pipeline orchestration operators (beyond dedup /
  * similarity / text analysis): the steps that turn a cleaned corpus
  * into training batches.
  *
  *  - deterministic stratified sampling (data mixing): md5-derived
  *    per-doc percentile vs a per-stratum rate — reproducible across
  *    engines and runs, no RNG state, embarrassingly map-side;
  *  - sequence packing: greedy token-budget binning per (lang, shard)
  *    via a partitioned running sum — the batch-construction step;
  *  - benchmark decontamination: n-gram overlap between the corpus and
  *    a held-out eval set, bloom-prefiltered map-side before the exact
  *    confirm join (the GPT-3-style 13-gram method, n=3 here because
  *    the synthetic docs are short).
  *
  * All three are single-shuffle (or shuffle-free) plans keyed on
  * columns that exist at any scale.
  */
object Pipeline {
  type Q = (SparkSession, String) => DataFrame

  /** Deterministic percentile in [0, 100) from a column's string form.
    * The DuckDB oracle reproduces it exactly via md5. */
  private def pct(c: Column): Column = hash28(c.cast("string")) % 100

  /** Per-language sampling rates (percent) — a data-mixing recipe. */
  private val RATES = Seq("en" -> 50, "de" -> 25, "fr" -> 25, "es" -> 10)
  private val DEFAULT_RATE = 100

  /** Stratified sampling profile: deterministic hash-percentile keep
    * decision per doc, aggregated per stratum. Map-side decision + one
    * partial-aggregated shuffle; at 100 TB the same plan emits the
    * sampled rows instead of the profile. */
  val qSampleStratified: Q = (s, d) => {
    val rate = RATES.foldRight(lit(DEFAULT_RATE): Column) {
      case ((lang, r), rest) => when(col("lang") === lang, lit(r)).otherwise(rest)
    }
    Tables.documents(s, d)
      .withColumn("keep", (pct(col("doc_id")) < rate).cast("int"))
      .groupBy("lang")
      .agg(count(lit(1)).as("n_total"), sum("keep").cast("long").as("n_kept"))
      .withColumn("ratio", round(col("n_kept") / col("n_total"), 4))
      .orderBy("lang")
  }

  private val PACK_BUDGET = 512 // tokens per packed sequence
  private val PACK_SHARDS = 8

  /** Sequence packing: contiguous greedy binning of docs into
    * token-budget sequences. The window partitions by (lang, shard) so
    * no global sort exists at any scale — shard count grows with the
    * cluster; each doc's sequence id is the budget-bin of its starting
    * offset in the running token count. */
  val qPackSequences: Q = (s, d) => {
    val w = Window.partitionBy("lang", "shard").orderBy("doc_id")
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    Tables.documents(s, d)
      .withColumn("shard", (col("doc_id") % PACK_SHARDS).cast("int"))
      .withColumn("n_tok", size(tokens(col("text"))))
      .withColumn("running", sum("n_tok").over(w))
      .withColumn("seq_id",
        floor((col("running") - col("n_tok")) / lit(PACK_BUDGET.toDouble)).cast("long"))
      .groupBy("lang", "shard", "seq_id")
      .agg(count(lit(1)).as("n_docs"), sum("n_tok").cast("long").as("n_tok"))
      .orderBy("lang", "shard", "seq_id")
  }

  private val DECON_MOD = 11  // doc_id % 11 == 0 plays the eval set
  private val DECON_MIN_OVERLAP = 5

  /** Benchmark decontamination: training docs sharing ≥ 5 word-3-grams
    * with the held-out eval split. The eval side is tiny by nature, so
    * its distinct shingles broadcast; a driver-built bloom filter
    * (1% fpp) additionally drops almost every clean shingle MAP-SIDE
    * before the exact confirm semi-join — false positives die in the
    * join, so the result is exact regardless of fpp. At 100 TB the
    * bloom is what keeps join input proportional to candidate shingles,
    * not the corpus. */
  val qDecontaminate: Q = (s, d) => {
    // scoped cache: the eval and train splits both read this shingle
    // pass; bench additionally feeds count, bloom build and confirm join
    val sh = Tables.documents(s, d)
      .withColumn("w", tokens(col("text")))
      .select(col("doc_id"), col("lang"), explode(shingles(col("w"), 3)).as("s"))
    val bench = sh.where(col("doc_id") % DECON_MOD === 0).select("s").distinct()
    Scoped.withCached(sh, bench) {
      val train = sh.where(col("doc_id") % DECON_MOD =!= 0)
      // Size the bloom from the data, not a constant: an undersized
      // filter silently degrades its fpp, which weakens the map-side
      // prune — the whole point of the bloom at 100 TB. The count is one
      // extra action on the (tiny, cached) eval side.
      val nBench = bench.count().max(1L)
      val bf = bench.stat.bloomFilter("s", nBench, 0.01)
      val bfB = s.sparkContext.broadcast(bf)
      val mightContain = udf((x: String) => bfB.value.mightContainString(x))
      train.where(mightContain(col("s")))
        .join(bench, Seq("s"), "left_semi") // exact confirm
        .groupBy("doc_id", "lang").agg(count(lit(1)).as("n_over"))
        .where(col("n_over") >= DECON_MIN_OVERLAP)
        .select("doc_id", "lang", "n_over")
        .orderBy("doc_id")
    }
  }

  def queries: Map[String, Q] = Map(
    "q_sample_stratified" -> qSampleStratified,
    "q_pack_sequences" -> qPackSequences,
    "q_decontaminate" -> qDecontaminate
  )

  private val toksAll =
    """list_filter(string_split_regex(lower(text), '[^a-z0-9]+'), t -> t != '')"""

  private val ratesCase = RATES
    .map { case (l, r) => s"WHEN lang = '$l' THEN $r" }
    .mkString("CASE ", " ", s" ELSE $DEFAULT_RATE END")

  def oracleSql: Map[String, String] = Map(
    "q_sample_stratified" ->
      s"""WITH k AS (
         |  SELECT lang,
         |    CASE WHEN CAST(concat('0x', substr(md5(CAST(doc_id AS VARCHAR)), 1, 7)) AS BIGINT)
         |      % 100 < ($ratesCase) THEN 1 ELSE 0 END AS keep
         |  FROM documents)
         |SELECT lang, count(*) AS n_total, CAST(sum(keep) AS BIGINT) AS n_kept,
         |  round(CAST(sum(keep) AS DOUBLE) / count(*), 4) AS ratio
         |FROM k GROUP BY lang ORDER BY lang""".stripMargin,
    "q_pack_sequences" ->
      s"""WITH t AS (SELECT lang, CAST(doc_id % $PACK_SHARDS AS INT) AS shard, doc_id,
         |             len($toksAll) AS n_tok FROM documents),
         |r AS (SELECT lang, shard, n_tok,
         |        sum(n_tok) OVER (PARTITION BY lang, shard ORDER BY doc_id
         |          ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS running
         |      FROM t)
         |SELECT lang, shard,
         |  CAST(floor((running - n_tok) / ${PACK_BUDGET.toDouble}) AS BIGINT) AS seq_id,
         |  count(*) AS n_docs, CAST(sum(n_tok) AS BIGINT) AS n_tok
         |FROM r GROUP BY lang, shard, seq_id
         |ORDER BY lang, shard, seq_id""".stripMargin,
    "q_decontaminate" ->
      s"""WITH toks AS (SELECT doc_id, lang, $toksAll AS w FROM documents),
         |sh AS (SELECT DISTINCT doc_id, lang, w[i] || ' ' || w[i+1] || ' ' || w[i+2] AS s
         |       FROM toks, unnest(range(1, len(w) - 1)) t(i)),
         |bench AS (SELECT DISTINCT s FROM sh WHERE doc_id % $DECON_MOD = 0),
         |train AS (SELECT * FROM sh WHERE doc_id % $DECON_MOD != 0),
         |ov AS (SELECT doc_id, lang, count(*) AS n_over
         |       FROM train JOIN bench USING(s) GROUP BY doc_id, lang)
         |SELECT doc_id, lang, n_over FROM ov
         |WHERE n_over >= $DECON_MIN_OVERLAP ORDER BY doc_id""".stripMargin
  )
}
