package graft.queries

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Skew-safe corpus-frequency attach: the heavy-hitter split.
  *
  * The problem this solves (round-8, replacing the round-7 single-pass
  * form): attaching per-key occurrence counts to an exploded token /
  * shingle table with `count().over(Window.partitionBy(key))` shuffles
  * the FULL row table hash-partitioned by the raw key. Natural-language
  * token frequency is Zipfian — the hottest token ("the", ~4-5% of all
  * tokens in English web text) lands its entire multi-TB group in ONE
  * WindowExec task at 100 TB, and AQE cannot split a skewed window
  * partition (`OptimizeSkewedJoin` rewrites SMJ/SHJ only). A window on
  * a raw text key is therefore a straggler/spill scale-killer no matter
  * how wide the shuffle is.
  *
  * The split, with its provable bounds:
  *
  *  1. `counts` — one `groupBy(key).count` over the rows. Map-side
  *     partial aggregation collapses hot keys PER INPUT TASK before the
  *     shuffle, so the exchange carries ≤ (tasks × distinct-keys-per-
  *     task) rows regardless of skew: a hot key costs one long per
  *     task, not one row per occurrence.
  *  2. `hot` — the keys with count ≥ total/H (H = [[HOT_DENOM]]). At
  *     most H keys can satisfy that inequality (their counts would
  *     otherwise sum past the total), so the hot table is ≤ H rows BY
  *     CONSTRUCTION — broadcastable at any corpus size. Hot rows get
  *     their count MAP-SIDE via this broadcast: the dominant share of a
  *     Zipf corpus's occurrences (its head) never shuffles at all.
  *  3. Tail rows — everything not matching `hot` — attach via a
  *     shuffle-hash join back to `counts`. Every tail key has
  *     count < total/H, so no join partition can exceed 1/H of the
  *     corpus even before AQE; and because this is an equi-join (not a
  *     window), AQE's skew handling stays available as a second layer.
  *
  * The identical `counts` exchange feeds both the hot filter and the
  * tail join, so Spark's ReuseExchange materializes it once. Counts are
  * exact longs and identical per key across both branches; downstream
  * consumers aggregate (order-insensitive), so the union's row order
  * cannot perturb a result hash.
  *
  * The exception that proves the rule: a frequency model that is
  * FIXED-SIZE by construction (DSIR's B=1024 hashed buckets,
  * [[Curation]]) should keep plain agg + broadcast — there the whole
  * model broadcasts and the corpus never shuffles at all. This helper
  * is for UNBOUNDED key spaces (vocabularies, shingle sets) where the
  * model itself is corpus-sized.
  */
object HeavyHitters {

  /** Hot-key denominator H: a key is a heavy hitter iff its count is
    * ≥ total/H. Bounds the broadcast at ≤ H rows and every tail join
    * partition at < total/H rows. 10⁴ keeps the broadcast trivial
    * (≤ 10⁴ longs) while catching every key above 0.01% frequency —
    * far below the ~4-5% Zipf head that creates stragglers. */
  val HOT_DENOM = 10000L

  /** Returns `df` with column `out` = number of rows sharing `df(key)`
    * (exact long), computed by the heavy-hitter split above. When
    * `totalOut` is set, also attaches the total row count as that
    * column (one extra K-free scalar, derived from `counts` — no
    * additional scan of `df`), since every corpus-frequency consumer
    * (unigram surprise, df ratios) needs the total anyway.
    *
    * Reach for this ONLY when the count must attach to corpus-sized
    * ROWS (a per-doc or per-row output downstream). When the output is
    * per-GROUP (per-domain, per-lang profiles), aggregate to
    * per-(key, group) multiplicities first and join the two key-keyed
    * aggregate tables instead — that join is bounded at ≤ #groups rows
    * per key by construction, so no split is needed at all (see
    * q_mix_doremi / q_dedup_spans). */
  def attachKeyCount(df: DataFrame, key: String, out: String,
      totalOut: Option[String] = None): DataFrame = {
    val counts = df.groupBy(key).agg(count(lit(1)).as(out))
    val totals = counts.agg(sum(col(out)).cast("long").as("__hh_total"))
    val hot = counts
      .crossJoin(broadcast(totals))
      .where(col(out) * lit(HOT_DENOM) >= col("__hh_total"))
      .drop("__hh_total")
    val tagged = df.join(
      broadcast(hot.withColumnRenamed(out, "__hh_hot")), Seq(key), "left")
    val hotRows = tagged.where(col("__hh_hot").isNotNull)
      .withColumn(out, col("__hh_hot")).drop("__hh_hot")
    val tailRows = tagged.where(col("__hh_hot").isNull).drop("__hh_hot")
      .join(counts.hint("shuffle_hash"), Seq(key))
    val attached = hotRows.unionByName(tailRows)
    totalOut match {
      case Some(t) =>
        attached.crossJoin(broadcast(totals.withColumnRenamed("__hh_total", t)))
      case None => attached
    }
  }

  /** The same hot/tail split for a PRECOMPUTED per-key model table
    * (`key`, `countCol`, any derived columns): hot keys — `countCol` ≥
    * total/H, ≤ H rows by the same counting argument — broadcast and
    * attach every model column MAP-SIDE; tail rows join the model
    * shuffle-hash with every partition bounded below total/H.
    *
    * Use when the model is derived from aggregates rather than being a
    * bare row count — e.g. a per-bigram-type surprise that needs the
    * bigram AND its left-element totals ([[Curation.qQualityBigram]]):
    * deriving those on the key-cardinality counts table and attaching
    * ONCE costs one corpus-wide aggregate + one split, where nesting
    * [[attachKeyCount]] per statistic would re-aggregate and re-split
    * the corpus-sized stream for each. `countCol` must be the key's
    * occurrence count in `df` (it decides hotness); every `df` row's
    * key must exist in `model` (inner tail join — true by construction
    * when the model aggregates the same stream). */
  def attachModel(df: DataFrame, key: String, model: DataFrame,
      countCol: String): DataFrame = {
    val modelCols = model.columns.filterNot(_ == key).toSeq
    val totals = model.agg(sum(col(countCol)).cast("long").as("__hh_total"))
    val hot = model.crossJoin(broadcast(totals))
      .where(col(countCol) * lit(HOT_DENOM) >= col("__hh_total"))
      .drop("__hh_total")
    val hotTagged = modelCols.foldLeft(hot) {
      (t, c) => t.withColumnRenamed(c, s"__hot_$c")
    }
    val tagged = df.join(broadcast(hotTagged), Seq(key), "left")
    val isHot = col(s"__hot_$countCol").isNotNull // counts are never null
    val hotRows = modelCols.foldLeft(tagged.where(isHot)) {
      (t, c) => t.withColumn(c, col(s"__hot_$c"))
    }.drop(modelCols.map(c => s"__hot_$c"): _*)
    val tailRows = tagged.where(!isHot)
      .drop(modelCols.map(c => s"__hot_$c"): _*)
      .join(model.hint("shuffle_hash"), Seq(key))
    hotRows.unionByName(tailRows)
  }
}
