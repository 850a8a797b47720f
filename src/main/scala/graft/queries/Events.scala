package graft.queries

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window
import graft.Tables

/** Event-stream analytics over the `events` table — the product /
  * telemetry queries (funnel conversion, per-entity anomaly flags)
  * that share the corpus engine in every real deployment.
  *
  * Both operators work on exact integer grains (epoch microseconds,
  * floor(value·100) cents) so every boundary decision — a funnel
  * window cutoff, an outlier threshold — is grain-exact and the
  * DuckDB oracle replays it bit-for-bit; no FP comparison sits on a
  * decision edge.
  */
object Events {
  type Q = (SparkSession, String) => DataFrame

  private val FUNNEL_WINDOW_US = 7L * 24 * 3600 * 1000000 // 7 days in µs

  /** Staged conversion funnel view → click → purchase: a user converts
    * a stage if the event occurs at-or-after their previous stage's
    * first qualifying event and within [[FUNNEL_WINDOW_US]] of it
    * (each stage re-anchors the window — the "open attribution
    * window" convention). Output: one row of stage populations plus
    * the exact floored mean seconds view→purchase for full converts.
    *
    * Shape: three keyed aggregations, each a map-side-combined
    * groupBy(user) followed by an equi-join on user_id — all three
    * joins co-partitioned on the same key, so at scale this is one
    * shuffle family, no broadcast of anything user-sized, and the
    * final stage tables shrink monotonically (click ⊆ view users).
    * Timestamps ride as unix_micros longs end-to-end: interval
    * arithmetic is exact long math in both engines. */
  val qEventsFunnel: Q = (s, d) => {
    val ev = Tables.events(s, d)
      .select(col("user_id"), col("event_type"), unix_micros(col("ts")).as("us"))
    val view = ev.where(col("event_type") === "view")
      .groupBy("user_id").agg(min("us").as("tv"))
    val click = ev.where(col("event_type") === "click")
      .join(view, "user_id")
      .where(col("us") >= col("tv") && col("us") <= col("tv") + FUNNEL_WINDOW_US)
      .groupBy("user_id").agg(min("us").as("tc"), min("tv").as("tv"))
    val purch = ev.where(col("event_type") === "purchase")
      .join(click, "user_id")
      .where(col("us") >= col("tc") && col("us") <= col("tc") + FUNNEL_WINDOW_US)
      .groupBy("user_id").agg(min("us").as("tp"), min("tv").as("tv"))
    val nv = view.agg(count(lit(1)).as("n_view"))
    val nc = click.agg(count(lit(1)).as("n_click"))
    val np = purch.agg(count(lit(1)).as("n_purchase"),
      // floored mean seconds view→purchase: exact long µs sum, one
      // integer divide — no FP anywhere
      expr("sum(tp - tv) div (count(1) * 1000000)").as("mean_convert_secs"))
    nv.crossJoin(nc).crossJoin(np) // three 1-row aggregates: scalar attach
      .select(col("n_view"), col("n_click"), col("n_purchase"),
        col("mean_convert_secs"))
  }

  private val ANOM_W = 5  // trailing window length (full windows only)
  private val ANOM_Z = 3L // |z| threshold

  /** Trailing-window outlier flags: within each (user, event_type)
    * stream ordered by time, an event is flagged when its value sits
    * more than [[ANOM_Z]] population standard deviations from the
    * mean of the previous [[ANOM_W]] values. The test is evaluated in
    * EXACT integer arithmetic on floor(value·100) cent grains —
    * z² > Z² rewritten cross-multiplied as
    *   (n·v − S)² > Z² · (n·Q − S²),   S = Σvᵢ, Q = Σvᵢ²
    * so no FP division or sqrt sits on the decision boundary (the
    * same cross-multiplication trick as the quality-quantile edges).
    * Output: per event_type, streams scored and events flagged.
    *
    * Scale: the window partitions by (user_id, event_type) — entity
    * keys whose group size is one user's stream, the sessionizer's
    * key posture; the final rollup is 5 rows. Window sums are two
    * trailing-frame aggregates sharing one sort. */
  val qEventsAnomaly: Q = (s, d) => {
    val w = Window.partitionBy("user_id", "event_type")
      .orderBy(col("us").asc, col("event_id").asc)
      .rowsBetween(-ANOM_W, -1)
    Tables.events(s, d)
      .select(col("event_id"), col("user_id"), col("event_type"),
        unix_micros(col("ts")).as("us"),
        floor(col("value") * 100).cast("long").as("vg"))
      .withColumn("n", count(lit(1)).over(w))
      .withColumn("sm", sum("vg").over(w))
      .withColumn("qq", sum(expr("vg * vg")).over(w))
      .where(col("n") === ANOM_W)
      .select(col("event_type"),
        ((col("vg") * ANOM_W - col("sm")) * (col("vg") * ANOM_W - col("sm")) >
          lit(ANOM_Z * ANOM_Z) * (lit(ANOM_W.toLong) * col("qq") - col("sm") * col("sm")))
          .cast("long").as("fl"))
      .groupBy("event_type")
      .agg(count(lit(1)).as("n_scored"), sum("fl").as("n_flagged"))
      .orderBy("event_type")
  }

  private val RET_MAX_OFFSET = 3 // weeks tracked per cohort

  /** Cohort retention — the product-analytics staple, here on the
    * repeat-PURCHASE definition (the all-events variant is vacuous on
    * this fixture — every user fires some event every week; purchase
    * cadence actually varies): users cohort by first-purchase epoch
    * week; for offsets 0..[[RET_MAX_OFFSET]] count cohort members
    * purchasing again in cohort_week + offset. All grain arithmetic
    * is exact integer epoch math (µs → week), so cohort boundaries
    * cannot drift between engines.
    *
    * Shape: one groupBy(user) for cohorts, one distinct over (user,
    * week), one equi-join co-partitioned on user_id, one rollup to
    * (cohort, offset) — the same single-shuffle-family posture as the
    * funnel. Retention at 100 TB is exactly this plan with the rollup
    * output still tiny (weeks × offsets). */
  val qEventsRetention: Q = (s, d) => {
    val wk = Tables.events(s, d)
      .where(col("event_type") === "purchase")
      .select(col("user_id"),
        expr("unix_micros(ts) div 604800000000").as("wk")) // 7·86400·10⁶
    val cohort = wk.groupBy("user_id").agg(min("wk").as("cw"))
    val active = wk.distinct()
    active.join(cohort, "user_id")
      .withColumn("offset", (col("wk") - col("cw")).cast("int"))
      .where(col("offset") <= RET_MAX_OFFSET)
      .groupBy(col("cw").as("cohort_week"), col("offset"))
      .agg(count(lit(1)).as("n_users"))
      .orderBy("cohort_week", "offset")
  }

  /** First-order Markov transition matrix between consecutive event
    * types within each user's stream — the behavioral-model complement
    * of the staged funnel (every transition, not a chosen path).
    * Output: (prev, cur, n, p) with p the row-normalized probability —
    * an exact long ratio divided once and rounded, so the only FP is
    * one divide of exact integers.
    *
    * Scale: the lag window partitions on user_id (per-entity streams);
    * transition counting is a map-side-combined aggregate on a
    * |types|² key domain; row totals join 1:1 on a |types|-row
    * aggregate. */
  val qEventsTransitions: Q = (s, d) => {
    val w = Window.partitionBy("user_id").orderBy(col("us").asc, col("event_id").asc)
    val pairs = Tables.events(s, d)
      .select(col("event_id"), col("user_id"), col("event_type"),
        unix_micros(col("ts")).as("us"))
      .withColumn("prev", lag("event_type", 1).over(w))
      .where(col("prev").isNotNull)
      .groupBy(col("prev"), col("event_type").as("cur"))
      .agg(count(lit(1)).as("n"))
    val totals = pairs.groupBy("prev").agg(sum("n").as("tot"))
    pairs.join(totals, "prev")
      .select(col("prev"), col("cur"), col("n"),
        round(col("n").cast("double") / col("tot"), 4).as("p"))
      .orderBy("prev", "cur")
  }

  /** Peak concurrency by sweep-line — the interval-overlap pattern
    * (room occupancy, concurrent sessions, license seats): each user's
    * per-day activity span [first, last event] becomes a +1/−1
    * endpoint pair; the running endpoint sum ordered by
    * (time, delta) — ends BEFORE starts at the same instant, i.e.
    * end-exclusive intervals — peaks at the day's max concurrency.
    * Output per epoch day: active users and peak concurrent spans.
    *
    * Determinism: ties beyond (t, delta) permute only IDENTICAL
    * deltas, so the partial-sum multiset — hence the max — is
    * invariant; everything is exact integer µs. Scale: the sweep
    * partitions per day; at 100 TB/day the posture is hierarchical —
    * shard-local sweeps plus a boundary merge on shard base counts
    * (same two-phase shape as the scalable ntile) — while the
    * per-day demo keeps the one-partition-per-day form the data
    * volume here warrants. */
  val qEventsConcurrency: Q = (s, d) => {
    val ev = Tables.events(s, d)
      .select(col("user_id"), unix_micros(col("ts")).as("us"))
      .withColumn("day", expr("us div 86400000000"))
    val spans = ev.groupBy("day", "user_id")
      .agg(min("us").as("t0"), max("us").as("t1"))
    val deltas = spans.select(col("day"), col("t0").as("t"), lit(1L).as("delta"))
      .unionAll(spans.select(col("day"), col("t1").as("t"), lit(-1L).as("delta")))
    val w = Window.partitionBy("day").orderBy(col("t").asc, col("delta").asc)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    deltas.withColumn("run", sum("delta").over(w))
      .groupBy("day")
      .agg(expr("count(1) div 2").as("n_users"),
        max("run").as("peak"))
      .orderBy("day")
  }

  // Fixed-bin RFM edges (business-rule thresholds, NOT quantiles — no
  // global sort at scale; sized to the fixture's purchase cadence so
  // all score levels populate at both SFs)
  private val RFM_R_DAYS = Seq(3L, 7L, 14L)     // recency: ≤3d→4 … else 1
  private val RFM_F = Seq(16L, 13L, 11L)        // frequency: ≥16→4 … else 1
  private val RFM_M = Seq(90000L, 60000L, 40000L) // monetary cents

  /** RFM segmentation (Hughes 1994 — the classic customer-value
    * grid): per user, Recency = days since last purchase vs the
    * corpus max-event anchor, Frequency = purchase count, Monetary =
    * Σ floor(value·100) cents; each scored 1–4 by FIXED business
    * thresholds and rolled up to segment populations. Fixed bins
    * rather than quantile bins on purpose: quantile RFM needs three
    * global sorts, fixed-bin RFM is one map-side-combined
    * groupBy(user) plus a 64-row rollup — the form that survives
    * 100 TB unchanged (the engine's quantile machinery exists
    * separately in q_quality_quantile / q_ntile_scalable for when
    * data-driven edges are wanted).
    *
    * Determinism: the anchor is an exact max over long µs, recency
    * days an integer divide, cents an exact floor grain — every bin
    * edge is integer-exact in both engines. */
  val qEventsRfm: Q = (s, d) => {
    val ev = Tables.events(s, d)
      .select(col("user_id"), col("event_type"), unix_micros(col("ts")).as("us"),
        floor(col("value") * 100).cast("long").as("cents"))
    val anchor = ev.agg(max("us").as("anchor")) // 1-row scalar: broadcast attach
    def score(c: Column, edges: Seq[Long], asc: Boolean): Column = {
      val cmp: (Column, Long) => Column = if (asc) (x, e) => x <= e else (x, e) => x >= e
      when(cmp(c, edges(0)), 4).when(cmp(c, edges(1)), 3)
        .when(cmp(c, edges(2)), 2).otherwise(1)
    }
    ev.where(col("event_type") === "purchase")
      .groupBy("user_id")
      .agg(max("us").as("last_us"), count(lit(1)).as("f"), sum("cents").as("m"))
      .crossJoin(broadcast(anchor))
      .withColumn("r_days", expr("(anchor - last_us) div 86400000000"))
      .select(score(col("r_days"), RFM_R_DAYS, asc = true).as("r_score"),
        score(col("f"), RFM_F, asc = false).as("f_score"),
        score(col("m"), RFM_M, asc = false).as("m_score"),
        col("m"))
      .groupBy("r_score", "f_score", "m_score")
      .agg(count(lit(1)).as("n_users"), sum("m").as("sum_m_cents"))
      .orderBy("r_score", "f_score", "m_score")
  }

  private val TWAP_BUCKET = 500L // cent-bucket width for the rollup

  /** Per-user time-weighted average value (the TWAP/duration-weighted
    * mean — metering, pricing, engagement-intensity): each event's
    * value holds until the user's next event; TWAP = Σ cents·Δt /
    * Σ Δt over closed intervals, then users roll up into
    * [[TWAP_BUCKET]]-cent histogram buckets. Exact integer end to
    * end: cents grain × floored Δt seconds, one integer divide per
    * user — no FP on any bucket edge.
    *
    * Envelope: cents ≤ 10⁵ (value < 1000 on this fixture's schema),
    * Δt_s ≤ 2.6×10⁶ (the 30-day span; ≤ 3.2×10⁷ at a year), so a
    * per-user term is ≤ 3×10¹² and even 10⁵ events/user stays ~30×
    * under int64 — headroom documented, no decimal needed. Shape:
    * one lead-window per user stream (entity-keyed partition), one
    * groupBy(user), one bounded histogram rollup. */
  val qEventsTwap: Q = (s, d) => {
    val w = Window.partitionBy("user_id").orderBy(col("us").asc, col("event_id").asc)
    Tables.events(s, d)
      .select(col("event_id"), col("user_id"), unix_micros(col("ts")).as("us"),
        floor(col("value") * 100).cast("long").as("cents"))
      .withColumn("next_us", lead("us", 1).over(w))
      .where(col("next_us").isNotNull)
      .withColumn("dt_s", expr("(next_us - us) div 1000000"))
      .groupBy("user_id")
      .agg(sum(col("cents") * col("dt_s")).as("wsum"), sum("dt_s").as("dsum"))
      .where(col("dsum") > 0)
      .withColumn("twap", expr("wsum div dsum"))
      .groupBy(expr(s"twap div $TWAP_BUCKET").as("bucket"))
      .agg(count(lit(1)).as("n_users"), min("twap").as("min_twap"), max("twap").as("max_twap"))
      .orderBy("bucket")
  }

  /** SCD Type-2 versioning of a mutating attribute (Kimball's
    * slowly-changing-dimension pattern, built from the event log the
    * way a warehouse derives dim history from CDC): within each
    * user's time-ordered stream, every CHANGE of event_type opens a
    * new version row [valid_from, valid_to) closed by the next
    * change; the last version per user stays open. Output per
    * attribute value: versions opened, closed, and total closed
    * duration in floored seconds.
    *
    * Shape: a lag window to find change rows, a lead window over the
    * (much smaller) change stream to close versions — both partition
    * on user_id, one per-entity-stream shuffle family and a 5-row
    * rollup; nothing global at any scale. */
  val qEventsScd2: Q = (s, d) => {
    val w = Window.partitionBy("user_id").orderBy(col("us").asc, col("event_id").asc)
    val ev = Tables.events(s, d)
      .select(col("event_id"), col("user_id"), col("event_type"),
        unix_micros(col("ts")).as("us"))
      .withColumn("prev", lag("event_type", 1).over(w))
      .where(col("prev").isNull || col("prev") =!= col("event_type"))
    // version starts only; the next start CLOSES this version
    ev.withColumn("valid_to", lead("us", 1).over(w))
      .select(col("event_type"),
        col("valid_to").isNotNull.cast("long").as("closed"),
        when(col("valid_to").isNotNull,
          expr("(valid_to - us) div 1000000")).otherwise(0L).as("dur_s"))
      .groupBy("event_type")
      .agg(count(lit(1)).as("n_versions"), sum("closed").as("n_closed"),
        sum("dur_s").as("closed_dur_s"))
      .orderBy("event_type")
  }

  /** Last-touch attribution — the marketing-analytics staple (which
    * touchpoint gets credit for a conversion): each purchase is
    * attributed to the user's most recent PRECEDING non-purchase
    * event type, via an IGNORE NULLS last_value window over the
    * per-user stream (non-purchase rows project their type, purchase
    * rows project NULL, so the window's last non-null IS the last
    * touch; purchases with no prior touch attribute to 'none').
    * Output: per touch type, conversions credited and exact share of
    * all purchases at a rounded-once ratio.
    *
    * Shape: ONE window over the (user_id, us, event_id) sort — the
    * same per-entity-stream shuffle family as the sessionizer — then
    * a ≤|types|+1-row rollup joined to a 1-row total; nothing global
    * at any scale. */
  val qEventsAttrib: Q = (s, d) => {
    val w = Window.partitionBy("user_id").orderBy(col("us").asc, col("event_id").asc)
      .rowsBetween(Window.unboundedPreceding, -1)
    val attributed = Tables.events(s, d)
      .select(col("event_id"), col("user_id"), col("event_type"),
        unix_micros(col("ts")).as("us"))
      .withColumn("touch", last(
        when(col("event_type") =!= "purchase", col("event_type")),
        ignoreNulls = true).over(w))
      .where(col("event_type") === "purchase")
      .select(coalesce(col("touch"), lit("none")).as("touch"))
    val counts = attributed.groupBy("touch").agg(count(lit(1)).as("n_conv"))
    val tot = counts.agg(sum("n_conv").as("tot"))
    counts.crossJoin(broadcast(tot))
      .select(col("touch"), col("n_conv"),
        round(col("n_conv").cast("double") / col("tot"), 4).as("share"))
      .orderBy("touch")
  }

  /** Interval-union coverage — the sweep-line "merge overlapping
    * intervals" operator (the temporal complement of [[qSessionize]]'s
    * gap split: sessions split on IDLE time between points; coverage
    * unions EXTENTS that themselves overlap): each event opens an
    * interval of floor(value·60000) ms, and per user the merged-block
    * count, total covered ms, and span utilization come out — the
    * machine-utilization / incident-overlap / speaker-overlap shape.
    *
    * Exact integer ms end-to-end; the only FP op is the duration
    * floor, evaluated with the identical expression in both engines.
    *
    * Shape: one per-user window family (running max-end marks block
    * breaks, running sum numbers blocks) then two key-bounded
    * aggregations — a single hash-partitioned shuffle on user_id, no
    * self-join (the naive overlap query is O(n²) per user; the
    * sweep is O(n log n) and partitions cleanly at any user count). */
  val qEventsCoverage: Q = (s, d) => {
    val iv = Tables.events(s, d)
      .where(col("user_id") % 40 === 0)
      .select(col("user_id"), col("event_id"),
        unix_millis(col("ts")).as("st"),
        (unix_millis(col("ts"))
          + floor(col("value") * lit(60000.0)).cast("long")).as("en"))
    val byUser = Window.partitionBy("user_id").orderBy(col("st"), col("event_id"))
    val prevMax = max("en").over(byUser.rowsBetween(Window.unboundedPreceding, -1))
    val blocks = iv
      .withColumn("brk",
        when(prevMax.isNull || col("st") > prevMax, 1L).otherwise(0L))
      .withColumn("blk",
        sum("brk").over(byUser.rowsBetween(Window.unboundedPreceding, 0)))
      .groupBy("user_id", "blk")
      .agg(min("st").as("bs"), max("en").as("be"), count(lit(1)).as("n_ev"))
    blocks.groupBy("user_id")
      .agg(sum("n_ev").as("n_events"), count(lit(1)).as("n_blocks"),
        sum(col("be") - col("bs")).as("covered_ms"),
        (max("be") - min("bs")).as("span_ms"))
      // nullif: a user whose intervals are ALL zero-length at one
      // timestamp has span_ms = 0 — Spark `div` would yield NULL but
      // DuckDB `//` raises, so guard identically in both engines
      .withColumn("util_bp", expr("(covered_ms * 10000) div nullif(span_ms, 0)"))
      .orderBy("user_id")
  }

  /** Time-series gap-fill (resample + forward-fill) — the
    * regularization step every metrics/feature pipeline runs before
    * windowed models: snap each user's irregular event stream onto an
    * hourly grid over that user's own [first, last] hour span, carry
    * the last observation forward across empty hours (LOCF), and
    * report per-user fill accounting plus the exact carried sum.
    *
    * Grain exactness: hours are `unix_micros div 3.6e9` longs, values
    * are floor(value·100) cents longs — the fill decision and the
    * carried sum are integer-exact in both engines. Per (user, hour)
    * the observation is the LAST event (max ts, then event_id).
    *
    * Shape at scale: one groupBy(user, hour) with map-side combine,
    * one groupBy(user) span pass, `sequence`+`explode` generates the
    * grid WITHOUT a cross join against a calendar table, and the
    * forward fill is `last(ignoreNulls)` over a per-user window — all
    * stages hash-partition on user_id, so the whole query is one
    * shuffle family and the grid is bounded by Σ_user span_hours
    * (linear in users for a bounded retention window, never
    * |users|×|calendar|). */
  val qEventsGapfill: Q = (s, d) => {
    val ev = Tables.events(s, d)
      .select(col("user_id"), col("event_id"),
        unix_micros(col("ts")).as("us"),
        floor(col("value") * lit(100.0)).cast("long").as("vc"))
      .withColumn("h", expr("us div 3600000000"))
    val byUserHour = Window.partitionBy("user_id", "h")
      .orderBy(col("us").desc, col("event_id").desc)
    val obs = ev
      .withColumn("rn", row_number().over(byUserHour))
      .where(col("rn") === 1)
      .select(col("user_id"), col("h"), col("vc"))
    val grid = ev.groupBy("user_id")
      .agg(min("h").as("hmin"), max("h").as("hmax"))
      .select(col("user_id"),
        explode(sequence(col("hmin"), col("hmax"))).as("h"))
    val ff = last("vc", ignoreNulls = true).over(
      Window.partitionBy("user_id").orderBy("h")
        .rowsBetween(Window.unboundedPreceding, 0))
    grid.join(obs, Seq("user_id", "h"), "left")
      .withColumn("ff", ff)
      .groupBy("user_id")
      .agg(count(lit(1)).as("n_hours"),
        count(col("vc")).as("n_obs"),
        sum(when(col("vc").isNull && col("ff").isNotNull, 1L).otherwise(0L))
          .as("n_filled"),
        sum("ff").as("ff_sum_cents"))
      .orderBy("user_id")
  }

  def queries: Map[String, Q] = Map(
    "q_events_coverage" -> qEventsCoverage,
    "q_events_attrib" -> qEventsAttrib,
    "q_events_concurrency" -> qEventsConcurrency,
    "q_events_rfm" -> qEventsRfm,
    "q_events_twap" -> qEventsTwap,
    "q_events_scd2" -> qEventsScd2,
    "q_events_gapfill" -> qEventsGapfill,
    "q_events_funnel" -> qEventsFunnel,
    "q_events_retention" -> qEventsRetention,
    "q_events_transitions" -> qEventsTransitions,
    "q_events_anomaly" -> qEventsAnomaly)

  def oracleSql: Map[String, String] = Map(
    "q_events_coverage" ->
      """WITH iv AS (SELECT user_id, event_id, epoch_ms(ts) AS st,
        |    epoch_ms(ts) + CAST(floor(value * 60000.0) AS BIGINT) AS en
        |  FROM events WHERE user_id % 40 = 0),
        |g AS (SELECT user_id, event_id, st, en,
        |    max(en) OVER (PARTITION BY user_id ORDER BY st, event_id
        |      ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING) AS pmax
        |  FROM iv),
        |b AS (SELECT user_id, event_id, st, en,
        |    CASE WHEN pmax IS NULL OR st > pmax THEN 1 ELSE 0 END AS brk FROM g),
        |blk AS (SELECT user_id, st, en,
        |    sum(brk) OVER (PARTITION BY user_id ORDER BY st, event_id
        |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS blk FROM b),
        |per AS (SELECT user_id, blk, min(st) AS bs, max(en) AS be,
        |          count(*) AS n_ev FROM blk GROUP BY 1, 2)
        |SELECT user_id, CAST(sum(n_ev) AS BIGINT) AS n_events,
        |  count(*) AS n_blocks,
        |  CAST(sum(be - bs) AS BIGINT) AS covered_ms,
        |  CAST(max(be) - min(bs) AS BIGINT) AS span_ms,
        |  (CAST(sum(be - bs) AS BIGINT) * 10000)
        |    // nullif(CAST(max(be) - min(bs) AS BIGINT), 0) AS util_bp
        |FROM per GROUP BY user_id ORDER BY user_id""".stripMargin,
    "q_events_funnel" ->
      s"""WITH ev AS (SELECT user_id, event_type, epoch_us(ts) AS us FROM events),
         |v AS (SELECT user_id, min(us) AS tv FROM ev
         |      WHERE event_type = 'view' GROUP BY user_id),
         |c AS (SELECT e.user_id, min(e.us) AS tc, min(v.tv) AS tv
         |      FROM ev e JOIN v ON e.user_id = v.user_id
         |      WHERE e.event_type = 'click'
         |        AND e.us >= v.tv AND e.us <= v.tv + $FUNNEL_WINDOW_US
         |      GROUP BY e.user_id),
         |p AS (SELECT e.user_id, min(e.us) AS tp, min(c.tv) AS tv
         |      FROM ev e JOIN c ON e.user_id = c.user_id
         |      WHERE e.event_type = 'purchase'
         |        AND e.us >= c.tc AND e.us <= c.tc + $FUNNEL_WINDOW_US
         |      GROUP BY e.user_id)
         |SELECT (SELECT count(*) FROM v) AS n_view,
         |       (SELECT count(*) FROM c) AS n_click,
         |       (SELECT count(*) FROM p) AS n_purchase,
         |       (SELECT CAST(sum(tp - tv) // (count(*) * 1000000) AS BIGINT) FROM p)
         |         AS mean_convert_secs""".stripMargin,
    "q_events_retention" ->
      s"""WITH wk AS (SELECT user_id, epoch_us(ts) // 604800000000 AS wk
         |           FROM events WHERE event_type = 'purchase'),
         |cohort AS (SELECT user_id, min(wk) AS cw FROM wk GROUP BY user_id),
         |active AS (SELECT DISTINCT user_id, wk FROM wk)
         |SELECT c.cw AS cohort_week, CAST(a.wk - c.cw AS INT) AS "offset",
         |       count(*) AS n_users
         |FROM active a JOIN cohort c ON a.user_id = c.user_id
         |WHERE a.wk - c.cw <= $RET_MAX_OFFSET
         |GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin,
    "q_events_attrib" ->
      """WITH ev AS (SELECT event_id, user_id, event_type, epoch_us(ts) AS us
        |            FROM events),
        |a AS (SELECT event_type,
        |        last_value(CASE WHEN event_type <> 'purchase'
        |                   THEN event_type END IGNORE NULLS)
        |          OVER (PARTITION BY user_id ORDER BY us, event_id
        |                ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING) AS touch
        |      FROM ev),
        |c AS (SELECT coalesce(touch, 'none') AS touch, count(*) AS n_conv
        |      FROM a WHERE event_type = 'purchase' GROUP BY 1),
        |t AS (SELECT sum(n_conv) AS tot FROM c)
        |SELECT touch, n_conv,
        |  round(CAST(n_conv AS DOUBLE) / tot, 4) AS share
        |FROM c CROSS JOIN t ORDER BY touch""".stripMargin,
    "q_events_rfm" -> {
      val (r4, r3, r2) = (RFM_R_DAYS(0), RFM_R_DAYS(1), RFM_R_DAYS(2))
      val (f4, f3, f2) = (RFM_F(0), RFM_F(1), RFM_F(2))
      val (m4, m3, m2) = (RFM_M(0), RFM_M(1), RFM_M(2))
      s"""WITH ev AS (SELECT user_id, event_type, epoch_us(ts) AS us,
         |        CAST(floor("value" * 100) AS BIGINT) AS cents FROM events),
         |anchor AS (SELECT max(us) AS anchor FROM ev),
         |u AS (SELECT user_id, max(us) AS last_us, count(*) AS f,
         |        sum(cents) AS m FROM ev WHERE event_type = 'purchase'
         |      GROUP BY 1),
         |sc AS (SELECT
         |    CASE WHEN (a.anchor - u.last_us) // 86400000000 <= $r4 THEN 4
         |         WHEN (a.anchor - u.last_us) // 86400000000 <= $r3 THEN 3
         |         WHEN (a.anchor - u.last_us) // 86400000000 <= $r2 THEN 2
         |         ELSE 1 END AS r_score,
         |    CASE WHEN f >= $f4 THEN 4 WHEN f >= $f3 THEN 3
         |         WHEN f >= $f2 THEN 2 ELSE 1 END AS f_score,
         |    CASE WHEN m >= $m4 THEN 4 WHEN m >= $m3 THEN 3
         |         WHEN m >= $m2 THEN 2 ELSE 1 END AS m_score,
         |    m FROM u CROSS JOIN anchor a)
         |SELECT CAST(r_score AS INT) AS r_score, CAST(f_score AS INT) AS f_score,
         |  CAST(m_score AS INT) AS m_score, count(*) AS n_users,
         |  CAST(sum(m) AS BIGINT) AS sum_m_cents
         |FROM sc GROUP BY 1, 2, 3 ORDER BY 1, 2, 3""".stripMargin
    },
    "q_events_twap" ->
      s"""WITH ev AS (SELECT event_id, user_id, epoch_us(ts) AS us,
         |        CAST(floor("value" * 100) AS BIGINT) AS cents FROM events),
         |d AS (SELECT user_id, cents,
         |        (lead(us) OVER (PARTITION BY user_id ORDER BY us, event_id)
         |         - us) // 1000000 AS dt_s FROM ev),
         |t AS (SELECT user_id, sum(cents * dt_s) AS wsum, sum(dt_s) AS dsum
         |      FROM d WHERE dt_s IS NOT NULL GROUP BY 1 HAVING sum(dt_s) > 0),
         |tw AS (SELECT wsum // dsum AS twap FROM t)
         |SELECT CAST(twap // $TWAP_BUCKET AS BIGINT) AS bucket,
         |  count(*) AS n_users, CAST(min(twap) AS BIGINT) AS min_twap,
         |  CAST(max(twap) AS BIGINT) AS max_twap
         |FROM tw GROUP BY 1 ORDER BY 1""".stripMargin,
    "q_events_scd2" ->
      """WITH ev AS (SELECT event_id, user_id, event_type, epoch_us(ts) AS us
        |            FROM events),
        |ch AS (SELECT * FROM (
        |  SELECT event_id, user_id, event_type, us,
        |    lag(event_type) OVER (PARTITION BY user_id
        |                          ORDER BY us, event_id) AS prev
        |  FROM ev) q WHERE prev IS NULL OR prev <> event_type),
        |v AS (SELECT event_type, us,
        |        lead(us) OVER (PARTITION BY user_id
        |                       ORDER BY us, event_id) AS valid_to
        |      FROM ch)
        |SELECT event_type, count(*) AS n_versions,
        |  CAST(sum(CASE WHEN valid_to IS NOT NULL THEN 1 ELSE 0 END) AS BIGINT)
        |    AS n_closed,
        |  CAST(sum(CASE WHEN valid_to IS NOT NULL
        |           THEN (valid_to - us) // 1000000 ELSE 0 END) AS BIGINT)
        |    AS closed_dur_s
        |FROM v GROUP BY 1 ORDER BY 1""".stripMargin,
    // gap-fill: hourly grid per user via generate_series, LOCF via
    // last_value IGNORE NULLS — grain-exact (hours + cents, both
    // integer) so the carried sum hash-matches bit-for-bit
    "q_events_gapfill" ->
      """WITH ev AS (SELECT user_id, event_id, epoch_us(ts) AS us,
        |        epoch_us(ts) // 3600000000 AS h,
        |        CAST(floor("value" * 100) AS BIGINT) AS vc FROM events),
        |obs AS (SELECT user_id, h, vc FROM (
        |    SELECT user_id, h, vc, row_number() OVER (
        |      PARTITION BY user_id, h ORDER BY us DESC, event_id DESC) AS rn
        |    FROM ev) q WHERE rn = 1),
        |span AS (SELECT user_id, min(h) AS hmin, max(h) AS hmax
        |         FROM ev GROUP BY 1),
        |grid AS (SELECT user_id, unnest(generate_series(hmin, hmax)) AS h
        |         FROM span),
        |f AS (SELECT g.user_id, g.h, o.vc,
        |        last_value(o.vc IGNORE NULLS) OVER (
        |          PARTITION BY g.user_id ORDER BY g.h
        |          ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS ff
        |      FROM grid g LEFT JOIN obs o
        |        ON g.user_id = o.user_id AND g.h = o.h)
        |SELECT user_id, count(*) AS n_hours,
        |  count(vc) AS n_obs,
        |  CAST(sum(CASE WHEN vc IS NULL AND ff IS NOT NULL THEN 1 ELSE 0 END)
        |    AS BIGINT) AS n_filled,
        |  CAST(sum(ff) AS BIGINT) AS ff_sum_cents
        |FROM f GROUP BY user_id ORDER BY user_id""".stripMargin,
    "q_events_concurrency" ->
      """WITH ev AS (SELECT user_id, epoch_us(ts) AS us,
        |        epoch_us(ts) // 86400000000 AS day FROM events),
        |spans AS (SELECT day, user_id, min(us) AS t0, max(us) AS t1
        |          FROM ev GROUP BY 1, 2),
        |deltas AS (SELECT day, t0 AS t, CAST(1 AS BIGINT) AS delta FROM spans
        |           UNION ALL
        |           SELECT day, t1, CAST(-1 AS BIGINT) FROM spans),
        |sweep AS (SELECT day,
        |    sum(delta) OVER (PARTITION BY day ORDER BY t, delta
        |                     ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS run
        |  FROM deltas)
        |SELECT s.day, CAST(c.n2 // 2 AS BIGINT) AS n_users,
        |       CAST(max(s.run) AS BIGINT) AS peak
        |FROM sweep s JOIN (SELECT day, count(*) AS n2 FROM deltas GROUP BY day) c
        |  USING (day)
        |GROUP BY s.day, c.n2 ORDER BY s.day""".stripMargin,
    "q_events_transitions" ->
      """WITH lagd AS (SELECT user_id, event_type,
        |        lag(event_type) OVER (PARTITION BY user_id
        |                              ORDER BY epoch_us(ts), event_id) AS prev
        |      FROM events),
        |pairs AS (SELECT prev, event_type AS cur, count(*) AS n
        |          FROM lagd WHERE prev IS NOT NULL GROUP BY 1, 2),
        |tot AS (SELECT prev, CAST(sum(n) AS BIGINT) AS tot FROM pairs GROUP BY prev)
        |SELECT p.prev, p.cur, p.n, round(CAST(p.n AS DOUBLE) / t.tot, 4) AS p
        |FROM pairs p JOIN tot t ON p.prev = t.prev
        |ORDER BY p.prev, p.cur""".stripMargin,
    "q_events_anomaly" ->
      s"""WITH g AS (SELECT event_id, user_id, event_type, epoch_us(ts) AS us,
         |        CAST(floor("value" * 100) AS BIGINT) AS vg
         |      FROM events),
         |w AS (SELECT event_type, vg,
         |        count(*) OVER tw AS n, sum(vg) OVER tw AS sm,
         |        sum(vg * vg) OVER tw AS qq
         |      FROM g
         |      WINDOW tw AS (PARTITION BY user_id, event_type ORDER BY us, event_id
         |                    ROWS BETWEEN $ANOM_W PRECEDING AND 1 PRECEDING))
         |SELECT event_type, count(*) AS n_scored,
         |  CAST(sum(CASE WHEN (vg * $ANOM_W - sm) * (vg * $ANOM_W - sm) >
         |                     ${ANOM_Z * ANOM_Z} * ($ANOM_W * qq - sm * sm)
         |           THEN 1 ELSE 0 END) AS BIGINT) AS n_flagged
         |FROM w WHERE n = $ANOM_W
         |GROUP BY event_type ORDER BY event_type""".stripMargin)
}
