package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
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

  def queries: Map[String, Q] = Map(
    "q_events_concurrency" -> qEventsConcurrency,
    "q_events_funnel" -> qEventsFunnel,
    "q_events_retention" -> qEventsRetention,
    "q_events_transitions" -> qEventsTransitions,
    "q_events_anomaly" -> qEventsAnomaly)

  def oracleSql: Map[String, String] = Map(
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
