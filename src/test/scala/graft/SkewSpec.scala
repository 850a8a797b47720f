package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanExec

/** Round-10 verdict item 2: verify by EXECUTION — not prose — whether
  * AQE's skew-join split fires on the keeper-join shape used by
  * q_dedup_lines / q_dedup_multilen / q_memorization (a Zipf-hot
  * boilerplate line on the probe side, joined to a 1-row-per-key
  * aggregate).
  *
  * Measured result (pinned here, Spark 4.1):
  *  - With the keeper's final HashAggregate directly under the join,
  *    `OptimizeSkewedJoin` does NOT fire: the rule pattern-matches
  *    joins whose children are (Sort over) ShuffleQueryStage ONLY, and
  *    the through-agg shape falls outside it — for SMJ and SHJ alike.
  *  - Materializing the keeper first (localCheckpoint — both join
  *    children then read plain ENSURE_REQUIREMENTS shuffles) makes the
  *    split fire on the hot probe partition, same results.
  *  - Without a hot key, no split fires either way (no false trigger).
  *
  * The dedup queries' scaladoc cites this spec: their default shape
  * trades skew-splittability for zero extra keeper shuffle (a hot
  * line's probe rows are linear work in one task, then fan back out on
  * the doc key); a corpus with a pathological single-line share takes
  * the measured mitigation — materialize the keeper, or salt as in
  * q_join_salted. */
class SkewSpec extends AnyFunSuite {
  private lazy val parent = SparkSessionTestWrapper.spark

  private val HOT = 100000
  private val TAIL = 2000

  private def skewSession() = {
    val s = parent.newSession()
    // scale AQE's skew detection to fixture bytes: a partition is
    // skewed when > max(threshold, factor × median); the hot key's
    // shuffle partition carries a few MB here, the tail a few KB
    s.conf.set("spark.sql.shuffle.partitions", "8")
    s.conf.set("spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes", "64KB")
    s.conf.set("spark.sql.adaptive.skewJoin.skewedPartitionFactor", "2")
    s.conf.set("spark.sql.adaptive.advisoryPartitionSizeInBytes", "32KB")
    s.conf.set("spark.sql.adaptive.coalescePartitions.enabled", "false")
    s.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    s
  }

  /** probe side: (doc_id, line hash, payload) — one boilerplate line
    * at HOT copies across docs plus a distinct tail; the payload makes
    * the hot partition's shuffle bytes unambiguous */
  private def probeDf(s: org.apache.spark.sql.SparkSession): DataFrame =
    s.range(HOT + TAIL).select(
      (col("id") % 5000).as("doc_id"),
      when(col("id") < HOT, lit("boilerplate"))
        .otherwise(concat(lit("line_"), col("id"))).as("lh"),
      concat(lit("p" * 200), col("id")).as("payload"))

  /** run the keeper-join rollup and return (rows, skewFired) */
  private def run(s: org.apache.spark.sql.SparkSession,
      materializeKeeper: Boolean): (Seq[(Long, Long)], Boolean) = {
    val probe = probeDf(s)
    val keeper0 = probe.groupBy("lh").agg(min("doc_id").as("kid"))
    val keeper = if (materializeKeeper) keeper0.localCheckpoint(true) else keeper0
    val joined = probe.join(keeper.hint("shuffle_hash"), Seq("lh"))
      .groupBy("doc_id")
      .agg(count(lit(1)).as("nl"), max(length(col("payload"))).as("b"))
    val rows = joined.collect().toSeq
      .map(r => (r.getLong(0), r.getLong(1))).sortBy(_._1)
    val adaptive = joined.queryExecution.executedPlan.collectFirst {
      case a: AdaptiveSparkPlanExec => a
    }.getOrElse(fail("no AdaptiveSparkPlanExec in executed plan"))
    (rows, adaptive.executedPlan.toString.contains("skew=true"))
  }

  test("through-agg keeper join: AQE skew split does NOT fire (rule pattern limit)") {
    val (rows, skew) = run(skewSession(), materializeKeeper = false)
    assert(rows.size === 5000)
    assert(!skew, "OptimizeSkewedJoin unexpectedly fired through the keeper agg " +
      "— the dedup queries' scaladoc mitigation note is now stale")
  }

  test("materialized keeper: the skew split fires on the hot probe partition") {
    val (rows, skew) = run(skewSession(), materializeKeeper = true)
    assert(skew, "expected skew=true join in the final adaptive plan")
    // and the mitigation is semantics-preserving
    val (base, _) = run(skewSession(), materializeKeeper = false)
    assert(rows === base)
  }

  test("no hot key: no skew split fires (no false trigger)") {
    val s = skewSession()
    val probe = s.range(20000).select(
      (col("id") % 5000).as("doc_id"),
      concat(lit("line_"), col("id")).as("lh"),
      lit("x" * 100).as("payload"))
    val keeper = probe.groupBy("lh").agg(min("doc_id").as("kid")).localCheckpoint(true)
    val joined = probe.join(keeper.hint("shuffle_hash"), Seq("lh"))
      .groupBy("doc_id").agg(count(lit(1)).as("nl"))
    joined.collect()
    val adaptive = joined.queryExecution.executedPlan.collectFirst {
      case a: AdaptiveSparkPlanExec => a
    }.get
    assert(!adaptive.executedPlan.toString.contains("skew=true"))
  }
}
