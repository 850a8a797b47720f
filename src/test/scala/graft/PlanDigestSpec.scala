package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.plans.PlanDigest

/** Plan-digest regression gate (round-11 verdict item 4): the EXECUTED
  * (AQE-final) plan fingerprints of the heaviest bench queries, pinned
  * against `src/test/resources/plan_digests.tsv`. A lost broadcast, a
  * new exchange, or a join-strategy flip changes the fingerprint and
  * fails here immediately — instead of surfacing as a throughput
  * regression in a later bench round.
  *
  * To refresh after an INTENDED plan change:
  *   GRAFT_UPDATE_PLAN_DIGESTS=1 sbt "testOnly graft.PlanDigestSpec"
  * then review the tsv diff like any other code change.
  */
class PlanDigestSpec extends AnyFunSuite {
  private lazy val spark = SparkSessionTestWrapper.spark
  private val SF = "/root/testdata/sf0.001"

  /** The heaviest deterministic batch queries from the round-10 bench
    * ranking (streaming excluded: micro-batch boundaries make their
    * executed plans run-dependent; kcore/bfs excluded: their returned
    * frame is a driver-assembled local relation — their loop shapes
    * are pinned by BfsGateSpec and the kcore scaladoc instead). */
  private val Queries = Seq(
    "q1_agg", "q_pipeline_corpus", "q_sim_sparse", "q_quality_kn_tri",
    "q_graph_triangles", "q_dedup_apply", "q_tokenize_fertility",
    "q_ann_ivf_opq", "q_dedup_multilen", "q_source_overlap",
    "q_ann_ivf_pq", "q_graph_pagerank", "q_dedup_cluster", "q_semdedup",
    "q_ann_rq", "q_quality_classifier", "q_select_dsir", "q_sql_recursive",
    "q_select_rho", "q_mine_bitext", "q_agg_cms", "q_dedup_trim",
    "q_join_salted", "q_link_records", "q_dedup_minhash",
    // round-11 additions heavy enough to digest-pin
    "q_agg_kmv", "q_text_itemsets",
    // round-12 additions: the qsketch's bounded-heap window +
    // broadcast audit and the bloom join's scan-side pre-filter +
    // broadcast are exactly the plan properties a regression would
    // silently drop. (q_dedup_prefixjoin is NOT digest-pinned: its
    // self-join's identical sides make one exchange's AQE reuse
    // run-dependent even after reuse-invariant counting — its plan
    // discipline is asserted structurally in PlanSpec instead.)
    "q_agg_qsketch", "q_join_bloom")

  /** The merged fingerprint of EVERY SQL execution the query runs —
    * bounded-model fits, loop materializations, and the final frame
    * alike (queries that localize results would otherwise digest as a
    * bare LocalTableScan). The listener fires async; the bus is
    * flushed before merging. */
  private def digestOf(name: String): String = {
    val plans =
      new java.util.concurrent.ConcurrentLinkedQueue[Map[String, Int]]()
    val listener = new org.apache.spark.sql.util.QueryExecutionListener {
      override def onSuccess(funcName: String,
          qe: org.apache.spark.sql.execution.QueryExecution,
          durationNs: Long): Unit = {
        plans.add(PlanDigest.counts(qe.executedPlan)); ()
      }
      override def onFailure(funcName: String,
          qe: org.apache.spark.sql.execution.QueryExecution,
          exception: Exception): Unit = ()
    }
    // ExecutionListenerManagers are SESSION-scoped, and queries that
    // run on the memoized per-query tuning child session (q_agg_kmv's
    // coalescing floor, round 17) would otherwise digest as "trivial"
    // — register on both the parent and that child.
    val sessions = Seq(spark, graft.queries.Scoped.coalesceFloorSession(spark))
    sessions.foreach(_.listenerManager.register(listener))
    try {
      SparkEntry.queries(name)(spark, SF).collect()
      org.apache.spark.ListenerBusProbe.waitUntilEmpty(spark.sparkContext)
    } finally sessions.foreach(_.listenerManager.unregister(listener))
    import scala.jdk.CollectionConverters._
    PlanDigest.format(plans.asScala.toSeq)
  }

  private def tsvPath = java.nio.file.Paths.get(
    sys.props("user.dir"), "src", "test", "resources", "plan_digests.tsv")

  private lazy val expected: Map[String, String] = {
    val in = getClass.getResourceAsStream("/plan_digests.tsv")
    assert(in != null,
      "missing src/test/resources/plan_digests.tsv — regenerate with " +
        "GRAFT_UPDATE_PLAN_DIGESTS=1")
    scala.io.Source.fromInputStream(in, "UTF-8").getLines()
      .filter(_.nonEmpty).map { l =>
        val Array(k, v) = l.split("\t", 2); k -> v
      }.toMap
  }

  if (sys.env.contains("GRAFT_UPDATE_PLAN_DIGESTS")) {
    test("regenerate checked-in plan digests") {
      val lines = Queries.map(q => s"$q\t${digestOf(q)}")
      java.nio.file.Files.createDirectories(tsvPath.getParent)
      java.nio.file.Files.writeString(tsvPath, lines.mkString("", "\n", "\n"))
      succeed
    }
  } else {
    for (q <- Queries) test(s"executed-plan digest pinned: $q") {
      val want = expected.getOrElse(q,
        fail(s"no checked-in digest for $q — regenerate the tsv"))
      val got = digestOf(q)
      assert(got == want,
        s"""EXECUTED PLAN CHANGED for $q
           |  pinned: $want
           |  now:    $got
           |If intended, refresh with GRAFT_UPDATE_PLAN_DIGESTS=1 and
           |review the tsv diff; if not, a broadcast/exchange/strategy
           |regressed.""".stripMargin)
    }
  }
}
