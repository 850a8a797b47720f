package graft

import org.scalatest.funsuite.AnyFunSuite

/** Round-10 verdict item 3: the BFS frontier broadcast is size-gated.
  * Drives BOTH branches on the same fixture and pins (a) identical
  * results — the shuffle fallback is bit-equivalent, so the oracle
  * hash held by q_graph_bfs covers both — and (b) the plans actually
  * differ in the intended way (broadcast hint present under the gate,
  * absent above it). */
class BfsGateSpec extends AnyFunSuite {
  private lazy val spark = SparkSessionTestWrapper.spark
  private val SF = "/root/testdata/sf0.001"

  private def rows(df: org.apache.spark.sql.DataFrame): Seq[(Int, Long)] =
    df.collect().toSeq.map(r => (r.getInt(0), r.getLong(1)))

  test("broadcast branch (default gate) and forced-shuffle branch (gate 0) agree") {
    val bcast = rows(graft.queries.Graph.bfsProfile(spark, SF, 10000000L))
    val shuf = rows(graft.queries.Graph.bfsProfile(spark, SF, 0L))
    assert(bcast.nonEmpty)
    assert(bcast === shuf)
    // sanity: distances actually spread (dist 0 seeds + at least one hop)
    assert(bcast.map(_._1).contains(0))
    assert(bcast.map(_._1).exists(_ >= 1))
  }

  test("gate 0 removes the broadcast hint from the per-round join plan") {
    import org.apache.spark.sql.functions._
    // reproduce one superstep the way bfsProfile builds it and check
    // the optimized plan's join strategy under each hint decision
    val e = Tables.lineitem(spark, SF)
      .select((col("l_partkey") % 2000).as("src"), (col("l_suppkey") % 2000).as("dst"))
      .distinct()
    val f = e.select(col("src").as("node")).distinct().limit(50)
      .localCheckpoint(true)
    def stepPlan(hinted: Boolean): String = {
      val fh = if (hinted) broadcast(f) else f
      fh.join(e, col("node") === col("src")).queryExecution.executedPlan.toString
    }
    // at sf0.001 the EDGE table itself is under the auto-broadcast
    // threshold (at real scale it never is) — disable the auto path so
    // the assertion isolates the hint decision the gate controls
    val prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try {
      assert(stepPlan(true).contains("BroadcastHashJoin"))
      assert(!stepPlan(false).contains("BroadcastHashJoin"))
    } finally spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)
  }
}
