package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window
import graft.Tables

/** Graph analytics over a derived link graph — the PageRank-style
  * centrality a web-corpus pipeline uses as a document quality signal
  * (alongside q_dedup_cluster's connected components).
  *
  * Cross-engine determinism: ranks are SCALED INTEGERS (S = 10¹²) and
  * every step is integer arithmetic — contribution = rank div outdeg,
  * damping = (17·sum) div 20 (d = 0.85), base = (3·S) div (20·N) — so
  * integer sums are order-independent and the oracle hash-checks the
  * exact rank values, no floating-point tolerance anywhere.
  *
  * At 100 TB: each iteration is one co-partitioned equi-join
  * (ranks ⋈ edges on src — both sides keyed by node) + one
  * partial-aggregated shuffle on dst. Iterations are a driver loop
  * over lazy plans (3 fixed rounds — power iteration, not a
  * convergence test), the same shape GraphX/Pregel lowers to.
  */
object Graph {
  type Q = (SparkSession, String) => DataFrame

  private val PR_SCALE = 1000000000000L // 10^12
  private val PR_ITERS = 3
  private val PR_NODES_MOD = 100

  /** PageRank over the part→supplier co-occurrence graph: distinct
    * edges (l_partkey mod 100 → l_suppkey mod 100). Dangling-node mass
    * leaks (the standard simplification); all arithmetic integer-exact
    * (see object doc). Output: every node's final scaled rank. */
  val qPageRank: Q = (s, d) => {
    val rawEdges = Tables.lineitem(s, d)
      .select((col("l_partkey") % PR_NODES_MOD).as("src"),
        (col("l_suppkey") % PR_NODES_MOD).as("dst"))
      .distinct()
    // out-degree is static across iterations: fold it into the cached
    // edge table ONCE (the standard PageRank precompute) so each
    // iteration is a single equi-join — not join-edges + join-outdeg
    val w = Window.partitionBy("src")
    // The iteration tables are tiny (≤ PR_NODES_MOD nodes); explicit
    // small hash-partitioning on the join keys keeps every per-round
    // join/agg from fanning out to the session's full shuffle width
    // (same pattern as Dedup's label-propagation loop — at real graph
    // scale the value is sized to |edges| instead).
    val loopParts = 4
    val edges = rawEdges.withColumn("deg", count(lit(1)).over(w))
      .repartition(loopParts, col("src"))
    Scoped.withCached(edges) {
      val nodes = edges.select(col("src").as("node"))
        .union(edges.select(col("dst"))).distinct()
        .repartition(loopParts, col("node"))
      val n = nodes.count()
      val base = (3L * PR_SCALE) / (20L * n) // floor((1-d)·S/N), d=0.85
      var ranks = nodes.withColumn("rank", lit(PR_SCALE / n))
      for (_ <- 1 to PR_ITERS) {
        val contrib = ranks.join(edges, col("node") === col("src"))
          .select(col("dst"), expr("rank div deg").as("c"))
          .repartition(loopParts, col("dst"))
          .groupBy("dst").agg(sum("c").as("in_sum"))
        ranks = nodes.join(contrib, col("node") === col("dst"), "left")
          .select(col("node"),
            (lit(base) + expr("(17 * coalesce(in_sum, 0L)) div 20")).as("rank"))
      }
      ranks.orderBy(col("rank").desc, col("node").asc)
    }
  }

  def queries: Map[String, Q] = Map("q_graph_pagerank" -> qPageRank)

  def oracleSql: Map[String, String] = {
    val S = PR_SCALE
    def iterCte(name: String, prev: String) =
      s"""$name AS (
         |  SELECT nodes.node,
         |    (3 * $S) // (20 * (SELECT n FROM nn))
         |      + (17 * coalesce(s.in_sum, 0)) // 20 AS rank
         |  FROM nodes LEFT JOIN (
         |    SELECT e.dst, sum(r.rank // o.deg) AS in_sum
         |    FROM $prev r JOIN e ON r.node = e.src
         |    JOIN outd o ON o.src = r.node
         |    GROUP BY e.dst) s ON s.dst = nodes.node)""".stripMargin
    Map("q_graph_pagerank" ->
      s"""WITH e AS (SELECT DISTINCT l_partkey % $PR_NODES_MOD AS src,
         |                  l_suppkey % $PR_NODES_MOD AS dst FROM lineitem),
         |nodes AS (SELECT DISTINCT node FROM (
         |  SELECT src AS node FROM e UNION SELECT dst FROM e) u),
         |nn AS (SELECT count(*) AS n FROM nodes),
         |outd AS (SELECT src, count(*) AS deg FROM e GROUP BY src),
         |r0 AS (SELECT node, $S // (SELECT n FROM nn) AS rank FROM nodes),
         |${iterCte("r1", "r0")},
         |${iterCte("r2", "r1")},
         |${iterCte("r3", "r2")}
         |SELECT node, CAST(rank AS BIGINT) AS rank
         |FROM r3 ORDER BY rank DESC, node ASC""".stripMargin)
  }
}
