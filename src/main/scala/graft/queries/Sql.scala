package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import graft.Tables

/** SQL-string surface parity (SURVEY.md §2.8 API-surface closure).
  *
  * The rest of the inventory exercises the DataFrame API; a real user
  * migrating from the reference also expects to hand the engine ANSI
  * SQL text. These queries register the test tables as temp views and
  * execute via `spark.sql(...)` — and the parity statement is made as
  * strong as possible by running the IDENTICAL SQL string on both
  * engines: `oracleSql` is the very string passed to `spark.sql`
  * (broadcast hints ride in hint-style block comments, which DuckDB
  * parses as plain comments; ORDER BY spells NULLS FIRST explicitly
  * since Spark defaults nulls-first and DuckDB nulls-last).
  *
  * Scale posture is inherited from the plans, not the strings:
  * Catalyst compiles these to the same physical plans as their
  * DataFrame twins (broadcast dim joins, partial aggregation,
  * rank-window with a 5-value partition key), verified in PlanSpec.
  */
object Sql {
  type Q = (SparkSession, String) => DataFrame

  /** Views are per-session and definitions are constant, so concurrent
    * re-registration is idempotent. Events goes through normalizeTs so
    * SQL over `events` sees the same µs-precision UTC timestamps as the
    * DataFrame surface. */
  private def registerViews(s: SparkSession, d: String): Unit =
    Tables.names.foreach { t =>
      try Tables(s, d, t).createOrReplaceTempView(t)
      catch { case _: Throwable => () } // missing fixture table: view absent
    }

  /** Join-matrix core via SQL text: customer ⋈ nation (broadcast-hinted
    * dim) — the snowflake join q_join_bcast expresses via DataFrame. */
  private val sqlJoin: String =
    """SELECT /*+ BROADCAST(nation) */ n_name,
      |       count(*) AS n_cust,
      |       round(avg(c_acctbal), 4) AS avg_bal
      |FROM customer
      |JOIN nation ON c_nationkey = n_nationkey
      |GROUP BY n_name
      |ORDER BY n_name NULLS FIRST""".stripMargin

  /** Rank window over a bounded (5-value) partition key via SQL text —
    * the q_topk_per_group shape. Ties at the boundary are included by
    * rank() on both engines, so the result is order-deterministic via
    * the trailing total sort. */
  private val sqlWindow: String =
    """SELECT o_orderpriority, o_orderkey, rnk
      |FROM (
      |  SELECT o_orderpriority, o_orderkey,
      |         rank() OVER (PARTITION BY o_orderpriority
      |                      ORDER BY o_totalprice DESC, o_orderkey) AS rnk
      |  FROM orders
      |) t
      |WHERE rnk <= 3
      |ORDER BY o_orderpriority NULLS FIRST, rnk, o_orderkey""".stripMargin

  /** ROLLUP aggregate via SQL text — the q_agg_rollup shape. */
  private val sqlRollup: String =
    """SELECT o_orderstatus, o_orderpriority,
      |       count(*) AS n,
      |       round(CAST(sum(o_totalprice) AS DOUBLE), 2) AS sum_v
      |FROM orders
      |GROUP BY ROLLUP(o_orderstatus, o_orderpriority)
      |ORDER BY o_orderstatus NULLS FIRST, o_orderpriority NULLS FIRST""".stripMargin

  /** Correlated scalar subquery — the decorrelation path: Catalyst
    * rewrites the per-row subquery into an aggregate + join
    * (RewriteCorrelatedScalarSubquery), so what LOOKS like a nested
    * loop executes as one aggregate exchange + one equi-join at any
    * scale. The boundary quantity is an integer count, so no FP
    * summation-order ulp can flip a row across the predicate. */
  private val sqlSubquery: String =
    """SELECT o_orderkey, o_custkey
      |FROM orders o
      |WHERE o_orderkey < (SELECT min(o2.o_orderkey) + 10
      |                    FROM orders o2
      |                    WHERE o2.o_custkey = o.o_custkey)
      |ORDER BY o_orderkey""".stripMargin

  /** CTE + HAVING + join — the query text every analyst writes.
    * Aggregates kept to exact counts (no FP in the HAVING boundary). */
  private val sqlCte: String =
    """WITH big AS (
      |  SELECT o_custkey, count(*) AS n_orders
      |  FROM orders
      |  GROUP BY o_custkey
      |  HAVING count(*) >= 10
      |)
      |SELECT c_mktsegment, count(*) AS n_cust,
      |       CAST(sum(n_orders) AS BIGINT) AS orders_total
      |FROM big
      |JOIN customer ON o_custkey = c_custkey
      |GROUP BY c_mktsegment
      |ORDER BY c_mktsegment NULLS FIRST""".stripMargin

  /** NOT EXISTS anti-semi subquery — Catalyst decorrelates it into a
    * LEFT ANTI hash join (RewritePredicateSubquery), so the per-row
    * existence probe is one equi-join at any scale; DuckDB plans the
    * same anti-join. Counting customers with no orders exercises the
    * null-safe side of the rewrite. Counts customers with no
    * large order (every customer has SOME order in the fixture, so
    * the price predicate is what makes the anti-set non-empty). */
  private val sqlExists: String =
    """SELECT c_mktsegment, count(*) AS n_no_big_orders
      |FROM customer c
      |WHERE NOT EXISTS (SELECT 1 FROM orders o
      |                  WHERE o.o_custkey = c.c_custkey
      |                    AND o.o_totalprice > 250000)
      |GROUP BY c_mktsegment
      |ORDER BY c_mktsegment NULLS FIRST""".stripMargin

  /** Recursive CTE — Spark 4 compiles WITH RECURSIVE to a UnionLoop
    * that materializes each frontier and feeds it back (the iterative
    * BFS shape every graph walk compiles to); DuckDB runs its own
    * recursive-union executor on the identical string. The walk is a
    * depth-bounded traversal of the deterministic functional graph
    * v → (7v+3) mod 25 over nation keys, with the successor resolved
    * through a JOIN so the recursive step is a real per-level
    * equi-join (frontier shuffles on the join key each level — the
    * 100 TB posture for any frontier algorithm), and DISTINCT
    * aggregation applied outside the loop so both engines use plain
    * UNION ALL recursion semantics. */
  private val sqlRecursive: String =
    """WITH RECURSIVE walk(root, node, depth) AS (
      |  SELECT n_nationkey, n_nationkey, 0 FROM nation WHERE n_nationkey < 5
      |  UNION ALL
      |  SELECT w.root, n.n_nationkey, w.depth + 1
      |  FROM walk w
      |  JOIN nation n ON n.n_nationkey = (w.node * 7 + 3) % 25
      |  WHERE w.depth < 6
      |)
      |SELECT root, CAST(count(DISTINCT node) AS BIGINT) AS n_reach,
      |       CAST(max(depth) AS INT) AS max_depth
      |FROM walk
      |GROUP BY root
      |ORDER BY root""".stripMargin

  /** LATERAL correlated derived table — the per-row top-k join shape
    * (ANSI <lateral derived table>): for each nation, the two
    * highest-balance customers. Catalyst decorrelates the LIMITed
    * correlated subquery into a rank-window over the join
    * (DecorrelateInnerQuery + RewriteLateralSubquery), i.e. the same
    * physical per-group top-k as q_topk_per_group — no nested loop at
    * any scale; DuckDB executes its own lateral-join operator on the
    * identical string. Balances pass through unmodified (no FP
    * arithmetic), ties broken on c_name. */
  private val sqlLateral: String =
    """SELECT n_name, top2.c_name, top2.c_acctbal
      |FROM nation, LATERAL (
      |  SELECT c_name, c_acctbal
      |  FROM customer
      |  WHERE c_nationkey = n_nationkey
      |  ORDER BY c_acctbal DESC, c_name
      |  LIMIT 2
      |) top2
      |ORDER BY n_name NULLS FIRST, top2.c_acctbal DESC, top2.c_name""".stripMargin

  private def runSql(sql: String): Q = (s, d) => {
    registerViews(s, d)
    s.sql(sql)
  }

  val queries: Map[String, Q] = Map(
    "q_sql_join"     -> runSql(sqlJoin),
    "q_sql_window"   -> runSql(sqlWindow),
    "q_sql_rollup"   -> runSql(sqlRollup),
    "q_sql_subquery" -> runSql(sqlSubquery),
    "q_sql_cte"      -> runSql(sqlCte),
    "q_sql_exists"   -> runSql(sqlExists),
    "q_sql_recursive" -> runSql(sqlRecursive),
    "q_sql_lateral"  -> runSql(sqlLateral)
  )

  /** Identical strings — the whole point of the parity gate. */
  val oracleSql: Map[String, String] = Map(
    "q_sql_join"     -> sqlJoin,
    "q_sql_window"   -> sqlWindow,
    "q_sql_rollup"   -> sqlRollup,
    "q_sql_subquery" -> sqlSubquery,
    "q_sql_cte"      -> sqlCte,
    "q_sql_exists"   -> sqlExists,
    "q_sql_recursive" -> sqlRecursive,
    "q_sql_lateral"  -> sqlLateral
  )
}
