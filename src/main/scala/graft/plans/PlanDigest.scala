package graft.plans

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.execution.SparkPlan
import org.apache.spark.sql.execution.adaptive.{AdaptiveSparkPlanExec, QueryStageExec}
import org.apache.spark.sql.execution.exchange.ReusedExchangeExec

/** Canonical fingerprint of an EXECUTED physical plan (round-11
  * verdict item 4): the operator counts that decide scale behavior —
  * exchanges, join strategies, aggregate modes, sorts, windows — as a
  * stable `name=count` string. A spec diffs the fingerprints of the
  * heaviest queries against checked-in values, so a lost broadcast, a
  * new shuffle, or a join-strategy flip fails `sbt test` immediately
  * instead of surfacing as a bench regression a round later.
  *
  * AQE note: the final adaptive plan exists only after execution, so
  * [[of]] collects the frame first and then unwraps
  * `AdaptiveSparkPlanExec`/query stages (the same recipe SkewSpec
  * proved; `collect()`, not `count()` — a different action builds a
  * different QueryExecution).
  */
object PlanDigest {

  /** Node classes worth pinning. Everything else (projects, filters,
    * codegen wrappers, scans) is noise that would make the digest
    * brittle without adding regression signal. */
  private val Interesting = Set(
    "ShuffleExchange", "BroadcastExchange",
    "BroadcastHashJoin", "SortMergeJoin", "ShuffledHashJoin",
    "BroadcastNestedLoopJoin", "CartesianProduct",
    "HashAggregate", "ObjectHashAggregate", "SortAggregate",
    "Sort", "Window", "WindowGroupLimit", "Expand", "Generate",
    "TakeOrderedAndProject", "CollectLimit", "GlobalLimit",
    "InMemoryTableScan", "TopKPerKey")

  /** Execute the frame, then fingerprint its final adaptive plan.
    * NOTE: queries that localize intermediate results (bounded-model
    * fits, loop counts) run most of their work in EARLIER executions —
    * fingerprint those with [[counts]] per execution via a
    * QueryExecutionListener and [[format]] the merged sum (the
    * PlanDigestSpec recipe). */
  def of(df: DataFrame): String = {
    df.collect()
    digest(df.queryExecution.executedPlan)
  }

  def digest(plan: SparkPlan): String = format(counts(plan))

  /** Interesting-operator counts of one executed plan. */
  def counts(plan: SparkPlan): Map[String, Int] = {
    val counts = scala.collection.mutable.TreeMap.empty[String, Int]
    def add(name: String): Unit =
      counts.update(name, counts.getOrElse(name, 0) + 1)
    def walk(p: SparkPlan): Unit = p match {
      case a: AdaptiveSparkPlanExec => walk(a.executedPlan)
      case s: QueryStageExec => walk(s.plan)
      // a reused exchange is a second CONSUMPTION of a counted one.
      // Whether AQE reuses (a self-join's identical sides race stage
      // materialization) is run-dependent, so count it as the wrapped
      // exchange TYPE — the digest then reads the same whether the
      // planner deduplicated or not — without re-descending into the
      // shared subtree (its operators are counted where the original
      // exchange sits)
      case r: ReusedExchangeExec =>
        add(if (r.child.getClass.getSimpleName.contains("Shuffle"))
          "ShuffleExchange" else "BroadcastExchange")
      case other =>
        val n = other.getClass.getSimpleName.stripSuffix("Exec")
        if (Interesting(n)) add(n)
        other.children.foreach(walk)
    }
    walk(plan)
    counts.toMap
  }

  /** Merge per-execution counts (sum) into the canonical string. */
  def format(all: Iterable[Map[String, Int]]): String = {
    val merged = all.foldLeft(Map.empty[String, Int]) { (acc, m) =>
      m.foldLeft(acc) { case (a, (k, v)) => a.updated(k, a.getOrElse(k, 0) + v) }
    }
    format(merged)
  }

  def format(counts: Map[String, Int]): String =
    if (counts.isEmpty) "trivial"
    else counts.toSeq.sortBy(_._1).map { case (k, v) => s"$k=$v" }.mkString(" ")
}
