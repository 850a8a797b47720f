package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import graft.{queries => q}

/** Driver contract — see /root/repo/SURVEY.md §7 + the builder prompt.
  *
  * `queries` / `oracleSql` aggregate the per-module inventories under
  * graft.queries.*; keys are unique across modules (asserted at load).
  */
object SparkEntry {

  /** Flagship query on /root/testdata/sf0.001; driver smoke-checks rows>0. */
  def entry(spark: SparkSession): DataFrame =
    queries("q1_agg")(spark, "/root/testdata/sf0.001")

  private val modules: Seq[(Map[String, (SparkSession, String) => DataFrame], Map[String, String])] =
    Seq(
      (q.Relational.queries, q.Relational.oracleSql),
      (q.Dedup.queries, q.Dedup.oracleSql),
      (q.Similarity.queries, q.Similarity.oracleSql),
      (q.TextAnalysis.queries, q.TextAnalysis.oracleSql),
      (q.Pipeline.queries, q.Pipeline.oracleSql),
      (q.Curation.queries, q.Curation.oracleSql),
      (q.Graph.queries, q.Graph.oracleSql),
      (q.Multimodal.queries, q.Multimodal.oracleSql),
      (q.Streaming.queries, q.Streaming.oracleSql),
      (q.Imaging.queries, q.Imaging.oracleSql),
      (q.Events.queries, q.Events.oracleSql),
      (q.Sql.queries, q.Sql.oracleSql)
    )

  /** One entry per implemented operator from SURVEY.md §2. */
  val queries: Map[String, (SparkSession, String) => DataFrame] = {
    val all = modules.map(_._1)
    val merged = all.reduceOption(_ ++ _).getOrElse(Map.empty)
    require(merged.size == all.map(_.size).sum, "duplicate query keys across modules")
    merged
  }

  /** For each key in queries, equivalent ANSI SQL runnable by DuckDB on
    * the same parquet tables. Omit for non-SQL-expressible ops. */
  val oracleSql: Map[String, String] = modules.map(_._2).reduceOption(_ ++ _).getOrElse(Map.empty)

  /** Sharded DuckDB replay recipes — (sliceKind, defaultSlices, steps)
    * per heavy oracle; same algorithms as [[oracleSql]], re-staged so
    * scale-fixture verification fits DuckDB temp/time budgets. Dumped
    * by [[Verify]] as oracle_sharded.json, run by
    * scripts/sharded_check.py (step grammar + slice-validity rules
    * documented there). */
  val shardedOracleSql: Map[String, (String, Int, Seq[String])] =
    q.Dedup.shardedOracle ++ q.Similarity.shardedOracle ++ q.Graph.shardedOracle
}
