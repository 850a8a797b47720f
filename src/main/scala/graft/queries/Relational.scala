package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.Tables

/** Relational operator inventory (SURVEY.md §2.3–§2.8 added categories).
  *
  * Conventions shared with the DuckDB oracle:
  *  - every aggregate / computed column is aliased identically on both
  *    sides (the driver hash-compares by column name);
  *  - every query ends in a total ORDER BY so row order is deterministic
  *    regardless of partitioning;
  *  - floating-point aggregates are rounded (sums to 2 dp, ratios to 6 dp)
  *    so summation-order ulp drift cannot flip the hash.
  */
object Relational {
  type Q = (SparkSession, String) => DataFrame

  /** TPC-H Q1-style hash aggregation with partial (map-side) combine. */
  val q1Agg: Q = (s, d) => {
    Tables.lineitem(s, d)
      .groupBy("l_returnflag", "l_linestatus")
      .agg(
        round(sum("l_quantity"), 2).as("sum_qty"),
        round(sum("l_extendedprice"), 2).as("sum_base_price"),
        round(sum(col("l_extendedprice") * (lit(1.0) - col("l_discount"))), 2)
          .as("sum_disc_price"),
        round(avg("l_quantity"), 6).as("avg_qty"),
        round(avg("l_discount"), 6).as("avg_disc"),
        count(lit(1)).as("count_order"))
      .orderBy("l_returnflag", "l_linestatus")
  }

  def queries: Map[String, Q] = Map(
    "q1_agg" -> q1Agg
  )

  def oracleSql: Map[String, String] = Map(
    "q1_agg" ->
      """SELECT l_returnflag, l_linestatus,
        |  round(sum(l_quantity), 2) AS sum_qty,
        |  round(sum(l_extendedprice), 2) AS sum_base_price,
        |  round(sum(l_extendedprice * (1.0 - l_discount)), 2) AS sum_disc_price,
        |  round(avg(l_quantity), 6) AS avg_qty,
        |  round(avg(l_discount), 6) AS avg_disc,
        |  count(*) AS count_order
        |FROM lineitem
        |GROUP BY l_returnflag, l_linestatus
        |ORDER BY l_returnflag, l_linestatus""".stripMargin
  )
}
