package graft.plans

import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.SparkSessionTestWrapper

/** The custom top-k operator must be plan-visible and row-identical to
  * the WindowExec it replaces, across filter shapes and edge cases. */
class TopKPerKeySpec extends AnyFunSuite {
  private lazy val spark = SparkSessionTestWrapper.spark

  private def df = {
    import spark.implicits._
    // 7 groups × 40 rows with a total (value desc, id asc) ordering,
    // plus one tiny group with fewer than k rows
    ((0 until 280).map(i => (i % 7, (i * 131) % 97, i)) ++
      Seq((99, 5, 1000), (99, 5, 1001)))
      .toDF("grp", "value", "id")
  }

  private def topk(k: Int, pred: org.apache.spark.sql.Column => org.apache.spark.sql.Column) = {
    val w = Window.partitionBy("grp").orderBy(col("value").desc, col("id").asc)
    df.withColumn("rn", row_number().over(w))
      .where(pred(col("rn")))
      .orderBy("grp", "rn")
  }

  private def withOperator[T](body: => T): T = {
    TopKPerKeyPlans.install(spark)
    try body finally TopKPerKeyPlans.uninstall(spark)
  }

  test("rn <= k rewrites to TopKPerKey and matches WindowExec row-for-row") {
    val expected = topk(3, _ <= 3).collect().toSeq
    withOperator {
      val q = topk(3, _ <= 3)
      assert(q.queryExecution.executedPlan.toString.contains("TopKPerKey"),
        "rule should have rewritten the window")
      assert(q.collect().toSeq == expected)
    }
  }

  test("rn === 1 (argmax per key) and rn < k shapes also rewrite") {
    for ((pred, label) <- Seq(
        ((c: org.apache.spark.sql.Column) => c === 1, "eq1"),
        ((c: org.apache.spark.sql.Column) => c < 4, "lt4"))) {
      val expected = topk(5, pred).collect().toSeq
      withOperator {
        val q = topk(5, pred)
        assert(q.queryExecution.executedPlan.toString.contains("TopKPerKey"), label)
        assert(q.collect().toSeq == expected, label)
      }
    }
  }

  test("groups smaller than k emit all their rows (tiny-group edge)") {
    withOperator {
      val rows = topk(3, _ <= 3).where(col("grp") === 99).collect()
      assert(rows.map(r => (r.getInt(2), r.getInt(3))).toSeq == Seq((1000, 1), (1001, 2)))
    }
  }

  test("global windows and non-row_number windows are left untouched") {
    withOperator {
      val g = df.withColumn("rn", row_number().over(
          Window.orderBy(col("value").desc, col("id").asc)))
        .where(col("rn") <= 3)
      assert(!g.queryExecution.executedPlan.toString.contains("TopKPerKey"))
      val r = df.withColumn("rk", rank().over(
          Window.partitionBy("grp").orderBy(col("value").desc)))
        .where(col("rk") <= 3)
      assert(!r.queryExecution.executedPlan.toString.contains("TopKPerKey"))
    }
  }
}
