package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.queries.HeavyHitters

/** The heavy-hitter split must be EXACTLY the naive per-key count —
  * the split is a physical re-shape, never a semantic change. */
class HeavyHittersSpec extends AnyFunSuite {
  private lazy val spark = SparkSessionTestWrapper.spark

  test("attachKeyCount equals the naive per-key count on a Zipf-skewed table") {
    import spark.implicits._
    // 60% of rows share one hot key (way past total/HOT_DENOM); the
    // rest spread over ~4k cold keys — both branches exercised.
    val df = spark.range(10000).select(col("id"),
      when(col("id") % 10 < 6, lit("the"))
        .otherwise(concat(lit("k"), (col("id") % 4096).cast("string"))).as("tok"))
    val got = HeavyHitters.attachKeyCount(df, "tok", "c", totalOut = Some("total"))
    val naive = df.groupBy("tok").agg(count(lit(1)).as("c"))
    val expect = df.join(naive, "tok")
    assert(got.count() === 10000L)
    assert(got.select("total").distinct().as[Long].collect().toSeq === Seq(10000L))
    // exact per-row equality, order-free: anti-join both directions
    val g = got.select("id", "tok", "c")
    val e = expect.select("id", "tok", "c")
    assert(g.exceptAll(e).isEmpty && e.exceptAll(g).isEmpty)
    // the hot key really took the broadcast path: it is in the hot set
    assert(got.where(col("tok") === "the").select("c").distinct()
      .as[Long].head() === 6000L)
  }

  test("attachKeyCount on a table with no heavy hitter (all-tail path)") {
    import spark.implicits._
    val df = spark.range(5000).select(col("id"),
      (col("id") % 3000).cast("string").as("tok"))
    val got = HeavyHitters.attachKeyCount(df, "tok", "c")
    val naive = df.groupBy("tok").agg(count(lit(1)).as("c2"))
    val bad = got.join(naive, "tok").where(col("c") =!= col("c2"))
    assert(got.count() === 5000L && bad.isEmpty)
  }

  test("attachModel equals a naive model join on a Zipf-skewed table") {
    // Same physical-reshape law for the precomputed-model variant:
    // every model column must arrive unchanged on every row, whichever
    // branch (hot broadcast / tail join) delivered it.
    val df = spark.range(10000).select(col("id"),
      when(col("id") % 10 < 6, lit("the"))
        .otherwise(concat(lit("k"), (col("id") % 4096).cast("string"))).as("tok"))
    val model = df.groupBy("tok").agg(count(lit(1)).as("c"))
      .withColumn("w", col("c") * 7 + length(col("tok")))
    val got = HeavyHitters.attachModel(df, "tok", model, "c")
    val expect = df.join(model, "tok")
    assert(got.count() === 10000L)
    val g = got.select("id", "tok", "c", "w")
    val e = expect.select("id", "tok", "c", "w")
    assert(g.exceptAll(e).isEmpty && e.exceptAll(g).isEmpty)
  }

  test("attachModel all-tail when no key is hot") {
    val df = spark.range(5000).select(col("id"),
      (col("id") % 3000).cast("string").as("tok"))
    val model = df.groupBy("tok").agg(count(lit(1)).as("c"))
    val got = HeavyHitters.attachModel(df, "tok", model, "c")
    val naive = df.groupBy("tok").agg(count(lit(1)).as("c2"))
    val bad = got.join(naive, "tok").where(col("c") =!= col("c2"))
    assert(got.count() === 5000L && bad.isEmpty)
  }
}
