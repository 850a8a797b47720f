package graft

import org.scalatest.funsuite.AnyFunSuite
import scala.concurrent.{Await, Future}
import scala.concurrent.ExecutionContext.Implicits.global
import scala.concurrent.duration._

/** Shared-session concurrency: the round-5 hazard was an iterative
  * query flipping the session-global `spark.sql.shuffle.partitions`
  * mid-flight, which any concurrently planned query would observe.
  * The fix replaced the conf mutation with explicit repartitioning;
  * this spec pins the contract — two queries (one iterative with the
  * fixpoint loop, one plain aggregate) running CONCURRENTLY on the
  * shared session produce exactly their sequential results, and the
  * session's shuffle width is untouched throughout. */
class ConcurrencySpec extends AnyFunSuite {
  private lazy val spark = SparkSessionTestWrapper.spark
  private val SF = "/root/testdata/sf0.001"

  private def rows(name: String): Seq[String] =
    SparkEntry.queries(name)(spark, SF)
      .collect().map(_.mkString("|")).toSeq

  test("iterative fixpoint + concurrent aggregate: sequential results, conf untouched") {
    val before = spark.conf.get("spark.sql.shuffle.partitions")
    val seqCluster = rows("q_dedup_cluster")
    val seqAgg = rows("q1_agg")
    // run both concurrently several times — the loop mutated the conf
    // for its whole duration, so any overlap would have exposed it
    (1 to 2).foreach { _ =>
      val fCluster = Future(rows("q_dedup_cluster"))
      val fAgg = Future {
        (1 to 5).map { _ =>
          val r = rows("q1_agg")
          // the shared session must never observe a flipped width
          assert(spark.conf.get("spark.sql.shuffle.partitions") == before,
            "a concurrent query observed a mutated session shuffle width")
          r
        }.last
      }
      assert(Await.result(fCluster, 5.minutes) == seqCluster)
      assert(Await.result(fAgg, 5.minutes) == seqAgg)
    }
    assert(spark.conf.get("spark.sql.shuffle.partitions") == before)
  }

  test("draining stream + concurrent batch query: batch keeps full shuffle width") {
    val before = spark.conf.get("spark.sql.shuffle.partitions")
    val seqAgg = rows("q1_agg")
    // the streaming queries run with shuffle.partitions=2 on an ISOLATED
    // child session (Streaming.onStreamSession); a batch query planned
    // while the stream drains must still see the parent's width — both
    // in the conf it reads and in the physical plan it gets
    val fStream = Future(rows("q_stream_hourly"))
    val fBatch = Future {
      (1 to 5).map { _ =>
        val r = rows("q1_agg")
        assert(spark.conf.get("spark.sql.shuffle.partitions") == before,
          "a batch query observed the streaming child session's width")
        // Under AQE the executed plan root is AdaptiveSparkPlanExec,
        // whose collect sees no exchanges: its inputPlan predates
        // EnsureRequirements, and in the FINAL plan every stage
        // (ResultQueryStage, ShuffleQueryStage) is a LEAF node hiding
        // its subtree in `plan`. Force execution, then walk the tree
        // descending through both children and stage bodies, and
        // require the exchange to actually be found so this can never
        // pass vacuously.
        val df = Tables.lineitem(spark, SF).groupBy("l_returnflag").count()
        df.collect()
        import org.apache.spark.sql.execution.SparkPlan
        import org.apache.spark.sql.execution.adaptive.{AdaptiveSparkPlanExec, QueryStageExec}
        def flatten(p: SparkPlan): Seq[SparkPlan] = p +: (p match {
          case a: AdaptiveSparkPlanExec => flatten(a.executedPlan)
          case q: QueryStageExec => flatten(q.plan)
          case other => other.children.flatMap(flatten)
        })
        val widths = flatten(df.queryExecution.executedPlan).collect {
          case s: org.apache.spark.sql.execution.exchange.ShuffleExchangeExec =>
            s.outputPartitioning.numPartitions
        }
        assert(widths.nonEmpty, "expected a shuffle exchange in the grouped-agg plan")
        assert(widths.forall(_ == before.toInt),
          s"batch plan shuffled at ${widths.mkString(",")} instead of $before")
        r
      }.last
    }
    assert(Await.result(fStream, 5.minutes).nonEmpty)
    assert(Await.result(fBatch, 5.minutes) == seqAgg)
    assert(spark.conf.get("spark.sql.shuffle.partitions") == before)
  }
}
