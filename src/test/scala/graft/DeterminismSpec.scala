package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.DataFrame

/** Determinism under reconfiguration — the law behind every "exact
  * integer treatment" claim in the inventory: a result must not change
  * when the cluster shape does. Each FP-order-sensitive query runs
  * under three execution geometries (shuffle width 2/4/13, scan-split
  * sizes forcing different per-partition row sets) on isolated child
  * sessions, and all three results must be identical cell-for-cell.
  * A double-sum anywhere in a hot aggregate would fail this the first
  * time partial-aggregation order shifts — exactly the class of bug
  * the integer-grain rules exist to prevent, now pinned structurally
  * rather than by one lucky configuration. */
class DeterminismSpec extends AnyFunSuite {
  private lazy val parent = SparkSessionTestWrapper.spark
  private val SF = "/root/testdata/sf0.001"

  // The queries whose math would drift first if any sum were FP-order
  // dependent or any per-partition structure leaked into the result:
  // surprise/importance scores, PMI, the integer power iteration,
  // bounded-heap top-k rankings, and the integer BM25/RRF ranks.
  private val TARGETS = Seq(
    "q_quality_lm", "q_select_dsir", "q_mix_doremi", "q_quality_bigram",
    "q_quality_kn",
    "q_text_pmi", "q_embed_pca", "q_eval_retrieval", "q_skew_profile",
    "q_rank_bm25", "q_rank_rrf", "q_ann_mrl_recall", "q_tokenize_fertility")

  private val GEOMETRIES = Seq(
    Map("spark.sql.shuffle.partitions" -> "2",
      "spark.sql.files.maxPartitionBytes" -> "16384",
      "spark.sql.files.openCostInBytes" -> "0"),
    Map("spark.sql.shuffle.partitions" -> "4"),
    Map("spark.sql.shuffle.partitions" -> "13",
      "spark.sql.files.maxPartitionBytes" -> "1048576"))

  private def canon(df: DataFrame): Seq[String] =
    df.collect().toSeq.map(_.toSeq.map {
      case null => "NULL"
      case a: Array[_] => a.mkString("[", ",", "]")
      case x => x.toString
    }.mkString("")).sorted

  test("FP-sensitive queries are bit-identical across execution geometries") {
    TARGETS.foreach { name =>
      val results = GEOMETRIES.map { conf =>
        val s = parent.newSession()
        conf.foreach { case (k, v) => s.conf.set(k, v) }
        canon(SparkEntry.queries(name)(s, SF))
      }
      assert(results(0).nonEmpty, s"$name: empty result")
      assert(results(1) == results(0) && results(2) == results(0),
        s"$name: result depends on execution geometry")
    }
  }
}
