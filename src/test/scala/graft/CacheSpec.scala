package graft

import org.scalatest.funsuite.AnyFunSuite

/** Cache-hygiene guard: every query that caches intermediates must
  * release them when its result is materialized (Scoped.withCached), so
  * a long-lived session serving the inventory repeatedly cannot
  * accumulate block-manager entries. The checkpointed result RDDs are
  * reference-tracked by Spark's ContextCleaner — after dropping the
  * DataFrames and forcing GC the persistent-RDD set must return to its
  * pre-query baseline.
  */
class CacheSpec extends AnyFunSuite {
  private lazy val spark = SparkSessionTestWrapper.spark
  private val SF = "/root/testdata/sf0.001"

  test("scoped caches do not outlive their query invocation") {
    val cachedQueries = Seq("q_dedup_ngram_jaccard", "q_dedup_minhash",
      "q_dedup_simhash", "q_dedup_embcos", "q_dedup_cluster",
      "q_dedup_apply", "q_ann_quantized", "q_ann_ivf_kmeans",
      "q_text_heavyhitters", "q_decontaminate")
    val baseline = spark.sparkContext.getPersistentRDDs.keySet
    cachedQueries.foreach { name =>
      SparkEntry.queries(name)(spark, SF).count()
    }
    // Explicitly-cached intermediates are unpersisted by the queries
    // themselves; the only entries allowed to linger are checkpointed
    // result RDDs, released by the async ContextCleaner once their
    // DataFrames are unreachable — force that path and wait.
    def leaked() = spark.sparkContext.getPersistentRDDs.keySet -- baseline
    val deadline = System.currentTimeMillis() + 30000
    while (leaked().nonEmpty && System.currentTimeMillis() < deadline) {
      System.gc(); Thread.sleep(250)
    }
    assert(leaked().isEmpty, s"persistent RDDs leaked past query end: ${leaked()}")
  }
}
