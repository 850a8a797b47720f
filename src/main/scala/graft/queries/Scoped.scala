package graft.queries

import org.apache.spark.sql.DataFrame

/** Query-scoped caching.
  *
  * Spark's `CacheManager` keys cache entries by logical plan and holds
  * them for the life of the session: a query that calls `.cache()` and
  * never unpersists leaks one block-manager entry per invocation, so a
  * long-lived session serving the inventory repeatedly accumulates
  * cached shingle/signature tables forever. `withCached` scopes the
  * cache to the query: it caches the intermediates, MATERIALIZES the
  * result while they are alive (`localCheckpoint(eager = true)`
  * computes the result distributed — no driver collect — and truncates
  * the lineage so the returned plan no longer references the caches),
  * then unpersists in a `finally`. The checkpointed result RDD itself
  * is released by Spark's ContextCleaner once the caller drops the
  * returned DataFrame (reference-tracked, GC-driven) — CacheSpec pins
  * that the persistent-RDD set returns to baseline after a full
  * inventory pass.
  */
object Scoped {
  /** Plan-inspection hook (PlanSpec): when set, `withCached` returns the
    * raw lazy plan — no cache, no checkpoint — so plan guards assert on
    * the exact tree that executes inside the wrapper. Never set outside
    * tests. */
  @volatile var planOnly: Boolean = false

  def withCached(cached: DataFrame*)(result: => DataFrame): DataFrame = {
    if (planOnly) result
    else {
      cached.foreach(_.cache())
      try result.localCheckpoint(true)
      finally cached.foreach(_.unpersist(blocking = false))
    }
  }
}
