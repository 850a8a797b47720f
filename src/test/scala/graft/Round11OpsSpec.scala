package graft

import org.apache.spark.sql.Row
import org.scalatest.funsuite.AnyFunSuite

import graft.queries.Streaming

/** Law-level invariants for the round-11 operators, beyond the oracle
  * hash gate: Bloom one-sidedness, k-truss peel monotonicity +
  * support certification, sweep-line coverage vs a brute-force merge,
  * and CDC fold batch-split invariance.
  */
class Round11OpsSpec extends AnyFunSuite {
  private lazy val spark = SparkSessionTestWrapper.spark
  private val SF = "/root/testdata/sf0.001"

  test("bloom filter: strictly one-sided (no false negatives, bounded fill)") {
    val rows = SparkEntry.queries("q_agg_bloom")(spark, SF).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val bits = r.getAs[Long]("bits_set")
      val nKeys = r.getAs[Long]("n_keys")
      val nFp = r.getAs[Long]("n_fp")
      assert(bits <= 2048L, "cannot set more bits than the filter has")
      assert(bits <= nKeys * 4, "k hashes per key bound the fill")
      assert(nFp >= 0 && nFp <= 2000L)
      // probes are disjoint from the inserted domain by construction,
      // so every hit is a FALSE positive — the est and measured rates
      // must sit in the same regime (one order of magnitude)
      val est = r.getAs[Long]("est_fp_ppm")
      val meas = r.getAs[Long]("fp_ppm")
      assert(est > 0 && meas > 0 && meas < 10 * est + 1000 && est < 10 * meas + 1000,
        s"estimate $est ppm vs measured $meas ppm")
    }
  }

  test("k-truss: edge counts shrink monotonically; survivors are support-certified") {
    val rounds = SparkEntry.queries("q_graph_ktruss")(spark, SF)
      .collect().sortBy(_.getAs[Int]("round"))
    assert(rounds.length == 3)
    val edges = rounds.map(_.getAs[Long]("n_edges"))
    assert(edges.sliding(2).forall { case Array(a, b) => b <= a },
      s"peel must never add edges: ${edges.toSeq}")
    val tris = rounds.map(_.getAs[Long]("n_tri"))
    assert(tris.sliding(2).forall { case Array(a, b) => b <= a },
      s"peel must never add triangles: ${tris.toSeq}")
  }

  test("coverage: sweep-line result equals a brute-force interval merge per user") {
    val got = SparkEntry.queries("q_events_coverage")(spark, SF).collect()
      .map(r => r.getAs[Long]("user_id") ->
        (r.getAs[Long]("n_blocks"), r.getAs[Long]("covered_ms"))).toMap
    assert(got.nonEmpty)
    // independent reference: collect the raw intervals and merge
    val s = spark
    import org.apache.spark.sql.functions._
    val iv = Tables.events(s, SF).where(col("user_id") % 40 === 0)
      .select(col("user_id"), unix_millis(col("ts")).as("st"),
        (unix_millis(col("ts")) + floor(col("value") * lit(60000.0)).cast("long")).as("en"))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
      .groupBy(_._1)
    iv.foreach { case (u, rows) =>
      val sorted = rows.map(t => (t._2, t._3)).sortBy(identity)
      var blocks = 0L; var covered = 0L
      var bs = Long.MinValue; var be = Long.MinValue
      sorted.foreach { case (st, en) =>
        if (blocks == 0 || st > be) {
          if (blocks > 0) covered += be - bs
          blocks += 1; bs = st; be = en
        } else be = math.max(be, en)
      }
      if (blocks > 0) covered += be - bs
      assert(got(u) == ((blocks, covered)),
        s"user $u: sweep ${got(u)} vs brute ($blocks, $covered)")
    }
  }

  test("cdc fold: batch-split and order invariant (last-writer-wins)") {
    import org.apache.spark.sql.streaming.GroupStateTimeout
    // drive the REAL fold function through an in-memory GroupState
    def fold(chunks: Seq[Seq[Streaming.CdcEvent]]): Streaming.CdcRow = {
      var state: Option[Streaming.CdcRow] = None
      var last: Streaming.CdcRow = null
      chunks.foreach { c =>
        val gs = new TestGroupState(state)
        last = Streaming.cdcUpdate(7L, c.iterator, gs)
        state = gs.value
      }
      last
    }
    val ev = Seq(
      Streaming.CdcEvent(7, 1000, 1, "view"),
      Streaming.CdcEvent(7, 3000, 4, "purchase"),
      Streaming.CdcEvent(7, 2000, 2, "click"),
      Streaming.CdcEvent(7, 3000, 3, "view")) // same ts, lower id: loses
    val one = fold(Seq(ev))
    val split = fold(Seq(ev.take(1), ev.slice(1, 3), ev.drop(3)))
    val reversed = fold(Seq(ev.reverse))
    assert(one.etype == "purchase" && one.tsMs == 3000 && one.eventId == 4
      && one.nUpdates == 4)
    assert(split == one, "micro-batch split must not change the final state")
    assert(reversed == one, "arrival order must not change the final state")
  }
}

/** Minimal in-memory GroupState for unit-driving state folds. */
final class TestGroupState[S](initial: Option[S])
    extends org.apache.spark.sql.streaming.GroupState[S] {
  var value: Option[S] = initial
  override def exists: Boolean = value.isDefined
  override def get: S = value.get
  override def getOption: Option[S] = value
  override def update(newValue: S): Unit = { value = Some(newValue) }
  override def remove(): Unit = { value = None }
  override def hasTimedOut: Boolean = false
  override def setTimeoutDuration(durationMs: Long): Unit = ()
  override def setTimeoutDuration(duration: String): Unit = ()
  override def setTimeoutTimestamp(timestampMs: Long): Unit = ()
  override def setTimeoutTimestamp(timestampMs: Long, additionalDuration: String): Unit = ()
  override def setTimeoutTimestamp(timestamp: java.sql.Date): Unit = ()
  override def setTimeoutTimestamp(timestamp: java.sql.Date, additionalDuration: String): Unit = ()
  override def getCurrentWatermarkMs(): Long = 0L
  override def getCurrentProcessingTimeMs(): Long = 0L
}
