package graft.streaming

import org.scalatest.funsuite.AnyFunSuite
import graft.SparkSessionTestWrapper
import Sessionizer._

class SessionizerSpec extends AnyFunSuite {
  private lazy val spark = SparkSessionTestWrapper.spark

  test("advance folds events into gap-delimited sessions") {
    val gap = 1000L
    val ev = Seq(
      Event(1, 0, 10), Event(1, 500, 11), Event(1, 900, 12),   // session 1
      Event(1, 5000, 13), Event(1, 5100, 14),                  // session 2
      Event(1, 99000, 15))                                     // session 3 (open)
    val (closed, open) = advance(1, ev, None, gap)
    assert(closed == Seq(
      Session(1, 0, 900, 3, 10),
      Session(1, 5000, 5100, 2, 13)))
    assert(open.contains(SessionState(99000, 99000, 1, 15)))
  }

  test("advance resumes an open session across micro-batches") {
    val gap = 1000L
    val (closed1, open1) = advance(7, Seq(Event(7, 0, 1)), None, gap)
    assert(closed1.isEmpty)
    val (closed2, open2) = advance(7, Seq(Event(7, 800, 2), Event(7, 4000, 3)), open1, gap)
    assert(closed2 == Seq(Session(7, 0, 800, 2, 1)))
    assert(open2.contains(SessionState(4000, 4000, 1, 3)))
  }

  test("advance sorts out-of-order events within a batch") {
    val (closed, open) = advance(3, Seq(
      Event(3, 900, 2), Event(3, 0, 1), Event(3, 5000, 3)), None, 1000L)
    assert(closed == Seq(Session(3, 0, 900, 2, 1)))
    assert(open.contains(SessionState(5000, 5000, 1, 3)))
  }

  test("streaming sessionize emits closed sessions through a real query") {
    import spark.implicits._
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    implicit val sqlCtx = spark.sqlContext
    val input = MemoryStream[Event]
    val q = sessionize(input.toDS(), gapMs = 1000L)
      .writeStream.outputMode("append")
      .format("memory").queryName("sessions_out").start()
    // epoch-0 timestamps would be dropped as late vs the initial
    // watermark — use a realistic base
    val t0 = 1700000000000L
    try {
      input.addData(
        Event(1, t0, 10), Event(1, t0 + 500, 11),
        Event(1, t0 + 5000, 12),            // closes session 1
        Event(2, t0 + 100, 20))
      q.processAllAvailable()
      val got = spark.table("sessions_out").as[Session].collect().toSeq
      assert(got.contains(Session(1, t0, t0 + 500, 2, 10)))
      // user 2's session and user 1's second session are still open
      assert(!got.exists(s => s.userId == 2))
    } finally q.stop()
  }

  test("state store holds exactly one row per active user and drains on timeout") {
    // The scale-law assertion behind the 100 TB posture (and the
    // MicroBench sessionstate evidence at 10⁶ users): state row count
    // equals ACTIVE-user cardinality on every batch — independent of
    // how many batches (events) have accumulated — and the event-time
    // timeout drains it once the watermark passes last + gap.
    import spark.implicits._
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    implicit val sqlCtx = spark.sqlContext
    val users = 20000
    val gapMs = 60000L
    val input = MemoryStream[Event]
    val qn = "sessions_state_scale"
    val ck = java.nio.file.Files.createTempDirectory("ck_state_scale").toString
    val q = sessionize(input.toDS(), gapMs, "1 second")
      .writeStream.outputMode("append").format("memory").queryName(qn)
      .option("checkpointLocation", ck).start()
    val base = 1700000000000L
    def stateRows: Long = q.lastProgress.stateOperators.map(_.numRowsTotal).sum
    try {
      (1 to 3).foreach { b =>
        val ts = base + b * 5000L // inside the gap: all sessions stay open
        input.addData((0 until users).map(u =>
          Event(u.toLong, ts + u % 100, b.toLong * users + u)))
        q.processAllAvailable()
        assert(stateRows == users.toLong,
          s"batch $b: state rows $stateRows != active users $users")
      }
      // past-gap pair: first advances the watermark beyond every
      // timeout, second fires them
      val far = base + 3 * 5000L + gapMs + 600000L
      input.addData(Seq(Event(-1L, far, -1L)))
      q.processAllAvailable()
      input.addData(Seq(Event(-1L, far + 100L, -2L)))
      q.processAllAvailable()
      assert(stateRows <= 2, s"state failed to drain: $stateRows rows")
      assert(spark.table(qn)
          .where(org.apache.spark.sql.functions.col("userId") >= 0)
          .count() == users.toLong,
        "every user's session must emit exactly once on timeout")
    } finally q.stop()
  }
}
