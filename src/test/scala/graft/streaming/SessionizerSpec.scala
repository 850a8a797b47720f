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
}
