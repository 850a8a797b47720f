package graft.streaming

import org.apache.spark.sql.{Dataset, Encoders, KeyValueGroupedDataset}
import org.apache.spark.sql.streaming.{ExpiredTimerInfo, OutputMode,
  StatefulProcessorWithInitialState, TimeMode, TimerValues, TTLConfig}

/** Sessionization with per-session TYPE diversity on the Spark 4
  * arbitrary-stateful v2 path — `transformWithState` with a
  * [[StatefulProcessor]] (SURVEY.md §2.10; the v1 path is
  * [[Sessionizer]]'s flatMapGroupsWithState, kept side by side so the
  * engine rides BOTH stateful APIs). Same session law as the v1
  * operator — a session closes after `gapMs` of inactivity, either by
  * a later event past the gap (emitted from the data batch) or by an
  * EVENT-TIME TIMER once the watermark passes `last + gap` — plus the
  * piece the v2 API exists for: a second, independently-typed state
  * variable per key. The running session rides in a ValueState; the
  * session's DISTINCT event types ride in a MapState used as a set
  * (composite per-key state, not encodable as one
  * flatMapGroupsWithState value without serializing a growing set
  * into every update — the MapState updates one key per event).
  *
  * State per user: one small ValueState record + one MapState entry
  * per distinct type in the OPEN session (bounded by the type
  * alphabet). At 100 TB of events the store scales with
  * |active users| · |type alphabet|, never event volume; the single
  * shuffle is the groupByKey on user_id. Timer discipline: exactly
  * one live timer per key (the previous one is deleted when an event
  * extends the session), so the timer store is also |active users|.
  */
object TypeSessionizer {

  final case class TEvent(userId: Long, tsMs: Long, eventId: Long, etype: String)
  final case class TState(start: Long, last: Long, n: Long)
  final case class TSession(userId: Long, startMs: Long, endMs: Long,
      nEvents: Long, nTypes: Long)

  /** One user's open session handed over from a batch bootstrap: the
    * running (start, last, n) plus the session's distinct types —
    * exactly the composite the processor keeps in (ValueState,
    * MapState), flattened to one encodable row. */
  final case class BootState(start: Long, last: Long, n: Long, types: Seq[String])

  /** The processor extends the INITIAL-STATE variant (a subclass of
    * plain StatefulProcessor, so the no-bootstrap [[sessionize]] path
    * uses the same class): `handleInitialState` re-seats a
    * batch-computed open session — ValueState, MapState set AND the
    * inactivity timer — before the first micro-batch, which is the
    * warm-start contract a backfill-then-stream deployment needs. */
  class Processor(gapMs: Long)
      extends StatefulProcessorWithInitialState[Long, TEvent, TSession, BootState] {
    @transient private var sess: org.apache.spark.sql.streaming.ValueState[TState] = _
    @transient private var types: org.apache.spark.sql.streaming.MapState[String, Boolean] = _

    override def init(outputMode: OutputMode, timeMode: TimeMode): Unit = {
      sess = getHandle.getValueState[TState]("sess", Encoders.product[TState],
        TTLConfig.NONE)
      types = getHandle.getMapState[String, Boolean]("types", Encoders.STRING,
        Encoders.scalaBoolean, TTLConfig.NONE)
    }

    private def closeSession(userId: Long, s: TState): TSession = {
      val nTypes = types.keys().size.toLong
      types.clear()
      TSession(userId, s.start, s.last, s.n, nTypes)
    }

    override def handleInputRows(userId: Long, rows: Iterator[TEvent],
        timers: TimerValues): Iterator[TSession] = {
      val out = Seq.newBuilder[TSession]
      var cur = if (sess.exists()) Some(sess.get()) else None
      // one live timer per key: remember the incoming deadline so it
      // can be replaced if this batch extends the session
      var deadline = cur.map(_.last + gapMs)
      rows.toSeq.sortBy(e => (e.tsMs, e.eventId)).foreach { e =>
        cur match {
          case Some(s) if e.tsMs - s.last <= gapMs =>
            // min/max extend: a cross-batch late event (within the
            // watermark, earlier than state.last) must not shrink the
            // timer deadline or move `start` late — batch-oracle parity
            cur = Some(TState(math.min(s.start, e.tsMs),
              math.max(s.last, e.tsMs), s.n + 1))
          case Some(s) =>
            out += closeSession(userId, s)
            cur = Some(TState(e.tsMs, e.tsMs, 1))
          case None =>
            cur = Some(TState(e.tsMs, e.tsMs, 1))
        }
        types.updateValue(e.etype, true)
      }
      cur match {
        case Some(s) =>
          sess.update(s)
          val next = s.last + gapMs
          if (!deadline.contains(next)) {
            deadline.foreach(getHandle.deleteTimer)
            getHandle.registerTimer(next)
          }
        case None => ()
      }
      out.result().iterator
    }

    override def handleInitialState(userId: Long, s0: BootState,
        timers: TimerValues): Unit = {
      sess.update(TState(s0.start, s0.last, s0.n))
      s0.types.foreach(t => types.updateValue(t, true))
      getHandle.registerTimer(s0.last + gapMs)
    }

    override def handleExpiredTimer(userId: Long, timers: TimerValues,
        expired: ExpiredTimerInfo): Iterator[TSession] =
      if (sess.exists()) {
        val s = sess.get()
        // defensive: only the CURRENT deadline closes the session (a
        // stale timer that raced a delete must not fire a live session)
        if (expired.getExpiryTimeInMs() >= s.last + gapMs) {
          sess.clear()
          Iterator.single(closeSession(userId, s))
        } else Iterator.empty
      } else Iterator.empty
  }

  /** Wire a streaming Dataset[TEvent] into type-profiled sessions.
    * Event-time watermark bounds both late data and timer firing. */
  def sessionize(events: Dataset[TEvent], gapMs: Long,
      watermark: String = "10 seconds"): Dataset[TSession] = {
    val spark = events.sparkSession
    import spark.implicits._
    import org.apache.spark.sql.functions.{col, timestamp_millis}
    events
      .withColumn("eventTime", timestamp_millis(col("tsMs")))
      .withWatermark("eventTime", watermark)
      .as[TEvent]
      .groupByKey(_.userId)
      .transformWithState(new Processor(gapMs), TimeMode.EventTime(),
        OutputMode.Append())
  }

  /** [[sessionize]] with a warm start: `init` carries each user's open
    * session from a batch bootstrap; the processor re-seats state and
    * timers from it before the first micro-batch. */
  def sessionizeWithInit(events: Dataset[TEvent],
      init: KeyValueGroupedDataset[Long, BootState], gapMs: Long,
      watermark: String = "10 seconds"): Dataset[TSession] = {
    val spark = events.sparkSession
    import spark.implicits._
    import org.apache.spark.sql.functions.{col, timestamp_millis}
    events
      .withColumn("eventTime", timestamp_millis(col("tsMs")))
      .withWatermark("eventTime", watermark)
      .as[TEvent]
      .groupByKey(_.userId)
      .transformWithState(new Processor(gapMs), TimeMode.EventTime(),
        OutputMode.Append(), init)
  }
}
