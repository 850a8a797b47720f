package graft.streaming

import org.apache.spark.sql.{Dataset, SparkSession}
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** Stateful streaming sessionization via flatMapGroupsWithState
  * (SURVEY.md §2.10 — the engine's streaming surface; the reference has
  * none). A session closes after `gapMs` of inactivity; closed sessions
  * are emitted downstream, open ones ride in state.
  *
  * State is one small record per active user — at 100 TB of events the
  * state store scales with cardinality of active users, not event
  * volume, and the shuffle is the single groupByKey on user_id.
  */
object Sessionizer {

  final case class Event(userId: Long, tsMs: Long, eventId: Long)
  final case class SessionState(start: Long, last: Long, n: Long, firstEvent: Long)
  final case class Session(userId: Long, startMs: Long, endMs: Long,
      nEvents: Long, firstEvent: Long)

  /** Pure per-group transition: fold sorted events into sessions,
    * emitting every closed session. Shared by the streaming and batch
    * paths so both are one implementation (batch/stream parity).
    */
  def advance(userId: Long, events: Seq[Event], prior: Option[SessionState],
      gapMs: Long): (Seq[Session], Option[SessionState]) = {
    var state = prior
    val out = Seq.newBuilder[Session]
    events.sortBy(e => (e.tsMs, e.eventId)).foreach { e =>
      state match {
        case Some(s) if e.tsMs - s.last <= gapMs =>
          // a late event inside the watermark can sort BEFORE the prior
          // batch's state (negative delta): extend with min/max so it
          // can neither shrink the gap deadline nor move `start` late —
          // matches the batch gap-split oracle across micro-batches.
          // firstEvent follows the oracle's min-(ts, event_id) tie-break,
          // so an equal-timestamp late event with a smaller id wins.
          val first =
            if (e.tsMs < s.start ||
                (e.tsMs == s.start && e.eventId < s.firstEvent)) e.eventId
            else s.firstEvent
          state = Some(SessionState(math.min(s.start, e.tsMs),
            math.max(s.last, e.tsMs), s.n + 1, first))
        case Some(s) =>
          out += Session(userId, s.start, s.last, s.n, s.firstEvent)
          state = Some(SessionState(e.tsMs, e.tsMs, 1, e.eventId))
        case None =>
          state = Some(SessionState(e.tsMs, e.tsMs, 1, e.eventId))
      }
    }
    (out.result(), state)
  }

  /** Streaming form. Use with `events.groupByKey(_.userId)`. */
  def flatMapFunc(gapMs: Long)(
      userId: Long, it: Iterator[Event], state: GroupState[SessionState])
      : Iterator[Session] = {
    val prior = if (state.exists) Some(state.get) else None
    if (state.hasTimedOut) {
      val emitted = prior.map(s =>
        Session(userId, s.start, s.last, s.n, s.firstEvent)).iterator
      state.remove()
      emitted
    } else {
      val (closed, next) = advance(userId, it.toSeq, prior, gapMs)
      next match {
        case Some(s) =>
          state.update(s)
          state.setTimeoutTimestamp(s.last + gapMs)
        case None => state.remove()
      }
      closed.iterator
    }
  }

  /** Wire a streaming Dataset[Event] into sessionized output. The
    * event-time watermark (needed for EventTimeTimeout) bounds how
    * long an idle session's state survives late data. */
  def sessionize(events: Dataset[Event], gapMs: Long,
      watermark: String = "10 seconds"): Dataset[Session] = {
    val spark = events.sparkSession
    import spark.implicits._
    import org.apache.spark.sql.functions.{col, timestamp_millis}
    events
      .withColumn("eventTime", timestamp_millis(col("tsMs")))
      .withWatermark("eventTime", watermark)
      .as[Event]
      .groupByKey(_.userId)
      .flatMapGroupsWithState(OutputMode.Append, GroupStateTimeout.EventTimeTimeout)(
        flatMapFunc(gapMs))
  }
}
