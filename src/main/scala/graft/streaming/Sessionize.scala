package graft.streaming

import java.sql.Timestamp

import org.apache.spark.sql.Dataset
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** One event of the sessionization stream (events-table shape). */
case class SessionEvent(user_id: Long, ts: Timestamp, event_id: Long)

/** Per-user open-session state kept between micro-batches. */
case class OpenSession(startMs: Long, endMs: Long, nEvents: Int)

/** A closed session emitted downstream. */
case class CompletedSession(user_id: Long, session_start: Timestamp,
                            session_end: Timestamp, n_events: Int)

/** Stateful gap-based sessionization with `flatMapGroupsWithState` — the
  * streaming image of the batch lag/cumulative-sum formulation in
  * [[graft.operators.EventAnalytics.sessionize]] (same 30-minute default
  * gap). The reference has no session concept; this is north-star §7.5
  * event-analytics surface.
  *
  * Mechanics: state is one `OpenSession` per user; each micro-batch folds
  * its (sorted) events into the open session, emitting any session closed
  * by an intra-batch gap immediately, and the still-open session closes
  * via `EventTimeTimeout` once the watermark passes its end + gap. State
  * is therefore O(active users), not O(events): the 100 TB shape.
  */
object Sessionize {

  val DefaultGapMs: Long = 30L * 60 * 1000

  def sessions(events: Dataset[SessionEvent],
               gapMs: Long = DefaultGapMs,
               watermarkDelay: String = "1 hour"): Dataset[CompletedSession] = {
    import events.sparkSession.implicits._
    events
      .withWatermark("ts", watermarkDelay)
      .groupByKey(_.user_id)
      .flatMapGroupsWithState[OpenSession, CompletedSession](
        OutputMode.Append(), GroupStateTimeout.EventTimeTimeout)(
        (user, batch, state) => fold(user, batch, state, gapMs))
  }

  private def fold(user: Long, batch: Iterator[SessionEvent],
                   state: GroupState[OpenSession],
                   gapMs: Long): Iterator[CompletedSession] = {
    def close(s: OpenSession) = CompletedSession(
      user, new Timestamp(s.startMs), new Timestamp(s.endMs), s.nEvents)

    if (state.hasTimedOut) {
      val closed = close(state.get)
      state.remove()
      Iterator.single(closed)
    } else {
      val ordered = batch.toIndexedSeq.sortBy(e => (e.ts.getTime, e.event_id))
      var open = state.getOption
      val out = Seq.newBuilder[CompletedSession]
      ordered.foreach { e =>
        val t = e.ts.getTime
        open match {
          case Some(s) if t - s.endMs <= gapMs =>
            open = Some(OpenSession(s.startMs, math.max(s.endMs, t), s.nEvents + 1))
          case Some(s) =>
            out += close(s)
            open = Some(OpenSession(t, t, 1))
          case None =>
            open = Some(OpenSession(t, t, 1))
        }
      }
      open.foreach { s =>
        state.update(s)
        state.setTimeoutTimestamp(s.endMs + gapMs)
      }
      out.result().iterator
    }
  }
}
