package graft.streaming

import java.sql.Timestamp

import org.apache.spark.sql.Dataset
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** Streaming sessionization with custom state (SURVEY.md §2.10 "custom
  * state" row): the stateful, incremental counterpart of
  * [[graft.operators.TemporalOps.sessionize]].
  *
  * State design for scale: per key we keep ONE open session (start, last
  * event time, count) — O(1) state per active key, not O(events). A
  * session closes two ways:
  *  1. a new event for the key arrives with gap > `gapMs` → emit the old
  *     session, open a new one;
  *  2. the event-time WATERMARK passes last+gap with no new event →
  *     `GroupStateTimeout.EventTimeTimeout` fires and the session is
  *     emitted and state removed — this is what bounds state for keys
  *     that simply stop (the failure mode of hand-rolled session caches).
  */
object StreamingSessions {

  case class SessionEvent(user_id: Long, ts: Timestamp)

  case class OpenSession(startMs: Long, lastMs: Long, n: Long)

  case class ClosedSession(user_id: Long, start_ts: Timestamp,
                           end_ts: Timestamp, n_events: Long)

  def sessionize(events: Dataset[SessionEvent], gapMs: Long,
                 watermarkDelay: String): Dataset[ClosedSession] = {
    import events.sparkSession.implicits._
    events
      .withWatermark("ts", watermarkDelay)
      .groupByKey(_.user_id)
      .flatMapGroupsWithState(
        OutputMode.Append, GroupStateTimeout.EventTimeTimeout)(
        update(gapMs))
  }

  private def update(gapMs: Long)(
      userId: Long, incoming: Iterator[SessionEvent],
      state: GroupState[OpenSession]): Iterator[ClosedSession] = {

    def close(s: OpenSession): ClosedSession =
      ClosedSession(userId, new Timestamp(s.startMs), new Timestamp(s.lastMs),
        s.n)

    if (state.hasTimedOut) {
      // watermark passed last+gap with no new events: flush and drop state
      val out = state.getOption.map(close).toIterator
      state.remove()
      return out
    }

    val times = incoming.map(_.ts.getTime).toArray.sorted
    var open = state.getOption
    val closed = Seq.newBuilder[ClosedSession]
    times.foreach { t =>
      open match {
        case Some(s) if t - s.lastMs > gapMs =>
          closed += close(s)
          open = Some(OpenSession(t, t, 1))
        case Some(s) if t >= s.startMs - gapMs =>
          // in-window (possibly late) event: extend the session both ways
          open = Some(OpenSession(math.min(s.startMs, t),
            math.max(s.lastMs, t), s.n + 1))
        case Some(_) =>
          // straggler more than a gap BEFORE the open session started: it
          // belongs to an earlier session. Emit it as its own closed
          // session — the bounded-state tradeoff vs. the batch sessionizer,
          // which (holding all events) could merge straggler chains.
          closed += ClosedSession(userId, new Timestamp(t), new Timestamp(t), 1)
        case None =>
          open = Some(OpenSession(t, t, 1))
      }
    }
    open.foreach { s =>
      state.update(s)
      state.setTimeoutTimestamp(s.lastMs + gapMs)
    }
    closed.result().iterator
  }
}
