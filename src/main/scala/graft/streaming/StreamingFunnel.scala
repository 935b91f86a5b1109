package graft.streaming

import java.sql.Timestamp

import org.apache.spark.sql.Dataset
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** Streaming funnel tracking — the stateful, incremental counterpart of
  * [[graft.operators.Funnel]]: per key, advance a stage cursor as the
  * ordered stages arrive (each within `windowMs` of the previous
  * stage's instant) and EMIT a progress row on every advance, so a
  * dashboard sees conversions the micro-batch they happen.
  *
  * Semantics match the batch operator exactly: the funnel anchors on
  * the FIRST qualifying instant per stage (a later stage-1 event never
  * re-opens a closed window), ties are inclusive. One difference is
  * inherent to streaming: events must arrive in event-time order per
  * key within the watermark (out-of-order arrivals older than the
  * current stage cursor cannot retroactively improve it — documented,
  * and the batch operator is the backfill tool).
  *
  * State design for scale: per key ONE (stage, instant) pair — O(1)
  * regardless of event volume; keys idle past the watermark are
  * dropped by EventTimeTimeout once fully converted or expired, which
  * bounds state for keys that stop (the hand-rolled-cache failure
  * mode).
  */
object StreamingFunnel {

  case class FunnelEvent(user_id: Long, ts: Timestamp, event_type: String)

  /** stage = how many stages completed; instant = completion ms of the
    * last completed stage.
    */
  case class Cursor(stage: Int, instantMs: Long)

  case class Progress(user_id: Long, stage: Int, at: Timestamp)

  def track(events: Dataset[FunnelEvent], stages: Seq[String],
            windowMs: Long, watermarkDelay: String): Dataset[Progress] = {
    require(stages.size >= 2, s"need >= 2 stages, got ${stages.size}")
    require(windowMs > 0, s"windowMs must be positive: $windowMs")
    import events.sparkSession.implicits._
    events
      .withWatermark("ts", watermarkDelay)
      .groupByKey(_.user_id)
      .flatMapGroupsWithState(
        OutputMode.Append, GroupStateTimeout.EventTimeTimeout)(
        update(stages, windowMs))
  }

  private def update(stages: Seq[String], windowMs: Long)(
      userId: Long, incoming: Iterator[FunnelEvent],
      state: GroupState[Cursor]): Iterator[Progress] = {
    if (state.hasTimedOut) {
      // fully idle past the watermark: whatever stage was reached is
      // final — drop the cursor (the emitted Progress rows already
      // recorded it)
      state.remove()
      Iterator.empty
    } else {
      var cur = state.getOption.getOrElse(Cursor(0, Long.MinValue))
      val out = Seq.newBuilder[Progress]
      // process in event-time order; ties resolve by arrival like the
      // batch operator's tiebreak column
      incoming.toSeq.sortBy(_.ts.getTime).foreach { e =>
        if (cur.stage < stages.size &&
            e.event_type == stages(cur.stage) &&
            (cur.stage == 0 ||
             (e.ts.getTime >= cur.instantMs &&
              e.ts.getTime <= cur.instantMs + windowMs))) {
          cur = Cursor(cur.stage + 1, e.ts.getTime)
          out += Progress(userId, cur.stage, e.ts)
        }
      }
      if (cur.stage > 0) {
        state.update(cur)
        // expire the key once it can no longer advance: either fully
        // converted, or the next-stage window already closed (clamped
        // past the watermark — Spark rejects a timeout at/behind it)
        val horizon =
          if (cur.stage == stages.size) cur.instantMs
          else cur.instantMs + windowMs
        state.setTimeoutTimestamp(
          math.max(horizon, state.getCurrentWatermarkMs() + 1))
      }
      out.result().iterator
    }
  }
}
