package graft.streaming

import java.sql.Timestamp

import org.apache.spark.sql.Dataset
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout,
  OutputMode}

import graft.functions.MisraGries

/** Streaming heavy hitters — the incremental counterpart of the q126
  * Misra-Gries batch sketch, SHARING its state transitions: the shard
  * state IS [[MisraGries]]'s buffer, advanced by the same `reduce` the
  * batch Aggregator uses, so the streaming path cannot drift from the
  * gated batch semantics.
  *
  * Sharding: items are hash-partitioned into `nShards` groups (each
  * distinct item lives in exactly ONE shard), every shard holds one
  * bounded Misra-Gries map. The MG guarantee then applies per shard:
  * with k counters, an item's undercount is at most (shard stream
  * length)/(k+1), so any item with shard frequency above that bound is
  * guaranteed present — the candidate-superset property the batch op's
  * exact verification pass (q126) relies on. State per shard is ≤ 2k
  * entries regardless of stream length or item cardinality — the knob
  * that makes unbounded-vocabulary streams safe.
  *
  * Output (Update mode): the shard's current summary rows every
  * micro-batch a shard receives data — `count_lb` is the residual MG
  * counter (a LOWER bound on the true count). Consumers keep the
  * latest row per (shard, item); a disappeared item means it was
  * compressed away (its count was ≤ the subtraction — not heavy).
  */
object StreamingTopK {

  case class Item(ts: Timestamp, item: String)

  case class Entry(shard: Int, item: String, count_lb: Long)

  /** Track heavy hitters with k counters per shard. `watermarkDelay`
    * bounds how far behind event time the stream may lag; state never
    * times out (a heavy-hitter summary is meant to live for the whole
    * stream — it is already bounded by construction).
    */
  def track(items: Dataset[Item], k: Int, nShards: Int,
            watermarkDelay: String): Dataset[Entry] = {
    require(nShards >= 1, s"nShards must be >= 1: $nShards")
    val mg = MisraGries(k) // validates k; supplies zero/reduce
    import items.sparkSession.implicits._
    items
      .withWatermark("ts", watermarkDelay)
      .groupByKey(r => math.floorMod(r.item.hashCode, nShards))
      .flatMapGroupsWithState(
        OutputMode.Update, GroupStateTimeout.NoTimeout)(
        (shard: Int, incoming: Iterator[Item],
         state: GroupState[Map[String, Long]]) => {
          val next = incoming.foldLeft(state.getOption.getOrElse(mg.zero))(
            (m, r) => mg.reduce(m, r.item))
          state.update(next)
          next.iterator.map { case (i, c) => Entry(shard, i, c) }
        })
  }
}
