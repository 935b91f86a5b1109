package graft.functions

import org.apache.spark.sql.{Column, Encoder}
import org.apache.spark.sql.catalyst.encoders.ExpressionEncoder
import org.apache.spark.sql.expressions.Aggregator
import org.apache.spark.sql.functions.udaf

/** Misra-Gries frequency sketch as a typed [[Aggregator]] — the
  * MERGEABLE heavy-hitters summary (the frequency member of the sketch
  * family next to HLL (q45) and the quantile sketches (q40)).
  *
  * Guarantee (what makes the candidate set sound): with k counters,
  * any compression subtracts some s ≥ 0 from every counter while
  * discarding ≥ k·s occurrences, so an item's undercount is at most
  * (total stream length)/(k+1) — INCLUDING across arbitrary partial
  * merges (each compress charges its subtraction against distinct
  * discarded mass). Therefore every item with true frequency
  * > n/(k+1) still holds a positive counter in the merged sketch: pick
  * k ≥ 1/θ and the sketch's key set is a SUPERSET of the θ-heavy
  * hitters. Exact counts then come from one verification pass over the
  * candidates only — sketch nondeterminism (partition order) can change
  * the extra candidates but never the verified output.
  *
  * State: counts stay exact until the map exceeds 2k, then one
  * compress subtracts the (k+1)-th largest count — amortized O(1)
  * per item, bounded 2k entries per partial aggregate.
  */
case class MisraGries(k: Int)
    extends Aggregator[String, Map[String, Long], Map[String, Long]] {
  require(k >= 1, s"k must be >= 1: $k")

  override def zero: Map[String, Long] = Map.empty

  override def reduce(m: Map[String, Long], item: String)
      : Map[String, Long] =
    compressIfNeeded(m.updated(item, m.getOrElse(item, 0L) + 1L))

  override def merge(a: Map[String, Long], b: Map[String, Long])
      : Map[String, Long] = {
    val combined = b.foldLeft(a) { case (m, (i, c)) =>
      m.updated(i, m.getOrElse(i, 0L) + c)
    }
    compressIfNeeded(combined)
  }

  private def compressIfNeeded(m: Map[String, Long]): Map[String, Long] =
    if (m.size <= 2 * k) m
    else {
      // subtract the (k+1)-th largest count; at most k survive positive
      val s = m.values.toSeq.sortBy(-_).apply(k)
      m.collect { case (i, c) if c > s => i -> (c - s) }
    }

  override def finish(m: Map[String, Long]): Map[String, Long] = m

  override def bufferEncoder: Encoder[Map[String, Long]] =
    ExpressionEncoder[Map[String, Long]]()

  override def outputEncoder: Encoder[Map[String, Long]] =
    ExpressionEncoder[Map[String, Long]]()
}

object MisraGriesAgg {

  /** Column form: aggregates a string column to `map<string, bigint>` —
    * the merged sketch (candidate keys + residual counts).
    */
  def sketch(k: Int)(item: Column): Column = udaf(MisraGries(k)).apply(item)
}
