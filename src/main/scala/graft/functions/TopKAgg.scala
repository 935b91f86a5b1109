package graft.functions

import org.apache.spark.sql.{Column, Encoder}
import org.apache.spark.sql.expressions.Aggregator
import org.apache.spark.sql.functions.udaf

/** Bounded-state grouped top-k as a typed [[Aggregator]] — the custom-
  * aggregate surface of the library (next to the codegen scalar
  * kernels), and the SCALE answer to per-group top-k:
  *
  *   - `collect_list` + sort ships EVERY group member through the
  *     shuffle and materializes unbounded per-group state;
  *   - a `row_number` window needs the full per-group sort and carries
  *     every row to the reducer before filtering to k;
  *   - this Aggregator's state never exceeds k rows, and because
  *     Aggregators expose `merge`, Spark runs it MAP-SIDE: each input
  *     partition contributes at most k rows per group to the shuffle —
  *     the same partial-aggregation property a plain `max` enjoys.
  *
  * Ordering: descending by `value`, ties ascending by `id` (a total
  * order, so results are deterministic and oracle-reproducible). The
  * reduce keeps the buffer sorted and truncated; k is fixed at
  * construction (an aggregate's state bound must be a plan-time
  * constant).
  */
case class TopKByValue(k: Int)
    extends Aggregator[(Double, Long), List[(Double, Long)],
                       Seq[(Double, Long)]] {
  require(k >= 1, s"k must be >= 1: $k")

  /** Descending value, ascending id. */
  private def lt(a: (Double, Long), b: (Double, Long)): Boolean =
    a._1 > b._1 || (a._1 == b._1 && a._2 < b._2)

  override def zero: List[(Double, Long)] = Nil

  override def reduce(buf: List[(Double, Long)], in: (Double, Long))
      : List[(Double, Long)] = insert(buf, in)

  override def merge(x: List[(Double, Long)], y: List[(Double, Long)])
      : List[(Double, Long)] = y.foldLeft(x)(insert)

  private def insert(buf: List[(Double, Long)], in: (Double, Long))
      : List[(Double, Long)] = {
    if (buf.lengthCompare(k) >= 0 && lt(buf.last, in)) buf // below cutoff
    else {
      val (hi, lo) = buf.span(lt(_, in))
      (hi ::: in :: lo).take(k)
    }
  }

  override def finish(buf: List[(Double, Long)]): Seq[(Double, Long)] = buf

  override def bufferEncoder: Encoder[List[(Double, Long)]] =
    org.apache.spark.sql.catalyst.encoders
      .ExpressionEncoder[List[(Double, Long)]]()

  override def outputEncoder: Encoder[Seq[(Double, Long)]] =
    org.apache.spark.sql.catalyst.encoders
      .ExpressionEncoder[Seq[(Double, Long)]]()
}

object TopKAgg {

  /** Column form: `topKByValue(3)(col("value"), col("id"))` aggregates to
    * `array<struct<_1: double, _2: bigint>>`, length ≤ k, sorted
    * (value desc, id asc).
    */
  def topKByValue(k: Int)(value: Column, id: Column): Column =
    udaf(TopKByValue(k)).apply(value, id)
}
