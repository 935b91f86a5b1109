package graft.streaming

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Stream-stream joins — the live enrichment shape (clicks ⋈ impressions,
  * errors ⋈ purchases): two unbounded inputs joined on a key within an
  * event-time interval. Both sides are watermarked so Spark can BOUND the
  * join state: a buffered left row is dropped once the right watermark
  * passes `leftTs + maxDelay` (and vice versa) — without the interval
  * condition the state store grows forever, which is the difference
  * between a demo and something that survives week-long runs.
  *
  * At scale the join is a state-store hash join partitioned on the key:
  * one shuffle per side, state size ≈ key-rate × interval — the knobs a
  * capacity plan needs are all in the watermark delay and interval width.
  */
object StreamingJoins {

  /** Inner interval join: rows match when keys are equal and the right
    * event lands in `[leftTs, leftTs + within]`. `delay` is each side's
    * watermark (late tolerance); `within` the business interval.
    */
  def intervalJoin(left: DataFrame, leftTs: String, leftKey: String,
                   right: DataFrame, rightTs: String, rightKey: String,
                   delay: String, within: String): DataFrame = {
    val l = left.withWatermark(leftTs, delay)
    val r = right.withWatermark(rightTs, delay)
    l.join(r,
      col(leftKey) === col(rightKey) &&
        col(rightTs) >= col(leftTs) &&
        col(rightTs) <= col(leftTs) + expr(s"INTERVAL $within"))
  }

  /** LEFT-OUTER interval join: [[intervalJoin]]'s matches plus a
    * null-right row for every left event whose interval expires
    * unmatched. The null row may only emit once the watermark PROVES
    * no match can still arrive (left ts + within + delay behind the
    * right watermark) — so outer results trail the stream by the
    * interval plus the late tolerance, which is the correctness/
    * latency trade outer stream joins inherently make. State bounds
    * are identical to the inner form. Batch-equivalent semantics =
    * the plain SQL LEFT JOIN with the interval in the join condition
    * (q217 gates it).
    */
  def intervalJoinLeftOuter(left: DataFrame, leftTs: String,
                            leftKey: String, right: DataFrame,
                            rightTs: String, rightKey: String,
                            delay: String, within: String): DataFrame = {
    val l = left.withWatermark(leftTs, delay)
    val r = right.withWatermark(rightTs, delay)
    l.join(r,
      col(leftKey) === col(rightKey) &&
        col(rightTs) >= col(leftTs) &&
        col(rightTs) <= col(leftTs) + expr(s"INTERVAL $within"),
      "leftOuter")
  }
}
