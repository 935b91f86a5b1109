package graft.streaming

import org.apache.spark.sql.{DataFrame, Row}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.DataStreamWriter

import graft.operators.Sampling

/** Streaming maintenance of the q228 temperature-smoothed mixing
  * shares — the "keep the next epoch's allocation current as the
  * corpus grows" face: per-language doc counts are ADDITIVE, so the
  * state is ONE ROW PER LANGUAGE merged per micro-batch through
  * [[StreamingAgg]]'s versioned table-as-state (idempotent under
  * crash-replay, readers never see a partial merge), and the
  * allocation — isqrt weights + Hamilton largest-remainder — derives
  * from the maintained counts alone via the SAME operator entry the
  * batch query gates ([[Sampling.smoothedQuotasFromSizes]]), so
  * maintained ≡ batch-recompute is an exact equality, not an
  * approximation (the [[graft.streaming]] state-≡-recompute
  * convention, asserted by `StreamingMixSpec`).
  *
  * Per-batch cost: `|langs| + |batch langs|` state rows plus one
  * map-combined count over the batch — the corpus is never rescanned,
  * and the state is control-plane-sized by construction (|languages|
  * rows at any corpus size).
  */
object StreamingMix {

  /** One micro-batch's partial counts: `(lang, n_docs)`. */
  def partials(batch: DataFrame, langCol: String): DataFrame =
    batch.groupBy(col(langCol).as("lang"))
      .agg(count(lit(1)).as("n_docs"))

  /** Wire a document stream into the count state at `root`. */
  def maintain(stream: DataFrame, langCol: String, root: String)
      : DataStreamWriter[Row] =
    StreamingAgg.maintain(stream, "lang", root)(b =>
      partials(b, langCol))

  /** The q228 allocation off a maintained count state — bit-equal to
    * `Sampling.smoothedQuotas` over everything streamed so far.
    */
  def sharesFrom(state: DataFrame, budget: Long): DataFrame =
    Sampling.smoothedQuotasFromSizes(
      state.select(col("lang").as("source"), col("n_docs").as("n")),
      budget)
}
