package graft.streaming

import org.apache.spark.sql.{DataFrame, Row}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.DataStreamWriter

import graft.operators.LanguageModel

/** Streaming maintenance of the q133 bigram language model — the
  * "retrain the quality scorer as the corpus grows" face: bigram
  * counts are ADDITIVE, so the model state is a per-bigram count table
  * kept current by merging each micro-batch's partial counts through
  * [[StreamingAgg]]'s versioned table-as-state (idempotent under
  * crash-replay, readers never see a partial merge). The corpus is
  * never rescanned: per batch the merge cost is
  * `|model bigrams| + |batch bigrams|`, and the MODEL — conditional
  * probabilities — derives from the maintained counts alone
  * ([[modelFrom]] re-aggregates the left-token totals FROM the count
  * table, the [[LanguageModel.bigramModel]] discipline), so
  * maintained-model ≡ batch-retrained-model is an exact equality, not
  * an approximation ([[graft.streaming]] state-≡-recompute
  * convention, asserted by `StreamingLmSpec`).
  *
  * The composite (w1, w2) key rides [[StreamingAgg]]'s single-key
  * contract as `w1 || ' ' || w2` — unambiguous because words are
  * whitespace-split and therefore contain no space.
  */
object StreamingLm {

  /** One micro-batch's partial counts: `(bg, n_c2)`. */
  def partials(batch: DataFrame, idCol: String, textCol: String)
      : DataFrame =
    LanguageModel.docBigrams(batch, idCol, textCol)
      .select(concat_ws(" ", col("w1"), col("w2")).as("bg"))
      .groupBy(col("bg")).agg(count(lit(1)).as("n_c2"))

  /** Wire a document stream into the count state at `root`. */
  def maintain(stream: DataFrame, idCol: String, textCol: String,
               root: String): DataStreamWriter[Row] =
    stream.writeStream.foreachBatch { (batch: DataFrame, batchId: Long) =>
      StreamingAgg.mergeBatch(partials(batch, idCol, textCol), batchId,
                              "bg", root)
    }

  /** The q133 model off a maintained count state: `(w1, w2, p_e6)` with
    * `p_e6 = (1e6 * c2) div c1`, `c1` re-aggregated from the counts —
    * exactly [[LanguageModel.bigramModel]]'s arithmetic, so the
    * maintained model is bit-equal to a batch retrain over everything
    * streamed so far.
    */
  def modelFrom(state: DataFrame): DataFrame = {
    val c2 = state.select(
      element_at(split(col("bg"), " "), 1).as("w1"),
      element_at(split(col("bg"), " "), 2).as("w2"),
      col("n_c2").as("__c2"))
    val c1 = c2.groupBy(col("w1")).agg(sum(col("__c2")).as("__c1"))
    c2.join(c1, Seq("w1"))
      .select(col("w1"), col("w2"),
              expr("(1000000 * __c2) div __c1").as("p_e6"))
  }
}
