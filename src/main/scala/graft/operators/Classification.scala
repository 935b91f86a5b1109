package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Nearest-centroid (Rocchio) text classification in EXACT INTEGER
  * arithmetic — the classic high-throughput label-transfer pass a
  * curation pipeline runs when a small labeled slice must tag the rest
  * of a corpus (language, domain, topic): train per-class term
  * centroids from the labeled rows, score every unlabeled document by
  * its term overlap with each centroid, take the argmax.
  *
  * Design notes for the 100 TB shape:
  *  - The MODEL is small (|vocab| × |classes| rows); the scoring join
  *    carries no broadcast hint, so AQE's runtime stats broadcast it
  *    while it fits `autoBroadcastJoinThreshold` and genuinely fall
  *    back to a shuffled hash join on `term` when a vocab×classes
  *    model outgrows it — a forced `broadcast()` hint would override
  *    the threshold and OOM the driver instead of falling back.
  *  - Centroid weights are floor-scaled integers
  *    `w_e6 = (1e6 · ctf) div clen` (ctf = term count within the
  *    class, clen = total class tokens), so scores are sums of
  *    nonnegative long products — bit-identical at any partitioning
  *    and re-derivable by a SQL oracle. No floats, no log-likelihoods
  *    (IEEE `ln` is not portable across engines; the rational scaled
  *    form is the [[graft.queries.AdvancedQueries.q35Tfidf]]
  *    discipline).
  *  - Overflow bound: a document's score is ≤ doc_tokens · 1e6 (each
  *    scaled weight < 1e6 since ctf ≤ clen); int64 admits documents to
  *    ~9.2e12 tokens — unreachable.
  *
  * No smoothing: terms absent from a class contribute 0, matching the
  * dot-product semantics (smoothing matters for NB log-products, not
  * for overlap scores).
  */
object Classification {

  /** Per-class scaled term centroids from labeled token rows.
    * Input: one row per token occurrence (labelCol, termCol).
    * Output: (label, term, w_e6) with w_e6 = (scale·ctf) div clen.
    */
  def trainCentroids(tokens: DataFrame, labelCol: String, termCol: String,
                     scale: Long = 1000000L): DataFrame = {
    require(scale >= 1, s"scale must be >= 1: $scale")
    val ctf = tokens.groupBy(col(labelCol).as("label"),
                             col(termCol).as("term"))
      .agg(count(lit(1)).as("__ctf"))
    val clen = tokens.groupBy(col(labelCol).as("label"))
      .agg(count(lit(1)).as("__clen"))
    ctf.join(clen, Seq("label"))
      .select(col("label"), col("term"),
              expr(s"(__ctf * $scale) div __clen").as("w_e6"))
  }

  /** Score unlabeled docs against centroids and keep each document's
    * argmax class — ties break on the smallest label string, so the
    * prediction is deterministic. Documents sharing no term with ANY
    * class are absent from the output (no overlap ⇒ no evidence).
    *
    * Input: token rows (idCol, termCol); model from [[trainCentroids]].
    * Output: (id, pred_label, score_e6).
    */
  def predictNearestCentroid(tokens: DataFrame, idCol: String,
                             termCol: String,
                             model: DataFrame): DataFrame = {
    val tf = tokens.groupBy(col(idCol).as("id"), col(termCol).as("term"))
      .agg(count(lit(1)).as("__tf"))
    val scored = tf.join(model, Seq("term"))
      .groupBy(col("id"), col("label"))
      .agg(sum(col("__tf") * col("w_e6")).as("score_e6"))
    // argmax per doc: |classes| rows per id, so the row_number window
    // is a bounded per-key sort; it reuses no exchange with the
    // (id,label) agg but both keys hash on id first, and AQE coalesces
    // the tiny post-agg side.
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("id"))
      .orderBy(col("score_e6").desc, col("label").asc)
    scored.withColumn("__rn", row_number().over(w))
      .filter(col("__rn") === 1)
      .select(col("id"), col("label").as("pred_label"), col("score_e6"))
  }
}
