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

  /** TRAINED discriminative quality classifier — BATCH-PERCEPTRON
    * training in exact integer arithmetic. The published quality-filter
    * shape (GPT-3/CCNet-style: a linear model over cheap text features
    * separating "reference-like" from "raw" documents) needs actual
    * TRAINING, not just the nearest-centroid label transfer above; the
    * batch perceptron is the discipline that stays engine-portable:
    * each epoch's update is w ← w + Σ_misclassified y·x — a SUM over
    * the corpus, so it is order-independent (unlike SGD, whose result
    * depends on row order and is unreproducible under distributed
    * partitioning) and integer-exact (unlike logistic loss, whose
    * sigmoid cannot be floored portably).
    *
    * A row is misclassified iff y·(w·x) ≤ 0 (zero margin counts as
    * wrong for either class — every doc is misclassified by the
    * all-zero epoch-1 weights, giving the standard g¹ = Σ y·x start).
    *
    * Output: one row per epoch — (epoch, n_mis, w0..w{k−1}) with the
    * weights AFTER that epoch's update, so the trajectory itself is
    * gateable, not just the final vector.
    *
    * Scale shape: features are per-row projections; each epoch is ONE
    * map-combined aggregate to a single row collected driver-side
    * (the k-means/BPE control-plane discipline) — epochs · one pass,
    * no shuffle beyond the agg. Overflow: |w_i| grows ≤ epochs · Σ|x_i|;
    * the loud guard keeps the dot product far from int64's edge
    * (Σ|x| ≲ 1e15/k with features ≲ 1e4 admits ~10¹⁰ docs).
    */
  def batchPerceptron(examples: DataFrame, labelCol: String,
                      featureCols: Seq[String], epochs: Int): DataFrame = {
    import org.apache.spark.sql.{Row, SparkSession}
    import org.apache.spark.sql.types.{LongType, StructField, StructType}
    require(epochs >= 1, s"need epochs >= 1, got $epochs")
    require(featureCols.nonEmpty, "need at least one feature column")
    val spark = examples.sparkSession
    val y = col(labelCol)
    val k = featureCols.size
    var w = Array.fill(k)(0L)
    // every epoch is a full agg pass over the examples; persist the
    // (narrow: label + k longs) projection once so epochs 2..n read
    // blocks instead of re-running the caller's feature-extraction
    // kernels per epoch (r16 — the cache-the-training-set discipline
    // kmeansFitMulti already applies). Released before return; the
    // caller's frame is untouched.
    val cached = examples
      .select((labelCol +: featureCols).map(col): _*)
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    try {
    val rows = Seq.newBuilder[Row]
    for (e <- 1 to epochs) {
      val margin = featureCols.zip(w)
        .map { case (c, wi) => col(c) * lit(wi) }
        .reduceLeft(_ + _)
      val mis = y * margin <= 0
      val aggs = sum(when(mis, 1L).otherwise(0L)).as("__n_mis") +:
        featureCols.zipWithIndex.map { case (c, i) =>
          coalesce(sum(when(mis, y * col(c))), lit(0L)).as(s"__g$i")
        }
      val r = cached.agg(aggs.head, aggs.tail: _*).collect()(0)
      val nMis = if (r.isNullAt(0)) 0L else r.getLong(0)
      w = Array.tabulate(k)(i => w(i) + r.getLong(i + 1))
      require(w.forall(x => math.abs(x) < 1000000000000000L),
        s"perceptron weights exceeded 1e15 after epoch $e — rescale " +
          "features before the dot product nears int64")
      rows += Row(e.toLong +: nMis +: w.toSeq: _*)
    }
    spark.createDataFrame(
      spark.sparkContext.parallelize(rows.result(), 1),
      StructType(
        StructField("epoch", LongType, nullable = false) +:
        StructField("n_mis", LongType, nullable = false) +:
        (0 until k).map(i => StructField(s"w$i", LongType, nullable = false))))
    } finally cached.unpersist(blocking = false)
  }

  /** Score `examples` with the FINAL weights of a
    * [[batchPerceptron]] run (retrained here — training is
    * deterministic, so the weights are a pure function of the input):
    * margin = w·x, pred = +1 iff margin > 0 else −1 (consistent with
    * the ≤-0-is-misclassified training rule). One extra scan.
    */
  def perceptronScored(examples: DataFrame, labelCol: String,
                       featureCols: Seq[String], epochs: Int): DataFrame = {
    val trained = batchPerceptron(examples, labelCol, featureCols, epochs)
      .orderBy(col("epoch").desc).limit(1).collect()(0)
    val w = featureCols.indices.map(i => trained.getLong(i + 2))
    val margin = featureCols.zip(w)
      .map { case (c, wi) => col(c) * lit(wi) }
      .reduceLeft(_ + _)
    examples
      .withColumn("margin", margin.cast("long"))
      .withColumn("pred", when(col("margin") > 0, 1L).otherwise(-1L))
  }
}
