package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.functions.TextFunctions

/** Corpus-level n-gram language-model scoring — the CCNet-style quality
  * signal: documents whose token transitions are typical of the corpus
  * score high; repetitive junk, boilerplate, and wrong-language text
  * score low. Real pipelines bucket the corpus by this score
  * (head/middle/tail) and mix buckets deliberately.
  *
  * All arithmetic is EXACT INTEGER (floor-scaled e6 conditional
  * probabilities), so the score is reproducible bit-for-bit at any
  * partitioning and a SQL oracle can re-derive it: no log(), no float
  * accumulation order to drift. The standard formulation averages log
  * probabilities; the average scaled probability used here is a
  * monotone-in-quality surrogate with the same bucketing power and an
  * exact gate — the tradeoff is documented, not hidden.
  *
  * Scale shape (100 TB corpus): two map-combined aggregations build the
  * model (bigram counts, then left-token totals re-aggregated FROM the
  * bigram counts — the second agg reads the already-tiny model, not the
  * corpus), then one shuffle join of exploded doc bigrams against the
  * model and one final per-doc aggregation. The model is
  * vocabulary²-bounded, far smaller than the corpus; the join is a
  * plain hash equi-join on the bigram, so AQE can pick broadcast when
  * the model is small enough — nothing here is all-pairs or
  * driver-side.
  */
object LanguageModel {

  /** (id, w1, w2) — one row per CONSECUTIVE token pair per document.
    * Documents with fewer than two whitespace tokens contribute no rows
    * (and are absent from [[scoreDocuments]] — a 0/1-token doc has no
    * transition evidence to score).
    */
  def docBigrams(docs: DataFrame, idCol: String, textCol: String)
      : DataFrame = {
    val t = TextFunctions.words(col(textCol))
    docs
      .select(col(idCol).as("__id"), t.as("__t"))
      .where(size(col("__t")) >= 2)
      .select(col("__id"),
              explode(zip_with(
                slice(col("__t"), lit(1), size(col("__t")) - 1),
                slice(col("__t"), lit(2), size(col("__t")) - 1),
                (a, b) => struct(a.as("w1"), b.as("w2")))).as("__bg"))
      .select(col("__id"), col("__bg.w1").as("w1"), col("__bg.w2").as("w2"))
  }

  /** Bigram model with floor-scaled conditional probabilities:
    * `(w1, w2, p_e6)` where `p_e6 = (1e6 * count(w1 w2)) div count(w1 ·)`
    * — the denominator counts w1 as a bigram LEFT token, re-aggregated
    * from the bigram counts themselves so the corpus is scanned once.
    */
  def bigramModel(bigrams: DataFrame): DataFrame = {
    val c2 = bigrams.groupBy(col("w1"), col("w2"))
      .agg(count(lit(1)).as("__c2"))
    val c1 = c2.groupBy(col("w1")).agg(sum(col("__c2")).as("__c1"))
    c2.join(c1, Seq("w1"))
      .select(col("w1"), col("w2"),
              expr("(1000000 * __c2) div __c1").as("p_e6"))
  }

  /** Per-document LM quality score: `(id, n_bigrams, score_e6)` with
    * `score_e6 = floor(mean of the doc's bigram p_e6)` — exact integer,
    * in [0, 1e6]. Model is trained on `docs` itself (the corpus being
    * curated), so every doc bigram hits the model: the join is inner
    * with no recall caveat.
    */
  def scoreDocuments(docs: DataFrame, idCol: String, textCol: String)
      : DataFrame = {
    val bg = docBigrams(docs, idCol, textCol)
    bg.join(bigramModel(bg), Seq("w1", "w2"))
      .groupBy(col("__id"))
      .agg(count(lit(1)).as("n_bigrams"), sum(col("p_e6")).as("__sum"))
      .select(col("__id").as(idCol), col("n_bigrams"),
              expr("__sum div n_bigrams").as("score_e6"))
  }

  /** (id, w1, w2, w3) — one row per consecutive token triple. */
  def docTrigrams(docs: DataFrame, idCol: String, textCol: String)
      : DataFrame =
    docs
      .select(col(idCol).as("__id"),
              TextFunctions.words(col(textCol)).as("__t"))
      .where(size(col("__t")) >= 3)
      .select(col("__id"), explode(expr(
        """transform(sequence(1, size(__t) - 2),
          |  i -> named_struct('w1', element_at(__t, i),
          |                    'w2', element_at(__t, i + 1),
          |                    'w3', element_at(__t, i + 2)))"""
          .stripMargin)).as("__tg"))
      .select(col("__id"), col("__tg.w1").as("w1"),
              col("__tg.w2").as("w2"), col("__tg.w3").as("w3"))

  /** STUPID BACKOFF trigram scoring (Brants et al. 2007, "Large
    * Language Models in Machine Translation") — the smoothing designed
    * FOR distributed estimation: no discount mass to renormalize (the
    * score S is not a probability), just raw relative frequencies with
    * a fixed back-off penalty α = 2/5:
    *
    *   S(w3 | w1 w2) = f(w1w2w3)/f(w1w2)        if the trigram was seen
    *                 | α · f(w2w3)/f(w2)        else if the bigram was
    *                 | α² · f(w3)/N             else if w3 was seen
    *                 | 0  (counted as OOV)      otherwise
    *
    * trained on `train`, scored on `score` — the CCNet deployment shape
    * (clean reference corpus scores the crawl), and the split is what
    * makes the back-off branches live at all (a self-trained model
    * never backs off). Everything is floor-scaled integer arithmetic:
    * each branch floors to e6 then applies α as ·2 div 5 (α² as ·4
    * div 25), so the gate is exact.
    *
    * Output per scored doc (zeros for docs with < 3 tokens):
    * (id, n_trigrams, n_bo1, n_bo2, n_oov, score_e6 = Σ branch div n).
    *
    * Scale shape: counts are three map-combined hash aggs over the
    * train stream; scoring is the scored trigram stream through four
    * hash joins keyed by the n-gram (the MapReduce LM shape — model
    * tables are corpus-derived and shuffle with the stream; nothing is
    * driver-sized except the single N row).
    */
  def stupidBackoffScores(train: DataFrame, score: DataFrame,
                          idCol: String, textCol: String): DataFrame = {
    val tgTrain = docTrigrams(train, idCol, textCol)
    val bgTrain = docBigrams(train, idCol, textCol)
    val ugTrain = train
      .select(explode(TextFunctions.words(col(textCol))).as("w"))
    val c123 = tgTrain.groupBy("w1", "w2", "w3")
      .agg(count(lit(1)).as("__c123"))
    val c12 = bgTrain.groupBy(col("w1").as("__b1"), col("w2").as("__b2"))
      .agg(count(lit(1)).as("__c12"))
    val c23 = bgTrain.groupBy(col("w1").as("__d2"), col("w2").as("__d3"))
      .agg(count(lit(1)).as("__c23"))
    val c1 = ugTrain.groupBy(col("w").as("__u"))
      .agg(count(lit(1)).as("__c1"))
    val n = ugTrain.agg(count(lit(1)).as("__n"))
    val scoredTg = docTrigrams(score, idCol, textCol)
      .join(c123, Seq("w1", "w2", "w3"), "left")
      .join(c12, col("w1") === col("__b1") && col("w2") === col("__b2"),
            "left")
      .join(c23, col("w2") === col("__d2") && col("w3") === col("__d3"),
            "left")
      .join(c1.select(col("__u").as("__u2"), col("__c1").as("__cw2")),
            col("w2") === col("__u2"), "left")
      .join(c1.select(col("__u").as("__u3"), col("__c1").as("__cw3")),
            col("w3") === col("__u3"), "left")
      .crossJoin(broadcast(n))
      .select(col("__id"),
        expr("""CASE
          | WHEN __c123 IS NOT NULL THEN (1000000 * __c123) div __c12
          | WHEN __c23 IS NOT NULL
          |   THEN (2 * ((1000000 * __c23) div __cw2)) div 5
          | WHEN __cw3 IS NOT NULL
          |   THEN (4 * ((1000000 * __cw3) div __n)) div 25
          | ELSE 0 END""".stripMargin).as("__s"),
        when(col("__c123").isNotNull, 0L)
          .when(col("__c23").isNotNull, 1L).otherwise(0L).as("__bo1"),
        when(col("__c123").isNotNull || col("__c23").isNotNull, 0L)
          .when(col("__cw3").isNotNull, 1L).otherwise(0L).as("__bo2"),
        when(col("__c123").isNull && col("__c23").isNull &&
             col("__cw3").isNull, 1L).otherwise(0L).as("__oov"))
    val agg = scoredTg.groupBy(col("__id"))
      .agg(count(lit(1)).as("n_trigrams"), sum(col("__bo1")).as("n_bo1"),
           sum(col("__bo2")).as("n_bo2"), sum(col("__oov")).as("n_oov"),
           expr("sum(__s) div count(1)").as("score_e6"))
    score.select(col(idCol).as("__id")).distinct()
      .join(agg, Seq("__id"), "left")
      .select(col("__id").as(idCol),
              coalesce(col("n_trigrams"), lit(0L)).as("n_trigrams"),
              coalesce(col("n_bo1"), lit(0L)).as("n_bo1"),
              coalesce(col("n_bo2"), lit(0L)).as("n_bo2"),
              coalesce(col("n_oov"), lit(0L)).as("n_oov"),
              coalesce(col("score_e6"), lit(0L)).as("score_e6"))
  }
}
