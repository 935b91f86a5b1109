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
}
