package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.functions.TextFunctions

/** Corpus search — exact phrase lookup via token postings: the
  * candidate-then-verify shape of an inverted-index engine. Candidates
  * are documents containing ALL of a phrase's distinct tokens (posting
  * intersection — a hash aggregate on (doc, phrase), never a scan-wide
  * substring sweep); only candidates pay the exact word-boundary
  * verification.
  *
  * Scale note: here postings are derived inline (one explode over the
  * scan, pre-filtered to query tokens so the shuffle carries only
  * matching-token rows); a production deployment materializes the same
  * posting table once (bucketed by token — see [[Bucketing]]) and each
  * query then touches only its tokens' buckets. The verify stage and
  * everything downstream are identical in both deployments.
  */
object Search {

  /** Exact phrase hits: one row per (phrase, containing doc), with the
    * 1-based position of the first word-boundary occurrence.
    */
  def phraseSearch(docs: DataFrame, idCol: String, textCol: String,
                   phrases: Seq[String]): DataFrame = {
    require(phrases.nonEmpty && phrases.forall(_.trim.nonEmpty),
      "phrases must be non-empty")
    val spark = docs.sparkSession
    import spark.implicits._
    val phraseDf = phrases.map { p =>
      val toks = p.split(" ").filter(_.nonEmpty).distinct
      (p, toks, toks.length.toLong)
    }.toDF("phrase", "toks", "n_toks")
    val tokens = phraseDf
      .select(col("phrase"), col("n_toks"), explode(col("toks")).as("w"))
    val allToks = phrases.flatMap(_.split(" ")).filter(_.nonEmpty).distinct
    val postings = Partitioning.spread(docs)
      .select(col(idCol).as("doc_id"),
              explode(TextFunctions.words(col(textCol))).as("w"))
      .filter(col("w").isin(allToks: _*))
      .distinct()
    val candidates = postings
      .join(broadcast(tokens), Seq("w"))
      .groupBy(col("doc_id"), col("phrase"), col("n_toks"))
      .agg(count(lit(1)).as("n_found"))
      .filter(col("n_found") === col("n_toks"))
      .select("doc_id", "phrase")
    candidates
      .join(docs.select(col(idCol).as("doc_id"), col(textCol).as("__t")),
            Seq("doc_id"))
      .withColumn("pos",
        locate_padded(col("__t"), col("phrase")))
      .filter(col("pos") > 0)
      .select(col("phrase"), col("doc_id"), col("pos"))
  }

  /** 1-based position of the first word-boundary occurrence of `phrase`
    * in `text` (0 when absent): both sides space-padded so boundaries
    * are plain characters — `instr` stays a codegen'd scan.
    */
  private def locate_padded(text: org.apache.spark.sql.Column,
                            phrase: org.apache.spark.sql.Column) =
    instr(concat(lit(" "), text, lit(" ")),
          concat(lit(" "), phrase, lit(" "))).cast("long")

  /** BM25 RANKED retrieval, top-k docs per query, EXACT INTEGER
    * arithmetic (k1 = 6/5, b = 3/4 — the standard 1.2 / 0.75 as
    * rationals). Per query term t in doc d:
    *
    *   tf-term = tf·(k1+1) / (tf + k1·(1−b) + k1·b·dl/avgdl)
    *           = 22·10¹²·tf div (10⁷·tf + 3·10⁶ + 9·r_e6)   [×10⁷·10⁶]
    *   r_e6    = (10⁶·dl·N) div L        (dl/avgdl, avgdl = L/N)
    *   idf_e6  = (10⁶·(2(N−df)+1)) div (2df+1)
    *   contrib = (idf_e6 · tf-term_e6) div 10⁶;  score = Σ contribs
    *
    * idf is the RATIONAL form (the argument of BM25's log, without the
    * log) — the [[graft.queries.AdvancedQueries.q35Tfidf]] discipline:
    * monotone in df like log-idf, but floor-exact integers end to end,
    * so a SQL oracle replays every division (no libm ulp to drift).
    * Overflow bounds (documented, q133/q139-style): 22·10¹²·tf needs
    * tf < 4·10⁵; idf_e6·term_e6 needs N/df ≲ 2·10⁶ — a term in fewer
    * than one-in-2-million docs overflows; rescale idf (e3) for
    * web-scale N.
    *
    * Plan shape (the q35 linear-window pipeline + the bounded top-k
    * aggregator): ONE explode of the corpus → tf aggregate; dl as a
    * window sum over tf (doc_id grain); term-filter THEN df as a
    * window count (term grain — post-filter rows still carry every doc
    * containing the term, so df is exact); query terms and the 1-row
    * (N, L) totals broadcast; final per-query top-k via
    * [[graft.functions.TopKAgg]] — map-side-combined, state ≤ k rows
    * per query, never a full sort. Ties break ascending doc_id (a
    * total order the oracle mirrors).
    *
    * Production note: tf/dl/df are corpus statistics a deployment
    * materializes ONCE (bucketed by term) and reuses per query batch;
    * here they derive inline from the same scan, which is the same
    * plan downstream of the postings.
    */
  /** SPARSE-VECTOR top-k retrieval: every document is a TF-IDF-weighted
    * sparse vector over its terms (the q35 integer weighting:
    * w_e6 = (10⁶·tf·N) div (df·len)), queries are corpus documents
    * (`queryIds`), and score(q, d) = the exact sparse dot product
    * Σ_t w_e6(q,t)·w_e6(d,t) — term-at-a-time evaluation over a
    * postings join, the inverted-index companion to the dense-vector
    * ANN family ([[Similarity]]).
    *
    * Scale semantics, stated not hidden: terms with df·dfDen > dfNum·N
    * are PRUNED from every vector — the impact-pruning knob that keeps
    * posting lists (and therefore the candidate set per query)
    * df-bounded instead of corpus-bounded. A stopword-dense query
    * cannot touch every document; what it loses is exactly the
    * low-idf mass that contributes least to the score. The ratio is
    * caller-set (production wants aggressive cuts like 1/10; the gate
    * fixture's 30-term vocabulary needs a looser one to stay
    * non-vacuous) and is part of the operator's definition, so the
    * oracle replays it.
    *
    * Arithmetic: weights are floor-div longs (≤ ~10¹⁸ at N = 10¹²,
    * inside int64); their PRODUCTS ride decimal(38,0) (HUGEINT in the
    * oracle) — long×long would wrap at exactly the rare-term weights
    * that matter most. Scores surface as strings (the q189 rational
    * convention). Ties break ascending doc_id.
    *
    * Plan: postings shuffle on term (df-pruned), query vectors
    * broadcast, one (query, doc) sum agg, then a rank window the
    * optimizer group-limits (WindowGroupLimit) — never a full
    * per-query sort.
    */
  def sparseTopK(docs: DataFrame, idCol: String, textCol: String,
                 queryIds: DataFrame, k: Int,
                 dfNum: Long = 1L, dfDen: Long = 10L): DataFrame = {
    require(k >= 1, s"k must be >= 1: $k")
    require(dfNum >= 1 && dfDen >= 1,
      s"df-pruning ratio must be positive: $dfNum/$dfDen")
    val d38 = "decimal(38,0)"
    val words = Partitioning.spread(docs)
      .select(col(idCol).as("doc_id"),
              explode(split(col(textCol), " ")).as("term"))
    val tf = words.groupBy("doc_id", "term").agg(count(lit(1)).as("tf"))
    val df = tf.groupBy("term").agg(count(lit(1)).as("df"))
    val totals = docs.agg(count(lit(1)).as("n_docs"))
    val w = tf
      .withColumn("dl", sum(col("tf")).over(Window.partitionBy(col("doc_id"))))
      .join(df, Seq("term"))
      .crossJoin(broadcast(totals))
      .filter(col("df") * dfDen <= col("n_docs") * dfNum)
      .select(col("doc_id"), col("term"),
              expr(s"(CAST(1000000 AS $d38) * tf * n_docs) div " +
                   s"(CAST(df AS $d38) * dl)").as("w_e6"))
    val q = w.join(
        broadcast(queryIds.select(col(queryIds.columns.head).as("doc_id"))),
        Seq("doc_id"))
      .select(col("doc_id").as("query_id"), col("term"),
              col("w_e6").as("qw"))
    val scores = w.join(broadcast(q), Seq("term"))
      .filter(col("doc_id") =!= col("query_id"))
      .groupBy(col("query_id"), col("doc_id"))
      .agg(sum(expr(s"CAST(qw AS $d38) * w_e6")).cast(d38).as("score"))
    val win = Window.partitionBy(col("query_id"))
      .orderBy(col("score").desc, col("doc_id").asc)
    scores.withColumn("rnk", row_number().over(win))
      .filter(col("rnk") <= k)
      .select(col("query_id"), col("rnk").cast("long").as("rnk"),
              col("doc_id"), col("score").cast("string").as("score"))
  }

  def bm25TopK(docs: DataFrame, idCol: String, textCol: String,
               queries: Seq[String], k: Int): DataFrame = {
    require(queries.nonEmpty && queries.forall(_.trim.nonEmpty),
      "queries must be non-empty")
    require(k >= 1, s"k must be >= 1: $k")
    val spark = docs.sparkSession
    import spark.implicits._
    val qt = queries.map { q =>
      (q, q.split(" ").filter(_.nonEmpty).distinct)
    }.toDF("query", "toks")
      .select(col("query"), explode(col("toks")).as("term"))
    val allToks = queries.flatMap(_.split(" ")).filter(_.nonEmpty).distinct
    val words = Partitioning.spread(docs)
      .select(col(idCol).as("doc_id"),
              explode(TextFunctions.words(col(textCol))).as("term"))
    val tf = words.groupBy("doc_id", "term").agg(count(lit(1)).as("tf"))
      .withColumn("dl",
        sum(col("tf")).over(Window.partitionBy(col("doc_id"))))
    // 1-row corpus totals, broadcast — N and L, never a driver collect.
    // L from size(words) on the unexploded scan: one narrow pass.
    val totals = docs.agg(
      count(lit(1)).as("n_docs"),
      sum(size(TextFunctions.words(col(textCol)))).cast("long").as("l_tot"))
    val scored = tf.filter(col("term").isin(allToks: _*))
      .withColumn("df", count(lit(1)).over(Window.partitionBy(col("term"))))
      .join(broadcast(qt), Seq("term"))
      .crossJoin(broadcast(totals))
      .withColumn("r_e6", expr("(1000000 * dl * n_docs) div l_tot"))
      .withColumn("term_e6",
        expr("(22000000000000 * tf) div " +
             "(10000000 * tf + 3000000 + 9 * r_e6)"))
      .withColumn("idf_e6",
        expr("(1000000 * (2 * (n_docs - df) + 1)) div (2 * df + 1)"))
      .withColumn("contrib_e6", expr("(idf_e6 * term_e6) div 1000000"))
      .groupBy(col("query"), col("doc_id"))
      .agg(sum(col("contrib_e6")).as("score_e6"))
    scored.groupBy(col("query"))
      .agg(graft.functions.TopKAgg.topKByValue(k)(
             col("score_e6").cast("double"), col("doc_id")).as("tk"))
      .select(col("query"), posexplode(col("tk")))
      .select(col("query"), (col("pos") + 1).cast("long").as("rnk"),
              col("col").getField("_2").as("doc_id"),
              col("col").getField("_1").cast("long").as("score_e6"))
  }
}
