package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** UNIGRAM-LM tokenizer (SentencePiece's other trainer — Kudo 2018),
  * as an EXACT-INTEGER hard-EM surrogate: where BPE ([[Bpe]]) grows a
  * vocab bottom-up by merge frequency, unigram starts from an
  * over-complete substring vocab and keeps the pieces a Viterbi
  * segmentation actually uses.
  *
  * The published trainer is float EM over piece log-probabilities;
  * floats are ungateable (shuffle-order sums), so this surrogate keeps
  * the algorithm's structure with integer-exact pieces, the q68 Lloyd
  * discipline:
  *
  *  - piece cost = bits(total) − bits(count) + 1, where bits(x) is the
  *    BIT LENGTH of x (length of `bin(x)`) — an exact whole-bit
  *    ⌈−log₂ p⌉-style surrogate both engines compute identically; the
  *    +1 makes every token cost ≥ 1, penalizing token count like the
  *    real model's p < 1 does.
  *  - E step = VITERBI segmentation of the word vocab under current
  *    costs (hard EM): DP over word positions minimizing
  *    (Σ cost, n_pieces, last-piece-start) lexicographically — the
  *    tuple is PACKED into one int64 (cost·2³², n·2¹⁶, i) so "min"
  *    is a plain integer min in both engines and the tie-break is
  *    total, making the segmentation a pure function of the data.
  *  - M step = usage recount: multi-char pieces unused by the E step
  *    are DROPPED (the unigram prune), single chars survive with
  *    add-one smoothing (coverage guarantee), costs recomputed from
  *    the new counts. One fixed iteration — like [[Clustering]]'s
  *    fixed-iteration Lloyd, enough to exercise prune+refit while
  *    staying replayable.
  *
  * Scale shape: everything heavier than a 1-row total rides the
  * DISTINCT-WORD vocab, not the corpus (the Zipf lever BPE uses too);
  * seed-piece counting is two explodes over distinct words + one hash
  * agg; top-V admission is [[PrefixSum.denseRank]]'s single range
  * exchange (piece keys are unique, so dense rank IS row_number) —
  * never a global window; the Viterbi DP is ONE codegen'd `aggregate`
  * fold per word (no per-position joins, no UDF); document encode is
  * a hash join of doc words against the segmented vocab, then a
  * per-doc ordered rollup.
  *
  * Packing bound: per-token cost ≤ bits(total)+1 ≤ 64, so a word of
  * length ≤ 2¹⁶−1 keeps cost·2³² below 2⁶³ and n, i inside their 16-bit
  * fields; [[segmentWords]] enforces the word-length bound loudly.
  */
object UnigramLm {

  /** Corpus word vocabulary: (word, freq), the BPE word filter
    * (non-empty, no '|' — '|' is the segmentation separator).
    */
  def wordFreqs(docs: DataFrame, textCol: String): DataFrame =
    docs
      .select(explode(graft.functions.TextFunctions.words(col(textCol)))
        .as("word"))
      .filter(length(col("word")) > 0 && !col("word").contains("|"))
      .groupBy("word").agg(count(lit(1)).as("freq"))

  /** Seed piece counts: every substring of length 1..maxPieceLen of
    * every vocab word, weighted by word frequency (all start
    * positions, multiplicity counted): (piece, c0).
    */
  def seedCounts(wf: DataFrame, maxPieceLen: Int): DataFrame =
    wf
      .withColumn("__i", explode(expr("sequence(1, length(word))")))
      .withColumn("__p", explode(expr(s"sequence(1, $maxPieceLen)")))
      .filter(col("__i") + col("__p") - 1 <= length(col("word")))
      .select(expr("substring(word, __i, __p)").as("piece"), col("freq"))
      .groupBy("piece").agg(sum(col("freq")).as("c0"))

  /** Admission: ALL single chars (coverage), plus multi-char pieces
    * with c0 ≥ minCount ranked into the top `vocabSize` by
    * (c0 desc, piece asc). Piece keys are unique, so the dense rank is
    * a row_number — one range exchange, no global window. Output:
    * (piece, cnt).
    */
  def seedVocab(seeds: DataFrame, minCount: Long, vocabSize: Int)
      : DataFrame = {
    val chars = seeds.filter(length(col("piece")) === 1)
      .select(col("piece"), col("c0").as("cnt"))
    val multiCand = seeds
      .filter(length(col("piece")) > 1 && col("c0") >= minCount)
      .select(col("piece"), col("c0"), (-col("c0")).as("__negc"))
    val multi = PrefixSum.denseRank(multiCand, Seq("__negc", "piece"),
                                    rankCol = "__rk")
      .filter(col("__rk") <= vocabSize)
      .select(col("piece"), col("c0").as("cnt"))
    chars.unionByName(multi)
  }

  /** Integer cost table from counts: cost = bits(total) − bits(cnt) + 1
    * (bits = bit length via `bin`). Output: (piece, cnt, cost_bits).
    */
  def costs(vocab: DataFrame): DataFrame = {
    val total = vocab.agg(sum(col("cnt")).as("__tot"))
    vocab.crossJoin(total)
      .select(col("piece"), col("cnt"),
              (length(bin(col("__tot"))) - length(bin(col("cnt"))) + 1)
                .cast("long").as("cost_bits"))
  }

  /** The packed-Viterbi DP as one codegen'd SQL `aggregate` fold.
    * Requires columns `word` and `__es` (array of struct(i 0-based
    * start, j 1-based end, c cost)); appends struct arrays bc/bn/bs
    * (best cost / token count / segmentation up to each position).
    * The inner 1-element `aggregate` is a let-binding for the packed
    * best so it is computed once per position.
    *
    * UNREACHABLE positions (no edge ends at j, or every predecessor is
    * itself unreachable — a vocabulary gap) carry the SENTINEL cost
    * 2³⁰ instead of a null: the bs array's element type is non-null
    * (seeded by array('')), so a null entry would NPE the unsafe row
    * writer, and nulls can't survive the packed arithmetic anyway.
    * 2³⁰ dominates every real path (cost ≤ 64·len < 2²², packing stays
    * under 2⁶³ even after per-token additions), so a final cost ≥ 2³⁰
    * IS the uncovered-word witness [[segmentWords]] raises on.
    */
  private[graft] val UncoveredSentinelCost = 1L << 30
  private val dpExpr: String =
    s"""aggregate(
      |  sequence(1, length(word)),
      |  named_struct('bc', array(CAST(0 AS BIGINT)),
      |               'bn', array(CAST(0 AS BIGINT)),
      |               'bs', array('')),
      |  (acc, j) -> aggregate(
      |    array(coalesce(array_min(transform(filter(__es, e -> e.j = j),
      |      e -> (element_at(acc.bc, CAST(e.i + 1 AS INT)) + e.c)
      |             * CAST(4294967296 AS BIGINT)
      |           + (element_at(acc.bn, CAST(e.i + 1 AS INT)) + 1)
      |             * CAST(65536 AS BIGINT)
      |           + e.i)),
      |      CAST(${UncoveredSentinelCost * 4294967296L} AS BIGINT))),
      |    acc,
      |    (a, b) -> named_struct(
      |      'bc', concat(a.bc, array(b div 4294967296)),
      |      'bn', concat(a.bn, array(pmod(b div 65536, 65536))),
      |      'bs', concat(a.bs, array(CASE WHEN pmod(b, 65536) = 0
      |        THEN substring(word, 1, j)
      |        ELSE concat(
      |          element_at(a.bs, CAST(pmod(b, 65536) + 1 AS INT)), '|',
      |          substring(word, CAST(pmod(b, 65536) + 1 AS INT),
      |                    j - CAST(pmod(b, 65536) AS INT))) END)))))
      |""".stripMargin

  /** Viterbi-segment every vocab word under the given piece costs:
    * (word, freq, n_tok, seg) with seg = pieces joined by '|'.
    * Deterministic: min over packed (Σcost, n, last-piece-start).
    * Preconditions, BOTH loud (r11 verdict #5 / ADVICE — the coverage
    * check used to be an inner join that silently dropped uncovered
    * words and a DP that folded a vocabulary gap into null segs):
    * every word must have a full piece cover under `pieceCosts` (true
    * by construction when costs derive from the same corpus, since
    * single chars always survive; a FOREIGN piece table with a gap now
    * raises instead of losing rows), and words must be shorter than
    * 2¹⁶ chars (the packing bound).
    */
  def segmentWords(wf: DataFrame, pieceCosts: DataFrame,
                   maxPieceLen: Int): DataFrame = {
    val edges = wf
      .withColumn("__i", explode(expr("sequence(1, length(word))")))
      .withColumn("__p", explode(expr(s"sequence(1, $maxPieceLen)")))
      .filter(col("__i") + col("__p") - 1 <= length(col("word")))
      .select(col("word"), expr("substring(word, __i, __p)").as("piece"),
              (col("__i") - 1).cast("long").as("i"),
              (col("__i") + col("__p") - 1).cast("long").as("j"))
      .join(broadcast(pieceCosts.select(col("piece"),
                                        col("cost_bits").as("c"))),
            Seq("piece"))
      .groupBy(col("word"))
      .agg(collect_list(struct(col("i"), col("j"), col("c"))).as("__es"))
    val guarded = wf
      .withColumn("__len_ok", length(col("word")) < 65536)
      .withColumn("word",
        when(col("__len_ok"), col("word"))
          .otherwise(raise_error(concat(
            lit("unigram: word exceeds the 65535-char packing bound: "),
            substring(col("word"), 1, 64)))))
      .drop("__len_ok")
    // LEFT join: a word with no matching piece at all keeps a null
    // edge set; both it and a mid-word vocabulary gap drive the DP's
    // final cost to the uncovered sentinel (see [[dpExpr]]), which the
    // guard below turns into the promised error instead of a silent
    // null/garbage row.
    guarded.join(edges, Seq("word"), "left")
      .withColumn("__dp", expr(dpExpr))
      .select(col("word"), col("freq"),
              element_at(col("__dp.bc"),
                         (length(col("word")) + 1).cast("int"))
                .as("__cost"),
              element_at(col("__dp.bn"),
                         (length(col("word")) + 1).cast("int"))
                .as("n_tok"),
              element_at(col("__dp.bs"),
                         (length(col("word")) + 1).cast("int")).as("seg"))
      .select(col("word"), col("freq"),
              when(col("__cost") < UncoveredSentinelCost, col("n_tok"))
                .otherwise(raise_error(concat(
                  lit("unigram: word has no full piece cover under the " +
                      "given pieceCosts (foreign/gapped vocabulary): "),
                  substring(col("word"), 1, 64)))).as("n_tok"),
              col("seg"))
  }

  /** Full trainer: seed → cost₀ → E (Viterbi usage recount) → M
    * (prune + refit). Returns the FINAL piece table
    * (piece, uses, cost_bits), the tokenizer artifact.
    */
  def trainPieces(docs: DataFrame, textCol: String, maxPieceLen: Int = 4,
                  minCount: Long = 4, vocabSize: Int = 1024): DataFrame = {
    val wf = wordFreqs(docs, textCol)
    val v0 = costs(seedVocab(seedCounts(wf, maxPieceLen),
                             minCount, vocabSize))
    val seg0 = segmentWords(wf, v0, maxPieceLen)
    val c1 = seg0
      .select(col("freq"), explode(split(col("seg"), "\\|")).as("piece"))
      .groupBy("piece").agg(sum(col("freq")).as("c1"))
    val v1 = v0.join(c1, Seq("piece"), "left")
      .select(col("piece"),
              when(length(col("piece")) === 1,
                   coalesce(col("c1"), lit(0L)) + 1L)
                .otherwise(col("c1")).as("cnt"))
      .filter(col("cnt").isNotNull && col("cnt") >= 1L)
    costs(v1).select(col("piece"), col("cnt").as("uses"),
                     col("cost_bits"))
  }

  /** Tokenizer APPLY: every document's words segmented under the
    * trained final costs; output (keyCols..., n_tokens, encoded) with
    * encoded = per-word segmentations joined by ' ' in word order.
    * Docs with no valid word encode as '' with 0 tokens.
    */
  def encode(docs: DataFrame, textCol: String, keyCols: Seq[String],
             maxPieceLen: Int = 4, minCount: Long = 4,
             vocabSize: Int = 1024): DataFrame =
    encodeWith(docs, textCol, keyCols,
               trainPieces(docs, textCol, maxPieceLen, minCount, vocabSize),
               maxPieceLen)

  /** [[encode]] under an EXISTING piece table (piece, …, cost_bits) —
    * the apply path a pipeline runs against a trained-and-persisted
    * tokenizer ([[TokenizerStore]]): train once, encode any corpus the
    * vocabulary covers. Same plan as [[encode]] minus the trainer.
    */
  def encodeWith(docs: DataFrame, textCol: String, keyCols: Seq[String],
                 pieces: DataFrame, maxPieceLen: Int = 4): DataFrame = {
    val segs = segmentWords(wordFreqs(docs, textCol), pieces, maxPieceLen)
      .select(col("word"), col("n_tok"), col("seg"))
    val keys = keyCols.map(col)
    val dw = docs
      .select(keys :+
        posexplode(graft.functions.TextFunctions.words(col(textCol)))
          .as(Seq("__wi", "word")): _*)
      .filter(length(col("word")) > 0 && !col("word").contains("|"))
    val enc = dw.join(segs, Seq("word"))
      .groupBy(keys: _*)
      .agg(sum(col("n_tok")).as("n_tokens"),
           array_join(transform(
             array_sort(collect_list(struct(col("__wi"), col("seg")))),
             x => x.getField("seg")), " ").as("encoded"))
    docs.select(keys: _*).distinct()
      .join(enc, keyCols, "left")
      .select(keys ++ Seq(coalesce(col("n_tokens"), lit(0L))
                            .as("n_tokens"),
                          coalesce(col("encoded"), lit(""))
                            .as("encoded")): _*)
  }
}
