package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import graft.GraftOps._

/** Distributed GENERALIZED SUFFIX ARRAY construction by prefix
  * doubling (Manber & Myers 1990; the distributed form is the
  * Flick & Aluru 2015 bulk-synchronous shape) — the index structure
  * under Lee et al. 2021's ExactSubstr dedup. One row per suffix
  * (doc, pos); ranks START at level min(16, capChars) (one dense rank
  * over the packed substring key — two 8-char segments — at each
  * position), then double per round: log₂(cap/16) doubling rounds
  * total, not log₂(cap). (ADVICE r11: this header used to say level 8;
  * the in-body `pack = min(16, capChars)` comment was always right.)
  *
  * Comparisons are CAPPED at `capChars` (default 64): suffixes are
  * ordered by their first `capChars` characters, remaining ties broken
  * by (doc_id, pos). For the dedup use the cap is not a compromise —
  * deciding "duplicated substring ≥ L" needs adjacent-suffix
  * comparisons only up to L < cap characters — and it BOUNDS the round
  * count and the rank-key width independently of document length (an
  * uncapped corpus-long repeat would otherwise force ~log(maxDocLen)
  * rounds).
  *
  * Round shape (everything data-sized, nothing driver-sized):
  *  - pair ranks: one self-join keyed (doc_id, pos ± h) — both sides
  *    hash the same key family, so the exchange is reused;
  *  - re-rank pairs: DISTINCT pairs (hash agg), then a dense rank via
  *    [[PrefixSum.runningTotal]]'s two-phase scan — the one range
  *    exchange any total order pays, never a single-partition window;
  *  - join the new ranks back (hash join on the pair key);
  *  - the round's result rides a LAZY checkpoint whose materializing
  *    action IS the convergence witness (max(rank) == row count ⟺ all
  *    suffixes already distinct ⟹ early exit), the
  *    [[GraphOps.connectedComponents]] single-job-per-round discipline.
  *
  * Determinism: ranks depend only on (text, cap); the final
  * `sa_rank` is the exact row_number of the (key, doc_id, pos) total
  * order, so an engine-independent oracle can replay it by sorting
  * capped suffix strings directly.
  */
object SuffixRank {

  /** (doc_id, pos, sa_rank): 1-based position and the suffix's 1-based
    * global rank under (first-capChars-chars, doc_id, pos).
    */
  def ranks(docs: DataFrame, idCol: String, textCol: String,
            capChars: Int = 64): DataFrame = {
    require(capChars >= 2 && (capChars & (capChars - 1)) == 0,
      s"capChars must be a power of two >= 2, got $capChars")
    // PACKED initial ranks (r10 verdict #2): the level-`pack` rank comes
    // from ONE dense rank over the first `pack` characters at each
    // position — the same capped-string comparison the finalize step
    // already trusts — instead of log₂(pack) pair-doubling rounds over
    // per-char ranks. The key is carried as ⌈pack/8⌉ 8-char substring
    // segments compared lexicographically, which is order-isomorphic
    // to the capped suffix order at level `pack`: UTF-8 binary
    // comparison is codepoint order; a suffix that ends inside a
    // segment yields a shorter segment that sorts before any
    // continuation (and forces its later segments empty) — exactly the
    // absent-rank-sentinel rule the doubling rounds use. For cap=64
    // this is 1 + log₂(64/16) = 3 range exchanges instead of 6
    // (measured −40%+ construction at sf0.1); the per-row state in the
    // doubling loop stays two longs, never the packed key itself.
    val pack = math.min(16, capChars)
    val segs = (pack + 7) / 8
    val keyCols = (0 until segs).map(i => s"__k$i")
    val keyed = Partitioning.spread(docs)
      .select(col(idCol).as("doc_id"), col(textCol).as("__t"))
      .filter(length(col("__t")) > 0)
      .withColumn("__p", explode(expr("sequence(1, length(__t))")))
      .select(Seq(col("doc_id"), col("__p").cast("long").as("pos")) ++
        (0 until segs).map(i =>
          expr(s"substring(__t, __p + ${i * 8}, ${math.min(8, pack - i * 8)})")
            .as(s"__k$i")): _*)
    var r = PrefixSum.denseRank(keyed, keyCols, rankCol = "rank")
      .select(col("doc_id"), col("pos"), col("rank"))
    // counts ride the already-materialized checkpoint (denseRank is
    // eager), so neither action re-runs the explode
    val n = r.count()
    val mx0 = r.agg(max(col("rank")).as("m")).collect()(0).getLong(0)
    var h = pack
    // all packed ranks distinct ⟹ the level-pack order already IS the
    // capped order (pairs differing within `pack` chars order the same
    // at any longer cap) — skip the doubling entirely
    var distinctAll = mx0 == n
    // PAIR RANKS BY WINDOW, NOT SELF-JOIN (r15): positions are
    // CONTIGUOUS 1..len within each doc (the explode above), so
    // rank(pos + h) is exactly lead(rank, h) over (doc_id, pos) —
    // absent (pos + h > len) ⟹ lead's null ⟹ the same 0 sentinel the
    // old left join coalesced. The round's (doc_id)-keyed checkpoint
    // (hash-partitioned, sorted (doc_id, pos), AQE-off so the layout
    // survives — [[org.apache.spark.sql.GraftColumns.keyedCheckpoint]])
    // then feeds the window with ZERO exchange and ZERO sort: per
    // round the old plan paid two suffix-sized join exchanges + two
    // sorts; the new plan pays one keyed exchange when re-checkpointing
    // the round's output and nothing at consumption. Per-doc window
    // concentration is the engine's existing per-doc discipline (the
    // substring operators window per doc the same way); partition
    // count tracks the measured block bytes of the previous round's
    // checkpoint against AQE's advisory size.
    def keyedByDoc(df: org.apache.spark.sql.DataFrame,
                   sizeHint: org.apache.spark.sql.DataFrame)
        : org.apache.spark.sql.DataFrame = {
      import org.apache.spark.sql.GraftColumns
      val conf = df.sparkSession.sessionState.conf
      val bytes = GraftColumns.materializedBytes(sizeHint)
      val advisory = math.max(1L, conf.getConf(
        org.apache.spark.sql.internal.SQLConf
          .ADVISORY_PARTITION_SIZE_IN_BYTES))
      // Sizing rule (r16, after the materializedBytes fix made the
      // byte-derived count actually engage): the loop's consumer is a
      // WINDOW pass computed 2–3× per round (the range partitioner's
      // sampling pass plus the exchange pass re-evaluate it), i.e. a
      // per-row compute stage — so the partition count floors at the
      // CORE count (defaultParallelism), not at the shuffle-byte
      // optimum. Measured: pure byte sizing gave p=2 at sf0.1 and
      // q258 lost ~2 s serializing the lead() passes on two cores; the
      // byte term takes over only past cores·advisory bytes — the
      // 100 TB regime, where it bounds per-task partition size exactly
      // like AQE's coalescing. Cap stays numShufflePartitions (the
      // cluster-scale knob).
      val cores = df.sparkSession.sparkContext.defaultParallelism.toLong
      val p =
        if (bytes <= 0L) conf.numShufflePartitions
        else math.max(math.min(cores, conf.numShufflePartitions.toLong),
          math.min(conf.numShufflePartitions.toLong,
            (bytes + advisory - 1L) / advisory)).toInt
      GraftColumns.keyedCheckpoint(df, p, Seq(col("doc_id")),
                                   Seq(col("doc_id"), col("pos")))
    }
    if (!distinctAll && h < capChars) {
      val rk = keyedByDoc(r, sizeHint = r)
      org.apache.spark.sql.GraftColumns.unpersistCheckpoint(r)
      r = rk
    }
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("doc_id")).orderBy(col("pos"))
    while (h < capChars && !distinctAll) {
      val paired = r
        .select(col("doc_id"), col("pos"), col("rank").as("__r1"),
                coalesce(lead(col("rank"), h).over(w), lit(0L))
                  .as("__r2"))
      // re-rank the pairs IN PLACE: denseRank's one range exchange
      // replaces the distinct + rank + join-back round trip the first
      // cut of this loop paid (3 exchanges per round -> 1, measured
      // the dominant cost of the whole construction at sf0.1)
      val next0 = PrefixSum.denseRank(paired, Seq("__r1", "__r2"),
                                      rankCol = "__nr")
        .select(col("doc_id"), col("pos"), col("__nr").as("rank"))
      val mx = next0.agg(max(col("rank")).as("m")).collect()(0).getLong(0)
      distinctAll = mx == n
      h *= 2
      val next =
        if (h < capChars && !distinctAll) {
          // another round will consume the window — restore the layout
          val nk = keyedByDoc(next0, sizeHint = next0)
          org.apache.spark.sql.GraftColumns.unpersistCheckpoint(next0)
          nk
        } else next0
      org.apache.spark.sql.GraftColumns.unpersistCheckpoint(r)
      r = next
    }
    // finalize: ranks are dense over capped-prefix classes; ties (equal
    // capped prefixes — exact-duplicate regions) break by (doc_id, pos).
    // When the loop ended with ALL ranks distinct the dense rank is a
    // bijection onto 1..n, so the (rank, doc_id, pos) row_number IS the
    // rank itself — skip the whole finalize pass (one range exchange +
    // its sampling job) and rename in place; the returned projection
    // keeps r's checkpoint live as the result's handle (r16).
    if (distinctAll)
      r.select(col("doc_id"), col("pos"), col("rank").as("sa_rank"))
    else {
      val out = PrefixSum.runningTotal(
          r.withColumn("__one", lit(1L)),
          "__one", Seq("rank", "doc_id", "pos"), cumCol = "sa_rank")
        .select(col("doc_id"), col("pos"), col("sa_rank"))
      org.apache.spark.sql.GraftColumns.unpersistCheckpoint(r)
      out
    }
  }

  /** Per-document duplicate profile READ OFF THE SUFFIX ARRAY: for
    * every suffix, the longest common prefix (capped) with its
    * SA-adjacent neighbors; per doc the max — `max_lcp` is the length
    * of the longest substring of the doc that occurs elsewhere in the
    * corpus (or again in the doc), because any repeated substring is a
    * common prefix of two suffixes that are adjacent-or-bracketing in
    * suffix order, and adjacent pairs realize the maximum. `dup_l`
    * flags docs with a repeat >= minLen — the Lee et al. detection
    * verdict, this time derived from the index structure itself.
    * `max_lcp` SATURATES at `capChars` (a repeat longer than the cap
    * reports the cap); `dup_l` is exact for any minLen <= capChars.
    */
  def adjacentDupStats(docs: DataFrame, idCol: String, textCol: String,
                       capChars: Int = 64, minLen: Int = 25): DataFrame = {
    require(minLen <= capChars,
      s"minLen $minLen must be <= capChars $capChars")
    val sa = ranks(docs, idCol, textCol, capChars)
    val keyed = sa.join(
        Partitioning.spread(docs)
          .select(col(idCol).as("doc_id"), col(textCol).as("__t")),
        Seq("doc_id"))
      .select(col("doc_id"), col("pos"), col("sa_rank"),
              expr(s"substring(__t, CAST(pos AS INT), $capChars)")
                .as("__key"))
    val nxt = keyed.select((col("sa_rank") - 1).as("__rprev"),
                           col("doc_id").as("__dn"),
                           col("__key").as("__keyn"))
    // contiguous common-prefix length of two capped keys by BINARY
    // SEARCH: log₂(cap)+1 segment compares instead of a per-char scan
    // (the r10 fold did cap struct-allocating steps with O(i) substring
    // access each — O(cap²) char work in an interpreted HOF; this is
    // the dominant cost of the whole query, measured −60% on the LCP
    // job at sf0.1). `lo` only extends when the [lo+1, lo+s] segments
    // are EQUAL AS STRINGS, which includes equal truncated segments
    // only when both keys are exhausted — the final least() against
    // both lengths turns that overshoot into the exact LCP.
    val steps = Iterator.iterate(capChars)(_ / 2).takeWhile(_ >= 1).toSeq
    val lcpExpr = expr(
      s"""least(
         |  aggregate(array(${steps.mkString(", ")}), CAST(0 AS BIGINT),
         |    (lo, s) -> lo +
         |      CASE WHEN substring(__key, CAST(lo + 1 AS INT), s)
         |              = substring(__keyn, CAST(lo + 1 AS INT), s)
         |           THEN CAST(s AS BIGINT) ELSE CAST(0 AS BIGINT) END),
         |  CAST(length(__key) AS BIGINT),
         |  CAST(length(__keyn) AS BIGINT))""".stripMargin)
    // a suffix's best match is with an SA neighbor; attribute each
    // adjacent pair's lcp to BOTH suffixes' documents, then roll up
    val adj = keyed.join(nxt, col("sa_rank") === col("__rprev"))
      .select(col("doc_id"), col("__dn"), lcpExpr.as("__lcp"))
    val both = adj.select(col("doc_id"), col("__lcp"))
      .unionByName(adj.select(col("__dn").as("doc_id"), col("__lcp")))
    Partitioning.spread(docs).select(col(idCol).as("doc_id"))
      .join(both.groupBy("doc_id").agg(max(col("__lcp")).as("max_lcp")),
            Seq("doc_id"), "left")
      .select(col("doc_id"),
              coalesce(col("max_lcp"), lit(0L)).as("max_lcp"),
              (coalesce(col("max_lcp"), lit(0L)) >= minLen).as("dup_l"))
  }
}
