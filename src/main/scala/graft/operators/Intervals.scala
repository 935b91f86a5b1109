package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Interval algebra over per-key span sets — the primitive under every
  * "union of matched/covered regions" step (dictionary redaction,
  * dedup-span coverage, scene ranges): merge overlapping-or-touching
  * [start, start+len) intervals into maximal disjoint ones.
  *
  * Plan shape: one window per key ordered by (start, len) — a running
  * max of interval ends marks where a new disjoint group begins, a
  * running sum of those breaks numbers the groups, one hash agg emits
  * them. Per-key work is bounded by that key's interval count (match
  * lists, never the corpus), so the window is the bounded-partition
  * kind the repo's window policy allows.
  */
object Intervals {

  /** Merge [start, start+len) intervals per `keyCol`; two intervals
    * merge iff they overlap or touch (gap 0). Output:
    * (key, start, len) of the maximal disjoint union, lens > 0.
    */
  def unionSpans(spans: DataFrame, keyCol: String, startCol: String,
                 lenCol: String): DataFrame = {
    spans
      .select(col(keyCol).as("__k"),
              col(startCol).cast("long").as("__s"),
              (col(startCol) + col(lenCol)).cast("long").as("__e"))
      .filter(col("__e") > col("__s"))
      .withColumn("__maxPrev", max(col("__e")).over(
        Window.partitionBy(col("__k")).orderBy(col("__s"), col("__e"))
          .rowsBetween(Window.unboundedPreceding, -1)))
      .withColumn("__brk",
        when(col("__maxPrev").isNull || col("__s") > col("__maxPrev"), 1L)
          .otherwise(0L))
      .withColumn("__grp", sum(col("__brk")).over(
        Window.partitionBy(col("__k")).orderBy(col("__s"), col("__e"))
          .rowsBetween(Window.unboundedPreceding, Window.currentRow)))
      .groupBy(col("__k"), col("__grp"))
      .agg(min(col("__s")).as("__ms"), max(col("__e")).as("__me"))
      .select(col("__k").as(keyCol), col("__ms").as(startCol),
              (col("__me") - col("__ms")).as(lenCol))
  }

  /** Cut DISJOINT spans (1-based `start`, `len`; e.g. [[unionSpans]]
    * output) out of each document's text and emit the digest view:
    * (id, n_chars, removed_chars, cut_md5). Keys absent from `spans`
    * keep their text verbatim. The cut is a codegen'd `aggregate` fold
    * over the per-doc sorted span array — gaps between spans
    * concatenate, linear in doc bytes, and the document body crosses
    * the wire exactly once (the span list is the only shuffled state).
    */
  def cutSpans(docs: DataFrame, idCol: String, textCol: String,
               spans: DataFrame, startCol: String = "start",
               lenCol: String = "len",
               broadcastSpanCap: Long = -1L): DataFrame =
    cutSpansText(docs, idCol, textCol, spans, startCol, lenCol,
                 broadcastSpanCap)
      .select(col(idCol), col("n_chars"), col("removed_chars"),
              md5(col("cut_text")).as("cut_md5"))

  /** Span-side broadcast cap for [[cutSpansText]] (rows, not bytes):
    * a per-doc span entry collects to ~16 B of (start, len) payload,
    * so 4M spans keeps the driver-built HashedRelation inside a modest
    * heap — the [[graft.operators.Dedup.DefaultBroadcastPairCap]]
    * rationale.
    */
  val DefaultBroadcastSpanCap = 4000000L

  /** [[cutSpans]] keeping the CUT TEXT itself (`cut_text`) instead of
    * its digest — the form downstream pipeline stages consume
    * (q269's DAG rewrites text stage-to-stage). Same fold, same
    * disjointness contract; rows stay document-sized, so only callers
    * that immediately reduce (digest, token counts, further stages)
    * should keep the column wide.
    */
  def cutSpansText(docs: DataFrame, idCol: String, textCol: String,
                   spans: DataFrame, startCol: String = "start",
                   lenCol: String = "len",
                   broadcastSpanCap: Long = -1L): DataFrame = {
    val perDoc = spans
      .groupBy(col(idCol))
      .agg(array_sort(collect_list(
             struct(col(startCol).cast("long").as("s"),
                    col(lenCol).cast("long").as("l")))).as("__spans"),
           sum(col(lenCol)).cast("long").as("__rm"))
    // COUNTED broadcast (the spansFromGrams discipline, r14): with the
    // default estimate carry, the span side of this left join reaches
    // Catalyst with its grams-ancestry's clamped (huge) size, so the
    // initial plan is a SortMergeJoin and AQE must rescue it into a
    // broadcast at runtime — a RACE against the probe side's exchange
    // materialization. Lost (cold JVM, suite position), the probe pays
    // a full extra document shuffle: q265's two plans, 2.2 s vs 3.4 s
    // at sf0.1, all three r13 sweeps on the slow one. A positive
    // `broadcastSpanCap` counts `spans` (callers pass materialized
    // checkpoints — the count is a block scan) and DECLARES the
    // broadcast under the cap, which pins the fast plan in the initial
    // planning pass; above the cap (the 100 TB regime where a span
    // table outgrows the driver) the shuffle join is kept untouched.
    // Default -1 preserves fully-lazy construction for callers whose
    // spans are not materialized (q257's redaction chain).
    val perDocJ =
      if (broadcastSpanCap > 0L && spans.count() <= broadcastSpanCap)
        broadcast(perDoc)
      else perDoc
    docs.select(col(idCol), col(textCol).as("__t"))
      .join(perDocJ, Seq(idCol), "left")
      .select(
        col(idCol),
        length(col("__t")).cast("long").as("n_chars"),
        coalesce(col("__rm"), lit(0L)).as("removed_chars"),
        when(col("__spans").isNull, col("__t")).otherwise(expr(
          // fold over disjoint sorted spans: emit the gap before each
          // span, track the last removed position, then the tail. Gap
          // lengths are >= 0 by the disjointness contract.
          """aggregate(__spans,
            |  named_struct('acc', CAST('' AS STRING),
            |               'e', CAST(0 AS BIGINT)),
            |  (a, sp) -> named_struct(
            |    'acc', concat(a.acc, substring(__t, CAST(a.e + 1 AS INT),
            |                                   CAST(sp.s - a.e - 1 AS INT))),
            |    'e', CAST(sp.s + sp.l - 1 AS BIGINT)),
            |  a -> concat(a.acc, substring(__t, CAST(a.e + 1 AS INT),
            |                               CAST(length(__t) - a.e AS INT))))
            |""".stripMargin)).as("cut_text"))
  }
}
