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
               lenCol: String = "len"): DataFrame =
    cutSpansText(docs, idCol, textCol, spans, startCol, lenCol)
      .select(col(idCol), col("n_chars"), col("removed_chars"),
              md5(col("cut_text")).as("cut_md5"))

  /** [[cutSpans]] keeping the CUT TEXT itself (`cut_text`) instead of
    * its digest — the form downstream pipeline stages consume
    * (q269's DAG rewrites text stage-to-stage). Same fold, same
    * disjointness contract; rows stay document-sized, so only callers
    * that immediately reduce (digest, token counts, further stages)
    * should keep the column wide.
    */
  def cutSpansText(docs: DataFrame, idCol: String, textCol: String,
                   spans: DataFrame, startCol: String = "start",
                   lenCol: String = "len"): DataFrame = {
    val perDoc = spans
      .groupBy(col(idCol))
      .agg(array_sort(collect_list(
             struct(col(startCol).cast("long").as("s"),
                    col(lenCol).cast("long").as("l")))).as("__spans"),
           sum(col(lenCol)).cast("long").as("__rm"))
    docs.select(col(idCol), col(textCol).as("__t"))
      .join(perDoc, Seq(idCol), "left")
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
