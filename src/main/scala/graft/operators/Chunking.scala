package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

import graft.functions.TextFunctions

/** Sliding-window document chunking — the RAG/embedding-prep layout:
  * fixed-size token windows advancing by `stride` (overlap =
  * chunkSize − stride keeps context across boundaries), with the last
  * window anchored so the document tail is always covered exactly once.
  *
  * Chunk starts are 0, stride, 2·stride, …; the last chunk is the first
  * one whose window reaches the end, so a doc of n ≤ chunkSize tokens
  * yields exactly one chunk and n > chunkSize yields
  * ⌈(n − chunkSize)/stride⌉ + 1. Pure per-row arithmetic + one
  * generator: no shuffle, no UDF — at 100 TB this is a map over the
  * scan, and the emitted chunk hash (md5 of the joined tokens) keeps
  * the output row narrow for the downstream embed/dedup join.
  */
object Chunking {

  /** One row per (doc, chunk): (idCol, chunk_id, start_tok, chunk_len,
    * chunk_md5). Tokens are whitespace words ([[TextFunctions.words]]).
    */
  def slidingChunks(df: DataFrame, idCol: String, textCol: String,
                    chunkSize: Int, stride: Int): DataFrame = {
    require(chunkSize > 0 && stride > 0 && stride <= chunkSize,
      s"need 0 < stride <= chunkSize, got $stride/$chunkSize")
    val w = TextFunctions.words(col(textCol))
    val n = size(w).cast("long")
    val cs = lit(chunkSize.toLong)
    val st = lit(stride.toLong)
    val nChunks = when(n > cs,
        floor((n - cs + st - lit(1L)) / st).cast("long") + lit(1L))
      .otherwise(lit(1L))
    val start = col("chunk_id") * st
    df.select(col(idCol), w.as("w"), n.as("n"), nChunks.as("n_chunks"))
      .withColumn("chunk_id",
        explode(sequence(lit(0L), col("n_chunks") - 1)))
      .select(
        col(idCol),
        col("chunk_id"),
        start.as("start_tok"),
        least(cs, col("n") - start).as("chunk_len"),
        md5(concat_ws(" ",
          slice(col("w"), (start + 1).cast("int"), lit(chunkSize))))
          .as("chunk_md5"))
  }

  /** Content-defined chunking (CDC) — Rabin-style boundaries for
    * dedup of SHIFTED content: a boundary falls after word i whenever
    * the hash of the (wᵢ₋₁, wᵢ) window ≡ 0 mod `modulus` (expected chunk
    * length = `modulus` words). Because boundaries depend only on LOCAL
    * content, inserting or deleting a prefix re-chunks only the edited
    * neighborhood — downstream chunks realign and their hashes still
    * match across document versions, which fixed-size chunking
    * structurally cannot do (every boundary shifts). This is the
    * backup-dedup / CAS-store trick applied to corpus near-dup at
    * sub-document granularity.
    *
    * Output: one row per (id, chunk): `chunk_id` (0-based, contiguous),
    * `n_words`, `chunk_md5` (digest of the space-joined words).
    *
    * Scale shape: ONE shuffle by id; the lag + running-count windows
    * share one per-id window (docs are bounded, so per-id windows are
    * safe — this is not a global-order window), and the final
    * (id, chunk_id) aggregate reuses the id partitioning with no second
    * exchange. Word-level windows keep the whole pipeline in codegen'd
    * builtins; a byte-level CDC (real Rabin fingerprint over bytes)
    * would drop to one mapPartitions pass, same output contract.
    */
  def contentDefinedChunks(df: DataFrame, idCol: String, textCol: String,
                           modulus: Int): DataFrame = {
    require(modulus >= 2, s"modulus must be >= 2: $modulus")
    val win = org.apache.spark.sql.expressions.Window
      .partitionBy(col(idCol)).orderBy(col("i"))
    val boundary = col("pw").isNotNull &&
      pmod(conv(substring(md5(concat(col("pw"), lit(" "), col("w"))), 1, 6),
                16, 10).cast("long"),
           lit(modulus.toLong)) === 0
    df.select(col(idCol),
              posexplode(TextFunctions.words(col(textCol))).as(Seq("i", "w")))
      .withColumn("pw", lag(col("w"), 1).over(win))
      .withColumn("b", when(boundary, 1L).otherwise(0L))
      .withColumn("chunk_id",
        coalesce(sum(col("b")).over(
            win.rowsBetween(org.apache.spark.sql.expressions.Window
              .unboundedPreceding, -1)),
          lit(0L)))
      .groupBy(col(idCol), col("chunk_id"))
      .agg(count(lit(1)).as("n_words"),
           collect_list(struct(col("i"), col("w"))).as("ws"))
      .select(col(idCol), col("chunk_id"), col("n_words"),
        md5(array_join(
          transform(sort_array(col("ws")), s => s.getField("w")), " "))
          .as("chunk_md5"))
  }

  /** Source-interleaved training order — the "shuffle by interleaving"
    * layout of a mixing recipe: rank rows within each `keyCol` group by
    * `rankCols` (the curriculum: quality-first, or hash order), then lay
    * groups out round-robin — all the rank-1 rows (in key order), then
    * rank-2, … — so no source produces a long contiguous run. The
    * global position comes from [[PrefixSum.runningTotal]] over
    * (rn, key): one range exchange, never a single-partition
    * `row_number` window.
    *
    * Adds `rn` (1-based rank within key) and `pos` (1-based global
    * training position). `(rn, keyCol)` is automatically a total order
    * because rn is unique per key.
    */
  def interleave(df: DataFrame, keyCol: String, rankCols: Seq[Column])
      : DataFrame = {
    require(rankCols.nonEmpty, "rankCols must be non-empty")
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col(keyCol)).orderBy(rankCols: _*)
    val ranked = df
      .withColumn("rn", row_number().over(w).cast("long"))
      .withColumn("one", lit(1L))
    PrefixSum.runningTotal(ranked, "one", Seq("rn", keyCol), cumCol = "pos")
      .drop("one")
  }
}
