package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.functions.PortableHash

/** KMV (k minimum values) distinct-value sketch (Bar-Yossef et al.
  * RANDOM 2002; set operations per Beyer et al. SIGMOD 2007): keep the
  * k SMALLEST portable hash values of a key column's distinct values.
  * The kth-smallest order statistic estimates density — if k uniform
  * points occupy [0, h_k] of a [0, 2^52) space, the set has about
  * (k−1) · 2^52 / h_k distinct members (±1/√k relative error).
  *
  * The engine-portable complement to the q45 HLL gate: HLL's hash is
  * engine-private so its gate is an ACCURACY ENVELOPE; KMV's hash is
  * [[PortableHash.h52]], so an external SQL engine replays the exact
  * k-minimum set and every estimate is gated BIT-FOR-BIT (integer
  * div arithmetic only — the [[CountMin]] convention). Unlike HLL it
  * also supports SET OPERATIONS: the k smallest of SA ∪ SB is exactly
  * the KMV sketch of A ∪ B (min-k is mergeable), and the fraction of
  * that combined sketch present in both sides estimates Jaccard —
  * distinct-set overlap between two 100 TB corpora from two
  * constant-size sketches, no join over the data.
  *
  * Shape: build = map-combined distinct of hash values (shuffle
  * bounded by DISTINCT keys, never rows) + a distributed top-k
  * (`orderBy.limit` → TakeOrderedAndProject: per-partition partial
  * min-k, driver-side k-way merge of ≤ k·partitions rows) — output ≤ k
  * rows, constant in corpus size. Merge = distinct + min-k over
  * unioned sketches, so executors sketch slices independently
  * (idempotent — overlapping slices are fine). Estimates/set-ops run
  * on ≤ 2k-row frames: broadcast-sized, control-plane cost.
  */
object Kmv {

  /** Build the sketch: the k smallest distinct [[PortableHash.h52]]
    * values of `df(keyCol)` as a 1-column (`hv`) frame, ≤ k rows.
    * NULL keys are EXCLUDED (COUNT(DISTINCT) semantics, and the
    * NULL-propagating oracle cast would never hash them).
    */
  def sketch(df: DataFrame, keyCol: String, k: Int): DataFrame =
    df.filter(col(keyCol).isNotNull)
      .select(PortableHash.h52(col(keyCol).cast("string")).as("hv"))
      .distinct()
      .orderBy(col("hv"))
      .limit(k)

  /** Merge sketches built over slices of one corpus: min-k of the
    * union of min-k sets IS the union's min-k set (order statistics
    * are mergeable), so per-slice sketches reduce to the exact corpus
    * sketch. Input: any union of `hv` rows; output ≤ k rows.
    */
  def merge(sketches: DataFrame, k: Int): DataFrame =
    sketches.select(col("hv")).distinct().orderBy(col("hv")).limit(k)

  /** Distinct-count estimate from a sketch: exact row count when the
    * sketch holds fewer than k values (the whole distinct set fits —
    * the estimator's exact regime), else (k−1) · 2^52 div h_k.
    * Returns one row (`kmv_est`), integer arithmetic only.
    */
  def estimateDistinct(sk: DataFrame, k: Int): DataFrame =
    sk.agg(count(lit(1)).as("__kmv_n"), max(col("hv")).as("__kmv_hk"))
      .select(when(col("__kmv_n") < k, col("__kmv_n"))
        .otherwise(expr(s"(CAST(${k - 1} AS BIGINT) * " +
          s"CAST(${PortableHash.H52Space} AS BIGINT)) div __kmv_hk"))
        .as("kmv_est"))

  /** Set-operation estimates between two same-k sketches (Beyer et
    * al. SIGMOD 2007): the combined sketch S = min-k of SA ∪ SB is
    * the union's KMV sketch; |S ∩ SA ∩ SB| / |S| estimates Jaccard;
    * union size comes from S's own order statistic; intersection =
    * Jaccard × union. One row: `kmv_union_est`, `kmv_jaccard_e6`,
    * `kmv_inter_est` — all integer div, gated bit-for-bit.
    */
  def setOps(ska: DataFrame, skb: DataFrame, k: Int): DataFrame = {
    val s = merge(ska.unionByName(skb), k)
    val flagged = s
      .join(ska.select(col("hv"), lit(1L).as("__in_a")), Seq("hv"), "left")
      .join(skb.select(col("hv"), lit(1L).as("__in_b")), Seq("hv"), "left")
      .agg(count(lit(1)).as("__n_s"),
        sum(coalesce(col("__in_a"), lit(0L)) *
            coalesce(col("__in_b"), lit(0L))).as("__n_both"),
        max(col("hv")).as("__hk"))
    flagged.select(
      when(col("__n_s") < k, col("__n_s"))
        .otherwise(expr(s"(CAST(${k - 1} AS BIGINT) * " +
          s"CAST(${PortableHash.H52Space} AS BIGINT)) div __hk"))
        .as("kmv_union_est"),
      when(col("__n_s") === 0, lit(0L))
        .otherwise(expr("(1000000 * __n_both) div __n_s"))
        .as("kmv_jaccard_e6"))
      .select(col("kmv_union_est"), col("kmv_jaccard_e6"),
        expr("(kmv_union_est * kmv_jaccard_e6) div 1000000")
          .as("kmv_inter_est"))
  }
}
