package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

import graft.functions.{PortableHash, TextFunctions}

/** DSIR-style hashed n-gram importance weighting (Xie et al. 2023,
  * "Data Selection for Language Models via Importance Resampling"):
  * score each document by how much its hashed-unigram feature mass is
  * over-represented in a caller-declared TARGET subset relative to the
  * raw corpus — the domain-targeted data-selection primitive.
  *
  * Exact-integer surrogate (the [[LanguageModel]] log-prob discipline):
  * DSIR's per-feature log-likelihood ratio `log(p_f/q_f)` is replaced
  * by the floor-scaled ratio
  * `ratio_e6(f) = (1e6·(t_f+1)·(R+B)) div ((r_f+1)·(T+B))`
  * (Laplace-smoothed; `t/T` target counts, `r/R` corpus counts, `B`
  * hash buckets) and the document weight by the per-token mean
  * `weight_e6 = (Σ_f c_f·ratio_e6(f)) div n_tokens` — monotone in
  * domain affinity, reproducible bit-for-bit at any partitioning (no
  * log(), no float accumulation order), SQL-derivable for the oracle
  * gate. 1e6 ≈ parity with the corpus; higher = more target-like.
  * Intermediates ride decimal(38,0): the `(t+1)·(R+B)` product and the
  * `Σ c_f·ratio_e6` accumulator both overflow int64 in the 100 TB
  * token regime.
  *
  * Scale shape: ONE explode+hash-agg pass builds the per-doc feature
  * table (`docs × B` bounded, map-combined); the B-row model and its
  * totals re-aggregate from THAT table — the corpus is never
  * rescanned — and broadcast back onto it. Documents with zero
  * non-empty tokens carry no evidence and are absent (the q133
  * contract). `isTarget` is any Boolean column over the input row
  * (e.g. `col("lang") === "en"`), so the target set needs no second
  * scan either.
  */
object Dsir {

  /** Per-document importance weights: `(idCol, n_tokens, weight_e6)`,
    * `weight_e6` long. `buckets` is the feature-hash width B — small
    * keeps the model broadcast-trivial and the oracle cheap; large
    * sharpens the ratio estimates (the published recipe uses 10⁴).
    */
  def weights(docs: DataFrame, idCol: String, textCol: String,
              isTarget: Column, buckets: Int = 64): DataFrame = {
    require(buckets > 0, s"buckets must be positive: $buckets")
    val d38 = "decimal(38,0)"
    val docF = docs
      .select(col(idCol).as("__id"), isTarget.as("__tgt"),
              explode(TextFunctions.words(col(textCol))).as("w"))
      .filter(length(col("w")) > 0)
      .select(col("__id"), col("__tgt"),
              pmod(PortableHash.h32(col("w")), lit(buckets.toLong))
                .as("f"))
      .groupBy(col("__id"), col("__tgt"), col("f"))
      .agg(count(lit(1)).as("c"))
    val m0 = docF.groupBy(col("f"))
      .agg(sum(col("c")).as("rc"),
           sum(when(col("__tgt"), col("c")).otherwise(0L)).as("tc"))
    val tot = m0.agg(sum(col("rc")).as("rtot"), sum(col("tc")).as("ttot"))
    val model = m0.crossJoin(broadcast(tot))
      .select(col("f"), expr(
        s"(CAST(1000000 AS $d38) * (tc + 1) * (rtot + $buckets))" +
          s" div (CAST(rc + 1 AS $d38) * (ttot + $buckets))")
        .as("ratio_e6"))
    docF.join(broadcast(model), Seq("f"))
      .groupBy(col("__id"))
      .agg(sum(col("c")).as("n_tokens"),
           sum(expr(s"CAST(c AS $d38) * ratio_e6")).cast(d38).as("__num"))
      .select(col("__id").as(idCol), col("n_tokens"),
              expr("__num div n_tokens").as("weight_e6"))
  }
}
