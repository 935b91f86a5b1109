package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Equi-depth histogram + range-selectivity estimation — the fourth
  * leg of the sketch-planner quartet (join size = [[CountMin]] inner
  * product, membership = [[Bloom]], distinct count = [[Kmv]], range
  * selectivity = here): "how many rows match `v BETWEEN a AND b`"
  * answered from a B-row summary instead of a scan — the estimate a
  * cost-based planner needs for every range predicate it weighs.
  *
  * Construction is DETERMINISTIC at distinct-value granularity (no
  * ntile tie-lottery): distinct values are counted (one map-combined
  * aggregate — the corpus-size-bound work), then value v lands in
  * bucket (cum_before(v) · B) div N. Buckets hold ~N/B rows except
  * where a heavy value overflows one (a value is never split — the
  * skew is visible in the bucket's cnt, which is itself the
  * heavy-hitter witness). Estimation is the textbook uniform-spread
  * interpolation: full buckets count whole, straddled buckets
  * contribute cnt · overlap div width — integer arithmetic only, so
  * an external engine replays the histogram AND every estimate
  * bit-for-bit.
  *
  * Scale shape: the only non-map-combined step is the prefix sum over
  * the DISTINCT-VALUE table, which runs single-partition (a global
  * window) — bounded by the value DOMAIN's cardinality, not the
  * corpus (quantized cents over a price domain cap at millions of
  * rows no matter how many exabytes of facts; for genuinely unbounded
  * real-valued domains, pre-quantize coarser — caller's knob, same
  * determinism). Everything downstream runs on the ≤ B-row histogram:
  * broadcast scale.
  */
object Histogram {

  /** Build the ≤ `buckets`-row equi-depth histogram (bucket, lo, hi,
    * cnt) over an integer-valued column. NULLs are excluded (a range
    * predicate never matches NULL).
    */
  def equiDepth(df: DataFrame, valueCol: String,
                buckets: Int): DataFrame = {
    require(buckets > 0, s"buckets must be positive, got $buckets")
    val grouped = df.filter(col(valueCol).isNotNull)
      .groupBy(col(valueCol).as("v")).agg(count(lit(1)).as("n"))
    val cum = grouped.withColumn("cb",
      sum(col("n")).over(Window.orderBy(col("v"))) - col("n"))
    val total = grouped.agg(sum(col("n")).as("t"))
    cum.crossJoin(broadcast(total))
      .groupBy(expr(s"(cb * $buckets) div t").as("bucket"))
      .agg(min(col("v")).as("lo"), max(col("v")).as("hi"),
        sum(col("n")).as("cnt"))
  }

  /** Estimated rows matching `v BETWEEN a AND b` from the histogram:
    * full buckets whole, straddled buckets by uniform-spread
    * interpolation. One row (`est_rows`), integer arithmetic only.
    */
  def estimateRange(hist: DataFrame, a: Long, b: Long): DataFrame = {
    require(a <= b, s"empty range [$a, $b]: the straddle interpolation" +
      " would go negative — reject loudly instead")
    hist.agg(coalesce(sum(
      when(col("lo") >= a && col("hi") <= b, col("cnt"))
        .otherwise(when(col("hi") >= a && col("lo") <= b,
          expr(s"(cnt * (least(hi, ${b}L) - greatest(lo, ${a}L) + 1))" +
            " div (hi - lo + 1)"))
          .otherwise(lit(0L)))), lit(0L)).as("est_rows"))
  }
}
