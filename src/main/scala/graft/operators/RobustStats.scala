package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Robust distribution statistics: median / MAD / outlier flagging.
  *
  * The data-quality triage a curation pipeline runs per category:
  * mean/stddev outlier rules are themselves dragged by the outliers
  * they hunt; median ± k·MAD is the standard robust alternative, and
  * over integer-scaled values it is EXACT — every statistic is an
  * order statistic (nearest-rank, lower-middle: rank
  * `(n−1) div 2 + 1`), so the whole summary is integer arithmetic a
  * SQL oracle replays and partitioning cannot perturb.
  *
  * Shape: two per-GROUP window sorts (values, then absolute
  * deviations) + two broadcast joins of the 1-row-per-group medians.
  * Groups here are bounded categories (the q103/q136 exact-quantile
  * discipline); at 100 TB with huge groups you'd validate the q40
  * quantile sketches against this exact gate and deploy those.
  */
object RobustStats {

  /** Per-group robust summary: n_rows, median, MAD (median absolute
    * deviation), and the count of outliers — rows with
    * `|x − median| > k·MAD`. All nearest-rank order statistics over
    * the integer `valueCol`; deterministic under ties because rank
    * selection reads the VALUE at a fixed sorted position. A
    * zero MAD (over half the group identical) flags every deviating
    * row — the definition, documented rather than patched.
    */
  def madOutlierSummary(df: DataFrame, groupCol: String, valueCol: String,
                        k: Long): DataFrame = {
    require(k >= 1, s"k must be >= 1: $k")
    val byG = Window.partitionBy(col(groupCol))
    val vals = df.select(col(groupCol), col(valueCol).cast("long").as("__x"))
    val ranked = vals
      .withColumn("__rn", row_number().over(byG.orderBy(col("__x")))
        .cast("long"))
      .withColumn("__n", count(lit(1)).over(byG))
    val med = ranked.filter(expr("__rn = (__n - 1) div 2 + 1"))
      .select(col(groupCol), col("__x").as("__med"), col("__n").as("__nr"))
    val dev = vals
      .join(broadcast(med), Seq(groupCol))
      .withColumn("__dev", abs(col("__x") - col("__med")))
    val mad = dev
      .withColumn("__rn", row_number().over(byG.orderBy(col("__dev")))
        .cast("long"))
      .filter(expr("__rn = (__nr - 1) div 2 + 1"))
      .select(col(groupCol), col("__dev").as("__mad"))
    dev.join(broadcast(mad), Seq(groupCol))
      .groupBy(col(groupCol))
      .agg(max(col("__nr")).as("n_rows"),
           max(col("__med")).as("median"),
           max(col("__mad")).as("mad"),
           sum(when(col("__dev") > col("__mad") * k, 1L).otherwise(0L))
             .as("n_outliers"))
  }
}
