package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Table profiling — the ANALYZE/data-quality summary a pipeline runs
  * before trusting a new drop: per column, row count, null count, exact
  * distinct count, and min/max (computed on the NATIVE type, then
  * rendered as strings so mixed column types share one output schema).
  *
  * One aggregate job over the scan. Exact multi-column distinct counts
  * make Spark plan an Expand (each input row fans out once per profiled
  * column before the partial aggregate) — the standard exact shape, linear
  * in rows × profiled columns and map-side combined. At web scale swap
  * `countDistinct` for `approx_count_distinct` (HLL, one row per input,
  * no Expand) when ±2% suffices; the rest of the profile is unchanged.
  */
object Profiling {

  def profile(df: DataFrame, cols: Seq[String]): DataFrame = {
    require(cols.nonEmpty, "profile needs at least one column")
    val aggs = cols.flatMap { c =>
      Seq(count(col(c)).as(s"__cnt_$c"),
          countDistinct(col(c)).as(s"__nd_$c"),
          min(col(c)).cast("string").as(s"__min_$c"),
          max(col(c)).cast("string").as(s"__max_$c"))
    }
    val one = df.agg(count(lit(1)).as("__n_rows"), aggs: _*)
    val rows = cols.map { c =>
      struct(lit(c).as("col_name"),
             col("__n_rows").as("n_rows"),
             (col("__n_rows") - col(s"__cnt_$c")).as("n_null"),
             col(s"__nd_$c").as("n_distinct"),
             col(s"__min_$c").as("min_val"),
             col(s"__max_$c").as("max_val"))
    }
    one.select(explode(array(rows: _*)).as("s")).select("s.*")
  }
}
