package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Incremental aggregate maintenance — the daily-batch shape: a stored
  * per-key aggregate STATE is merged with a new batch's partial
  * aggregates instead of rescanning the corpus. Correctness rests on
  * mergeability (`merge(agg(A), agg(B)) == agg(A ∪ B)`), which holds for
  * the distributive aggregates encoded here by COLUMN-NAME CONVENTION:
  * `n_*`/`sum_*` columns merge by SUM, `max_*` by MAX, `min_*` by MIN —
  * any other non-key column is rejected loudly rather than silently
  * mis-merged (averages/distincts are NOT mergeable in this form; carry
  * (sum, n) or a sketch instead).
  *
  * Scale shape: the state table is one row per key — merging is a hash
  * agg over `|keys| + |batch keys|` rows, independent of corpus size.
  * That is the whole point: the 100 TB corpus is never re-read.
  */
object IncrementalAgg {

  def mergeStates(keyCol: String, states: DataFrame*): DataFrame = {
    require(states.nonEmpty, "need at least one state")
    val cols = states.head.columns.toSeq
    require(states.forall(_.columns.toSeq == cols),
      "all states must share one schema")
    val aggs = cols.filterNot(_ == keyCol).map { c =>
      if (c.startsWith("n_") || c.startsWith("sum_")) sum(col(c)).as(c)
      else if (c.startsWith("max_")) max(col(c)).as(c)
      else if (c.startsWith("min_")) min(col(c)).as(c)
      else throw new IllegalArgumentException(
        s"column '$c' has no mergeable prefix (n_/sum_/max_/min_)")
    }
    states.reduce(_ unionByName _)
      .groupBy(col(keyCol))
      .agg(aggs.head, aggs.tail: _*)
  }
}
