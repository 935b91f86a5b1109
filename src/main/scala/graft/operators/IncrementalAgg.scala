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

  /** CHANGELOG MERGE — the batch MERGE INTO: apply a keyed
    * upsert/delete log to a snapshot and return the next snapshot.
    * Per key, the log's LATEST row (by `ordCols`, lexicographic,
    * deterministic — supply a tiebreaker) wins: op == `deleteOp`
    * removes the key, any other op upserts `payloadCols` (update if
    * the key exists, insert otherwise; snapshot columns outside the
    * payload survive updates and are null on inserts).
    *
    * Plan shape: latest-per-key is ONE max(struct(ord…, op, payload…))
    * hash aggregate — map-side combinable, shuffling ~1 row per
    * changed key (the q44 discipline; a row_number window would sort
    * the whole log) — followed by ONE full-outer join on the key. At
    * 100 TB the snapshot shuffles once by key; with both sides
    * bucketed by key even that exchange disappears.
    *
    * Ordering columns must be non-null (null orders break "latest");
    * enforced per-batch with a cheap control-plane count.
    */
  def applyChangelog(snapshot: DataFrame, log: DataFrame, keyCol: String,
                     ordCols: Seq[String], opCol: String,
                     deleteOp: String,
                     payloadCols: Seq[String]): DataFrame = {
    require(ordCols.nonEmpty, "need at least one ordering column")
    val badOrd = log.filter(ordCols.map(col(_).isNull).reduce(_ || _))
      .limit(1).count()
    require(badOrd == 0,
      s"changelog has null ordering values in ${ordCols.mkString(",")} " +
        "— 'latest' is undefined; repair or filter the log first")
    val packed = (ordCols.map(col) :+ col(opCol)) ++ payloadCols.map(col)
    val latest = log
      .groupBy(col(keyCol).as("__k"))
      .agg(max(struct(packed: _*)).as("__top"))
      .select(
        (Seq(col("__k"), col(s"__top.$opCol").as("__op")) ++
          payloadCols.map(c => col(s"__top.$c").as(s"__new_$c"))): _*)
    val joined = snapshot.join(
      latest, snapshot(keyCol) === latest("__k"), "full_outer")
    val untouched = snapshot.columns
      .filterNot(c => c == keyCol || payloadCols.contains(c))
    val outCols =
      coalesce(snapshot(keyCol), col("__k")).as(keyCol) +:
        (untouched.map(c => snapshot(c).as(c)) ++
          payloadCols.map(c =>
            when(col("__op").isNotNull, col(s"__new_$c"))
              .otherwise(snapshot(c)).as(c)))
    joined
      .filter(col("__op").isNull || col("__op") =!= deleteOp)
      .select(outCols: _*)
  }
}
