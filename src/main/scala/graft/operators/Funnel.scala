package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Ordered event-sequence (funnel) matching — "which users did
  * view → click → purchase, each stage within `windowUs` of the one
  * before" — the product-analytics conversion query, and a disguised
  * regular-expression match over per-key event streams.
  *
  * Shape: ONE shuffle by key, one per-key sort, then a chain of RUNNING
  * CONDITIONAL MINIMA — stage i's candidate instant at any row is the
  * earliest qualifying stage-i event so far, where "qualifying" reads
  * stage i−1's running minimum on the same row. Running min is
  * monotone non-increasing, and the global first stage-(i−1) instant is
  * already in force at any row that could qualify for stage i, so the
  * per-row gate is exact (proof: at a qualifying stage-i row, the
  * running prev-min EQUALS the global prev stage instant). All stages
  * ride the SAME window spec — Catalyst chains the Window operators
  * over one exchange + sort, no re-shuffle. The final per-key aggregate
  * re-evaluates the same conditionals under `min`, adding nothing to
  * the shuffle.
  *
  * Determinism: the window orders by (`usCol`, `tieBreak`) with a ROWS
  * frame — a total order, so engines cannot disagree on tie frames.
  */
object Funnel {

  /** Per-key funnel depth: 0 = no stage-1 event, k = completed stage k.
    * Output: (keyCol, depth). `stages` are matched in order against
    * `typeCol`; stage i must occur within `windowUs` AFTER (inclusive)
    * the chosen stage i−1 instant.
    */
  def depths(events: DataFrame, keyCol: String, usCol: String,
             typeCol: String, tieBreak: String, stages: Seq[String],
             windowUs: Long): DataFrame = {
    require(stages.size >= 2, s"need >= 2 stages, got ${stages.size}")
    // a repeated name would let one event satisfy both occurrences (the
    // anchoring row's running min equals its own usCol, so stage i+1
    // matches the same event) — reject rather than silently inflate depth
    require(stages.distinct.size == stages.size,
      s"stage names must be distinct, got $stages")
    require(windowUs > 0, s"windowUs must be positive: $windowUs")
    val internal = stages.indices.map(i => s"__m$i").toSet ++
      stages.indices.map(i => s"__t$i") + "depth"
    val clash = events.columns.toSet.intersect(internal)
    require(clash.isEmpty,
      s"depths: input columns collide with internal/output names: $clash")
    val w = Window.partitionBy(col(keyCol))
      .orderBy(col(usCol), col(tieBreak))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)

    def stageCond(i: Int): Column =
      if (i == 0) col(typeCol) === stages(0)
      else col(typeCol) === stages(i) &&
        col(usCol) >= col(s"__m${i - 1}") &&
        col(usCol) <= col(s"__m${i - 1}") + windowUs

    // running conditional minima, each reading the previous stage's
    val chained = stages.indices.dropRight(1).foldLeft(events) {
      case (df, i) => df.withColumn(s"__m$i",
        min(when(stageCond(i), col(usCol))).over(w))
    }
    val ts = stages.indices.map(i =>
      min(when(stageCond(i), col(usCol))).as(s"__t$i"))
    val perKey = chained.groupBy(col(keyCol)).agg(ts.head, ts.tail: _*)
    // deepest non-null stage wins (t_i non-null implies t_{i-1} non-null
    // by construction, so the first hit scanning deepest-first is it)
    val depth = stages.indices.reverse.foldLeft(lit(0L)) {
      case (acc, i) =>
        when(acc === 0 && col(s"__t$i").isNotNull, lit(i + 1L))
          .otherwise(acc)
    }
    perKey.select(col(keyCol), depth.as("depth"))
  }
}
