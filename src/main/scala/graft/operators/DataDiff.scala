package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Dataset diff — the regression report run between two versions of a
  * pipeline's output: one row per key with status `added` (key only in
  * the new version), `removed` (only in the old), `changed` (any value
  * column differs, null-safe), or `same`, plus each value column from
  * both sides (`<col>_v1` / `<col>_v2`).
  *
  * One full-outer join on the key — at production scale both versions
  * are written bucketed by the same key, making the join co-located
  * (see [[Bucketing]]); the compare itself is per-row codegen.
  */
object DataDiff {

  def diff(v1: DataFrame, v2: DataFrame, keyCols: Seq[String]): DataFrame = {
    require(keyCols.nonEmpty, "need at least one key column")
    require(v1.columns.toSet == v2.columns.toSet,
      s"schemas differ: ${v1.columns.toSeq} vs ${v2.columns.toSeq}")
    val valCols = v1.columns.filterNot(keyCols.contains).toSeq
    // presence markers survive the outer join where all of a side's
    // nullable value columns cannot
    val a = v1.withColumn("__p1", lit(1))
    val b = v2.withColumn("__p2", lit(1))
    val joined = a.as("a").join(b.as("b"), keyCols, "full_outer")
    val allSame = valCols
      .map(c => col(s"a.$c") <=> col(s"b.$c"))
      .reduceOption(_ && _).getOrElse(lit(true))
    val status = when(col("a.__p1").isNull, lit("added"))
      .when(col("b.__p2").isNull, lit("removed"))
      .when(allSame, lit("same"))
      .otherwise(lit("changed"))
    joined.select(
      keyCols.map(col) ++ Seq(status.as("status")) ++
        valCols.flatMap(c =>
          Seq(col(s"a.$c").as(s"${c}_v1"), col(s"b.$c").as(s"${c}_v2"))): _*)
  }
}
