package graft.operators

import org.apache.spark.sql.functions._

import graft.SparkSpec

/** Contracts of [[IncrementalAgg.mergeStates]]: the mergeability law
  * (merge of any partition's partials equals the direct aggregate),
  * keys present in only one state, and loud rejection of non-mergeable
  * columns.
  */
class IncrementalAggSpec extends SparkSpec {
  import spark.implicits._

  private val rows = (1L to 300L).map(i =>
    (i, s"k${i % 7}", i * 3 % 101)).toDF("id", "k", "v")

  private def part(df: org.apache.spark.sql.DataFrame) = df
    .groupBy(col("k"))
    .agg(count(lit(1)).as("n_rows"), sum(col("v")).as("sum_v"),
         max(col("v")).as("max_v"), min(col("v")).as("min_v"))

  test("merge(agg(A), agg(B), agg(C)) == agg(A ∪ B ∪ C) for an " +
       "arbitrary 3-way split") {
    val direct = part(rows).collect().map(_.toSeq).toSet
    val merged = IncrementalAgg.mergeStates("k",
        part(rows.filter(col("id") % 3 === 0)),
        part(rows.filter(col("id") % 3 === 1)),
        part(rows.filter(col("id") % 3 === 2)))
      .collect().map(_.toSeq).toSet
    assert(merged === direct)
  }

  test("keys absent from one state still merge (union semantics)") {
    val a = part(rows.filter(col("k") === "k1"))
    val b = part(rows.filter(col("k").isin("k1", "k2")))
    val m = IncrementalAgg.mergeStates("k", a, b)
    assert(m.count() === 2)
  }

  test("non-mergeable columns are rejected loudly") {
    val bad = rows.groupBy(col("k")).agg(avg(col("v")).as("avg_v"))
    val e = intercept[IllegalArgumentException] {
      IncrementalAgg.mergeStates("k", bad, bad)
    }
    assert(e.getMessage.contains("avg_v"))
  }
}
