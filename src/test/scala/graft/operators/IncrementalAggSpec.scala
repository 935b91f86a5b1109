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

  test("applyChangelog: update, delete, insert, and latest-wins") {
    val snap = Seq((1L, "a", 10L), (2L, "b", 20L), (3L, "c", 30L))
      .toDF("k", "name", "v")
    val log = Seq(
      (1L, 100L, 1L, "U", 11L), // update k=1
      (1L, 200L, 2L, "U", 12L), // later update wins
      (2L, 100L, 3L, "D", 0L),  // delete k=2
      (5L, 100L, 4L, "U", 50L), // insert k=5
      (6L, 100L, 5L, "D", 0L)   // delete of an absent key: no-op
    ).toDF("k", "ts", "id", "op", "v")
    val out = IncrementalAgg
      .applyChangelog(snap, log, "k", Seq("ts", "id"), "op", "D", Seq("v"))
      .collect()
      .map(r => (r.getLong(0), Option(r.getString(1)),
                 r.getLong(2))).sortBy(_._1)
    assert(out.toSeq === Seq(
      (1L, Some("a"), 12L),  // updated, name survives
      (3L, Some("c"), 30L),  // untouched
      (5L, None, 50L)))      // inserted, no name
  }

  test("applyChangelog: delete-then-reinsert resolves by order; " +
       "null ordering fails loud") {
    val snap = Seq((1L, 1L)).toDF("k", "v")
    val log = Seq((1L, 1L, "D", 0L), (1L, 2L, "U", 9L))
      .toDF("k", "ts", "op", "v")
    val out = IncrementalAgg
      .applyChangelog(snap, log, "k", Seq("ts"), "op", "D", Seq("v"))
      .collect().map(r => (r.getLong(0), r.getLong(1)))
    assert(out.toSeq === Seq((1L, 9L)))
    val badLog = Seq((Option(1L), Option.empty[Long], "U", 5L))
      .toDF("k", "ts", "op", "v")
    val e = intercept[IllegalArgumentException] {
      IncrementalAgg.applyChangelog(snap, badLog, "k", Seq("ts"),
                                    "op", "D", Seq("v"))
    }
    assert(e.getMessage.contains("latest"))
  }
}
