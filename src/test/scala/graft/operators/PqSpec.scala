package graft.operators

import org.apache.spark.sql.functions._

import graft.SparkSpec

/** Contracts of [[Similarity.pqTopK]]: ADC ranking finds the true
  * nearest cluster on separable data, self is excluded, ranks are
  * dense from 1, the result is deterministic, and scoring is one
  * hash aggregate over broadcast lookups (no sort-merge join, no
  * corpus-sized shuffle before the m-row-per-vector aggregate).
  */
class PqSpec extends SparkSpec {
  import spark.implicits._

  // 64-dim vectors in two tight groups around `base` and `base+gap`
  private def vec(base: Float): Array[Float] = Array.fill(64)(base)

  private val corpus = (
    (0L until 20L).map(i => i -> vec(0.1f + 0.001f * i.toInt)) ++
    (20L until 40L).map(i => i -> vec(5.0f + 0.001f * (i - 20).toInt))
  ).toDF("vec_id", "embedding")

  test("queries rank their own tight group first; self excluded") {
    val got = Similarity.pqTopK(corpus, queryPred = col("vec_id") < 2,
                                k = 5)
      .collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getInt(3)))
    assert(got.length == 10, s"2 queries x top-5, got ${got.length}")
    // every neighbor of queries 0/1 must come from the low group
    assert(got.forall { case (_, v, _) => v < 20L }, s"got ${got.toSeq}")
    assert(got.forall { case (q, v, _) => q != v }, "self must be excluded")
    val ranks = got.groupBy(_._1).values.map(_.map(_._3).sorted.toSeq)
    assert(ranks.forall(_ == Seq(1, 2, 3, 4, 5)), s"dense ranks, got $ranks")
  }

  test("deterministic across runs") {
    def run() = Similarity.pqTopK(corpus, queryPred = col("vec_id") === 0L,
                                  k = 3)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSeq
    assert(run() == run())
  }

  test("executed plans: ADC scoring broadcasts the lookup, never " +
       "sort-merges") {
    withCapturedPlans {
      Similarity.pqTopK(corpus, queryPred = col("vec_id") === 0L, k = 3)
        .collect()
    } { plans =>
      val scoring = plans.filter(_.contains("BroadcastHashJoin"))
      assert(scoring.nonEmpty,
        s"ADC lookup must broadcast-join:\n${plans.mkString("\n===\n")}")
      assert(!plans.exists(_.contains("SortMergeJoin")),
        s"no sort-merge anywhere:\n${plans.mkString("\n===\n")}")
    }
  }
}
