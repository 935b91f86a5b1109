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

  test("IVF-PQ agrees with full-scan PQ on separable data (the probed " +
       "lists contain the true neighbors) and stays deterministic") {
    // DIRECTIONALLY distinct groups (first-half vs second-half energy) —
    // cosine probing cannot separate merely-parallel magnitude groups,
    // so the `corpus` fixture above (constant vectors) would be a
    // degenerate IVF input by construction
    def dvec(first: Float, second: Float, i: Int): Array[Float] =
      Array.tabulate(64)(d =>
        (if (d < 32) first else second) + 0.001f * i)
    val dirCorpus = (
      (0L until 20L).map(i => i -> dvec(1.0f, 0.01f, i.toInt)) ++
      (20L until 40L).map(i => i -> dvec(0.01f, 1.0f, (i - 20).toInt))
    ).toDF("vec_id", "embedding")
    def key(r: org.apache.spark.sql.Row) =
      (r.getLong(0), r.getLong(1), r.getLong(2))
    val full = Similarity.pqTopK(dirCorpus, queryPred = col("vec_id") < 2,
                                 k = 3)
      .collect().map(key).toSet
    def ivfpq() = Similarity.ivfPqTopK(dirCorpus,
        queryPred = col("vec_id") < 2, k = 3, nCentroids = 4, nProbe = 2)
      .collect().map(key).toSet
    val got = ivfpq()
    // 4 coarse centroids over 2 directions, 2 probes: the query's own
    // direction is always probed, so the ADC top-3 must coincide with
    // the full compressed-domain scan
    assert(got == full, s"ivf-pq $got vs full pq $full")
    assert(ivfpq() == got, "deterministic across runs")
  }

  test("embeddings longer than m*subDims fail fast — never a silent " +
       "prefix scan") {
    val long = Seq(0L -> Array.fill(80)(0.5f), 1L -> Array.fill(80)(0.6f))
      .toDF("vec_id", "embedding")
    val ex = intercept[Exception] {
      Similarity.pqTopK(long, queryPred = col("vec_id") < 1, k = 1)
    }
    def msgs(t: Throwable): List[String] =
      if (t == null) Nil
      else Option(t.getMessage).toList ++ msgs(t.getCause)
    assert(msgs(ex).exists(_.contains("pq: embedding")), s"got $ex")
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
