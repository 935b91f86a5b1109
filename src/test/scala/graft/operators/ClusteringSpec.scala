package graft.operators

import graft.SparkSpec

/** Contracts of [[Clustering.kmeansAssign]]: separable clusters are
  * recovered, assignment ties break to the lower cid, iterations are
  * deterministic, and an emptied centroid keeps its position instead of
  * corrupting the next iteration.
  */
class ClusteringSpec extends SparkSpec {
  import spark.implicits._

  private def vec(base: Float): Array[Float] =
    Array.fill(4)(base)

  test("recovers well-separated clusters (k=2, 4 dims)") {
    // ids 0,1 seed the centroids; points cluster tightly around 0.0 / 10.0
    val df = Seq(
      0L -> vec(0.1f), 1L -> vec(9.9f), 2L -> vec(0.2f), 3L -> vec(10.1f),
      4L -> vec(-0.1f), 5L -> vec(9.8f)).toDF("vec_id", "embedding")
    val got = Clustering.kmeansAssign(df, "vec_id", "embedding",
        k = 2, dims = 4, iters = 3)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(got == Map(0L -> 0L, 2L -> 0L, 4L -> 0L,
                      1L -> 1L, 3L -> 1L, 5L -> 1L), s"got $got")
  }

  test("equidistant point breaks the tie to the lower cid") {
    // centroids land exactly on 0 and 10 after one iteration of the two
    // seed points alone; the probe at 5 is equidistant
    val df = Seq(
      0L -> vec(0f), 1L -> vec(10f), 2L -> vec(5f))
      .toDF("vec_id", "embedding")
    // iters = 0: assignment against the raw seeds (0 and 10); the probe
    // at 5 is equidistant -> cid 0
    val got = Clustering.kmeansAssign(df, "vec_id", "embedding",
        k = 2, dims = 4, iters = 0)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(got(2L) == 0L, s"tie must go to lower cid, got $got")
  }

  test("deterministic across runs") {
    val df = Seq.tabulate(40)(i => i.toLong -> vec((i % 7).toFloat))
      .toDF("vec_id", "embedding")
    def run() = Clustering.kmeansAssign(df, "vec_id", "embedding",
        k = 4, dims = 4, iters = 3)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    assert(run() == run())
  }

  test("an emptied centroid keeps its position across iterations " +
       "(duplicate seed vectors)") {
    // seeds 0 and 1 are IDENTICAL → both init centroids coincide, every
    // point ties to cid 0 (lower-cid tie-break) and cluster 1 never
    // receives a member: its update must keep the seed position, not
    // throw or shrink k (the oracle mirrors this with a COALESCE
    // against the previous round's centroids)
    val df = Seq(
      0L -> vec(0.5f), 1L -> vec(0.5f), 2L -> vec(0.6f), 3L -> vec(0.4f))
      .toDF("vec_id", "embedding")
    val cents = Clustering.kmeansFit(df, "vec_id", "embedding",
                                     k = 2, dims = 4, iters = 2)
    assert(cents.length == 2, "k must not shrink on an emptied cluster")
    assert(cents(1).toSeq == Seq.fill(4)(500000L),
      s"emptied centroid must keep its seed position, got ${cents(1).toSeq}")
    val got = Clustering.kmeansAssign(df, "vec_id", "embedding",
        k = 2, dims = 4, iters = 2)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(got.values.forall(_ == 0L),
      s"all points tie to the lower cid, got $got")
  }

  test("dist2 is the exact quantized squared distance") {
    val df = Seq(0L -> vec(1f), 1L -> vec(2f)).toDF("vec_id", "embedding")
    // iters=0, k=1: centroid = vector 0 (1e6 per dim); vector 1 sits at
    // 2e6 per dim -> dist2 = 4 * (1e6)^2
    val got = Clustering.kmeansAssign(df, "vec_id", "embedding",
        k = 1, dims = 4, iters = 0)
      .collect().map(r => r.getLong(0) -> r.getLong(2)).toMap
    assert(got(0L) == 0L && got(1L) == 4L * 1000000L * 1000000L, s"got $got")
  }
}
