package graft.operators

import org.apache.spark.sql.functions._

import graft.SparkSpec

/** Contracts of [[Similarity.semDedup]]: the greedy min-id keeper keeps
  * exactly one representative per in-cluster duplicate set, pairs never
  * cross cluster boundaries, and the operator equals the reference
  * composition (kmeansAssign + all-pairs cosine restricted to same
  * cluster) on arbitrary data.
  */
class SemDedupSpec extends SparkSpec {
  import spark.implicits._

  // two directionally distinct groups (constant vectors are all
  // parallel — cosine cannot separate them, so fixtures must differ in
  // DIRECTION, not scale): group A ~ e1, group B ~ e2, with small
  // per-id perturbations keeping in-group cosine ≈ 1 and cross ≈ 0
  private def fixture = Seq(
    0L -> Array(1.0f, 0.01f, 0.0f, 0.0f),
    1L -> Array(0.01f, 1.0f, 0.0f, 0.0f),
    2L -> Array(1.0f, 0.02f, 0.01f, 0.0f),
    3L -> Array(0.02f, 1.0f, 0.01f, 0.0f),
    4L -> Array(1.0f, 0.03f, 0.0f, 0.01f),
    5L -> Array(0.03f, 1.0f, 0.0f, 0.01f)
  ).toDF("vec_id", "embedding")

  test("keeps the min id of each in-cluster duplicate set") {
    val got = Similarity.semDedup(fixture, minSimE6 = 950000L,
        k = 2, dims = 4, iters = 2)
      .collect()
      .map(r => r.getLong(0) -> ((r.getLong(2), r.getBoolean(3)))).toMap
    // group A = {0,2,4}: 0 kept, 2/4 dropped; each saw 2 close neighbors
    // group B = {1,3,5}: 1 kept, 3/5 dropped
    assert(got == Map(
      0L -> ((2L, true)), 2L -> ((2L, false)), 4L -> ((2L, false)),
      1L -> ((2L, true)), 3L -> ((2L, false)), 5L -> ((2L, false))),
      s"got $got")
  }

  test("a vector with no close in-cluster neighbor is kept with n_close 0") {
    // id 6 joins cluster A directionally but below the 0.95 threshold
    val df = fixture.unionAll(
      Seq(6L -> Array(1.0f, 0.5f, 0.0f, 0.0f)).toDF("vec_id", "embedding"))
    val got = Similarity.semDedup(df, minSimE6 = 950000L,
        k = 2, dims = 4, iters = 2)
      .filter(col("vec_id") === 6L).collect().head
    assert(got.getLong(2) == 0L && got.getBoolean(3), s"got $got")
  }

  test("auto-k (k = 0) equals explicit k = ceil(n/targetClusterSize) " +
       "on the same corpus") {
    val df = Seq.tabulate(60) { i =>
      i.toLong -> Array.tabulate(4)(d =>
        (((i * 7 + d * 13) % 11) - 5).toFloat / (1 + (i % 3)).toFloat)
    }.toDF("vec_id", "embedding")
    // n = 60, targetClusterSize = 15 -> derived k = 4
    val auto = Similarity.semDedup(df, minSimE6 = 900000L,
        k = 0, dims = 4, iters = 2, targetClusterSize = 15L)
      .collect().map(r => (r.getLong(0), r.getLong(1),
                           r.getLong(2), r.getBoolean(3))).toSet
    val explicit = Similarity.semDedup(df, minSimE6 = 900000L,
        k = 4, dims = 4, iters = 2)
      .collect().map(r => (r.getLong(0), r.getLong(1),
                           r.getLong(2), r.getBoolean(3))).toSet
    assert(auto == explicit,
      s"diff: ${(auto diff explicit) ++ (explicit diff auto)}")
    // degenerate knobs stay defined: one giant target cluster -> k = 1
    val k1 = Similarity.semDedup(df, minSimE6 = 900000L,
        k = 0, dims = 4, iters = 2, targetClusterSize = 1000000L)
    assert(k1.select("cid").distinct().count() === 1L)
  }

  test("equals the reference composition (assign + all-pairs, " +
       "same-cluster restriction) on arbitrary vectors") {
    val df = Seq.tabulate(60) { i =>
      i.toLong -> Array.tabulate(4)(d =>
        (((i * 7 + d * 13) % 11) - 5).toFloat / (1 + (i % 3)).toFloat)
    }.toDF("vec_id", "embedding")
    val got = Similarity.semDedup(df, minSimE6 = 900000L,
        k = 4, dims = 4, iters = 2)
      .collect().map(r => (r.getLong(0), r.getLong(1),
                           r.getLong(2), r.getBoolean(3))).toSet

    val assign = Clustering.kmeansAssign(df, "vec_id", "embedding",
        k = 4, dims = 4, iters = 2).select("vec_id", "cid")
    val pairs = Similarity.nearDupPairs(df, minSimE6 = 900000L)
      .join(assign.select(col("vec_id").as("vec_a"), col("cid").as("ca")),
            "vec_a")
      .join(assign.select(col("vec_id").as("vec_b"), col("cid").as("cb")),
            "vec_b")
      .filter(col("ca") === col("cb"))
      .select("vec_a", "vec_b")
    val dropSet = pairs.select("vec_b").distinct()
      .collect().map(_.getLong(0)).toSet
    val close = pairs.select(col("vec_a").as("v"))
      .unionAll(pairs.select(col("vec_b").as("v")))
      .groupBy("v").count()
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val want = assign.collect().map { r =>
      val id = r.getLong(0)
      (id, r.getLong(1), close.getOrElse(id, 0L), !dropSet.contains(id))
    }.toSet
    assert(got == want,
      s"diff: ${(got diff want) ++ (want diff got)}")
  }
}
