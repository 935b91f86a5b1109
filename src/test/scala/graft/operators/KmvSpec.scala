package graft.operators

import org.apache.spark.sql.functions._

import graft.SparkSpec

/** Contracts of the KMV distinct sketch: exact in the under-k regime,
  * within the ±1/√k order-statistic band in the estimator regime
  * (deterministic data → a fixed value, so the band can be asserted
  * without flaking), sketch bounded by k rows, merge-of-slices ≡
  * direct build (min-k is mergeable, idempotent under overlap), and
  * the set-operation estimates hitting their identical/disjoint
  * fixpoints exactly.
  */
class KmvSpec extends SparkSpec {
  import spark.implicits._

  test("under-k regime is EXACT: sketch holds the whole distinct set") {
    val df = (1L to 100L).flatMap(k => Seq(k, k, k)).toDF("k")
    val sk = Kmv.sketch(df, "k", 256)
    assert(sk.count() === 100L)
    val est = Kmv.estimateDistinct(sk, 256)
      .collect().head.getAs[Long]("kmv_est")
    assert(est === 100L)
  }

  test("estimator regime lands within the 1/sqrt(k) band " +
       "(deterministic draw, fixed value)") {
    val n = 20000L
    val df = spark.range(n).select(col("id").as("k"))
    val k = 512
    val est = Kmv.estimateDistinct(Kmv.sketch(df, "k", k), k)
      .collect().head.getAs[Long]("kmv_est")
    // ±3/sqrt(512) ≈ ±13% — generous around the 1-sigma 4.4% band,
    // but the draw is fixed: this asserts THIS value, not a tail risk
    assert(math.abs(est - n) <= n * 0.13,
      s"est=$est for n=$n distinct keys at k=$k")
  }

  test("sketch bounded by k rows; merge of overlapping slices == " +
       "direct build") {
    val df = spark.range(5000).select(col("id").as("k"))
    val k = 128
    val direct = Kmv.sketch(df, "k", k)
    assert(direct.count() === k.toLong)
    val slices = Seq((0L, 2000L), (1500L, 3500L), (3000L, 4999L)).map {
      case (lo, hi) =>
        Kmv.sketch(df.filter(col("k").between(lo, hi)), "k", k)
    }.reduce(_ unionByName _)
    val merged = Kmv.merge(slices, k).orderBy("hv")
      .collect().map(_.getLong(0)).toSeq
    assert(merged === direct.orderBy("hv")
      .collect().map(_.getLong(0)).toSeq)
  }

  test("set ops: identical sets -> jaccard exactly 1e6; disjoint " +
       "sets -> exactly 0") {
    val a = spark.range(3000).select(col("id").as("k"))
    val b = spark.range(3000, 6000).select(col("id").as("k"))
    val k = 256
    val ska = Kmv.sketch(a, "k", k)
    val skb = Kmv.sketch(b, "k", k)
    val same = Kmv.setOps(ska, ska, k).collect().head
    assert(same.getAs[Long]("kmv_jaccard_e6") === 1000000L)
    val disj = Kmv.setOps(ska, skb, k).collect().head
    assert(disj.getAs[Long]("kmv_jaccard_e6") === 0L)
    assert(disj.getAs[Long]("kmv_inter_est") === 0L)
  }

  test("null keys are excluded (COUNT DISTINCT semantics)") {
    val df = spark.sql(
      "SELECT CAST(NULL AS BIGINT) AS k UNION ALL SELECT 1L " +
        "UNION ALL SELECT 2L")
    val sk = Kmv.sketch(df, "k", 16)
    assert(sk.count() === 2L)
    assert(Kmv.estimateDistinct(sk, 16)
      .collect().head.getAs[Long]("kmv_est") === 2L)
  }
}
