package graft.operators

import org.apache.spark.sql.functions._

import graft.SparkSpec

/** Contracts of [[Similarity.hardNegatives]]: same-label vectors are
  * excluded no matter how similar, self excluded, ranking by cosine
  * with id tie-break.
  */
class SimilaritySpec extends SparkSpec {
  import spark.implicits._

  test("hardNegatives: excludes self and same-label; ranks the rest " +
       "by cosine") {
    val rows = Seq(
      (0L, Array(1f, 0f, 0f, 0f), 0),  // the query
      (1L, Array(1f, 0f, 0f, 0f), 0),  // identical but same label → out
      (2L, Array(0.9f, 0.1f, 0f, 0f), 1), // best different-label
      (3L, Array(0f, 1f, 0f, 0f), 1),     // orthogonal
      (4L, Array(0.9f, 0.1f, 0f, 0f), 2)) // ties on cos with 2 → id order
    val emb = rows.toDF("vec_id", "embedding", "label")
    val queries = emb.filter(col("vec_id") === 0)
      .select(col("vec_id").as("qid"), col("embedding").as("qv"),
              col("label").as("qlabel"))
    val got = Similarity.hardNegatives(emb, queries, k = 10)
      .select("neighbor_id", "rnk").collect()
      .map(r => (r.getLong(0), r.getInt(1))).sortBy(_._2)
    assert(got.toSeq === Seq((2L, 1), (4L, 2), (3L, 3)),
      s"got ${got.toSeq}")
  }

  test("hardNegatives: a query whose every neighbor shares its label " +
       "yields no rows") {
    val emb = Seq(
      (0L, Array(1f, 0f), 7), (1L, Array(0.5f, 0.5f), 7),
      (2L, Array(0f, 1f), 7)).toDF("vec_id", "embedding", "label")
    val queries = emb.filter(col("vec_id") === 0)
      .select(col("vec_id").as("qid"), col("embedding").as("qv"),
              col("label").as("qlabel"))
    assert(Similarity.hardNegatives(emb, queries, k = 3).count() === 0)
  }

  test("mutualTopK emits exactly the reciprocal subset of the " +
       "one-sided top-k lists") {
    val emb = spark.read.parquet(s"$sf/embeddings.parquet")
    // one-sided lists via the gated annTopK path, every vector a query
    val oneSided = Similarity.annTopK(emb, queryPred = lit(true), k = 3)
      .select("qid", "neighbor_id").collect()
      .map(r => (r.getLong(0), r.getLong(1)))
    val top = oneSided.groupBy(_._1).view
      .mapValues(_.map(_._2).toSet).toMap
    val expected = oneSided.collect {
      case (a, b) if a < b && top.getOrElse(b, Set.empty).contains(a) =>
        (a, b)
    }.toSet
    val got = Similarity.mutualTopK(emb, k = 3)
      .select("vec_a", "vec_b").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(got.forall { case (a, b) => a < b })
    assert(got === expected,
      s"only-got=${got -- expected} only-expected=${expected -- got}")
    assert(expected.nonEmpty, "fixture must produce mutual pairs")
  }

  test("mutualTopK targetBucketDocs ≡ the explicitly-derived plane " +
       "count, and identical copies stay mutual under it") {
    val emb = spark.read.parquet(s"$sf/embeddings.parquet")
    val n = emb.count()
    // replicate autoPlanes: raise p from the default 4 until expected
    // occupancy n/2^p is at most the target
    var p = 4
    while (p < 30 && (n >> p) > 8L) p += 1
    assert(p > 4, "fixture must actually trigger the auto-raise")
    val auto = Similarity.mutualTopK(emb, k = 3, targetBucketDocs = 8L)
      .collect().map(_.toSeq).toSet
    val explicit = Similarity.mutualTopK(emb, k = 3, planesPerTable = p)
      .collect().map(_.toSeq).toSet
    assert(auto === explicit,
      "auto mode must be exactly the derived explicit config")
    // exact copies agree on every sign bit, so a duplicated vector and
    // its twin must survive any plane count as a mutual pair
    val twin = emb.limit(1)
      .select((col("vec_id") + 1000000L).as("vec_id"), col("embedding"),
              col("label"))
    val baseId = emb.limit(1).select("vec_id").collect()(0).getLong(0)
    val withTwin = emb.unionByName(twin)
    val pairs = Similarity
      .mutualTopK(withTwin, k = 3, targetBucketDocs = 8L)
      .filter(col("vec_a") === baseId &&
              col("vec_b") === baseId + 1000000L)
    assert(pairs.count() == 1L,
      "an identical copy must remain a mutual pair under auto planes")
  }
}
