package graft.operators

import org.apache.spark.sql.functions._

import graft.SparkSpec

class WinnowingSpec extends SparkSpec {
  import spark.implicits._

  test("detection guarantee: a shared run of w + k - 1 words always " +
       "yields a shared fingerprint") {
    // w = 4, k = 3 → any shared 6-word run must surface. Surround the
    // run with disjoint noise so ONLY the run can collide.
    val shared = "the quick brown fox jumps high"
    val docs = Seq(
      (1L, s"alpha beta gamma delta $shared epsilon zeta eta theta"),
      (2L, s"one two three four five $shared six seven eight nine"))
      .toDF("doc_id", "text")
    val a = Winnowing.fingerprints(docs.filter(col("doc_id") === 1),
                                   "doc_id", "text").select("h")
      .collect().map(_.getLong(0)).toSet
    val b = Winnowing.fingerprints(docs.filter(col("doc_id") === 2),
                                   "doc_id", "text").select("h")
      .collect().map(_.getLong(0)).toSet
    assert((a intersect b).nonEmpty,
      "the paper's w+k-1 guarantee must hold on a shared 6-word run")
  }

  test("rightmost tie-break: a repeated identical k-gram selects the " +
       "later position") {
    // every word identical → every k-gram hash identical → each window
    // min must resolve to the window's RIGHTMOST position
    val docs = Seq((1L, "a a a a a a a a")).toDF("doc_id", "text")
    val fps = Winnowing.fingerprints(docs, "doc_id", "text")
      .select("pos").collect().map(_.getLong(0)).toSet
    // 8 words → 6 k-grams (pos 0..5), windows start 0..2, each window
    // of 4 picks its last position: {3, 4, 5}
    assert(fps === Set(3L, 4L, 5L), s"got $fps")
  }

  test("documents with fewer k-grams than the window contribute " +
       "nothing; too-long documents are refused") {
    val docs = Seq((1L, "just five words in here"),  // 3 kgrams < w=4
                   (2L, "x y")).toDF("doc_id", "text")
    assert(Winnowing.fingerprints(docs, "doc_id", "text").count() == 0L)
    val selfPairs = Winnowing.sharedFingerprintPairs(
      docs, "doc_id", "text")
    assert(selfPairs.count() == 0L)
  }

  test("fingerprint density is the ~2/(w+1) winnowing bound, not the " +
       "full k-gram set") {
    val docs = spark.read.parquet(s"$sf/documents.parquet")
      .select("doc_id", "text")
    val nk = docs
      .select(greatest(size(split(col("text"), " ")) - 2, lit(0))
        .as("nk"))
      .agg(sum(col("nk"))).collect()(0).getLong(0)
    val fps = Winnowing.fingerprints(docs, "doc_id", "text").count()
    assert(fps > 0L)
    assert(fps <= nk / 2,
      s"winnowing must select a bounded fraction: $fps of $nk k-grams")
  }
}
