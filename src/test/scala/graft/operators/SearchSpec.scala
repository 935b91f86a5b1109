package graft.operators

import graft.SparkSpec

/** Contracts of [[Search.phraseSearch]]: posting-intersection candidates
  * verified to word boundaries — all-tokens-present-but-not-adjacent is
  * rejected, substring-of-a-word is rejected, position is 1-based first
  * occurrence.
  */
class SearchSpec extends SparkSpec {
  import spark.implicits._

  private val docs = Seq(
    (1L, "the quick brown fox"),
    (2L, "quick the fox brown"),      // all tokens, wrong order
    (3L, "thequick brown fox here"),  // 'quick' only inside a word
    (4L, "x the quick brown fox and the quick brown fox")) // repeats
    .toDF("doc_id", "text")

  test("phrase hits need adjacency and word boundaries, not just tokens") {
    val got = Search.phraseSearch(docs, "doc_id", "text",
        Seq("the quick brown", "fox brown"))
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2)))
      .sortBy(t => (t._1, t._2))
    assert(got.toSeq === Seq(
      ("fox brown", 2L, 11L),
      ("the quick brown", 1L, 1L),
      ("the quick brown", 4L, 3L)), s"got ${got.toSeq}")
  }

  test("a phrase with an out-of-vocabulary token yields nothing") {
    assert(Search.phraseSearch(docs, "doc_id", "text",
      Seq("quick zebra")).count() === 0)
  }

  test("blank phrases are rejected") {
    intercept[IllegalArgumentException] {
      Search.phraseSearch(docs, "doc_id", "text", Seq("  "))
    }
  }
}
