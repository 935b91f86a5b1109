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

  test("bm25TopK: hand-derived single-term scores; higher tf ranks first") {
    // corpus: 3 docs, all length 2 => dl = avgdl => r_e6 = 1e6 exactly.
    // 'cat' df = 2, N = 3: idf_e6 = (1e6*(2*1+1)) div 5 = 600000.
    // tf=1: term_e6 = 22e12 div (1e7 + 3e6 + 9e6) = 1000000
    //   -> contrib = 600000
    // tf=2 (doc 20, dl=2): r_e6=1e6,
    //   term_e6 = 44e12 div (2e7+3e6+9e6) = 1375000 -> contrib = 825000
    val corpus = Seq(
      (10L, "cat dog"), (20L, "cat cat"), (30L, "dog bird"))
      .toDF("doc_id", "text")
    val got = Search.bm25TopK(corpus, "doc_id", "text",
        Seq("cat"), k = 5)
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2),
                           r.getLong(3)))
    assert(got.toSeq === Seq(
      ("cat", 1L, 20L, 825000L),
      ("cat", 2L, 10L, 600000L)))
  }

  test("bm25TopK: k-boundary ties break ascending doc_id, k truncates") {
    // four identical docs tie exactly; k=3 must keep the three lowest
    // ids in rank order and drop the fourth
    val corpus = Seq(
      (7L, "tie word"), (3L, "tie word"), (9L, "tie word"),
      (5L, "tie word"), (99L, "other text"))
      .toDF("doc_id", "text")
    val got = Search.bm25TopK(corpus, "doc_id", "text",
        Seq("tie"), k = 3)
      .collect().map(r => (r.getLong(1), r.getLong(2)))
    assert(got.toSeq === Seq((1L, 3L), (2L, 5L), (3L, 7L)))
  }

  test("bm25TopK: multi-term union semantics; absent query yields nothing") {
    val corpus = Seq(
      (1L, "alpha beta"), (2L, "alpha alpha"), (3L, "gamma delta"))
      .toDF("doc_id", "text")
    val got = Search.bm25TopK(corpus, "doc_id", "text",
        Seq("alpha delta", "zebra"), k = 5)
      .collect().map(r => (r.getString(0), r.getLong(2)))
    // union: docs 1 and 2 match 'alpha'; doc 3 matches 'delta'
    assert(got.map(_._1).forall(_ == "alpha delta"))
    assert(got.map(_._2).toSet === Set(1L, 2L, 3L))
    assert(Search.bm25TopK(corpus, "doc_id", "text",
      Seq("zebra"), k = 2).count() === 0)
  }

  test("sparseTopK: exact hand-computed dot products, df pruning kills " +
       "the stopword, no-overlap docs never surface") {
    // N = 6, every doc 3 tokens; 'the' (df 6) is pruned at ratio 1/2
    // (df·2 ≤ 6 keeps df ≤ 3); docs 4-6 share no surviving term with
    // the query and must be absent, not zero-scored
    val corpus = Seq(
      (1L, "the apple banana"), (2L, "the apple banana"),
      (3L, "the apple zebra"), (4L, "the cat dog"),
      (5L, "the cat dog"), (6L, "the lion tiger"))
      .toDF("doc_id", "text")
    val got = Search.sparseTopK(corpus, "doc_id", "text",
        Seq(1L).toDF("doc_id"), k = 3, dfNum = 1L, dfDen = 2L)
      .collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getString(3)))
      .sortBy(t => (t._1, t._2))
    // w(d,t) = (1e6·tf·N) div (df·len) = 6e6 div (3·df):
    // apple (df 3) -> 666666, banana (df 2) -> 1000000
    val sApple = BigInt(666666) * 666666
    val sBanana = BigInt(1000000) * 1000000
    assert(got.toSeq === Seq(
      (1L, 1L, 2L, (sApple + sBanana).toString), // shares both terms
      (1L, 2L, 3L, sApple.toString)))            // apple only
  }

  test("sparseTopK: the query doc never scores itself; k bounds rows") {
    val corpus = Seq(
      (1L, "x y"), (2L, "x y"), (3L, "x z"), (4L, "y z"))
      .toDF("doc_id", "text")
    val got = Search.sparseTopK(corpus, "doc_id", "text",
        Seq(1L).toDF("doc_id"), k = 1, dfNum = 1L, dfDen = 1L)
      .collect().map(r => (r.getLong(1), r.getLong(2)))
    assert(got.toSeq === Seq((1L, 2L)))
  }
}
