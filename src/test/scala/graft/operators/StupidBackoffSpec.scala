package graft.operators

import graft.SparkSpec

/** Contract of [[LanguageModel.stupidBackoffScores]]: all four branches
  * (trigram hit, bigram back-off, unigram back-off, OOV) exercised and
  * hand-verified on one fixture, plus the zero-fill for short docs.
  */
class StupidBackoffSpec extends SparkSpec {
  import spark.implicits._

  test("hand fixture: every branch fires with the exact floor values") {
    // train: trigrams {abc:2, bca:1, cab:1}; bigrams {ab:2, bc:2, ca:1};
    // unigrams {a:2, b:2, c:2}; N = 6
    val train = Seq((0L, "a b c a b c")).toDF("doc_id", "text")
    val score = Seq(
      (1L, "x a b c x b"), // (x,a,b)→bo1; (a,b,c)→hit; (b,c,x)→oov;
                           // (c,x,b)→bo2
      (3L, "a")            // < 3 tokens → zero row
    ).toDF("doc_id", "text")
    val got = LanguageModel.stupidBackoffScores(
        train, score, "doc_id", "text")
      .collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3),
                 r.getLong(4), r.getLong(5)))
      .sortBy(_._1).toSeq
    // hit: 1e6*2/2 = 1000000
    // bo1 (x,a,b): 2*((1e6*2)//2)//5 = 400000
    // bo2 (c,x,b): 4*((1e6*2)//6)//25 = 4*333333//25 = 53333
    // oov (b,c,x): 0
    // mean: (1000000+400000+53333+0)//4 = 363333
    assert(got == Seq((1L, 4L, 1L, 1L, 1L, 363333L),
                      (3L, 0L, 0L, 0L, 0L, 0L)))
  }
}
