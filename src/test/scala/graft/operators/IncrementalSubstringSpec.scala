package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Contracts of the incremental (batch-vs-corpus) exact-substring
  * family — [[Dedup.substringGramPostings]] /
  * [[Dedup.incrementalDuplicatedSubstringSpans]] /
  * [[Dedup.removeIncrementalDuplicatedSubstrings]].
  *
  * The headline theorem (r11 verdict #3's "done" gate): when every
  * corpus doc_id orders before every batch doc_id, the incremental
  * spans equal the FULL keep-first recompute over corpus ∪ batch,
  * restricted to batch documents — a batch position is cut iff it is
  * not the union-global first occurrence of its gram, and with corpus
  * ids first, "union-global first" is exactly "in the corpus, else the
  * batch's first".
  */
class IncrementalSubstringSpec extends SparkSpec {
  import spark.implicits._

  private val L = 8

  private def df(rows: Seq[(Long, String)]): DataFrame =
    rows.toDF("doc_id", "text")

  private def spansOf(d: DataFrame): Set[(Long, Long, Long)] =
    d.collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet

  private def incremental(corpus: Seq[(Long, String)],
                          batch: Seq[(Long, String)])
      : Set[(Long, Long, Long)] =
    spansOf(Dedup.incrementalDuplicatedSubstringSpans(
      Dedup.substringGramPostings(df(corpus), "doc_id", "text", L),
      df(batch), "doc_id", "text", L))

  private def fullKeepFirstOnBatch(corpus: Seq[(Long, String)],
                                   batch: Seq[(Long, String)])
      : Set[(Long, Long, Long)] = {
    val batchIds = batch.map(_._1).toSet
    spansOf(Dedup.keepFirstDuplicatedSubstringSpans(
        df(corpus ++ batch), "doc_id", "text", L)
      .filter(col("doc_id").isin(batchIds.toSeq: _*)))
  }

  // corpus ids 1..9 < batch ids 100.. — the precedence precondition
  private val corpus = Seq(
    1L -> "the quick brown fox jumps over the lazy dog tonight",
    2L -> "entirely unrelated corpus material with no repeats",
    3L -> "shared-span ALPHA BRAVO CHARLIE DELTA tail text here")
  private val batch = Seq(
    100L -> "leading words shared-span ALPHA BRAVO CHARLIE DELTA tail",
    101L -> "a batch-only repeated segment XRAY YANKEE ZULU ends one",
    102L -> "b batch-only repeated segment XRAY YANKEE ZULU ends two",
    // no 8-gram of this doc occurs anywhere else (vocab fully disjoint)
    103L -> "zebra quilt vortex mimic jumbo flask ninety kites")

  test("incremental spans == full keep-first recompute on the union, " +
       "restricted to batch docs (corpus ids order first)") {
    assert(incremental(corpus, batch) == fullKeepFirstOnBatch(corpus, batch))
    // and the result is non-trivial: both corpus-hit and batch-only
    // duplication are present in the fixture
    val got = incremental(corpus, batch)
    assert(got.exists(_._1 == 100L), "corpus-precedence cut missing")
    assert(got.exists(s => s._1 == 101L || s._1 == 102L),
           "within-batch cut missing")
  }

  test("corpus precedence: a gram occurring ONCE in the corpus and once " +
       "in the batch is cut from the batch (keep-first on the batch " +
       "alone would keep it)") {
    val spans = incremental(corpus, batch)
    assert(spans.exists(_._1 == 100L))
    val batchOnly = spansOf(Dedup.keepFirstDuplicatedSubstringSpans(
      df(batch), "doc_id", "text", L))
    assert(!batchOnly.exists(_._1 == 100L),
      "fixture broken: doc 100's span must come only from the corpus")
  }

  test("within-batch keep-first: the batch's first occurrence survives, " +
       "the second is cut; clean docs get no spans") {
    val spans = incremental(corpus, batch)
    assert(!spans.exists(_._1 == 101L) && spans.exists(_._1 == 102L),
      s"101 (first) must keep, 102 (second) must cut: $spans")
    assert(!spans.exists(_._1 == 103L))
  }

  test("empty corpus degrades to within-batch keep-first; empty batch " +
       "yields no spans") {
    val noCorpus = incremental(Seq(1L -> "zzzz"), batch)
      // corpus with no gram >= L chars shared
    val pureBatch = spansOf(Dedup.keepFirstDuplicatedSubstringSpans(
      df(batch), "doc_id", "text", L))
    assert(noCorpus == pureBatch)
    assert(incremental(corpus, Seq(200L -> "short")) == Set.empty)
  }

  test("postings state merges incrementally: postings(corpus ++ batch) " +
       "== distinct union of the two postings") {
    val u = Dedup.substringGramPostings(df(corpus ++ batch),
                                        "doc_id", "text", L)
    val m = Dedup.substringGramPostings(df(corpus), "doc_id", "text", L)
      .unionByName(
        Dedup.substringGramPostings(df(batch), "doc_id", "text", L))
      .distinct()
    assert(u.collect().map(_.toSeq).toSet == m.collect().map(_.toSeq).toSet)
  }

  test("apply: cleaned digests equal cutting the full keep-first spans " +
       "on batch docs; corpus docs never appear") {
    val got = Dedup.removeIncrementalDuplicatedSubstrings(
        Dedup.substringGramPostings(df(corpus), "doc_id", "text", L),
        df(batch), "doc_id", "text", L)
      .collect().map(r => (r.getLong(0), r.getString(3))).toMap
    assert(got.keySet == batch.map(_._1).toSet)
    // doc 103 is clean: digest of its own text
    val md = java.security.MessageDigest.getInstance("MD5")
    def md5hex(s: String) = md.digest(s.getBytes("UTF-8"))
      .map("%02x".format(_)).mkString
    assert(got(103L) == md5hex(batch.find(_._1 == 103L).get._2))
    // doc 100's shared span is gone (digest differs from raw text)
    assert(got(100L) != md5hex(batch.find(_._1 == 100L).get._2))
  }
}
