package graft.operators

import org.apache.spark.sql.functions._

import graft.SparkSpec

/** Contracts of [[Dedup.incrementalMinhashPairs]] (batch-vs-corpus dedup):
  * cross pairs only, exact recall at the verified threshold, and the
  * asymmetric plan shape (batch broadcasts; the corpus side never enters
  * a sort-merge join).
  */
class IncrementalDedupSpec extends SparkSpec {

  /** words 0..k-1 as a text — Jaccard between two such texts is easy to
    * reason about: prefix(k) vs prefix(m), k ≤ m, shares k−2 of m−2
    * 3-gram shingles.
    */
  private def prefixText(k: Int): String =
    (0 until k).map(i => s"w$i").mkString(" ")

  private def fixture = {
    import spark.implicits._
    // corpus: ids 1..4; batch: ids 101..103 (disjoint id spaces)
    // - 101 is a near-dup of 1 (49 of 50 shingles shared → J = 49/50)
    //   and of nothing else
    // - 102 is IDENTICAL to 103's text — a within-batch dup that must NOT
    //   be emitted — and unrelated to the corpus
    // - 2,3,4 are mutual corpus near-dups (not the operator's business)
    val corpus = Seq(
      (1, prefixText(52)),
      (2, prefixText(500)),
      (3, prefixText(499)),
      (4, prefixText(498))).toDF("doc_id", "text")
    val batch = Seq(
      (101, prefixText(51)),
      (102, "zz aa bb cc dd ee ff gg hh"),
      (103, "zz aa bb cc dd ee ff gg hh")).toDF("doc_id", "text")
    (corpus, batch)
  }

  private def runPairs(cap: Long): Map[(Long, Long), (Long, Long)] = {
    val (corpus, batch) = fixture
    Dedup.incrementalMinhashPairs(corpus, batch, "doc_id", "text",
        n = 3, num = 4, den = 5, broadcastPairCap = cap)
      .collect()
      .map(r => (r.getAs[Any]("batch_id").toString.toLong,
                 r.getAs[Any]("corpus_id").toString.toLong) ->
                (r.getAs[Long]("inter_cnt"), r.getAs[Long]("union_cnt")))
      .toMap
  }

  test("emits exactly the cross near-dup pairs — never within-batch or " +
       "within-corpus pairs") {
    val pairs = runPairs(Dedup.DefaultBroadcastPairCap)
    // prefix(51) vs prefix(52): 49 vs 50 shingles, 49 shared →
    // J = 49/50 ≥ 4/5; no other (batch, corpus) pair comes close
    assert(pairs == Map((101L, 1L) -> (49L, 50L)),
      s"expected the single cross pair, got $pairs")
  }

  test("oversized-batch fallback (cap 0) produces identical pairs via " +
       "shuffle joins") {
    assert(runPairs(0L) == Map((101L, 1L) -> (49L, 50L)))
  }

  test("broadcast path: no sort-merge join anywhere; banding + verify " +
       "probe via broadcast hash joins") {
    withCapturedPlans {
      runPairs(Dedup.DefaultBroadcastPairCap)
    } { planList =>
      val plans = planList.mkString("\n===\n")
      assert(!plans.contains("SortMergeJoin"),
        s"corpus side must never sort-merge on the broadcast path:\n$plans")
      assert(plans.contains("BroadcastHashJoin"),
        s"batch banding / candidates must broadcast:\n$plans")
    }
  }
}
