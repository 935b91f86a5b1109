package graft.operators

import org.apache.spark.sql.functions._

import graft.SparkSpec

/** Contracts of [[Membership]]: the bloom is output-invisible (result
  * equals the plain anti-join exactly, at any fpp and on both the
  * broadcast and fallback confirm paths), has no false negatives, and
  * genuinely prunes.
  */
class MembershipSpec extends SparkSpec {

  private def fixture = {
    import spark.implicits._
    // corpus keys: evens 0..1998; batch: 0..999 (half overlap)
    val corpus = (0 until 1000).map(i => (i * 2L, s"c$i")).toDF("k", "cv")
    val batch = (0 until 1000).map(i => (i.toLong, s"b$i")).toDF("k", "bv")
    (corpus, batch)
  }

  private def expectedNew = (0 until 1000).filter(_ % 2 == 1).map(_.toLong)

  test("newKeys equals the plain anti-join (half-overlap fixture)") {
    val (corpus, batch) = fixture
    val got = Membership.newKeys(batch, corpus, "k", 1000L)
      .select("k").collect().map(_.getLong(0)).sorted
    assert(got.toSeq == expectedNew)
  }

  test("bloom is output-invisible at an absurd fpp (0.9) and on the " +
       "cap-0 shuffle fallback") {
    val (corpus, batch) = fixture
    for (cap <- Seq(0L, 1000000L)) {
      val got = Membership.newKeys(batch, corpus, "k", 1000L, fpp = 0.9,
          broadcastKeyCap = cap)
        .select("k").collect().map(_.getLong(0)).sorted
      assert(got.toSeq == expectedNew, s"cap=$cap")
    }
  }

  test("empty corpus: every batch row is new") {
    val (corpus, batch) = fixture
    val got = Membership.newKeys(batch, corpus.filter(lit(false)), "k", 10L)
    assert(got.count() == 1000)
  }

  test("no false negatives; pruning is real at fpp=0.01") {
    val (corpus, batch) = fixture
    val bloom = Membership.buildBloom(corpus, "k", 1000L, 0.01).get
    val probed = batch
      .select(col("k"), Membership.mightContain(bloom, col("k")).as("mc"))
      .collect().map(r => r.getLong(0) -> r.getBoolean(1)).toMap
    // every true member must probe true (bloom never false-negatives)
    (0 until 1000).filter(_ % 2 == 0).map(_.toLong)
      .foreach(k => assert(probed(k), s"false negative for member $k"))
    // pruning: at 1% fpp the 500 non-members must be mostly rejected
    val fps = expectedNew.count(probed(_))
    assert(fps <= 25, s"pruning broken: $fps of 500 non-members passed")
  }
}
