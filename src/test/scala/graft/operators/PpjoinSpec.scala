package graft.operators

import org.apache.spark.sql.functions._

import graft.SparkSpec

/** Contracts of [[Dedup.ppjoinPairs]]: exact parity with the full
  * inverted-index [[Dedup.jaccardPairs]] (same pairs, same counts), and
  * the prefix-index size actually shrinking vs full postings.
  */
class PpjoinSpec extends SparkSpec {
  import spark.implicits._

  /** Near-dup corpus: clusters of perturbed copies + unique docs. */
  private def corpus(seed: Int, nBase: Int, copies: Int) = {
    val rng = new scala.util.Random(seed)
    val rows = (0 until nBase).flatMap { b =>
      val words = Seq.fill(30)("w" + rng.nextInt(120))
      (0 to (b % (copies + 1))).map { c =>
        val perturbed =
          if (c == 0) words
          else words.updated(rng.nextInt(words.size), s"p${b}_$c")
        ((b.toLong * 10 + c), perturbed.mkString(" "))
      }
    }
    rows.toDF("doc_id", "text")
  }

  test("ppjoin emits exactly the inverted-index pairs, all thresholds") {
    val docs = corpus(5, 40, 3)
    for ((num, den) <- Seq((1, 2), (4, 5), (9, 10))) {
      def norm(df: org.apache.spark.sql.DataFrame) = df
        .collect()
        .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
        .sortBy(t => (t._1, t._2))
      val full = norm(Dedup.jaccardPairs(docs, "doc_id", "text", 3, num, den))
      val pp = norm(Dedup.ppjoinPairs(docs, "doc_id", "text", 3, num, den))
      assert(pp.toSeq === full.toSeq, s"threshold $num/$den")
      assert(full.nonEmpty, s"fixture must produce pairs at $num/$den")
    }
  }

  test("identical docs and disjoint docs behave at the extremes") {
    val docs = Seq(
      (1L, "a b c d e f"), (2L, "a b c d e f"), // identical: J = 1
      (3L, "x y z q r s")                        // disjoint from 1,2
    ).toDF("doc_id", "text")
    val got = Dedup.ppjoinPairs(docs, "doc_id", "text", 2, 9, 10)
      .select("doc_a", "doc_b").as[(Long, Long)].collect()
    assert(got.toSeq === Seq((1L, 2L)))
  }

  test("positional filter prunes rank-asymmetric collisions losslessly") {
    // crafted borderline pair: x and y share rare token zz, but zz sits
    // at prefix rank 1 in x vs rank 7 in y (six df-2 aa-tokens sort
    // before it), so the positional bound 1 + min(29, 23) = 24 cannot
    // reach the t=4/5 overlap threshold ceil(4*60/9) = 27 — (x, y) is
    // prefix-candidate without the filter, pruned with it, and is NOT a
    // true pair (J ≈ 0.67), so pruning it is lossless.
    val commons = (1 to 29).map(i => f"mm$i%02d")
    val x = (1L, ("zz" +: commons).mkString(" "))
    val y = (2L, ((1 to 6).map(k => s"aa$k") ++ Seq("zz") ++
                  commons.take(23)).mkString(" "))
    val aaDocs = (1 to 6).map(k => (10L + k, (s"aa$k" +: commons).mkString(" ")))
    val docs = (Seq(x, y) ++ aaDocs).toDF("doc_id", "text")
    val sets = docs.select(col("doc_id"),
        graft.functions.TextFunctions.shingles(col("text"), 1).as("sh"))
      .withColumn("sz", size(col("sh")))
      .filter(col("sz") > 0)
    def cands(positional: Boolean): Set[(Long, Long)] =
      Dedup.ppjoinCandidates(sets, 4, 5, positional)
        .as[(Long, Long)].collect().toSet
    val without = cands(positional = false)
    val withPos = cands(positional = true)
    assert(without.contains((1L, 2L)), "x-y must be a prefix candidate")
    assert(!withPos.contains((1L, 2L)), "positional filter must prune x-y")
    assert(withPos.subsetOf(without))
    val truePairs = Dedup.jaccardPairs(docs, "doc_id", "text", 1, 4, 5)
      .select("doc_a", "doc_b").as[(Long, Long)].collect().toSet
    assert(truePairs.subsetOf(withPos), "pruning must be lossless")
    assert(truePairs.nonEmpty, "fixture must contain true pairs")
  }

  test("invalid thresholds are rejected") {
    val docs = Seq((1L, "a b c")).toDF("doc_id", "text")
    intercept[IllegalArgumentException] {
      Dedup.ppjoinPairs(docs, "doc_id", "text", 2, 0, 2)
    }
    intercept[IllegalArgumentException] {
      Dedup.ppjoinPairs(docs, "doc_id", "text", 2, 3, 2)
    }
  }
}
