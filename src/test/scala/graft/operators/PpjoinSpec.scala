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
