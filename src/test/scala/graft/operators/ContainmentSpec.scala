package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.SparkSpec

/** Contracts of [[Dedup.containmentPairs]]: exact parity with the naive
  * all-pairs containment join (the filters are pruning, not semantics),
  * directionality, and the doc-inside-doc case Jaccard misses.
  */
class ContainmentSpec extends SparkSpec {
  import spark.implicits._

  /** Corpus with contained fragments: pages + paragraphs cut from them. */
  private def corpus(seed: Int): DataFrame = {
    val rng = new scala.util.Random(seed)
    val rows = (0 until 25).flatMap { b =>
      val words = Seq.fill(60)("w" + rng.nextInt(150))
      val page = (b.toLong * 10, words.mkString(" "))
      // a clean cut (fully contained) and a lightly-edited cut
      val cut = words.slice(10, 30)
      val frag = (b.toLong * 10 + 1, cut.mkString(" "))
      val edited = (b.toLong * 10 + 2,
        cut.updated(5, s"e$b").mkString(" "))
      Seq(page, frag, edited)
    }
    rows.toDF("doc_id", "text")
  }

  private def naive(docs: DataFrame, n: Int, num: Int, den: Int) = {
    val sh = docs.select(col("doc_id"),
      graft.functions.TextFunctions.shingles(col("text"), n).as("sh"))
      .withColumn("sz", size(col("sh"))).filter(col("sz") > 0)
    sh.select(col("doc_id").as("doc_a"), col("sh").as("sh_a"),
              col("sz").as("sz_a"))
      .crossJoin(sh.select(col("doc_id").as("doc_b"), col("sh").as("sh_b"),
                           col("sz").as("sz_b")))
      .filter(col("doc_a") =!= col("doc_b"))
      .withColumn("inter_cnt",
        size(array_intersect(col("sh_a"), col("sh_b"))).cast("long"))
      .filter(col("inter_cnt") * den >= col("sz_a") * num)
      .select(col("doc_a"), col("doc_b"), col("inter_cnt"),
              col("sz_a").cast("long").as("sz_a"),
              col("sz_b").cast("long").as("sz_b"))
  }

  private def norm(df: DataFrame) = df.collect()
    .map(r => (r.getLong(0), r.getLong(1), r.getLong(2),
               r.getLong(3), r.getLong(4)))
    .sortBy(t => (t._1, t._2))

  test("containment pairs match the naive all-pairs join, all thresholds") {
    val docs = corpus(7)
    for ((num, den) <- Seq((1, 2), (4, 5), (9, 10))) {
      val fast = norm(
        Dedup.containmentPairs(docs, "doc_id", "text", 3, num, den))
      val slow = norm(naive(docs, 3, num, den))
      assert(fast.toSeq === slow.toSeq, s"threshold $num/$den")
      assert(slow.nonEmpty, s"fixture must produce pairs at $num/$den")
    }
  }

  test("electKeepers: quality argmax per component, ties to min id, " +
       "singletons keep themselves, bad ids refused") {
    val docs = Seq((1L, 5L), (2L, 9L), (3L, 9L), (4L, 7L))
      .toDF("doc_id", "q")
    // component {1,2,3} (chain), singleton {4}
    val pairs = Seq((1L, 2L), (2L, 3L)).toDF("doc_a", "doc_b")
    val out = Dedup.electKeepers(docs, "doc_id", "q", pairs)
      .collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2),
                 r.getBoolean(3))).sortBy(_._1)
    // keeper of {1,2,3}: quality 9 tie between 2 and 3 -> min id 2
    assert(out.toSeq === Seq(
      (1L, 1L, 2L, false), (2L, 1L, 2L, true), (3L, 1L, 2L, false),
      (4L, 4L, 4L, true)))
    intercept[IllegalArgumentException] {
      Dedup.electKeepers(Seq((-1L, 1L)).toDF("doc_id", "q"),
                         "doc_id", "q", pairs).collect()
    }
  }

  test("containment is directional where Jaccard is blind") {
    // fragment (6 tokens of shingles) inside a much larger page
    val page = (1 to 40).map(i => f"t$i%02d").mkString(" ")
    val frag = (11 to 18).map(i => f"t$i%02d").mkString(" ")
    val docs = Seq((1L, page), (2L, frag)).toDF("doc_id", "text")
    val got = Dedup.containmentPairs(docs, "doc_id", "text", 3, 9, 10)
      .select("doc_a", "doc_b").as[(Long, Long)].collect()
    // only frag→page qualifies; the page is NOT contained in the frag
    assert(got.toSeq === Seq((2L, 1L)))
    // and the symmetric Jaccard on the same pair is far below 9/10
    val j = Dedup.jaccardPairs(docs, "doc_id", "text", 3, 9, 10)
    assert(j.isEmpty)
  }
}
