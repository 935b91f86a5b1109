package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.SparkSpec

/** [[Dedup.weightedJaccardPairs]] — the multiplicity-collapsed
  * aggregate-report plan for the shingle family (q273). The
  * load-bearing claim is the EXACT identity: Σ n_pairs per
  * (inter_cnt, union_cnt) equals [[Dedup.jaccardPairs]]'s enumeration
  * grouped the same way, on any input including heavy verbatim
  * multiplicity, zero-shingle docs, and duplicate-free corpora.
  */
class JaccardWeightedSpec extends SparkSpec {

  private def hist(df: DataFrame): Map[(Long, Long), Long] =
    df.groupBy("inter_cnt", "union_cnt")
      .agg(sum("n_pairs").as("n"))
      .collect()
      .map(r => (r.getLong(0), r.getLong(1)) -> r.getLong(2)).toMap

  private def enumHist(docs: DataFrame): Map[(Long, Long), Long] =
    Dedup.jaccardPairs(docs, "doc_id", "text", n = 3, num = 1, den = 2)
      .groupBy("inter_cnt", "union_cnt")
      .agg(count(lit(1)).as("n"))
      .collect()
      .map(r => (r.getLong(0), r.getLong(1)) -> r.getLong(2)).toMap

  private def weightedHist(docs: DataFrame): Map[(Long, Long), Long] =
    hist(Dedup.weightedJaccardPairs(docs, "doc_id", "text",
                                    n = 3, num = 1, den = 2))

  test("collapsed weighted rollup equals the enumeration histogram " +
       "under heavy verbatim multiplicity (q273)") {
    // three near-dup text families with multiplicities 7, 5, 3 plus a
    // loner: the enumeration carries 7·5 + 7·3 + 5·3 cross pairs per
    // qualifying family pair and C(7,2)+C(5,2)+C(3,2) diagonal pairs;
    // the collapse must reproduce every bucket exactly
    val texts = Seq(
      "aa bb cc dd ee ff gg hh",       // family A
      "aa bb cc dd ee ff gg hh ii",    // family B: near A
      "aa bb cc dd ee ff gg hh ii jj", // family C: near B
      "zz yy xx ww vv uu tt ss")       // loner
    val mult = Seq(7, 5, 3, 1)
    val rows = for {
      (t, m) <- texts.zip(mult)
      k <- 0 until m
    } yield (texts.indexOf(t) * 100L + k, t)
    val docs = spark.createDataFrame(rows).toDF("doc_id", "text")
    val expected = enumHist(docs)
    assert(expected.nonEmpty, "fixture must produce qualifying pairs")
    assert(weightedHist(docs) === expected)
  }

  test("zero-shingle docs stay excluded from the diagonal exactly as " +
       "the enumeration excludes them from the postings") {
    // texts shorter than the 3-gram window shingle to empty sets: the
    // enumeration never pairs them (even verbatim copies), so the
    // weighted diagonal must not either
    val rows = Seq(
      (1L, "a b"), (2L, "a b"), (3L, "a b"),      // empty shingle sets
      (4L, "aa bb cc dd"), (5L, "aa bb cc dd"))   // one real family
    val docs = spark.createDataFrame(rows).toDF("doc_id", "text")
    val expected = enumHist(docs)
    assert(weightedHist(docs) === expected)
    // the real family's diagonal C(2,2)=1 pair at J=1 is the only hit
    assert(expected.values.sum === 1L)
  }

  test("duplicate-free corpus: no diagonal rows, weights all 1, " +
       "identical to the enumeration") {
    val rows = Seq(
      (1L, "aa bb cc dd ee ff"),
      (2L, "aa bb cc dd ee gg"),
      (3L, "qq rr ss tt uu vv"))
    val docs = spark.createDataFrame(rows).toDF("doc_id", "text")
    val w = Dedup.weightedJaccardPairs(docs, "doc_id", "text",
                                       n = 3, num = 1, den = 2)
    assert(w.filter(col("doc_a") === col("doc_b")).count() === 0L)
    assert(w.filter(col("n_pairs") =!= 1L).count() === 0L)
    assert(weightedHist(docs) === enumHist(docs))
  }
}
