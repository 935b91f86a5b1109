package graft.operators

import org.apache.spark.sql.functions._

import graft.SparkSpec

/** Contracts of [[LanguageModel]]: hand-computed scores on a tiny
  * corpus, exact-integer bounds, and the sub-2-token exclusion rule.
  */
class LanguageModelSpec extends SparkSpec {
  import spark.implicits._

  test("scores match hand-derived bigram conditional probabilities") {
    // doc1 = (a,b),(b,a),(a,b); doc2 = (a,b),(b,a),(a,c)
    // c2: (a,b)=3 (b,a)=2 (a,c)=1 ; c1: a=4, b=2
    // p_e6: (a,b)=750000, (b,a)=1000000, (a,c)=250000
    // doc1: (750000+1000000+750000)/3 = 2500000/3 = 833333
    // doc2: (750000+1000000+250000)/3 = 2000000/3 = 666666
    val docs = Seq(
      (1L, "a b a b"),
      (2L, "a b a c"),
      (3L, "solo")       // 1 token: excluded
    ).toDF("doc_id", "text")
    val got = LanguageModel.scoreDocuments(docs, "doc_id", "text")
      .orderBy("doc_id")
      .collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    assert(got.toSeq === Seq((1L, 3L, 833333L), (2L, 3L, 666666L)))
  }

  test("scores are exact integers in [0, 1e6] and partition-invariant") {
    val docs = (0L until 60L)
      .map(i => (i, (0 to 20).map(j => "t" + ((i * 7 + j) % 13)).mkString(" ")))
      .toDF("doc_id", "text")
    val s1 = LanguageModel.scoreDocuments(docs, "doc_id", "text")
    val rows = s1.collect()
    assert(rows.length === 60)
    assert(rows.forall { r =>
      val sc = r.getAs[Long]("score_e6"); sc >= 0L && sc <= 1000000L
    })
    val s2 = LanguageModel
      .scoreDocuments(docs.repartition(7), "doc_id", "text")
      .collect()
    assert(s2.map(r => (r.getLong(0), r.getLong(2))).sortBy(_._1).toSeq ===
           rows.map(r => (r.getLong(0), r.getLong(2))).sortBy(_._1).toSeq)
  }

  test("a uniformly-predictable corpus scores 1e6 everywhere") {
    // every token's only continuation is itself -> all p_e6 = 1e6
    val docs = Seq((1L, "x x x x"), (2L, "x x")).toDF("doc_id", "text")
    val got = LanguageModel.scoreDocuments(docs, "doc_id", "text")
      .orderBy("doc_id").collect()
    assert(got.map(_.getLong(2)).toSeq === Seq(1000000L, 1000000L))
  }
}
