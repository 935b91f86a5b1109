package graft.operators

import graft.SparkSpec

class ClassificationSpec extends SparkSpec {
  import spark.implicits._

  private def tokens(rows: (String, String)*) =
    rows.toDF("lang", "term")

  test("trainCentroids floor-scales per-class term frequencies") {
    // class a: 3 tokens (x x y) -> w(x)=666666, w(y)=333333
    // class b: 2 tokens (y y)   -> w(y)=1000000
    val m = Classification.trainCentroids(
        tokens(("a", "x"), ("a", "x"), ("a", "y"), ("b", "y"), ("b", "y")),
        "lang", "term")
      .collect().map(r => ((r.getString(0), r.getString(1)), r.getLong(2)))
      .toMap
    assert(m === Map(("a", "x") -> 666666L, ("a", "y") -> 333333L,
                     ("b", "y") -> 1000000L))
  }

  test("predictNearestCentroid takes the argmax; ties break low label") {
    val model = Seq(
      ("a", "x", 500000L), ("b", "x", 500000L), // tie on pure-x docs
      ("a", "y", 100000L), ("b", "z", 900000L)
    ).toDF("label", "term", "w_e6")
    val docs = Seq(
      (1L, "x"), (1L, "x"),          // tie 1000000 vs 1000000 -> "a"
      (2L, "x"), (2L, "z"),          // b: 500000+900000 beats a: 500000
      (3L, "q")                      // no term overlap -> absent
    ).toDF("id", "term")
    val out = Classification
      .predictNearestCentroid(docs, "id", "term", model)
      .collect().map(r => (r.getLong(0), r.getString(1), r.getLong(2)))
      .sortBy(_._1)
    assert(out.toSeq === Seq((1L, "a", 1000000L), (2L, "b", 1400000L)))
  }

  test("end-to-end: centroids separate two toy languages exactly") {
    val corpus = Seq(
      (1L, "en", "the cat sat"), (2L, "en", "the dog ran"),
      (3L, "fr", "le chat noir"), (4L, "fr", "le chien brun"),
      (10L, "en", "the cat ran"), (11L, "fr", "le chat brun")
    ).toDF("doc_id", "lang", "text")
    import org.apache.spark.sql.functions._
    val words = corpus.select(col("doc_id"), col("lang"),
      explode(split(col("text"), " ")).as("term"))
    val model = Classification.trainCentroids(
      words.filter(col("doc_id") < 10).select(col("lang"), col("term")),
      "lang", "term")
    val preds = Classification.predictNearestCentroid(
        words.filter(col("doc_id") >= 10)
          .select(col("doc_id"), col("term")),
        "doc_id", "term", model)
      .collect().map(r => (r.getLong(0), r.getString(1))).toMap
    assert(preds === Map(10L -> "en", 11L -> "fr"))
  }
}
