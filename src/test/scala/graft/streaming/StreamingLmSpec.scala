package graft.streaming

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._

import graft.SparkSpec
import graft.operators.LanguageModel

/** The maintained bigram model must equal a batch retrain over
  * everything streamed so far — exactly, per bigram — and replaying a
  * batch must leave the state untouched (the versioned-merge
  * idempotency [[StreamingAgg]] provides).
  */
class StreamingLmSpec extends SparkSpec {
  import spark.implicits._

  test("maintained model ≡ batch retrain after every micro-batch; " +
       "replay is a no-op") {
    val root = java.nio.file.Files
      .createTempDirectory("graft-stream-lm").toString
    implicit val sqlCtx = spark.sqlContext
    val docs = spark.read.parquet(s"$sf/documents.parquet")
      .select(col("doc_id"), col("text"))
      .collect().map(r => (r.getLong(0), r.getString(1)))
    // three uneven batches over the real corpus
    val batches = Seq(docs.take(100), docs.slice(100, 150),
                      docs.drop(150))
    val mem = MemoryStream[(Long, String)]
    val q = StreamingLm.maintain(
      mem.toDS().toDF("doc_id", "text"), "doc_id", "text", root).start()
    try {
      var streamed = Array.empty[(Long, String)]
      for (b <- batches) {
        mem.addData(b.toIndexedSeq: _*); q.processAllAvailable()
        streamed ++= b
        val maintained = StreamingLm.modelFrom(
            StreamingAgg.latestState(spark, root).get._2)
          .collect()
          .map(r => (r.getString(0), r.getString(1)) -> r.getLong(2))
          .toMap
        val retrained = LanguageModel.bigramModel(
            LanguageModel.docBigrams(streamed.toIndexedSeq
              .toDF("doc_id", "text"), "doc_id", "text"))
          .collect()
          .map(r => (r.getString(0), r.getString(1)) -> r.getLong(2))
          .toMap
        assert(maintained === retrained,
          s"model drifted from the retrain at ${streamed.length} docs")
      }
      // crash replay of the middle batch under its original id
      val before = StreamingAgg.latestState(spark, root).get._2
        .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
      StreamingAgg.mergeBatch(
        StreamingLm.partials(batches(1).toIndexedSeq
          .toDF("doc_id", "text"), "doc_id", "text"),
        batchId = 1L, keyCol = "bg", root = root)
      val after = StreamingAgg.latestState(spark, root).get._2
        .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
      assert(after === before, "replay must be a no-op")
    } finally q.stop()
  }
}
