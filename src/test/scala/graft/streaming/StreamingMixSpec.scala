package graft.streaming

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._

import graft.SparkSpec
import graft.operators.Sampling

/** The maintained mixing shares must equal a batch recompute over
  * everything streamed so far — exactly, per language, down to every
  * Hamilton remainder tie — and replaying a batch must leave the
  * state untouched (the versioned-merge idempotency [[StreamingAgg]]
  * provides).
  */
class StreamingMixSpec extends SparkSpec {
  import spark.implicits._

  private def sharesMap(df: org.apache.spark.sql.DataFrame)
      : Map[String, (Long, Long)] =
    df.collect().map { r =>
      r.getAs[String]("source") ->
        (r.getAs[Long]("n"),
         r.get(r.fieldIndex("quota")).toString.toLong)
    }.toMap

  test("maintained shares ≡ batch recompute after every micro-batch; " +
       "replay is a no-op") {
    val root = java.nio.file.Files
      .createTempDirectory("graft-stream-mix").toString
    implicit val sqlCtx = spark.sqlContext
    val docs = spark.read.parquet(s"$sf/documents.parquet")
      .select(col("doc_id"), col("lang"))
      .collect().map(r => (r.getLong(0), r.getString(1)))
    // three uneven batches over the real corpus; the middle one is
    // small enough that some language is absent from it (the merge
    // must carry absent keys forward unchanged)
    val batches = Seq(docs.take(120), docs.slice(120, 140),
                      docs.drop(140))
    val mem = MemoryStream[(Long, String)]
    val q = StreamingMix.maintain(
      mem.toDS().toDF("doc_id", "lang"), "lang", root).start()
    try {
      var streamed = Array.empty[(Long, String)]
      for (b <- batches) {
        mem.addData(b.toIndexedSeq: _*); q.processAllAvailable()
        streamed ++= b
        val maintained = sharesMap(StreamingMix.sharesFrom(
          StreamingAgg.latestState(spark, root).get._2, 1000000L))
        val recomputed = sharesMap(Sampling.smoothedQuotas(
          streamed.toIndexedSeq.toDF("doc_id", "lang"), "lang",
          1000000L))
        assert(maintained === recomputed,
          s"shares drifted from the recompute at ${streamed.length} docs")
        assert(maintained.values.map(_._2).sum === 1000000L)
      }
      // crash replay of the middle batch under its original id
      val before = StreamingAgg.latestState(spark, root).get._2
        .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
      StreamingAgg.mergeBatch(
        StreamingMix.partials(batches(1).toIndexedSeq
          .toDF("doc_id", "lang"), "lang"),
        batchId = 1L, keyCol = "lang", root = root)
      val after = StreamingAgg.latestState(spark, root).get._2
        .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
      assert(after === before, "replay must be a no-op")
    } finally q.stop()
  }
}
