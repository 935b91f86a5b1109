package graft.streaming

import java.nio.file.Files

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._

import graft.SparkSpec
import graft.queries.CurationQueries

/** End-to-end contract of [[StreamingCuration]] (r13 verdict #6): after
  * EVERY micro-batch, the streamed 11-stage ledger equals
  * `q269`'s batch DAG run over the union of every document seen so
  * far — row for row — and a crash replay of a processed batch is a
  * no-op (identical ledger, identical state).
  */
class StreamingCurationSpec extends SparkSpec {

  private val SfDir = "/root/testdata/sf0.001"

  private def docs: DataFrame =
    graft.Tables.documents(spark, SfDir)
      .select("doc_id", "lang", "source", "text")

  private def ledgerRows(df: DataFrame): Seq[(Long, String, Long, Long, Long)] =
    df.orderBy("stage_idx").collect().map(r =>
      (r.getLong(0), r.getString(1), r.getLong(2), r.getLong(3),
       r.getLong(4))).toSeq

  test("per-batch ledger equals the batch DAG over the union after " +
       "EVERY batch; replay is a no-op") {
    val root = Files.createTempDirectory("graft-scur").toString
    val parts = (0 until 3).map(k => docs.filter(col("doc_id") % 3 === k))
    var union: DataFrame = null
    parts.zipWithIndex.foreach { case (b, k) =>
      val ledger = StreamingCuration.curationBatch(b, root, k.toLong)
      union = if (union == null) b else union.unionByName(b)
      val expected =
        ledgerRows(CurationQueries.curationDagLedger(spark, union))
      assert(ledgerRows(ledger) === expected,
        s"batch $k: streamed ledger diverged from the union batch DAG")
    }
    // crash replay of the LAST batch (same batch id, same input): the
    // state versions rewrite from the same (predecessor, batch) pair,
    // so ledger and stage-3 state must come back identical
    val stateBefore = spark.read.parquet(s"$root/stage3/batch=2")
      .orderBy("doc_id").collect().toSeq
    val replayed = StreamingCuration.curationBatch(parts(2), root, 2L)
    assert(ledgerRows(replayed) ===
      ledgerRows(CurationQueries.curationDagLedger(spark, union)))
    val stateAfter = spark.read.parquet(s"$root/stage3/batch=2")
      .orderBy("doc_id").collect().toSeq
    assert(stateAfter === stateBefore, "replay must not change state")
  }

  test("the foreachBatch stream wires the same per-batch pipeline " +
       "(MemoryStream, two batches, ledger table versioned per batch)") {
    val root = Files.createTempDirectory("graft-scur-stream").toString
    val ckpt = Files.createTempDirectory("graft-scur-ckpt").toString
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val mem = MemoryStream[(Long, String, String, String)]
    val stream = mem.toDF().toDF("doc_id", "lang", "source", "text")
    val batches = (0 until 2).map(k =>
      docs.filter(col("doc_id") % 2 === k)
        .collect().map(r => (r.getLong(0), r.getString(1),
                             r.getString(2), r.getString(3))).toSeq)
    val q = StreamingCuration.curationStream(stream, root, ckpt).start()
    try {
      mem.addData(batches(0): _*)
      q.processAllAvailable()
      mem.addData(batches(1): _*)
      q.processAllAvailable()
    } finally q.stop()
    // after both batches the latest ledger equals the batch DAG on all docs
    val led = spark.read.parquet(s"$root/ledger/batch=1")
    assert(ledgerRows(led) ===
      ledgerRows(CurationQueries.curationDagLedger(spark, docs)))
    // and the intermediate version equals the DAG on batch 0 alone
    val led0 = spark.read.parquet(s"$root/ledger/batch=0")
    assert(ledgerRows(led0) === ledgerRows(
      CurationQueries.curationDagLedger(
        spark, docs.filter(col("doc_id") % 2 === 0))))
  }
}
