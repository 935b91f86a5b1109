package graft.streaming

import java.nio.file.Files

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream

import graft.SparkSpec

/** End-to-end contract of [[StreamingDedup]]: micro-batches dedup
  * within-batch (exact), vs-corpus (exact), and vs-corpus (near-dup)
  * before appending, and a replayed batch appends nothing.
  */
class StreamingDedupSpec extends SparkSpec {
  import spark.implicits._

  private def words(lo: Int, hi: Int): String =
    (lo until hi).map(i => s"w$i").mkString(" ")

  test("three-stage dedup across micro-batches; replay is a no-op") {
    val corpusPath = Files.createTempDirectory("graft-sdedup").toString + "/corpus"
    val ckpt = Files.createTempDirectory("graft-sdedup-ckpt").toString

    implicit val sqlCtx = spark.sqlContext
    val mem = MemoryStream[(Long, String)]
    val docs = mem.toDF().toDF("doc_id", "text")
    val q = StreamingDedup.dedupStream(docs, corpusPath, ckpt).start()

    try {
      // batch 1: A(1), B(2), A-dup(3) — within-batch exact dedup keeps 1,2
      mem.addData((1L, words(0, 60)), (2L, "zz yy xx ww vv uu tt ss rr"),
                  (3L, words(0, 60)))
      q.processAllAvailable()
      val after1 = spark.read.parquet(corpusPath)
        .select("doc_id").as[Long].collect().sorted
      assert(after1.toSeq == Seq(1L, 2L), s"batch 1 kept ${after1.toSeq}")

      // batch 2: C(11) near-dup of A (58/59 shingle overlap), D(12) exact
      // dup of B, E(13) genuinely new — only E survives
      mem.addData((11L, words(0, 61)), (12L, "zz yy xx ww vv uu tt ss rr"),
                  (13L, "aa bb cc dd ee ff gg hh ii jj kk ll"))
      q.processAllAvailable()
      val after2 = spark.read.parquet(corpusPath)
        .select("doc_id").as[Long].collect().sorted
      assert(after2.toSeq == Seq(1L, 2L, 13L), s"batch 2 kept ${after2.toSeq}")
    } finally q.stop()

    // replay batch 2's data directly (the foreachBatch crash-replay
    // path, new ids as a replayed source would assign): everything is
    // now an exact or near dup of the corpus — zero appends
    val replay = Seq((21L, words(0, 61)),
                     (22L, "zz yy xx ww vv uu tt ss rr"),
                     (23L, "aa bb cc dd ee ff gg hh ii jj kk ll"))
      .toDF("doc_id", "text")
    val kept = StreamingDedup.dedupAppendBatch(replay, corpusPath)
    assert(kept == 0, "replayed content must all dedup away")
    assert(spark.read.parquet(corpusPath).count() == 3)
  }

  test("within-batch NEAR-dups collapse to one keeper before appending") {
    val corpusPath =
      Files.createTempDirectory("graft-sdedup2").toString + "/corpus"
    // two near-identical docs (59 vs 60 words, J = 58/59) plus one
    // unrelated — first batch ever, so the corpus offers no protection
    val batch = Seq((5L, words(0, 60)), (6L, words(0, 61)),
                    (7L, "qq rr ss tt uu vv ww xx yy zz aa bb"))
      .toDF("doc_id", "text")
    val kept = StreamingDedup.dedupAppendBatch(batch, corpusPath)
    assert(kept == 2, s"near-dup pair must keep one doc, kept $kept")
    val ids = spark.read.parquet(corpusPath)
      .select("doc_id").as[Long].collect().sorted
    assert(ids.toSeq == Seq(5L, 7L), s"min-id keeper expected, got ${ids.toSeq}")
  }
}
