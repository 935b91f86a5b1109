package graft.streaming

import java.nio.file.Files

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._

import graft.SparkSpec
import graft.operators.Similarity

/** Batch-parity gates of [[StreamingAnn]]: the incrementally maintained
  * bucket table equals a from-scratch `lshBuckets` over the accumulated
  * corpus ROW FOR ROW, queries through the stored index reproduce
  * `Similarity.annTopK` exactly, and a replayed batch id is a no-op
  * (the batch-versioned overwrite discipline).
  */
class StreamingAnnSpec extends SparkSpec {
  import spark.implicits._

  private val Tables = 8
  private val Planes = 4

  // deterministic direction-diverse vectors (the SemDedupSpec recipe),
  // 64-dim to match lshBuckets' hyperplane width
  private def vec(i: Long): Array[Float] =
    Array.tabulate(64)(d =>
      (((i * 7 + d * 13) % 11) - 5).toFloat / (1 + (i % 3)).toFloat)

  private def batchDf(ids: Seq[Long]) =
    ids.map(i => (i, vec(i))).toDF("vec_id", "embedding")

  test("incremental bucket table == from-scratch lshBuckets; index " +
       "queries == batch annTopK; batchId replay is a no-op") {
    val root = Files.createTempDirectory("graft-sann").toString
    val corpusPath = s"$root/corpus"
    val bucketPath = s"$root/buckets"

    // three micro-batches (the middle one contains a within-batch
    // duplicate id, which must keep one row)
    val n1 = StreamingAnn.annAppendBatch(batchDf(0L until 20L), 0L,
      corpusPath, bucketPath, Tables, Planes)
    val n2 = StreamingAnn.annAppendBatch(
      batchDf(Seq(20L, 21L, 22L, 23L, 23L)), 1L,
      corpusPath, bucketPath, Tables, Planes)
    val n3 = StreamingAnn.annAppendBatch(batchDf(24L until 60L), 2L,
      corpusPath, bucketPath, Tables, Planes)
    assert(n1 === 20L && n2 === 4L && n3 === 36L)

    val corpus = StreamingAnn.readCorpus(spark, corpusPath)
    assert(corpus.count() === 60L)

    // parity 1: the accumulated index IS lshBuckets(accumulated corpus)
    val got = StreamingAnn.readBuckets(spark, bucketPath)
      .collect().map(r => (r.getLong(0), r.getInt(1), r.getLong(2))).toSet
    val want = Similarity.lshBuckets(corpus, Tables, Planes)
      .collect().map(r => (r.getLong(0), r.getInt(1), r.getLong(2))).toSet
    assert(got === want,
      s"bucket drift: ${(got diff want) ++ (want diff got)}")

    // parity 2: corpus members replayed as queries reproduce annTopK
    val queries = corpus.filter(col("vec_id") < 5)
      .select(col("vec_id").as("qid"), col("embedding").as("qv"))
    val inc = StreamingAnn.topKAgainstIndex(queries, corpusPath,
        bucketPath, k = 3, Tables, Planes)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getInt(2),
                           r.getLong(3))).toSet
    val batch = Similarity.annTopK(corpus, col("vec_id") < 5, k = 3,
        Tables, Planes)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getInt(2),
                           r.getLong(3))).toSet
    assert(inc === batch,
      s"answer drift: ${(inc diff batch) ++ (batch diff inc)}")

    // replay: same batchId, same data -> overwrite, not append
    val nReplay = StreamingAnn.annAppendBatch(
      batchDf(Seq(20L, 21L, 22L, 23L)), 1L,
      corpusPath, bucketPath, Tables, Planes)
    assert(nReplay === 4L)
    assert(StreamingAnn.readCorpus(spark, corpusPath).count() === 60L,
      "replayed batch must not grow the corpus")
    val afterReplay = StreamingAnn.readBuckets(spark, bucketPath).count()
    assert(afterReplay === want.size.toLong,
      "replayed batch must not grow the bucket table")
  }

  test("the stream wrapper maintains the index across micro-batches") {
    val root = Files.createTempDirectory("graft-sann-stream").toString
    val corpusPath = s"$root/corpus"
    val bucketPath = s"$root/buckets"
    val ckpt = s"$root/ckpt"

    implicit val sqlCtx = spark.sqlContext
    val mem = MemoryStream[(Long, Array[Float])]
    val emb = mem.toDF().toDF("vec_id", "embedding")
    val q = StreamingAnn.annStream(emb, corpusPath, bucketPath, ckpt,
      Tables, Planes).start()
    try {
      mem.addData((0L until 15L).map(i => (i, vec(i))): _*)
      q.processAllAvailable()
      mem.addData((15L until 40L).map(i => (i, vec(i))): _*)
      q.processAllAvailable()
    } finally q.stop()

    val corpus = StreamingAnn.readCorpus(spark, corpusPath)
    assert(corpus.count() === 40L)
    val got = StreamingAnn.readBuckets(spark, bucketPath)
      .collect().map(r => (r.getLong(0), r.getInt(1), r.getLong(2))).toSet
    val want = Similarity.lshBuckets(corpus, Tables, Planes)
      .collect().map(r => (r.getLong(0), r.getInt(1), r.getLong(2))).toSet
    assert(got === want)
  }
}
