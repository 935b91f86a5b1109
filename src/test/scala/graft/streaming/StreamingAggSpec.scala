package graft.streaming

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._

import graft.SparkSpec

/** Contracts of [[StreamingAgg]]: after every micro-batch the state
  * equals a full batch recompute over everything streamed so far, and a
  * crash-replayed batch leaves the state byte-identical (idempotent
  * versioned merge).
  */
class StreamingAggSpec extends SparkSpec {
  import spark.implicits._

  private def agg(df: DataFrame): DataFrame =
    df.groupBy(col("k"))
      .agg(count(lit(1)).as("n_rows"), sum(col("v")).as("sum_v"),
           max(col("v")).as("max_v"))

  private def snapshot(root: String): Map[Long, (Long, Long, Long)] =
    StreamingAgg.latestState(spark, root).get._2
      .collect()
      .map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2), r.getLong(3))))
      .toMap

  test("state tracks a batch recompute across micro-batches; replay is " +
       "a no-op") {
    val root = java.nio.file.Files
      .createTempDirectory("graft-stream-agg").toString
    implicit val sqlCtx = spark.sqlContext
    val mem = MemoryStream[(Long, Long)]
    val q = StreamingAgg.maintain(
      mem.toDS().toDF("k", "v"), "k", root)(agg)
      .start()
    try {
      val b1 = Seq((1L, 10L), (1L, 5L), (2L, 7L))
      val b2 = Seq((1L, 1L), (3L, 30L))
      val b3 = Seq((2L, 100L))

      mem.addData(b1: _*); q.processAllAvailable()
      assert(snapshot(root) === Map(1L -> ((2L, 15L, 10L)),
                                    2L -> ((1L, 7L, 7L))))

      mem.addData(b2: _*); q.processAllAvailable()
      mem.addData(b3: _*); q.processAllAvailable()
      val expected = agg((b1 ++ b2 ++ b3).toDF("k", "v"))
        .collect()
        .map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2),
                                    r.getLong(3))))
        .toMap
      assert(snapshot(root) === expected,
        "state must equal the full recompute")

      // crash replay: re-merge the SECOND batch (MemoryStream ids are
      // 0-based, so b2 ran as batch id 1) under its original id — the
      // merge reads only versions BELOW 1 and rewrites version 1 with
      // identical content; the LATEST state is untouched
      val before = snapshot(root)
      StreamingAgg.mergeBatch(agg(b2.toDF("k", "v")), batchId = 1L,
                              keyCol = "k", root = root)
      assert(snapshot(root) === before, "replay must be a no-op")
      // and version 1 itself equals what batch 1 originally produced
      val v1 = spark.read.parquet(s"$root/batch=1").collect()
        .map(r => r.getLong(0) -> r.getLong(2)).toMap
      assert(v1 === Map(1L -> 16L, 2L -> 7L, 3L -> 30L))

      // a crash mid-write leaves a version dir WITHOUT _SUCCESS: readers
      // must keep resolving the last fully-committed version
      val latestBefore = StreamingAgg.latestState(spark, root).get._1
      val partial = new java.io.File(s"$root/batch=99")
      assert(partial.mkdir())
      java.nio.file.Files.write(partial.toPath.resolve("part-0.parquet"),
                                Array[Byte](1, 2, 3))
      assert(StreamingAgg.latestState(spark, root).get._1 === latestBefore,
        "partially-written version must be invisible")
      assert(snapshot(root) === before)
    } finally q.stop()
  }
}
