package graft.streaming

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._

import graft.SparkSpec
import graft.operators.CountMin

/** Contracts of [[StreamingSketch]]: after every micro-batch the
  * maintained sketch equals [[CountMin.sketch]] over everything
  * streamed so far (linearity, streamed), estimates ride the
  * maintained state, state stays ≤ depth·width rows forever, and a
  * crash-replayed batch is a byte-identical no-op.
  */
class StreamingSketchSpec extends SparkSpec {
  import spark.implicits._

  private val (d, w) = (3, 8)

  private def snapshot(root: String): Map[(Int, Long), Long] =
    StreamingAgg.latestState(spark, root).get._2
      .collect()
      .map(r => (r.getInt(0), r.getLong(1)) -> r.getLong(2))
      .toMap

  private def direct(rows: Seq[Long]): Map[(Int, Long), Long] =
    CountMin.sketch(rows.toDF("k"), "k", d, w)
      .collect()
      .map(r => (r.getInt(0), r.getLong(1)) -> r.getLong(2))
      .toMap

  test("maintained sketch == direct sketch of the union after every " +
       "batch; bounded state; replay no-op; estimates served") {
    val root = java.nio.file.Files
      .createTempDirectory("graft-stream-sketch").toString
    implicit val sqlCtx = spark.sqlContext
    val mem = MemoryStream[Long]
    val q = StreamingSketch.maintain(mem.toDS().toDF("k"), "k", d, w,
                                     root).start()
    try {
      val b1 = Seq(1L, 1L, 2L, 5L)
      val b2 = Seq(2L, 3L, 3L, 3L)
      val b3 = Seq(1L, 9L)

      mem.addData(b1: _*); q.processAllAvailable()
      assert(snapshot(root) === direct(b1))

      mem.addData(b2: _*); q.processAllAvailable()
      assert(snapshot(root) === direct(b1 ++ b2))

      mem.addData(b3: _*); q.processAllAvailable()
      assert(snapshot(root) === direct(b1 ++ b2 ++ b3))
      assert(snapshot(root).size <= d * w, "state must stay bounded")

      // crash replay of batch id 1 (b2): identical content, state
      // untouched
      val before = snapshot(root)
      StreamingSketch.mergeBatch(b2.toDF("k"), batchId = 1L, keyCol = "k",
                                 depth = d, width = w, root = root)
      assert(snapshot(root) === before, "replay must be a no-op")

      // estimates ride the maintained state: est >= exact for all keys
      val exact = (b1 ++ b2 ++ b3).groupBy(identity)
        .map { case (k, v) => (k, v.size.toLong) }
      val keys = exact.keys.toSeq.toDF("k")
      val est = StreamingSketch
        .estimate(spark, root, keys, "k", d, w)
        .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
      exact.foreach { case (k, n) =>
        assert(est(k) >= n, s"CM must never undercount key $k")
      }
    } finally q.stop()
  }

  test("estimate over an absent state reads 0 (empty sketch)") {
    val root = java.nio.file.Files
      .createTempDirectory("graft-stream-sketch-empty").toString
    val est = StreamingSketch
      .estimate(spark, root, Seq(42L).toDF("k"), "k", d, w)
      .collect()
    assert(est.length === 1 && est.head.getLong(1) === 0L)
  }
}
