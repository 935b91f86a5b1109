package graft.streaming

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._

import graft.SparkSpec
import graft.operators.{Bloom, Kmv}

/** Contracts of [[StreamingMembership]]: after every micro-batch the
  * maintained Bloom bits / KMV hash set equal the direct build over
  * everything streamed so far, state stays bounded forever, a
  * crash-replayed batch is a byte-identical no-op (and for these two
  * sketches idempotence holds even WITHOUT the version gate —
  * re-merging a batch on top of committed state changes nothing), and
  * probes/estimates ride the maintained state.
  */
class StreamingMembershipSpec extends SparkSpec {
  import spark.implicits._

  private val (m, kH) = (512, 5)
  private val kmvK = 8

  private def bloomSnapshot(root: String): Map[Long, Long] =
    StreamingAgg.latestState(spark, root).get._2
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap

  private def bloomDirect(rows: Seq[Long]): Map[Long, Long] =
    Bloom.build(rows.toDF("k"), "k", m, kH)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap

  test("bloom: maintained bits == direct build after every batch; " +
       "replay no-op TWICE over (version gate AND idempotence); " +
       "probe rides the state") {
    val root = java.nio.file.Files
      .createTempDirectory("graft-stream-bloom").toString
    implicit val sqlCtx = spark.sqlContext
    val mem = MemoryStream[Long]
    val q = StreamingMembership.maintainBloom(mem.toDS().toDF("k"), "k",
                                              m, kH, root).start()
    try {
      val b1 = Seq(1L, 2L, 3L)
      val b2 = Seq(3L, 4L)
      mem.addData(b1: _*); q.processAllAvailable()
      assert(bloomSnapshot(root) === bloomDirect(b1))
      mem.addData(b2: _*); q.processAllAvailable()
      assert(bloomSnapshot(root) === bloomDirect(b1 ++ b2))
      assert(bloomSnapshot(root).size <= m / 32, "bounded state")

      // crash replay via the version gate: rewrite batch 1, no change
      val before = bloomSnapshot(root)
      StreamingMembership.mergeBloomBatch(b2.toDF("k"), 1L, "k", m, kH,
                                          root)
      assert(bloomSnapshot(root) === before, "replay must be a no-op")
      // idempotence even past the gate: merging b2 AGAIN as a NEW
      // batch id (at-least-once without versioning) changes nothing
      StreamingMembership.mergeBloomBatch(b2.toDF("k"), 2L, "k", m, kH,
                                          root)
      assert(bloomSnapshot(root) === before,
        "bit-OR absorbs duplicate delivery")

      // probe: every streamed key passes; a far key set of the same
      // size mostly does not (fp only)
      val pass = StreamingMembership.filterMaybe(spark, root,
        (b1 ++ b2).distinct.toDF("k"), "k", m, kH)
      assert(pass.count() === (b1 ++ b2).distinct.size.toLong)
    } finally q.stop()
  }

  test("bloom: probe over an absent state passes nothing") {
    val root = java.nio.file.Files
      .createTempDirectory("graft-stream-bloom-empty").toString
    val pass = StreamingMembership.filterMaybe(spark, root,
      Seq(1L, 2L).toDF("k"), "k", m, kH)
    assert(pass.count() === 0L)
  }

  test("kmv: maintained hash set == direct sketch after every batch; " +
       "bounded state; replay AND duplicate-delivery no-ops; " +
       "estimate rides the state") {
    val root = java.nio.file.Files
      .createTempDirectory("graft-stream-kmv").toString
    implicit val sqlCtx = spark.sqlContext
    val mem = MemoryStream[Long]
    val q = StreamingMembership.maintainKmv(mem.toDS().toDF("k"), "k",
                                            kmvK, root).start()
    def snap(): Seq[Long] = StreamingAgg.latestState(spark, root)
      .get._2.collect().map(_.getLong(0)).toSeq.sorted
    def direct(rows: Seq[Long]): Seq[Long] =
      Kmv.sketch(rows.toDF("k"), "k", kmvK)
        .collect().map(_.getLong(0)).toSeq.sorted
    try {
      val b1 = Seq(10L, 20L, 30L, 40L, 50L)
      val b2 = Seq(50L, 60L, 70L, 80L, 90L, 100L)
      mem.addData(b1: _*); q.processAllAvailable()
      assert(snap() === direct(b1))
      mem.addData(b2: _*); q.processAllAvailable()
      assert(snap() === direct(b1 ++ b2))
      assert(snap().size <= kmvK, "bounded state")

      val before = snap()
      StreamingMembership.mergeKmvBatch(b2.toDF("k"), 1L, "k", kmvK,
                                        root)
      assert(snap() === before, "version-gated replay must be a no-op")
      StreamingMembership.mergeKmvBatch(b2.toDF("k"), 2L, "k", kmvK,
                                        root)
      assert(snap() === before, "min-k absorbs duplicate delivery")

      // under-k regime here (10 distinct > kmvK=8 -> estimator path
      // still deterministic); just pin it equals the batch estimate
      val est = StreamingMembership.estimateDistinct(spark, root, kmvK)
        .collect().head.getLong(0)
      val batchEst = Kmv.estimateDistinct(
        Kmv.sketch((b1 ++ b2).toDF("k"), "k", kmvK), kmvK)
        .collect().head.getLong(0)
      assert(est === batchEst,
        "streamed estimate must equal the batch-built estimate")
    } finally q.stop()
  }

  test("kmv: estimate over an absent state reads 0") {
    val root = java.nio.file.Files
      .createTempDirectory("graft-stream-kmv-empty").toString
    assert(StreamingMembership.estimateDistinct(spark, root, kmvK)
      .collect().head.getLong(0) === 0L)
  }
}
