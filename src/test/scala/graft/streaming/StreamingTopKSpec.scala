package graft.streaming

import java.sql.Timestamp

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream

import graft.SparkSpec

/** Contracts of [[StreamingTopK]]: exact parity with the q126 batch
  * sketch while under capacity, the Misra-Gries candidate-superset
  * guarantee under compression, and bounded state.
  */
class StreamingTopKSpec extends SparkSpec {
  import spark.implicits._

  private def ts(s: Long) = new Timestamp(1700000000000L + s * 1000)

  private def run(batches: Seq[Seq[String]], k: Int, nShards: Int)
      : Map[(Int, String), Long] = {
    implicit val sqlCtx = spark.sqlContext
    val mem = MemoryStream[StreamingTopK.Item]
    val q = StreamingTopK.track(mem.toDS(), k, nShards, "10 seconds")
      .writeStream.outputMode("update").format("memory")
      .queryName("topk_out").start()
    try {
      var t = 0L
      batches.foreach { b =>
        mem.addData(b.map { i => t += 1; StreamingTopK.Item(ts(t), i) })
        q.processAllAvailable()
      }
    } finally q.stop()
    // latest emission per (shard, item): micro-batch order is the
    // memory sink's row order, so the last row wins
    spark.table("topk_out").collect()
      .map(r => (r.getInt(0), r.getString(1)) -> r.getLong(2))
      .toMap
  }

  test("under capacity the streaming summary IS the exact count, " +
       "equal to the batch sketch") {
    val items = Seq.fill(7)("a") ++ Seq.fill(4)("b") ++ Seq.fill(2)("c")
    val got = run(Seq(items.take(5), items.drop(5)), k = 4, nShards = 2)
    // <= 2k distinct per shard -> no compression ever: exact counts
    val expected = items.groupBy(identity).map { case (i, occ) =>
      (math.floorMod(i.hashCode, 2), i) -> occ.size.toLong
    }
    assert(got === expected)
    // and identical per-item to a batch count on the same data (shard
    // assignment cannot change counts — each item lives in one shard)
    val batchCounts = items.toDF("item").groupBy("item").count()
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(got.map { case ((_, i), c) => i -> c } === batchCounts)
  }

  test("heavy hitters survive compression with count_lb <= true count") {
    // one shard, k=2: stream 60xA, 40xB, then 30 distinct light items
    // interleaved; n=130, bound n/(k+1) ~ 43: A must survive
    val light = (1 to 30).map(i => s"light$i")
    val items = Seq.fill(60)("A") ++ Seq.fill(40)("B") ++ light
    val got = run(Seq(items), k = 2, nShards = 1)
    val a = got.collectFirst { case ((_, "A"), c) => c }
    assert(a.isDefined, "true heavy hitter A must hold a counter")
    assert(a.get <= 60L, "MG counters are lower bounds")
    // undercount bounded by n/(k+1)
    assert(a.get >= 60L - 130L / 3L)
  }

  test("state stays bounded: <= 2k entries emitted per shard") {
    val items = (1 to 500).map(i => s"u$i")
    val got = run(Seq(items), k = 5, nShards = 3)
    got.keys.groupBy(_._1).foreach { case (shard, ks) =>
      assert(ks.size <= 10, s"shard $shard emitted ${ks.size} > 2k entries")
    }
  }
}
