package graft
import java.util.concurrent.atomic.AtomicLong

import org.apache.spark.scheduler.{SparkListener, SparkListenerTaskEnd}
import org.apache.spark.sql.SparkSession

object Bench {

  /** Accumulates task-level shuffle/spill bytes. Wall-clock noise can
    * hide a plan regression (an extra exchange costs little at sf0.1 but
    * is the 100 TB bottleneck); these counters make it a metric diff.
    */
  private final class MetricsListener extends SparkListener {
    val shuffleWrite = new AtomicLong
    val shuffleRead  = new AtomicLong
    val memSpill     = new AtomicLong
    val diskSpill    = new AtomicLong
    override def onTaskEnd(te: SparkListenerTaskEnd): Unit = {
      val m = te.taskMetrics
      if (m != null) {
        shuffleWrite.addAndGet(m.shuffleWriteMetrics.bytesWritten)
        shuffleRead.addAndGet(m.shuffleReadMetrics.totalBytesRead)
        memSpill.addAndGet(m.memoryBytesSpilled)
        diskSpill.addAndGet(m.diskBytesSpilled)
      }
    }
    def reset(): Unit = Seq(shuffleWrite, shuffleRead, memSpill, diskSpill)
      .foreach(_.set(0L))
    def snapshot: (Long, Long, Long, Long) =
      (shuffleWrite.get, shuffleRead.get, memSpill.get, diskSpill.get)
    /** Listener events are delivered async; settle until stable. */
    def settled: (Long, Long, Long, Long) = {
      var prev = snapshot
      var same = 0
      while (same < 2) {
        Thread.sleep(50)
        val cur = snapshot
        if (cur == prev) same += 1 else { same = 0; prev = cur }
      }
      prev
    }
  }

  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "4")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val metrics = new MetricsListener
    spark.sparkContext.addSparkListener(metrics)
    // Drop any RDD blocks a query's operators left pinned (local
    // checkpoints of iterative plans). Operators release their own
    // intermediates, but each query's RESULT checkpoint stays addressable
    // until driver GC; clearing between queries makes every timed run see
    // the same (empty) block-manager state.
    def clearBlocks(): Unit =
      spark.sparkContext.getPersistentRDDs.values
        .foreach(_.unpersist(blocking = false))
    // Untimed warmup: run the FULL suite once. Cold runs pay one-off
    // Janino/JIT compile of each query's generated classes (~11 s for the
    // heaviest dedup plan, ~2.5 s for the chess CaseWhen trees) plus
    // parquet footer reads; which query absorbed those costs used to
    // depend on map iteration order, making per-query numbers
    // round-to-round noisy (the r3 "q37 regression" was exactly this
    // noise plus machine contention — isolated runs never reproduced it).
    // The timed pass below therefore measures steady-state plan execution.
    SparkEntry.queries.foreach { case (_, fn) =>
      try fn(spark, sfDir).count() catch { case _: Throwable => () }
    }
    clearBlocks()
    val results = SparkEntry.queries.map { case (name, fn) =>
      metrics.reset()
      val t0 = System.nanoTime()
      try { fn(spark, sfDir).count() } catch { case _: Throwable => -1L }
      val dt = (System.nanoTime() - t0) / 1e9
      val (sw, sr, ms, ds) = metrics.settled
      clearBlocks()
      name -> ((dt, sw, sr, ms, ds))
    }
    val qs = results.map { case (k, v) => s"\"" + k + "\":" + v._1 }
      .mkString("{", ",", "}")
    val qm = results.map { case (k, (_, sw, sr, ms, ds)) =>
      s"\"$k\":{\"shuffle_write_bytes\":$sw,\"shuffle_read_bytes\":$sr," +
        s"\"mem_spill_bytes\":$ms,\"disk_spill_bytes\":$ds}"
    }.mkString("{", ",", "}")
    val total = if (results.nonEmpty) results.values.map(_._1).sum else 0.0
    println(s"""{"metric":"total","value":$total,"unit":"sec","queries":$qs,"query_metrics":$qm,"sf":"$sfDir"}""")
    spark.stop()
  }
}
