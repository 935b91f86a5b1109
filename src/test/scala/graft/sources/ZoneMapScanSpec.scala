package graft.sources

import java.util.concurrent.atomic.AtomicLong

import graft.SparkSpec
import org.apache.spark.scheduler.{SparkListener, SparkListenerTaskEnd}
import org.apache.spark.sql.functions._

/** Contracts of [[ZoneMapScan]] — the pruned reader path must (a) be
  * ROW-INVISIBLE (pruned scan + residual filter ≡ full scan + filter on
  * any layout), (b) actually SKIP: on a clustered layout the pruned
  * scan reads strictly fewer bytes than the full scan (task input
  * metrics, not file-count arithmetic), and (c) never prune what it
  * cannot prove (null zones survive; intersecting zones survive).
  */
class ZoneMapScanSpec extends SparkSpec {
  import spark.implicits._

  private def tmp(name: String): String =
    System.getProperty("java.io.tmpdir") + s"/graft_zmspec_$name"

  /** Total task-level bytes read while running `body`. */
  private def bytesRead(body: => Unit): Long = {
    val acc = new AtomicLong
    val l = new SparkListener {
      override def onTaskEnd(te: SparkListenerTaskEnd): Unit = {
        val m = te.taskMetrics
        if (m != null) acc.addAndGet(m.inputMetrics.bytesRead); ()
      }
    }
    spark.sparkContext.addSparkListener(l)
    try {
      body
      // listener bus is async — settle until stable
      var prev = -1L; var same = 0
      while (same < 3) {
        Thread.sleep(50)
        val cur = acc.get
        if (cur == prev) same += 1 else { same = 0; prev = cur }
      }
      acc.get
    } finally spark.sparkContext.removeSparkListener(l)
  }

  private val rows = (1L to 4000L).map(i => (i, i % 97, s"payload_$i"))

  test("pruned scan reads strictly fewer bytes on a clustered layout " +
       "and returns row-identical results") {
    val path = tmp("clustered")
    ZoneMapScan.writeClustered(rows.toDF("k", "v", "pad"), path,
                               Seq("k"), numFiles = 16)
    val zones = ZoneMapScan.buildZoneMap(spark, path, "k")
    assert(zones.count() == 16)
    val files = ZoneMapScan.pruneFiles(zones, lit(100L), lit(400L))
    assert(files.nonEmpty && files.size < 16,
           s"expected a strict subset, got ${files.size}/16")
    val schema = spark.read.parquet(path).schema
    val prunedBytes = bytesRead {
      ZoneMapScan.prunedRead(spark, files, schema)
        .filter(col("k").between(100L, 400L)).count()
    }
    val fullBytes = bytesRead {
      spark.read.parquet(path)
        .filter(col("k").between(100L, 400L)).count()
    }
    assert(prunedBytes > 0 && prunedBytes < fullBytes,
           s"pruned=$prunedBytes full=$fullBytes")
    val got = ZoneMapScan.prunedRead(spark, files, schema)
      .filter(col("k").between(100L, 400L))
      .select("k", "v").collect().map(r => (r.getLong(0), r.getLong(1)))
      .sorted.toSeq
    val want = rows.filter(r => r._1 >= 100 && r._1 <= 400)
      .map(r => (r._1, r._2)).sorted
    assert(got == want)
  }

  test("scan() composes prune + residual filter; out-of-domain " +
       "predicate reads zero files but types the empty frame") {
    val path = tmp("scan")
    ZoneMapScan.writeClustered(rows.toDF("k", "v", "pad"), path,
                               Seq("k"), numFiles = 8)
    val (hit, nRead, nTotal) =
      ZoneMapScan.scan(spark, path, "k", lit(1L), lit(50L))
    assert(nTotal == 8 && nRead < 8 && nRead >= 1)
    assert(hit.count() == 50)
    val (miss, nRead2, _) =
      ZoneMapScan.scan(spark, path, "k", lit(99999L), lit(999999L))
    assert(nRead2 == 0)
    assert(miss.count() == 0 && miss.columns.toSeq ==
      Seq("k", "v", "pad"))
  }

  test("a hash-scattered layout prunes nothing — and is still correct") {
    val path = tmp("hashed")
    // scatter: write partitioned by a hash, zones all span the domain
    rows.toDF("k", "v", "pad").repartition(8, pmod(col("k"), lit(8)))
      .write.mode("overwrite").parquet(path)
    val zones = ZoneMapScan.buildZoneMap(spark, path, "k")
    val files = ZoneMapScan.pruneFiles(zones, lit(100L), lit(400L))
    assert(files.size == zones.count(),
           "hash layout: every file intersects the range")
    val schema = spark.read.parquet(path).schema
    val n = ZoneMapScan.prunedRead(spark, files, schema)
      .filter(col("k").between(100L, 400L)).count()
    assert(n == 301L)
  }

  test("null zones survive pruning (a file of all-null keys may match " +
       "nothing, but pruning must not decide that)") {
    val zones = Seq(
      ("f_null", null.asInstanceOf[java.lang.Long],
       null.asInstanceOf[java.lang.Long], 10L),
      ("f_low", java.lang.Long.valueOf(1L),
       java.lang.Long.valueOf(9L), 10L),
      ("f_hit", java.lang.Long.valueOf(90L),
       java.lang.Long.valueOf(110L), 10L))
      .toDF("file", "zone_min", "zone_max", "n_rows")
    val files = ZoneMapScan.pruneFiles(zones, lit(100L), lit(400L))
    assert(files.toSet == Set("f_null", "f_hit"))
  }
}
