package graft.tools

import scala.collection.mutable.ArrayBuffer

import org.apache.spark.scheduler.{SparkListener, SparkListenerStageCompleted}
import org.apache.spark.sql.SparkSession

/** Dev diagnostic for the r11 q269 shuffle-byte anomaly: executions 1-3
  * of q269 in one JVM move 63.46 MB of shuffle, execution 4 moves
  * 123.9 MB — deterministically, on a quiet box, with zero failed tasks
  * and only +16 tasks. This main runs q269 N times under the Bench
  * session config and prints per-execution stage-level shuffle bytes so
  * the flipped plan fragment can be identified. Not part of the driver
  * contract.
  *
  *   runMain graft.tools.ReproQ269 [sfDir] [n]
  */
object ReproQ269 {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val n = args.lift(1).map(_.toInt).getOrElse(5)
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")

    final case class St(id: Int, name: String, write: Long, read: Long,
                        tasks: Int)
    val stages = ArrayBuffer.empty[St]
    // stage -> the submitting job's call site (count at File.scala:NNN),
    // which names the q269 DAG stage the work belongs to
    val stageSite =
      new java.util.concurrent.ConcurrentHashMap[Int, String]()
    spark.sparkContext.addSparkListener(new SparkListener {
      override def onJobStart(
          js: org.apache.spark.scheduler.SparkListenerJobStart): Unit = {
        val site = Option(js.properties)
          .flatMap(p => Option(p.getProperty("spark.job.description"))
            .orElse(Option(p.getProperty("callSite.short"))))
          .getOrElse("?")
        js.stageIds.foreach(id => stageSite.put(id, site))
      }
      override def onStageCompleted(sc: SparkListenerStageCompleted): Unit =
        stages.synchronized {
          val m = sc.stageInfo.taskMetrics
          stages += St(sc.stageInfo.stageId, sc.stageInfo.name.take(70),
            m.shuffleWriteMetrics.bytesWritten,
            m.shuffleReadMetrics.totalBytesRead, sc.stageInfo.numTasks)
        }
    })

    for (run <- 1 to n) {
      stages.synchronized(stages.clear())
      val t0 = System.nanoTime()
      graft.queries.CurationQueries.q269CurationDag(spark, sfDir).count()
      spark.sparkContext.getPersistentRDDs.values
        .foreach(_.unpersist(blocking = false))
      var prev = -1; var same = 0
      while (same < 3) {
        Thread.sleep(100)
        val cur = stages.synchronized(stages.size)
        if (cur == prev) same += 1 else { same = 0; prev = cur }
      }
      val ss = stages.synchronized(stages.toList)
      val dt = (System.nanoTime() - t0) / 1e9
      println(f"===== run $run  ${dt}%.1f s  stages=${ss.size}" +
        f"  w=${ss.map(_.write).sum}  r=${ss.map(_.read).sum}")
      // every AQE stage shares one name (withThreadLocalCaptured), so
      // print the full ordered stage sequence; runs of the same plan
      // align positionally
      ss.sortBy(_.id).zipWithIndex.foreach { case (s, i) =>
        println(f"  [$i%3d] w=${s.write}%11d r=${s.read}%11d" +
          f" tasks=${s.tasks}%5d id=${s.id}%5d  " +
          stageSite.getOrDefault(s.id, "?")) }
    }
    spark.stop()
  }
}
