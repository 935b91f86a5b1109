package graft

import scala.collection.mutable.ArrayBuffer

import org.apache.spark.scheduler.{SparkListener, SparkListenerStageCompleted}
import org.apache.spark.sql.SparkSession

/** Dev diagnostic for the r7 audit note: q107 (PPJoin) and q160
  * (containment) reported BYTE-IDENTICAL per-query shuffle totals at two
  * scale factors. This main runs both with a PER-STAGE listener and
  * prints each stage's shuffle write/read bytes, so the identity can be
  * attributed (shared shingle/df/rank stages vs candidate stages) or
  * exposed as a metrics bug. Usage:
  *
  *   sbt "runMain graft.StageBytes <sfDir>"
  */
object StageBytes {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.01")
    val spark = SparkSession.builder()
      .master("local[8]")
      .config("spark.sql.shuffle.partitions", "8")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")

    final case class St(id: Int, name: String, write: Long, read: Long)
    val stages = ArrayBuffer.empty[St]
    val listener = new SparkListener {
      override def onStageCompleted(sc: SparkListenerStageCompleted): Unit =
        stages.synchronized {
          val m = sc.stageInfo.taskMetrics
          stages += St(sc.stageInfo.stageId, sc.stageInfo.name.take(60),
            m.shuffleWriteMetrics.bytesWritten,
            m.shuffleReadMetrics.totalBytesRead)
        }
    }
    spark.sparkContext.addSparkListener(listener)

    def run(name: String): Unit = {
      stages.synchronized(stages.clear())
      SparkEntry.queries(name)(spark, sfDir).count()
      // listener delivery is async — settle
      var prev = -1; var same = 0
      while (same < 3) {
        Thread.sleep(100)
        val cur = stages.synchronized(stages.size)
        if (cur == prev) same += 1 else { same = 0; prev = cur }
      }
      val ss = stages.synchronized(stages.toList)
      println(s"===== $name =====")
      ss.sortBy(_.id).foreach(s =>
        println(f"  stage ${s.id}%4d w=${s.write}%12d r=${s.read}%12d  ${s.name}"))
      println(f"  TOTAL w=${ss.map(_.write).sum}%d r=${ss.map(_.read).sum}%d" +
        f" w+r=${ss.map(s => s.write + s.read).sum}%d n_stages=${ss.size}%d")
    }
    run("q107_ppjoin_jaccard")
    run("q160_containment")
    spark.stop()
  }
}
