package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.execution.SparkPlan
import org.apache.spark.sql.execution.adaptive.{AdaptiveSparkPlanExec, QueryStageExec}
import org.apache.spark.sql.execution.joins.{BroadcastHashJoinExec, BroadcastNestedLoopJoinExec, ShuffledHashJoinExec, SortMergeJoinExec}

import graft.SparkEntry

/** Dev diagnostic for execution-number-dependent plan flips (the r11
  * q269 2× anomaly's shape, recurring as r13's q265 +47%): run ONE
  * registered query N times in a single JVM under the Bench session
  * config and print each execution's join-strategy mix plus task/
  * shuffle counters, so the flipped join is identifiable by diffing
  * two consecutive lines. Not part of the driver contract.
  *
  *   runMain graft.tools.ReproPlanFlip <queryName> [sfDir] [n]
  */
object ReproPlanFlip {
  def main(args: Array[String]): Unit = {
    val name = args(0)
    val sfDir = args.lift(1).getOrElse("/root/testdata/sf0.1")
    val n = args.lift(2).map(_.toInt).getOrElse(4)
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
    val fn = SparkEntry.queries(name)

    def joins(p: SparkPlan, acc: collection.mutable.ArrayBuffer[String])
        : Unit = {
      p match {
        case a: AdaptiveSparkPlanExec => joins(a.executedPlan, acc)
        case q: QueryStageExec        => joins(q.plan, acc)
        case j: BroadcastHashJoinExec =>
          acc += s"BHJ(${j.joinType},keys=${j.leftKeys.map(_.sql).mkString(",")})"
          j.children.foreach(joins(_, acc))
        case j: SortMergeJoinExec =>
          acc += s"SMJ(${j.joinType},keys=${j.leftKeys.map(_.sql).mkString(",")})"
          j.children.foreach(joins(_, acc))
        case j: ShuffledHashJoinExec =>
          acc += s"SHJ(${j.joinType},keys=${j.leftKeys.map(_.sql).mkString(",")})"
          j.children.foreach(joins(_, acc))
        case j: BroadcastNestedLoopJoinExec =>
          acc += s"BNLJ(${j.joinType})"
          j.children.foreach(joins(_, acc))
        case other => other.children.foreach(joins(_, acc))
      }
      p.expressions.foreach(_.foreach {
        case s: org.apache.spark.sql.execution.ExecSubqueryExpression =>
          joins(s.plan, acc)
        case _ => ()
      })
    }

    // stage-level counters: join summaries alone miss flips in window/
    // aggregate exchanges (the q265 case) — the ordered stage sequence
    // with per-stage tasks/bytes aligns positionally across runs
    final case class St(id: Int, write: Long, read: Long, tasks: Int)
    val stages = collection.mutable.ArrayBuffer.empty[St]
    val stageSite =
      new java.util.concurrent.ConcurrentHashMap[Int, String]()
    spark.sparkContext.addSparkListener(
      new org.apache.spark.scheduler.SparkListener {
        override def onJobStart(
            js: org.apache.spark.scheduler.SparkListenerJobStart): Unit = {
          val site = Option(js.properties)
            .flatMap(p => Option(p.getProperty("callSite.short")))
            .getOrElse("?")
          js.stageIds.foreach(id => stageSite.put(id, site))
        }
        override def onStageCompleted(
            sc: org.apache.spark.scheduler.SparkListenerStageCompleted)
            : Unit = stages.synchronized {
          val m = sc.stageInfo.taskMetrics
          stages += St(sc.stageInfo.stageId,
            m.shuffleWriteMetrics.bytesWritten,
            m.shuffleReadMetrics.totalBytesRead, sc.stageInfo.numTasks)
        }
      })

    // operators run eager jobs (checkpoint materializations) at
    // CONSTRUCTION time; every Dataset action fires the QE listener,
    // so the intermediate plans are observable there
    val captured = new java.util.concurrent.CopyOnWriteArrayList[
      (String, org.apache.spark.sql.execution.QueryExecution)]()
    spark.listenerManager.register(
      new org.apache.spark.sql.util.QueryExecutionListener {
        override def onSuccess(funcName: String,
            qe: org.apache.spark.sql.execution.QueryExecution,
            durationNs: Long): Unit = {
          captured.add(funcName -> qe); ()
        }
        override def onFailure(funcName: String,
            qe: org.apache.spark.sql.execution.QueryExecution,
            exception: Exception): Unit = ()
      })

    for (i <- 1 to n) {
      def clearBlocks(): Unit =
        spark.sparkContext.getPersistentRDDs.values
          .foreach(_.unpersist(blocking = false))
      captured.clear()
      stages.synchronized(stages.clear())
      val t0 = System.nanoTime()
      val df = fn(spark, sfDir)
      df.queryExecution.toRdd.count()
      val dt = (System.nanoTime() - t0) / 1e9
      // listener delivery is async; settle until stable
      var prevN = -1; var same = 0
      while (same < 3) {
        Thread.sleep(100)
        val cur = stages.synchronized(stages.size)
        if (cur == prevN) same += 1 else { same = 0; prevN = cur }
      }
      val execs = {
        import scala.jdk.CollectionConverters._
        captured.asScala.toSeq
      }
      println(f"[flip] exec#$i $dt%6.2f s  internal_actions=${execs.size}")
      execs.zipWithIndex.foreach { case ((fname, qe), e) =>
        val acc = collection.mutable.ArrayBuffer.empty[String]
        joins(qe.executedPlan, acc)
        if (acc.nonEmpty)
          println(f"[flip]   #$i.a$e%02d $fname: ${acc.mkString(" | ")}")
        if (sys.env.contains("SPARK_GRAFT_DUMP_PLANS"))
          java.nio.file.Files.writeString(
            java.nio.file.Paths.get(s"/tmp/flip_plan_${i}_a$e.txt"),
            qe.executedPlan.toString)
      }
      val acc = collection.mutable.ArrayBuffer.empty[String]
      joins(df.queryExecution.executedPlan, acc)
      if (acc.nonEmpty)
        println(f"[flip]   #$i.final ${acc.mkString(" | ")}")
      val ss = stages.synchronized(stages.toList)
      println(f"[flip]   #$i stages=${ss.size} tasks=${ss.map(_.tasks).sum}" +
        f" w=${ss.map(_.write).sum} r=${ss.map(_.read).sum}")
      ss.sortBy(_.id).zipWithIndex.foreach { case (s, k) =>
        println(f"[flip]   #$i.s$k%02d w=${s.write}%10d r=${s.read}%10d" +
          f" tasks=${s.tasks}%5d  ${stageSite.getOrDefault(s.id, "?")}")
      }
      clearBlocks()
    }
    spark.stop()
  }
}
