package graft

import org.apache.spark.sql.SparkSession

/** Dev diagnostic: print the final (post-AQE) physical plan of one or
  * more registered queries. Usage:
  *
  *   sbt "runMain graft.PlanDump <sfDir> <queryPrefix>"
  *
  * This is how plan-shape contracts get drafted before they are pinned
  * in `PlanShapeSpec` — run, read, assert the properties that matter.
  */
object PlanDump {
  def main(args: Array[String]): Unit = {
    val Array(sfDir, prefix) = args
    val spark = SparkSession.builder()
      .master("local[8]")
      .config("spark.sql.shuffle.partitions", "8")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    SparkEntry.queries
      .filter { case (name, _) => name.startsWith(prefix) }
      .toSeq.sortBy(_._1)
      .foreach { case (name, fn) =>
        val df = fn(spark, sfDir)
        df.collect()
        println(s"===== $name =====")
        println(df.queryExecution.executedPlan.toString
          .split("== Initial Plan ==")(0))
      }
    spark.stop()
  }
}
