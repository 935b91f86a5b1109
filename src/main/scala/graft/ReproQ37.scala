package graft

/** One-off diagnostic for the round-3 q37 bench regression (3.3 s → 21.1 s
  * with no operator change). Hypothesis (VERDICT r3 #1): leftover
  * localCheckpoint blocks from earlier bench queries fill storage memory by
  * the time q37's iterative, checkpoint-per-round plan runs. This measures
  * q37 (a) isolated/cold, (b) after the full 56-query suite, (c) after the
  * suite with persistent RDDs cleared — the delta between (b) and (c) is
  * the block-pressure cost.
  */
object ReproQ37 {
  def main(args: Array[String]): Unit = {
    val dir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val spark = GraftSession.local("repro-q37")
    spark.sparkContext.setLogLevel("ERROR")
    def time(name: String)(f: => Unit): Unit = {
      val t0 = System.nanoTime(); f
      println(f"REPRO $name ${(System.nanoTime() - t0) / 1e9}%.2f s  " +
        s"persistentRDDs=${spark.sparkContext.getPersistentRDDs.size}")
    }
    def q37() = SparkEntry.queries("q37_dedup_groups")(spark, dir).count()

    time("q37_cold")(q37())
    time("q37_warm")(q37())
    time("suite_minus_q37") {
      SparkEntry.queries.foreach { case (n, fn) =>
        if (n != "q37_dedup_groups")
          try fn(spark, dir).count() catch { case _: Throwable => () }
      }
    }
    time("q37_after_suite")(q37())
    time("clear_persistent") {
      spark.sparkContext.getPersistentRDDs.values
        .foreach(_.unpersist(blocking = true))
    }
    time("q37_after_clear")(q37())
    spark.stop()
  }
}
