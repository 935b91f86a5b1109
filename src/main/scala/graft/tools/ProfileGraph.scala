package graft.tools

import org.apache.spark.sql.SparkSession

/** Dev-only profiler for the iterative-graph round cost (VERDICT r9 #3):
  * times each phase of one gated graph query so the fixed per-round
  * overhead (checkpoint jobs, convergence actions, AQE re-planning) is
  * measured, not guessed. Not part of the driver contract.
  */
object ProfileGraph {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    sys.env.get("PROFILE_AQE").foreach(v =>
      spark.conf.set("spark.sql.adaptive.enabled", v))

    // per-job wall clock: how many jobs does one query run, and what
    // does each cost — the fixed-overhead-per-round signal
    val jobStarts = new java.util.concurrent.ConcurrentHashMap[Int, Long]()
    spark.sparkContext.addSparkListener(
      new org.apache.spark.scheduler.SparkListener {
        override def onJobStart(
            js: org.apache.spark.scheduler.SparkListenerJobStart): Unit =
          jobStarts.put(js.jobId, System.nanoTime())
        override def onJobEnd(
            je: org.apache.spark.scheduler.SparkListenerJobEnd): Unit = {
          // remove into the boxed type: a miss returns null, and
          // unboxing null into a scala Long NPEs (ADVICE r10)
          val t0: java.lang.Long = jobStarts.remove(je.jobId)
          if (t0 != null && sys.env.contains("PROFILE_JOBS"))
            println(f"[job] ${je.jobId}%4d ${(System.nanoTime() - t0) / 1e6}%8.1f ms")
        }
      })

    def time[T](label: String)(f: => T): T = {
      val t0 = System.nanoTime()
      val r = f
      println(f"[profile] $label%-28s ${(System.nanoTime() - t0) / 1e9}%.3f s")
      r
    }

    // warm the session (parquet footers, codegen of trivial plans)
    graft.queries.AdvancedQueries.q134Pagerank(spark, sfDir).collect()

    val all = Seq("q134", "q147", "q156", "q163", "q145", "q37",
                  "q196", "q209", "q253", "q258", "q259", "q252")
    val qs = sys.env.get("PROFILE_QUERIES")
      .map(_.split(",").toSeq).getOrElse(all)
    for (q <- qs) {
      for (i <- 1 to 4) {
        time(s"$q run$i") {
          val df = q match {
            case "q134" => graft.queries.AdvancedQueries.q134Pagerank(spark, sfDir)
            case "q147" => graft.queries.AdvancedQueries.q147PersonalizedPagerank(spark, sfDir)
            case "q156" => graft.queries.AdvancedQueries.q156KCore(spark, sfDir)
            case "q163" => graft.queries.AdvancedQueries.q163WeightedPaths(spark, sfDir)
            case "q145" => graft.queries.PipelineQueries.q145CrossModalDedup(spark, sfDir)
            case "q37"  => graft.queries.AdvancedQueries.q37DedupGroups(spark, sfDir)
            case "q196" => graft.queries.AdvancedQueries.q196DedupFixedpoint(spark, sfDir)
            case "q209" => graft.queries.AdvancedQueries.q209IncrementalCc(spark, sfDir)
            case "q253" => graft.queries.AdvancedQueries.q253LeakSafeSplit(spark, sfDir)
            case "q258" => graft.queries.PipelineQueries.q258SuffixRanks(spark, sfDir)
            case "q259" => graft.queries.PipelineQueries.q259SaDupStats(spark, sfDir)
            case "q252" => graft.queries.PipelineQueries.q252SubstringApply(spark, sfDir)
          }
          df.collect()
          org.apache.spark.sql.GraftColumns.unpersistCheckpoint(df)
        }
      }
    }
    spark.stop()
  }
}
