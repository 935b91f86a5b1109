package graft.tools

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.GraftOps._

/** Dev-only A/B for the iterative-family checkpoint cadence (r11
  * verdict #6): the shipped eager-per-round shape was chosen by an r10
  * measurement taken BEFORE `GraftColumns.clampStats` existed — the
  * stats-compounding blowup that measurement partly reflected is now
  * clamped, so the lazy/batched cadences get a fair re-run.
  *
  * Measures, min-of-N interleaved reps at the given sf dir:
  *
  *  A. the PageRank recurrence (the q134/q140/q147 shared loop, prep
  *     identical to [[graft.operators.GraphOps.pageRank]]'s):
  *     - eager:  one localCheckpoint per round, release previous
  *       (the shipped [[graft.operators.GraphOps]] rankLoop shape)
  *     - lazy:   graftCheckpointLazy per round — lineage truncated
  *       immediately, ONE materializing action at the end persists the
  *       whole chain (the "witness shares the materialization job"
  *       candidate)
  *     - every2: eager checkpoint every 2nd round, intermediate round
  *       stays a stacked lazy plan
  *
  *  B. connected components on the real near-dup pair graph
  *     (minhash J≥0.8 pairs over documents — the q37/q145 input shape):
  *     - shipped: two checkpoints per star round (large, then small)
  *     - folded:  ONE checkpoint per round — the small-star plan is
  *       built directly on the lazy large-star plan
  *
  * Results go to SURVEY §9; the winner ships, the loser is retracted
  * honestly either way.
  */
object AbCheckpointCadence {

  private def rankPrep(spark: SparkSession, dir: String)
      : (DataFrame, DataFrame, DataFrame) = {
    val rel = graft.Tables.lineitem(spark, dir)
      .select(col("l_suppkey"), col("l_orderkey"))
      .join(graft.Tables.orders(spark, dir)
              .select(col("o_orderkey"), col("o_custkey")),
            col("l_orderkey") === col("o_orderkey"))
      .select(concat(lit("s"), col("l_suppkey")).as("sup"),
              concat(lit("c"), col("o_custkey")).as("cust"))
      .distinct()
    val edges = rel.select(col("sup").as("src"), col("cust").as("dst"))
      .union(rel.select(col("cust").as("src"), col("sup").as("dst")))
    val e = edges.select(col("src"), col("dst"), lit(1L).as("__w"))
      .graftCheckpoint()
    val nodes = e.select(col("src").as("node"))
      .union(e.select(col("dst").as("node")))
      .distinct().graftCheckpoint()
    val n = nodes.count()
    val totalUnits = 1000000000000L
    val base = totalUnits * 15L / (100L * n)
    val outw = e.groupBy(col("src")).agg(sum(col("__w")).as("__outw"))
    val ew = e.join(outw, Seq("src")).graftCheckpoint()
    org.apache.spark.sql.GraftColumns.unpersistCheckpoint(e)
    (ew, nodes.withColumn("__base", lit(base)),
     nodes.withColumn("rank_units", lit(totalUnits / n)))
  }

  private def round(ew: DataFrame, nodesBase: DataFrame,
                    ranks: DataFrame): DataFrame = {
    val contrib = ew
      .join(ranks.select(col("node").as("src"),
                         col("rank_units").as("__r")), Seq("src"))
      .select(col("dst").as("node"),
              expr("(__r * 85 * __w) div (100 * __outw)").as("__c"))
      .groupBy(col("node")).agg(sum(col("__c")).as("__in"))
    nodesBase.join(contrib, Seq("node"), "left")
      .select(col("node"),
              (col("__base") + coalesce(col("__in"), lit(0L)))
                .as("rank_units"))
  }

  private def releaseAll(hs: Seq[DataFrame]): Unit =
    hs.foreach(org.apache.spark.sql.GraftColumns.unpersistCheckpoint(_))

  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val reps = args.lift(1).map(_.toInt).getOrElse(4)
    val iters = 5
    val spark = graft.GraftSession.local("ab-cadence")
    spark.sparkContext.setLogLevel("ERROR")

    val (ew, nodesBase, ranks0pre) = rankPrep(spark, dir)
    val ranks0 = ranks0pre.graftCheckpoint()

    def eager(): Long = {
      var ranks = ranks0
      var i = 0
      while (i < iters) {
        val next = round(ew, nodesBase, ranks).graftCheckpoint()
        if (ranks ne ranks0)
          org.apache.spark.sql.GraftColumns.unpersistCheckpoint(ranks)
        ranks = next; i += 1
      }
      val n = ranks.count()
      org.apache.spark.sql.GraftColumns.unpersistCheckpoint(ranks)
      n
    }
    def lazyChain(): Long = {
      var ranks = ranks0
      val hs = scala.collection.mutable.ArrayBuffer.empty[DataFrame]
      var i = 0
      while (i < iters) {
        val next = round(ew, nodesBase, ranks).graftCheckpointLazy()
        hs += next; ranks = next; i += 1
      }
      val n = ranks.count()
      releaseAll(hs.toSeq)
      n
    }
    def every2(): Long = {
      var ranks = ranks0
      val hs = scala.collection.mutable.ArrayBuffer.empty[DataFrame]
      var i = 0
      while (i < iters) {
        val r = round(ew, nodesBase, ranks)
        val next = if (i % 2 == 1 || i == iters - 1) {
          val c = r.graftCheckpoint(); hs += c; c
        } else r
        ranks = next; i += 1
      }
      val n = ranks.count()
      releaseAll(hs.toSeq)
      n
    }

    // B: CC cadence on the real near-dup pair graph
    val pairs = graft.operators.Dedup.minhashDedupPairs(
        graft.Tables.documents(spark, dir), "doc_id", "text",
        n = 3, num = 4, den = 5)
      .select(col("doc_a"), col("doc_b"))
      .graftCheckpoint()

    def ccShipped(): Long = {
      val (labels, rounds) = graft.operators.GraphOps
        .connectedComponentsWithStats(pairs, "doc_a", "doc_b")
      val k = labels.select("comp").distinct().count()
      org.apache.spark.sql.GraftColumns.unpersistCheckpoint(labels)
      println(s"    [cc shipped rounds=$rounds comps=$k]")
      k
    }
    def ccFolded(): Long = {
      import org.apache.spark.sql.GraftColumns
      val e0 = pairs.select(col("doc_a").as("u"), col("doc_b").as("v"))
      var cur = e0.filter(col("u") =!= col("v"))
        .select(greatest(col("u"), col("v")).as("a"),
                least(col("u"), col("v")).as("b"))
        .distinct().graftCheckpoint()
      def checksum(df: DataFrame): (Long, java.math.BigDecimal) = {
        val r = df.agg(count(lit(1)),
          sum(col("a").cast("decimal(38,0)") +
              col("b").cast("decimal(38,0)"))).collect()(0)
        (r.getLong(0), if (r.isNullAt(1)) java.math.BigDecimal.ZERO
                       else r.getDecimal(1))
      }
      var prev = checksum(cur)
      var iter = 0
      var converged = prev._1 == 0L
      while (!converged && iter < 50) {
        val sym = cur.select(col("a").as("x"), col("b").as("y"))
          .union(cur.select(col("b").as("x"), col("a").as("y")))
        val mins = sym.groupBy(col("x"))
          .agg(least(min(col("y")), col("x")).as("m"))
          .select(col("x").as("mx"), col("m"))
        // large-star rides a LAZY checkpoint: lineage truncated now, one
        // shared RDD for both consumers (no duplicated subplan, no
        // exchange-reuse race — the q269 lesson), blocks persist inside
        // the round's checksum job instead of their own
        val large = sym.filter(col("y") > col("x"))
          .join(mins, col("x") === col("mx"))
          .select(col("y").as("a"), col("m").as("b"))
          .distinct()
          .graftCheckpointLazy()
        val smin = large.groupBy(col("a"))
          .agg(min(col("b")).as("m"))
          .select(col("a").as("sa"), col("m"))
        val small = large
          .join(smin, col("a") === col("sa"))
          .select(col("b").as("a"), col("m").as("b"))
          .filter(col("a") =!= col("b"))
          .unionByName(smin.select(col("sa").as("a"), col("m").as("b")))
          .distinct()
          .graftCheckpoint()
        GraftColumns.unpersistCheckpoint(large)
        GraftColumns.unpersistCheckpoint(cur)
        cur = small
        val s = checksum(cur)
        converged = s._1 == prev._1 && s._2.compareTo(prev._2) == 0
        prev = s
        iter += 1
      }
      val k = cur.select(col("b")).distinct().count()
      GraftColumns.unpersistCheckpoint(cur)
      println(s"    [cc folded rounds=$iter]")
      k
    }

    val variants: Seq[(String, () => Long)] = Seq(
      "rank_eager" -> (eager _), "rank_lazy" -> (lazyChain _),
      "rank_every2" -> (every2 _),
      "cc_shipped" -> (ccShipped _), "cc_folded" -> (ccFolded _))
    val times = scala.collection.mutable.Map.empty[String, List[Double]]
      .withDefaultValue(Nil)
    // warmup (codegen/JIT) once per variant, untimed
    variants.foreach { case (_, f) => f() }
    for (rep <- 1 to reps; (name, f) <- variants) {
      val t0 = System.nanoTime()
      val out = f()
      val dt = (System.nanoTime() - t0) / 1e9
      times(name) = dt :: times(name)
      println(f"[ab] rep$rep $name%-12s $dt%6.2f s (out=$out)")
    }
    println("== min-of-" + reps + " ==")
    variants.foreach { case (name, _) =>
      println(f"[ab] $name%-12s min=${times(name).min}%6.2f s " +
        f"all=${times(name).reverse.map(t => f"$t%.2f").mkString(",")}")
    }
    spark.stop()
  }
}
