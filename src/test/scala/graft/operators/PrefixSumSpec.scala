package graft.operators

import org.apache.spark.sql.functions._

import graft.SparkSpec

/** Contracts of [[PrefixSum.runningTotal]]: exact global running sum
  * under any partition count (the offsets must stitch partitions
  * seamlessly), null values count as 0, and the plan never funnels the
  * data through one task.
  */
class PrefixSumSpec extends SparkSpec {

  test("matches the sequential scan for every partition count") {
    import spark.implicits._
    // values 1..200 in a scrambled order; global order = key asc
    val rows = (1 to 200).map(i => (i.toLong, ((i * 7919) % 97 + 1).toLong))
    val expected = rows.sortBy(_._1)
      .scanLeft((0L, 0L, 0L)) { case ((_, _, c), (k, v)) => (k, v, c + v) }
      .drop(1).map { case (k, _, c) => k -> c }.toMap
    val df = rows.toDF("k", "v").repartition(7)
    for (parts <- Seq(1, 3, 32, 64)) { // incl. more partitions than rows/32
      val got = PrefixSum.runningTotal(df, "v", Seq("k"), numParts = parts)
        .collect().map(r => r.getAs[Long]("k") -> r.getAs[Long]("cum")).toMap
      assert(got == expected, s"numParts=$parts")
    }
  }

  test("null values count as 0 and do not break the chain") {
    import spark.implicits._
    val df = Seq((1L, Some(5L)), (2L, None), (3L, Some(7L)))
      .toDF("k", "v")
    val got = PrefixSum.runningTotal(df, "v", Seq("k"))
      .collect().map(r => r.getAs[Long]("k") -> r.getAs[Long]("cum")).toMap
    assert(got == Map(1L -> 5L, 2L -> 5L, 3L -> 12L))
  }

  test("no single-partition funnel of the data: the only unpartitioned " +
       "window is over per-partition totals") {
    import spark.implicits._
    val df = spark.range(10000).select(
      col("id").as("k"), (col("id") % 13).as("v"))
    val out = PrefixSum.runningTotal(df, "v", Seq("k"), numParts = 16)
    // data arrives range-partitioned: all 16 partitions carry rows
    val sizes = out.groupBy(spark_partition_id().as("p")).count()
      .collect().map(_.getLong(1))
    assert(sizes.length == 16 && sizes.max < 10000,
      s"expected 16 populated range partitions, got ${sizes.toSeq}")
    // spot-check the global property at the seams: cum is monotone in k
    val cums = out.orderBy("k").select("cum")
      .collect().map(_.getLong(0))
    assert(cums.zip(cums.tail).forall { case (a, b) => b >= a },
      "running total must be monotone for non-negative values")
    assert(cums.last == (0 until 10000).map(_ % 13).sum)
  }

  test("reserved/output name collisions fail fast") {
    import spark.implicits._
    val bad = Seq((1L, 2L)).toDF("k", "cum")
    intercept[IllegalArgumentException] {
      PrefixSum.runningTotal(bad, "k", Seq("k"))
    }
    val bad2 = Seq((1L, 2L)).toDF("k", "__pid")
    intercept[IllegalArgumentException] {
      PrefixSum.runningTotal(bad2, "k", Seq("k"))
    }
  }

  test("executed plans: ONE full-data range exchange, no data-sized " +
       "window, totals read the cache") {
    val df = spark.range(5000).select(
      col("id").as("k"), (col("id") % 7).as("v"))
    withCapturedPlans {
      PrefixSum.runningTotal(df, "v", Seq("k"), numParts = 8).collect()
    } { plans =>
      val all = plans.mkString("\n===\n")
      assert(!all.contains("Window"),
        s"no window anywhere — offsets are driver-side:\n$all")
      // the range exchange must live only INSIDE the cached relation
      // (the InMemoryRelation node embeds its build plan in the plan
      // string, so a raw substring count over-counts): truncate each
      // plan at the cache node and assert no consumer re-shuffles the
      // data outside it
      val outsideCache = plans.map { p =>
        val idx = p.indexOf("InMemoryRelation")
        if (idx >= 0) p.substring(0, idx) else p
      }
      assert(!outsideCache.exists(_.contains("Exchange rangepartitioning")),
        s"range exchange must only appear inside the cached relation — " +
          s"every consumer reads the cache, never re-shuffles:\n$all")
      val cacheReaders = plans.count(_.contains("InMemoryTableScan"))
      assert(cacheReaders >= 2,
        s"both the totals pass and the output pass must read the " +
          s"persisted ranged data, got $cacheReaders readers:\n$all")
    }
  }

  test("runningMaxFlag: cum max and strict-new-max flags match a " +
       "sequential fold across many partitions") {
    import spark.implicits._
    val rng = new scala.util.Random(21)
    val rows = (1L to 4000L).map(i => (i, rng.nextInt(500).toLong))
    val df = rows.toDF("ord", "v").repartition(16)
    val got = PrefixSum.runningMaxFlag(df, "v", Seq("ord"), numParts = 8)
      .collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getBoolean(3)))
      .sortBy(_._1)
    var run = Long.MinValue
    rows.zip(got).foreach { case ((ord, v), (gOrd, gV, gMax, gFlag)) =>
      assert(gOrd === ord && gV === v)
      val isNew = v > run
      run = math.max(run, v)
      assert(gMax === run, s"cum max at ord=$ord")
      assert(gFlag === isNew, s"flag at ord=$ord")
    }
    assert(got.count(_._4) > 1, "fixture must produce several new maxima")
  }

  test("runningMaxFlag: negative values and a first-row flag") {
    import spark.implicits._
    val df = Seq((1L, -5L), (2L, -7L), (3L, -2L)).toDF("ord", "v")
    val got = PrefixSum.runningMaxFlag(df, "v", Seq("ord"))
      .collect().map(r => (r.getLong(0), r.getBoolean(3))).sortBy(_._1)
    assert(got.toSeq === Seq((1L, true), (2L, false), (3L, true)))
  }

  test("denseRank equals the window dense_rank at several partition " +
       "counts, heavy duplicate runs crossing boundaries included") {
    import spark.implicits._
    val rng = new scala.util.Random(7)
    // few distinct keys over many rows -> runs MUST cross partition
    // boundaries, exercising the shared-key offset correction
    val rows = (1L to 3000L).map(i => (i, rng.nextInt(12).toLong,
                                       rng.nextInt(3).toLong))
    val df = rows.toDF("id", "k1", "k2").repartition(13)
    val expected = rows.map { case (_, k1, k2) => (k1, k2) }
      .distinct.sorted.zipWithIndex
      .map { case (k, i) => k -> (i + 1L) }.toMap
    for (parts <- Seq(1, 3, 16)) {
      val got = PrefixSum.denseRank(df, Seq("k1", "k2"), numParts = parts)
        .collect()
        .map(r => ((r.getLong(1), r.getLong(2)), r.getLong(3)))
      got.foreach { case (k, rank) =>
        assert(rank === expected(k), s"key $k at parts=$parts")
      }
    }
  }

  test("denseRank rejects float order columns") {
    import spark.implicits._
    val df = Seq((1L, 0.5)).toDF("id", "x")
    intercept[IllegalArgumentException] {
      PrefixSum.denseRank(df, Seq("x"))
    }
  }

  test("denseRank keeps a NULL key and the literal string \"null\" " +
       "distinct across every boundary layout") {
    import spark.implicits._
    // many copies so the (null, "null") run crosses partition
    // boundaries in at least one layout — the boundary pass used to
    // render both as "null" and fuse them (ADVICE r10)
    val rows: Seq[(Long, String)] =
      (1L to 40L).map(i => (i, if (i % 2 == 0) null else "null")) ++
        Seq((41L, "a"), (42L, "zz"))
    val df = rows.toDF("id", "k")
    for (parts <- Seq(1, 3, 16)) {
      val got = PrefixSum.denseRank(df, Seq("k"), numParts = parts)
        .collect().map(r => (Option(r.getString(1)), r.getLong(2)))
        .toSet
      // Spark sorts NULL FIRST ascending: null=1, "a"=2, "null"=3, "zz"=4
      assert(got === Set((None, 1L), (Some("a"), 2L),
                         (Some("null"), 3L), (Some("zz"), 4L)),
             s"at parts=$parts")
    }
  }
}
