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
}
