package graft.operators

import org.apache.spark.sql.functions._

import graft.SparkSpec

/** Contracts of the equi-depth histogram: ≤ B buckets covering every
  * value exactly once (cnt sums to N, lo/hi nested in order), depth
  * balance on uniform data, estimates EXACT when the range aligns
  * with bucket boundaries or covers everything, exact-zero outside
  * the domain, the uniform-interpolation value on a dense uniform
  * draw, and heavy values never split across buckets.
  */
class HistogramSpec extends SparkSpec {
  import spark.implicits._

  test("buckets partition the value set: cnt sums to N, ranges are " +
       "ordered and disjoint, at most B buckets") {
    val df = spark.range(10000).select((col("id") * 7 % 1000).as("v"))
    val h = Histogram.equiDepth(df, "v", 16).orderBy("bucket").collect()
    assert(h.length <= 16)
    assert(h.map(_.getAs[Long]("cnt")).sum === 10000L)
    h.sliding(2).foreach {
      case Array(a, b) =>
        assert(a.getAs[Long]("hi") < b.getAs[Long]("lo"),
          "bucket ranges must be ordered and disjoint")
      case _ =>
    }
    h.foreach(r => assert(r.getAs[Long]("lo") <= r.getAs[Long]("hi")))
  }

  test("uniform data: every bucket holds ~N/B rows (equi-DEPTH, not " +
       "equi-width)") {
    val df = spark.range(6400).select(col("id").as("v"))
    val h = Histogram.equiDepth(df, "v", 16).collect()
    assert(h.length === 16)
    h.foreach(r => assert(r.getAs[Long]("cnt") === 400L,
      s"uniform distinct values must split evenly: $r"))
  }

  test("estimate is EXACT for the full domain, zero outside it, and " +
       "exact on bucket-aligned ranges") {
    val df = spark.range(6400).select(col("id").as("v"))
    val h = Histogram.equiDepth(df, "v", 16)
    def est(a: Long, b: Long): Long =
      Histogram.estimateRange(h, a, b).collect().head.getLong(0)
    assert(est(0L, 6399L) === 6400L, "full domain is exact")
    assert(est(-100L, -1L) === 0L, "below the domain reads 0")
    assert(est(7000L, 9000L) === 0L, "above the domain reads 0")
    assert(est(400L, 1199L) === 800L,
      "bucket-aligned range sums whole buckets exactly")
  }

  test("straddled bucket interpolates uniformly: half a uniform " +
       "bucket estimates half its rows") {
    val df = spark.range(6400).select(col("id").as("v"))
    val h = Histogram.equiDepth(df, "v", 16)
    // bucket [400, 799] has 400 rows; [400, 599] covers half its width
    val est = Histogram.estimateRange(h, 400L, 599L)
      .collect().head.getLong(0)
    assert(est === 200L, s"uniform interpolation must halve: $est")
  }

  test("a heavy value never splits: its bucket's cnt carries the " +
       "full multiplicity (the skew witness)") {
    val df = spark.range(100).select(col("id").as("v"))
      .unionByName(Seq.fill(5000)(50L).toDF("v"))
    val h = Histogram.equiDepth(df, "v", 8)
    val heavy = h.filter(col("lo") <= 50L && col("hi") >= 50L)
      .collect()
    assert(heavy.length === 1, "value 50 must live in exactly one bucket")
    assert(heavy.head.getAs[Long]("cnt") >= 5000L,
      "the heavy value's bucket must carry its full multiplicity")
  }

  test("nulls are excluded (a range predicate never matches NULL)") {
    val df = spark.sql(
      "SELECT CAST(NULL AS BIGINT) AS v UNION ALL SELECT 1L " +
        "UNION ALL SELECT 2L UNION ALL SELECT 3L")
    val h = Histogram.equiDepth(df, "v", 4)
    assert(h.agg(sum("cnt")).collect().head.getLong(0) === 3L)
  }
}
