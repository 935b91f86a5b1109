package graft.operators

import org.apache.spark.sql.functions._

import graft.SparkSpec

/** Contracts of [[ZOrder]]: bit-exact Morton codes vs a reference loop
  * interleave, equal-size deterministic file assignment with
  * non-overlapping z-ranges, and the out-of-domain fail-fast.
  */
class ZOrderSpec extends SparkSpec {
  import spark.implicits._

  /** Reference interleave: bit i of a → bit 2i, bit i of b → bit 2i+1. */
  private def mortonRef(a: Long, b: Long): Long = {
    var z = 0L
    var i = 0
    while (i < 32) {
      z |= ((a >> i) & 1L) << (2 * i)
      z |= ((b >> i) & 1L) << (2 * i + 1)
      i += 1
    }
    z
  }

  test("zValue is bit-exact vs the reference interleave, incl. edges") {
    val rng = new scala.util.Random(42)
    val cases = Seq((0L, 0L), (0xFFFFFFFFL, 0xFFFFFFFFL), (1L, 0L),
                    (0L, 1L), (0xFFFFFFFFL, 0L)) ++
      Seq.fill(200)((rng.nextInt(Int.MaxValue).toLong,
                     rng.nextInt(Int.MaxValue).toLong))
    val got = cases.toDF("a", "b")
      .select(col("a"), col("b"), ZOrder.zValue(col("a"), col("b")).as("z"))
      .collect()
    got.foreach { r =>
      val (a, b, z) = (r.getLong(0), r.getLong(1), r.getLong(2))
      assert(z === mortonRef(a, b), s"($a, $b)")
    }
  }

  test("layout: equal file sizes, deterministic, z-ranges do not overlap") {
    val rng = new scala.util.Random(7)
    val rows = (1L to 997L).map(i =>
      (i, rng.nextInt(1000).toLong, rng.nextInt(1000).toLong))
    val df = rows.toDF("id", "a", "b")
    val laid = ZOrder.layout(df, "a", "b", col("id"), rowsPerFile = 100L)
    val rep = ZOrder.localityReport(laid, "a", "b").collect()
    assert(rep.map(_.getLong(0)).toSeq === (0L to 9L))
    assert(rep.map(_.getLong(1)).toSeq ===
      Seq.fill(9)(100L) :+ 97L) // last file short
    rep.sliding(2).foreach { w =>
      assert(w(1).getLong(6) >= w(0).getLong(7), // z_lo(i+1) >= z_hi(i)
        s"overlap between files ${w(0).getLong(0)} and ${w(1).getLong(0)}")
    }
    // determinism: a second run assigns identical file ids per row
    val again = ZOrder.layout(df, "a", "b", col("id"), rowsPerFile = 100L)
      .select("id", "file_id").collect().map(r => r.getLong(0) -> r.getLong(1))
    val first = laid.select("id", "file_id").collect()
      .map(r => r.getLong(0) -> r.getLong(1))
    assert(first.sortBy(_._1).toSeq === again.sortBy(_._1).toSeq)
  }

  test("reserved/output name collisions are rejected") {
    import org.apache.spark.sql.functions.col
    val df = Seq((1L, 2L, 3L)).toDF("a", "b", "z")
    intercept[IllegalArgumentException] {
      ZOrder.layout(df, "a", "b", col("a"), 10L)
    }
  }

  test("out-of-domain dimensions fail fast") {
    val bad = Seq((1L, -1L, 5L)).toDF("id", "a", "b")
    val ex = intercept[Exception] {
      ZOrder.layout(bad, "a", "b", col("id"), 10L).collect()
    }
    assert(ex.getMessage != null)
  }

  /** Reference d-ary interleave: bit j of dim i → bit j·d + i. */
  private def mortonRefN(xs: Seq[Long], b: Int): Long = {
    val d = xs.length
    var z = 0L
    for (j <- 0 until b; i <- 0 until d)
      if (((xs(i) >> j) & 1L) != 0) z |= 1L << (j * d + i)
    z
  }

  test("zValueN is bit-exact vs the d-ary reference interleave for " +
       "3 and 4 dims, incl. corners (r12 verdict #6)") {
    val b3 = ZOrder.bitsPerDim(3)
    assert(b3 === 20 && ZOrder.bitsPerDim(4) === 15 &&
           ZOrder.bitsPerDim(2) === 31)
    val top = (1L << b3) - 1
    val rng = new scala.util.Random(11)
    val cases = Seq(Seq(0L, 0L, 0L), Seq(top, top, top), Seq(top, 0L, 1L),
                    Seq(1L, 2L, 4L)) ++
      Seq.fill(100)(Seq.fill(3)(rng.nextInt(1 << b3).toLong))
    val got = cases.map(c => (c(0), c(1), c(2))).toDF("a", "b", "c")
      .select(col("a"), col("b"), col("c"),
              ZOrder.zValueN(Seq(col("a"), col("b"), col("c"))).as("z"))
      .collect()
    got.foreach { r =>
      val xs = Seq(r.getLong(0), r.getLong(1), r.getLong(2))
      assert(r.getLong(3) === mortonRefN(xs, b3), xs.toString)
    }
    val b4 = ZOrder.bitsPerDim(4)
    val g4 = Seq((1L, 2L, 3L, (1L << b4) - 1)).toDF("a", "b", "c", "d")
      .select(ZOrder.zValueN(
        Seq(col("a"), col("b"), col("c"), col("d"))).as("z"))
      .collect()(0).getLong(0)
    assert(g4 === mortonRefN(Seq(1L, 2L, 3L, (1L << b4) - 1), b4))
  }

  test("layoutN/localityReportN cover every row with ordered disjoint " +
       "z-ranges; out-of-domain fails fast at the d-derived bound") {
    val rng = new scala.util.Random(13)
    val rows = (1L to 499L).map(i =>
      (i, rng.nextInt(1000).toLong, rng.nextInt(1000).toLong,
       rng.nextInt(1000).toLong))
    val laid = ZOrder.layoutN(rows.toDF("id", "a", "b", "c"),
                              Seq("a", "b", "c"), col("id"), 100L)
    val rep = ZOrder.localityReportN(laid, Seq("a", "b", "c")).collect()
    assert(rep.map(_.getLong(1)).sum === 499L)
    assert(rep.map(_.getLong(0)).toSeq === (0L until 5L).toSeq)
    val ranges = rep.map(r => (r.getLong(8), r.getLong(9)))
    for (Array((_, hi0), (lo1, _)) <- ranges.sliding(2).map(_.toArray))
      assert(hi0 <= lo1, "file z-ranges must be ordered")
    val bad = Seq((1L, 1L << 20, 0L, 0L)).toDF("id", "a", "b", "c")
    val ex = intercept[Exception] {
      ZOrder.layoutN(bad, Seq("a", "b", "c"), col("id"), 10L).collect()
    }
    assert(ex.getMessage.contains("zValueN: dimension out of"))
  }
}
