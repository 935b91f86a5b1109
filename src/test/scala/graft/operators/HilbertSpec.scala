package graft.operators

import org.apache.spark.sql.functions.col

import graft.SparkSpec

/** Contracts of [[Hilbert]]: the d-value matches an independent
  * imperative xy2d walk, the curve is CONTINUOUS (consecutive cells are
  * grid-adjacent — the property that distinguishes a Hilbert curve from
  * Morton interleave), the first cells match the canonical 2×2 table,
  * and the domain guard fails fast.
  */
class HilbertSpec extends SparkSpec {
  import spark.implicits._

  /** Independent reference: the textbook xy2d loop, written imperatively
    * (mutable state) so it shares no code path with the operator's
    * column chain.
    */
  private def xy2d(x0: Int, y0: Int): Long = {
    var x = x0; var y = y0; var d = 0L
    var s = 1 << (Hilbert.Bits - 1)
    while (s > 0) {
      val rx = if ((x & s) > 0) 1 else 0
      val ry = if ((y & s) > 0) 1 else 0
      d += s.toLong * s * ((3 * rx) ^ ry)
      if (ry == 0) {
        if (rx == 1) { x = s - 1 - x; y = s - 1 - y }
        val t = x; x = y; y = t
      }
      s >>= 1
    }
    d
  }

  test("withHilbert matches the imperative reference on a scattered " +
       "sample including domain corners") {
    val pts = Seq((0, 0), (1, 0), (0, 1), (1, 1), (65535, 65535),
                  (65535, 0), (0, 65535), (12345, 54321), (40000, 1),
                  (257, 65534), (31337, 31337))
    val got = Hilbert.withHilbert(
        pts.toDF("x", "y"), "x", "y")
      .select(col("x"), col("y"), col("h"))
      .as[(Int, Int, Long)].collect()
      .map { case (x, y, h) => (x, y) -> h }.toMap
    for ((x, y) <- pts)
      assert(got((x, y)) === xy2d(x, y), s"($x, $y)")
  }

  test("the origin 2x2 block is the curve's first four cells, starting " +
       "at the origin") {
    // orientation of the innermost U depends on the rotations
    // accumulated down all 16 levels (swap parity), so the exact
    // (0,1)-vs-(1,0) order is NOT invariant — what is: the origin cell
    // is d = 0 and the origin block occupies d ∈ {0,1,2,3} (first four
    // cells of the whole curve), with (1,1) never adjacent to (0,0)
    assert(xy2d(0, 0) === 0L)
    val block = Map((0, 0) -> xy2d(0, 0), (0, 1) -> xy2d(0, 1),
                    (1, 0) -> xy2d(1, 0), (1, 1) -> xy2d(1, 1))
    assert(block.values.toSet === Set(0L, 1L, 2L, 3L))
    assert(block((1, 1)) === 2L,
      "the diagonal cell sits two steps along the U, whatever the " +
      "orientation")
  }

  test("continuity: consecutive d-values in the origin 16x16 recursive " +
       "cell are grid-adjacent (the property Morton lacks)") {
    val cells = for (x <- 0 until 16; y <- 0 until 16) yield (x, y)
    val byD = Hilbert.withHilbert(cells.toDF("x", "y"), "x", "y")
      .select(col("h"), col("x"), col("y"))
      .as[(Long, Int, Int)].collect().sortBy(_._1)
    // the origin 16x16 square is a recursive sub-cell: its 256 cells
    // occupy 256 CONSECUTIVE d values
    assert(byD.last._1 - byD.head._1 === 255L, "sub-cell not contiguous")
    for (Array((_, x0, y0), (_, x1, y1)) <- byD.sliding(2).map(_.toArray))
      assert(math.abs(x1 - x0) + math.abs(y1 - y0) === 1,
        s"jump between ($x0,$y0) and ($x1,$y1)")
  }

  test("domain guard: negative or >= 2^31 dimensions raise; the old " +
       "2^16 ceiling (sf1.0 key domains) is now inside the domain") {
    val bad = Seq((1L << 31, 3L)).toDF("x", "y")
    val e = intercept[Exception] {
      Hilbert.withHilbert(bad, "x", "y").collect()
    }
    assert(e.getMessage.contains("hilbert: dimension out of"))
    val neg = Seq((-1L, 3L)).toDF("x", "y")
    val e2 = intercept[Exception] {
      Hilbert.withHilbert(neg, "x", "y").collect()
    }
    assert(e2.getMessage.contains("hilbert: dimension out of"))
    // 2,000,000 (the synthesized-sf1.0 l_partkey range that used to
    // fail) now matches the reference walk
    val wide = Seq((2000000L, 70000L)).toDF("x", "y")
    val h = Hilbert.withHilbert(wide, "x", "y")
      .select(col("h")).as[Long].collect()(0)
    assert(h === xy2d(2000000, 70000))
  }

  test("layout assigns contiguous equal files in (h, tie) order and " +
       "the report covers every row") {
    val df = (0L until 97L).map(i => (i, (i * 7 % 64).toInt,
                                      (i * 13 % 64).toInt))
      .toDF("rid", "a", "b")
    val laid = Hilbert.layout(df, "a", "b", col("rid"), rowsPerFile = 25L)
    val rep = Hilbert.localityReport(laid, "a", "b").collect()
    assert(rep.map(_.getLong(1)).sum === 97L)
    assert(rep.map(_.getLong(0)).toSeq === Seq(0L, 1L, 2L, 3L))
    assert(rep.map(_.getLong(1)).toSeq === Seq(25L, 25L, 25L, 22L))
    // file h-ranges are disjoint and ordered
    val ranges = rep.map(r => (r.getLong(6), r.getLong(7)))
    for (Array((_, hi0), (lo1, _)) <- ranges.sliding(2).map(_.toArray))
      assert(hi0 <= lo1, "file h-ranges must be ordered")
  }
}
