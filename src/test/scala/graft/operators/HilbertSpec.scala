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

  /** Independent d-D reference: Skilling's AxesToTranspose + interleave,
    * written imperatively on arrays so it shares no code with the
    * operator's column chain (r12 verdict #6).
    */
  private def skilling(xs0: Seq[Long], b: Int): Long = {
    val n = xs0.length
    val x = xs0.toArray
    var q = 1L << (b - 1)
    while (q > 1) {
      val p = q - 1
      for (i <- 0 until n) {
        if ((x(i) & q) != 0) x(0) ^= p
        else { val t = (x(0) ^ x(i)) & p; x(0) ^= t; x(i) ^= t }
      }
      q >>= 1
    }
    for (i <- 1 until n) x(i) ^= x(i - 1)
    var t = 0L; q = 1L << (b - 1)
    while (q > 1) { if ((x(n - 1) & q) != 0) t ^= q - 1; q >>= 1 }
    for (i <- 0 until n) x(i) ^= t
    var h = 0L
    for (j <- 0 until b; i <- 0 until n)
      if ((x(i) & (1L << j)) != 0) h |= 1L << (j * n + (n - 1 - i))
    h
  }

  test("withHilbertN matches the imperative Skilling reference on " +
       "scattered 3-D and 4-D samples including domain corners") {
    val b3 = ZOrder.bitsPerDim(3) // 20
    val top3 = (1L << b3) - 1
    val pts3 = Seq(
      (0L, 0L, 0L), (1L, 0L, 0L), (0L, 1L, 1L), (top3, top3, top3),
      (top3, 0L, top3), (123456L, 654321L, 999999L),
      (200000L, 10000L, 2500L), (1L, top3, 524288L))
    val got3 = Hilbert.withHilbertN(
        pts3.toDF("x", "y", "z"), Seq("x", "y", "z"))
      .select(col("x"), col("y"), col("z"), col("h"))
      .as[(Long, Long, Long, Long)].collect()
      .map { case (x, y, z, h) => (x, y, z) -> h }.toMap
    for ((x, y, z) <- pts3)
      assert(got3((x, y, z)) === skilling(Seq(x, y, z), b3),
             s"($x, $y, $z)")
    val b4 = ZOrder.bitsPerDim(4) // 15
    val top4 = (1L << b4) - 1
    val pts4 = Seq((0L, 0L, 0L, 0L), (top4, top4, top4, top4),
                   (12345L, 6789L, 1L, top4))
    val got4 = Hilbert.withHilbertN(
        pts4.toDF("a", "b", "c", "d"), Seq("a", "b", "c", "d"))
      .select(col("a"), col("b"), col("c"), col("d"), col("h"))
      .as[(Long, Long, Long, Long, Long)].collect()
      .map { case (a, bb, c, dd, h) => (a, bb, c, dd) -> h }.toMap
    for ((a, bb, c, dd) <- pts4)
      assert(got4((a, bb, c, dd)) === skilling(Seq(a, bb, c, dd), b4))
  }

  test("3-D continuity and bijectivity over the FULL 8x8x8 domain: " +
       "h is a permutation of 0..511 and consecutive cells are " +
       "grid-adjacent in exactly one axis") {
    val cells = for (x <- 0 until 8; y <- 0 until 8; z <- 0 until 8)
      yield (x.toLong, y.toLong, z.toLong)
    val byH = Hilbert.withHilbertN(
        cells.toDF("x", "y", "z"), Seq("x", "y", "z"), "h", 3)
      .select(col("h"), col("x"), col("y"), col("z"))
      .as[(Long, Long, Long, Long)].collect().sortBy(_._1)
    assert(byH.map(_._1).toSeq === (0L until 512L).toSeq,
           "h must be a bijection onto 0..511")
    assert(byH.head match { case (_, x, y, z) => x + y + z == 0L },
           "the curve starts at the origin")
    for (Array((_, x0, y0, z0), (_, x1, y1, z1))
           <- byH.sliding(2).map(_.toArray))
      assert(math.abs(x1 - x0) + math.abs(y1 - y0) + math.abs(z1 - z0)
               === 1L,
             s"jump between ($x0,$y0,$z0) and ($x1,$y1,$z1)")
  }

  test("layoutN + localityReportN: 3-D files are contiguous in h and " +
       "the domain guard fails fast out of [0, 2^20)") {
    val df = (0L until 97L).map(i =>
        (i, i * 7 % 64, i * 13 % 64, i * 29 % 64))
      .toDF("rid", "a", "b", "c")
    val laid = Hilbert.layoutN(df, Seq("a", "b", "c"), col("rid"),
                               rowsPerFile = 25L)
    val rep = Hilbert.localityReportN(laid, Seq("a", "b", "c")).collect()
    assert(rep.map(_.getLong(1)).sum === 97L)
    assert(rep.map(_.getLong(0)).toSeq === Seq(0L, 1L, 2L, 3L))
    val ranges = rep.map(r => (r.getLong(8), r.getLong(9)))
    for (Array((_, hi0), (lo1, _)) <- ranges.sliding(2).map(_.toArray))
      assert(hi0 <= lo1, "file h-ranges must be ordered")
    val e = intercept[Exception] {
      Hilbert.withHilbertN(Seq((1L << 20, 0L, 0L)).toDF("x", "y", "z"),
                           Seq("x", "y", "z")).collect()
    }
    assert(e.getMessage.contains("hilbertN: dimension out of"))
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
