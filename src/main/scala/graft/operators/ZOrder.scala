package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.LongType

/** Z-order (Morton-curve) data layout — multi-dimensional clustering for
  * data skipping, the operation behind `OPTIMIZE ... ZORDER BY (a, b)`.
  *
  * Why it matters at 100 TB: min/max file statistics prune a scan only
  * along the sort dimension. Sorting by `a` makes `a`-range predicates
  * cheap but leaves `b` uniformly smeared over every file; interleaving
  * the bits of `a` and `b` and sorting by the interleaved value tiles the
  * (a, b) plane into near-square rectangles, so files carry TIGHT min/max
  * envelopes on BOTH columns and a predicate on either (or both) skips
  * most files. [[localityReport]] emits exactly those per-file envelopes,
  * making the skipping win measurable (and oracle-checkable).
  *
  * Execution shape, Spark-first:
  *   - [[zValue]] is pure Column arithmetic (5 shift/mask rounds per dim
  *     — the textbook bit-spread), fully inside whole-stage codegen; no
  *     UDF, no shuffle.
  *   - [[layout]]'s global order costs the ONE range-exchange any total
  *     sort pays; equal-size file assignment rides [[PrefixSum]]'s
  *     two-phase scan instead of a single-partition window (the classic
  *     `row_number() OVER (ORDER BY z)` scale-killer).
  *
  * Domain contract: dimension values must be non-negative and < 2^32
  * (cast/normalize upstream — rank-transform unbounded domains first).
  * Violations fail fast rather than silently fold distant keys together.
  */
object ZOrder {

  /** Shift/mask rounds of the 32→64-bit spread; shared with the oracle
    * SQL generator so the two sides cannot drift.
    */
  private[graft] val spreadSteps: Seq[(Int, Long)] = Seq(
    16 -> 0x0000FFFF0000FFFFL,
    8  -> 0x00FF00FF00FF00FFL,
    4  -> 0x0F0F0F0F0F0F0F0FL,
    2  -> 0x3333333333333333L,
    1  -> 0x5555555555555555L)

  /** Spreads the low 32 bits of `c` to the even bit positions of a long
    * (bit i → bit 2i). Pure shift/mask — codegen-friendly, no branches.
    */
  def spread32(c: Column): Column =
    spreadSteps.foldLeft(c.cast(LongType).bitwiseAND(lit(0xFFFFFFFFL))) {
      case (x, (sh, m)) => x.bitwiseOR(shiftleft(x, sh)).bitwiseAND(lit(m))
    }

  /** 64-bit Morton code of two 32-bit dimensions: `a` on even bits, `b`
    * on odd. Nulls or out-of-domain values (negative / ≥ 2^32) raise —
    * a z-curve over a clipped domain would silently break locality.
    */
  def zValue(a: Column, b: Column): Column = {
    def guarded(c: Column): Column =
      when(c.isNull.or(c < 0).or(c.cast(LongType) > lit(0xFFFFFFFFL)),
           raise_error(concat(lit("zValue: dimension out of [0, 2^32): "),
                              c.cast("string"))).cast(LongType))
        .otherwise(c.cast(LongType))
    spread32(guarded(a)).bitwiseOR(shiftleft(spread32(guarded(b)), 1))
  }

  /** Assigns each row to a z-ordered file: appends `z` (the Morton code
    * of `dimA`,`dimB`) and `file_id` (0-based, `rowsPerFile` rows each in
    * (z, tieBreak) order; the last file may be short). `tieBreak` must be
    * unique per row — it makes the global order total, so the assignment
    * is deterministic and oracle-reproducible.
    */
  def layout(df: DataFrame, dimA: String, dimB: String, tieBreak: Column,
             rowsPerFile: Long): DataFrame = {
    require(rowsPerFile > 0, s"rowsPerFile must be positive: $rowsPerFile")
    val clash = df.columns.toSet
      .intersect(Set("z", "file_id", "__tie", "__one", "__rn"))
    require(clash.isEmpty,
      s"layout: input columns collide with output/internal names: $clash")
    val withZ = df
      .withColumn("z", zValue(col(dimA), col(dimB)))
      .withColumn("__tie", tieBreak)
      .withColumn("__one", lit(1L))
    PrefixSum.runningTotal(withZ, "__one", Seq("z", "__tie"), cumCol = "__rn")
      .withColumn("file_id",
        floor((col("__rn") - 1) / lit(rowsPerFile)).cast(LongType))
      .drop("__tie", "__one", "__rn")
  }

  /** Per-file locality envelopes over a [[layout]] result: row count,
    * min/max of both dimensions (what a format's footer statistics would
    * store and a scan would prune on), and the file's z-range. Tight
    * rectangles here ARE the data-skipping win.
    */
  def localityReport(laid: DataFrame, dimA: String, dimB: String): DataFrame =
    laid.groupBy(col("file_id"))
      .agg(count(lit(1)).as("n_rows"),
           min(col(dimA)).as("min_a"), max(col(dimA)).as("max_a"),
           min(col(dimB)).as("min_b"), max(col(dimB)).as("max_b"),
           min(col("z")).as("z_lo"), max(col("z")).as("z_hi"))
      .orderBy("file_id")

  // ---------------------------------------------------------------
  // d-dimensional generalization (r12 verdict #6: production layouts
  // cluster 3–4 columns). The 2-D API above keeps its 32-bit domain
  // and magic-mask spread; the N-D path derives everything from the
  // dimension count so the operator, its guards, and the SQL oracle
  // generator share one set of constants.
  // ---------------------------------------------------------------

  /** Bits per dimension for a `d`-dim interleave: the widest equal
    * split that keeps the code inside NON-NEGATIVE signed int64 on
    * every engine (62 usable bits — bit 63 is the sign, and capping at
    * 62 also keeps downstream arithmetic like Hilbert's top-round term
    * safe). d=2 → 31 (the [[Hilbert.Bits]] domain), d=3 → 20, d=4 → 15.
    */
  def bitsPerDim(d: Int): Int = {
    require(d >= 2, s"need >= 2 dimensions, got $d")
    62 / d
  }

  /** Spreads the low `bits` bits of `c` to stride-`d` positions
    * (bit j → bit j·d) — the d-ary generalization of [[spread32]].
    * One shift/AND/shift per source bit, OR-folded: ~3·bits integer
    * ops, branch-free, fully codegen'd; linear cost that is noise next
    * to the layout's range exchange (the magic-mask doubling of the
    * 2-D path saves a constant factor only, and does not generalize to
    * arbitrary (d, bits) without a mask table per pair).
    */
  def spreadN(c: Column, d: Int, bits: Int): Column =
    (0 until bits).map { j =>
      shiftleft(shiftright(c, j).bitwiseAND(lit(1L)), j * d)
    }.reduce(_ bitwiseOR _)

  /** The same spread as DuckDB SQL, generated from the same loop — the
    * shared-constants discipline that keeps operator and oracle from
    * drifting.
    */
  private[graft] def spreadNSql(expr: String, d: Int, bits: Int): String =
    (0 until bits)
      .map(j => s"((($expr >> $j) & 1) << ${j * d})")
      .mkString(" | ")

  /** Morton code of `dims.length` dimensions: dims(0) on the lowest
    * stride offset (…so for equal prefixes the FIRST dimension varies
    * fastest — same convention as [[zValue]]'s even-bits-for-a). Each
    * dimension must sit in [0, 2^bitsPerDim(d)); violations raise —
    * a z-curve over a clipped domain silently breaks locality.
    *
    * Computed by the [[graft.functions.ZValueN]] loop kernel, not the
    * unrolled [[spreadN]] Column chain: the 3-dim unroll fused into a
    * 6.4 KB whole-stage method (r14 JIT audit near_limit — one more
    * fused expression from HotSpot's 8000-byte interpreter cliff).
    * Bit-identical values; the guard (same message) moved inside the
    * kernel. [[spreadN]] stays as the spec's independent reference and
    * the [[spreadNSql]] oracle generator's Spark-side mirror.
    */
  def zValueN(dims: Seq[Column]): Column = {
    import org.apache.spark.sql.GraftColumns
    val b = bitsPerDim(dims.length)
    GraftColumns.column(graft.functions.ZValueN(
      dims.map(c => GraftColumns.expression(c.cast(LongType))), b))
  }

  /** [[layout]] over d dimensions: appends `z` = [[zValueN]] of `dims`
    * and `file_id` (0-based, `rowsPerFile` rows each in (z, tieBreak)
    * order). Same scale shape as the 2-D path: codegen'd per-row key,
    * ONE range exchange, [[PrefixSum]] file assignment.
    */
  def layoutN(df: DataFrame, dims: Seq[String], tieBreak: Column,
              rowsPerFile: Long): DataFrame = {
    require(rowsPerFile > 0, s"rowsPerFile must be positive: $rowsPerFile")
    val clash = df.columns.toSet
      .intersect(Set("z", "file_id", "__tie", "__one", "__rn"))
    require(clash.isEmpty,
      s"layoutN: input columns collide with output/internal names: $clash")
    val withZ = df
      .withColumn("z", zValueN(dims.map(col)))
      .withColumn("__tie", tieBreak)
      .withColumn("__one", lit(1L))
    PrefixSum.runningTotal(withZ, "__one", Seq("z", "__tie"), cumCol = "__rn")
      .withColumn("file_id",
        floor((col("__rn") - 1) / lit(rowsPerFile)).cast(LongType))
      .drop("__tie", "__one", "__rn")
  }

  /** Per-file envelopes over a [[layoutN]] result: min/max per
    * dimension as min_d0/max_d0, min_d1/max_d1, … plus the z-range.
    */
  def localityReportN(laid: DataFrame, dims: Seq[String]): DataFrame =
    laid.groupBy(col("file_id"))
      .agg(count(lit(1)).as("n_rows"),
           dims.zipWithIndex.flatMap { case (c, i) =>
             Seq(min(col(c)).as(s"min_d$i"), max(col(c)).as(s"max_d$i"))
           } :+ min(col("z")).as("z_lo") :+ max(col("z")).as("z_hi"): _*)
      .orderBy("file_id")
}
