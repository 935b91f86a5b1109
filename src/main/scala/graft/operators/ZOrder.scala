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
}
