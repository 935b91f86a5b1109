package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.LongType
import graft.GraftOps._

/** Hilbert-curve data layout — the locality-stronger sibling of
  * [[ZOrder]]. Both interleave two dimensions into one sort key so file
  * min/max envelopes stay tight on BOTH columns; the Hilbert curve adds
  * the property Z-order lacks: CONSECUTIVE cells are always
  * grid-adjacent (no Z-shaped jumps across the plane), so file
  * envelopes never straddle the diagonal seams where Morton locality
  * tears. For range predicates the practical win is fewer boundary
  * files per query rectangle; the cost is ~3 CASE branches per bit
  * round instead of pure shift/mask.
  *
  * Execution shape, Spark-first: [[withHilbert]] is ONE codegen'd
  * expression — the compact native kernel
  * [[graft.functions.HilbertIndexXY]] (r13; the earlier per-round
  * projection chain fused into one whole-stage-codegen stage but its
  * unrolled consume method ran past HotSpot's 8000-bytecode JIT
  * ceiling and executed in the bytecode interpreter — see the kernel's
  * scaladoc for the measurements). No UDF, no shuffle for the value;
  * [[layout]] pays the one range exchange any total sort pays and
  * assigns files via [[PrefixSum]] — never a single-partition window.
  *
  * The round recurrence (the standard xy2d walk, top bit down):
  * rx = bit s of x, ry = bit s of y; d += s²·((3·rx) xor ry); then
  * rotate: when ry = 0, negate both (s−1−·) if rx = 1 and swap x↔y.
  * s−1−x may go negative once upper bits are present — harmless and
  * ENGINE-AGREED: only bits below s are ever examined again, and bits
  * below s of s−1−x equal those of s−1−(x mod s) exactly (the
  * subtracted multiple of s cannot borrow into them); Spark, DuckDB,
  * and the JVM all run two's-complement int64 `&`.
  *
  * Domain contract: dimensions in [0, 2^31) — d then fits 62 bits, the
  * widest that keeps the top round's 3·s² term inside SIGNED int64 on
  * both engines (Bits = 32 would put 3·2^62 past Long.MaxValue).
  * Widened from 2^16 in r12: the sf1.0 growth sweep showed real key
  * domains (remapped l_partkey ≈ 2·10⁶) blowing the old bound, and a
  * layout operator must cover production key ranges. Violations still
  * fail fast — a curve over a clipped domain silently breaks locality.
  * The SQL oracle generator ([[oracleCtes]]) derives from the SAME round
  * constants, so the two sides cannot drift.
  */
object Hilbert {

  /** Dimension bit width; d spans [0, 2^(2·Bits)) — see the domain
    * contract above for why 31 is the int64 ceiling.
    */
  val Bits = 31

  /** Round scales, high bit first — shared with the oracle generator. */
  private[graft] val roundScales: Seq[Long] =
    (Bits - 1 to 0 by -1).map(1L << _)

  /** Appends column `out` = the Hilbert d-value of (dimA, dimB).
    *
    * r13: the per-round `withColumn` chain is replaced by the compact
    * codegen kernel [[graft.functions.HilbertIndexXY]] — the chain
    * fused into one whole-stage-codegen stage, but its generated
    * consume method unrolled 31 rounds of CASE arithmetic past
    * HotSpot's 8000-bytecode DontCompileHugeMethods ceiling and ran in
    * the JVM BYTECODE INTERPRETER (~18 µs/row; ~11 s for the d-value
    * alone at sf0.1). The kernel is a few hundred bytecodes, JITs, and
    * computes identical values (`HilbertSpec` pins it against the
    * independent imperative walk; the oracle still replays
    * [[roundScales]], so cross-engine parity stays gated). Same
    * domain guard, now inside the kernel: null or out-of-[0, 2^31)
    * dimensions throw.
    */
  def withHilbert(df: DataFrame, dimA: String, dimB: String,
                  out: String = "h"): DataFrame = {
    require(!df.columns.contains(out),
      s"withHilbert: input already has a '$out' column")
    import org.apache.spark.sql.GraftColumns
    df.withColumn(out, GraftColumns.column(graft.functions.HilbertIndexXY(
      GraftColumns.expression(col(dimA).cast(LongType)),
      GraftColumns.expression(col(dimB).cast(LongType)), Bits)))
  }

  /** [[ZOrder.layout]] on the Hilbert key: appends `h` and `file_id`
    * (0-based, `rowsPerFile` rows each in (h, tieBreak) order;
    * `tieBreak` must be unique per row for a total, oracle-reproducible
    * order).
    */
  def layout(df: DataFrame, dimA: String, dimB: String, tieBreak: Column,
             rowsPerFile: Long): DataFrame = {
    require(rowsPerFile > 0, s"rowsPerFile must be positive: $rowsPerFile")
    val clash = df.columns.toSet
      .intersect(Set("h", "file_id", "__tie", "__one", "__rn"))
    require(clash.isEmpty,
      s"layout: input columns collide with output/internal names: $clash")
    // No pre-exchange checkpoint (r13): the range partitioner's
    // sampling job re-executes the input plan, which mattered when the
    // d-value was the interpreted 31-round chain (13.6 s vs 4 s at
    // sf0.1); the JIT'd kernel is nearly free to recompute, so the
    // layout takes the same no-materialization shape as ZOrder.
    val withH = withHilbert(df, dimA, dimB, out = "h")
      .withColumn("__tie", tieBreak)
      .withColumn("__one", lit(1L))
    PrefixSum
      .runningTotal(withH, "__one", Seq("h", "__tie"), cumCol = "__rn")
      .withColumn("file_id",
        floor((col("__rn") - 1) / lit(rowsPerFile)).cast(LongType))
      .drop("__tie", "__one", "__rn")
  }

  /** Per-file locality envelopes over a [[layout]] result — the footer
    * statistics a scan prunes on, plus the file's h-range.
    */
  def localityReport(laid: DataFrame, dimA: String, dimB: String): DataFrame =
    laid.groupBy(col("file_id"))
      .agg(count(lit(1)).as("n_rows"),
           min(col(dimA)).as("min_a"), max(col(dimA)).as("max_a"),
           min(col(dimB)).as("min_b"), max(col(dimB)).as("max_b"),
           min(col("h")).as("h_lo"), max(col("h")).as("h_hi"))
      .orderBy("file_id")

  // ---------------------------------------------------------------
  // d-dimensional Hilbert (r12 verdict #6) via Skilling's transform
  // ("Programming the Hilbert curve", J. Skilling, AIP Conf. Proc.
  // 707 (2004) — the standard public-domain d-D algorithm): walk the
  // bit planes top-down exchanging/inverting axes against axis 0,
  // Gray-encode across axes, fold a parity correction from the last
  // axis, then bit-interleave the transposed axes into one scalar.
  // Computed by the compact codegen kernel
  // [[graft.functions.HilbertIndexN]] (r13 — the 2-D kernel's
  // huge-method reasoning applies ×d), and the SQL oracle generator
  // below replays the identical rounds from the same constants.
  // ---------------------------------------------------------------

  /** Bit-plane scales for a b-bit transform: Q = 2^(b−1) … 2. */
  private[graft] def roundScalesB(b: Int): Seq[Long] =
    (b - 1 to 1 by -1).map(1L << _)

  /** Appends `out` = the d-dimensional Hilbert index of `dims`
    * (d = dims.length ≥ 2; each value must sit in
    * [0, 2^bitsPerDim(d)), violations raise). The index spans
    * [0, 2^(d·bitsPerDim(d))) and inherits the Hilbert adjacency
    * property in d dimensions: consecutive indices differ by ±1 in
    * exactly one coordinate (`HilbertSpec` walks a full small domain
    * to pin it). The 2-D [[withHilbert]] keeps its own xy2d walk —
    * the two curves are both Hilbert but differently oriented, so
    * their oracles stay separate.
    */
  def withHilbertN(df: DataFrame, dims: Seq[String],
                   out: String = "h"): DataFrame =
    withHilbertN(df, dims, out, ZOrder.bitsPerDim(dims.length))

  /** [[withHilbertN]] at an explicit per-dim bit width — private: the
    * spec walks a FULL small domain (bits = 3 → 8³ cells) to pin the
    * adjacency/bijectivity properties exhaustively, which the
    * production width (2^60 cells at d = 3) cannot.
    *
    * r13: computed by the compact codegen kernel
    * [[graft.functions.HilbertIndexN]] (same reasoning as the 2-D
    * [[withHilbert]] — the unrolled 19×3-round chain ran past
    * HotSpot's huge-method JIT ceiling); the kernel's loop IS the
    * Skilling algorithm the [[oracleCtesN]] CTE chain replays from
    * [[roundScalesB]], and `HilbertSpec` pins it against an
    * independent imperative reference.
    */
  private[graft] def withHilbertN(df: DataFrame, dims: Seq[String],
                                  out: String, b: Int): DataFrame = {
    val d = dims.length
    require(d >= 2, s"need >= 2 dimensions, got $d")
    require(!df.columns.contains(out),
      s"withHilbertN: input already has a '$out' column")
    import org.apache.spark.sql.GraftColumns
    df.withColumn(out, GraftColumns.column(graft.functions.HilbertIndexN(
      dims.map(c => GraftColumns.expression(col(c).cast(LongType))), b)))
  }

  /** [[layout]] over d dimensions on the Skilling index: appends `h`
    * and `file_id`. Same scale shape: a codegen'd per-row key
    * (cheap to recompute, so no pre-exchange materialization), ONE
    * range exchange, [[PrefixSum]] file assignment.
    */
  def layoutN(df: DataFrame, dims: Seq[String], tieBreak: Column,
              rowsPerFile: Long): DataFrame = {
    require(rowsPerFile > 0, s"rowsPerFile must be positive: $rowsPerFile")
    val clash = df.columns.toSet
      .intersect(Set("h", "file_id", "__tie", "__one", "__rn"))
    require(clash.isEmpty,
      s"layoutN: input columns collide with output/internal names: $clash")
    val withH = withHilbertN(df, dims, out = "h")
      .withColumn("__tie", tieBreak)
      .withColumn("__one", lit(1L))
    PrefixSum
      .runningTotal(withH, "__one", Seq("h", "__tie"), cumCol = "__rn")
      .withColumn("file_id",
        floor((col("__rn") - 1) / lit(rowsPerFile)).cast(LongType))
      .drop("__tie", "__one", "__rn")
  }

  /** Per-file envelopes over a [[layoutN]] result — min/max per
    * dimension (min_d0/max_d0, …) plus the h-range; the
    * [[ZOrder.localityReportN]] shape on the Hilbert key.
    */
  def localityReportN(laid: DataFrame, dims: Seq[String]): DataFrame =
    laid.groupBy(col("file_id"))
      .agg(count(lit(1)).as("n_rows"),
           dims.zipWithIndex.flatMap { case (c, i) =>
             Seq(min(col(c)).as(s"min_d$i"), max(col(c)).as(s"max_d$i"))
           } :+ min(col("h")).as("h_lo") :+ max(col("h")).as("h_hi"): _*)
      .orderBy("file_id")

  /** DuckDB oracle fragment for [[withHilbertN]]: the identical
    * Skilling rounds as a CTE chain `s0..sK`, generated from the SAME
    * [[roundScalesB]]/[[ZOrder.spreadNSql]] constants. `srcCte` must
    * provide `xCols` and the passthrough list `keep`; the final CTE
    * (whose name this returns as the second tuple element) carries
    * (keep, hd).
    */
  private[graft] def oracleCtesN(srcCte: String, xCols: Seq[String],
                                 keep: String): (String, String) = {
    val d = xCols.length
    val b = ZOrder.bitsPerDim(d)
    val gs = (0 until d).map(i => s"g$i")
    var k = 0
    val parts = scala.collection.mutable.ArrayBuffer.empty[String]
    val g0Init = xCols.zip(gs)
      .map { case (x, g) => s"CAST($x AS BIGINT) AS $g" }.mkString(", ")
    parts += s"s0 AS (SELECT $keep, $g0Init FROM $srcCte)"
    for (q <- roundScalesB(b)) {
      val p = q - 1
      // axis 0 inverts against itself
      k += 1
      parts +=
        s"""s$k AS (SELECT $keep,
           |  CASE WHEN (g0 & $q) > 0 THEN xor(g0, $p) ELSE g0 END AS g0,
           |  ${gs.drop(1).mkString(", ")} FROM s${k - 1})""".stripMargin
      for (i <- 1 until d) {
        val gi = gs(i)
        val others = gs.filter(g => g != "g0" && g != gi)
        val othersSel = if (others.isEmpty) "" else others.mkString(", ", ", ", "")
        k += 1
        parts +=
          s"""s$k AS (SELECT $keep,
             |  CASE WHEN ($gi & $q) > 0 THEN xor(g0, $p)
             |       ELSE xor(g0, ht) END AS g0,
             |  CASE WHEN ($gi & $q) > 0 THEN $gi
             |       ELSE xor($gi, ht) END AS $gi$othersSel
             |  FROM (SELECT *, (xor(g0, $gi) & $p) AS ht FROM s${k - 1}))"""
            .stripMargin
      }
    }
    // Gray encode: final g_i = xor of original g_0..g_i (the unrolled
    // form of the sequential X[i] ^= X[i-1])
    k += 1
    parts += ("s" + k + " AS (SELECT " + keep + ", " +
      gs.zipWithIndex.map { case (g, i) =>
        if (i == 0) g
        else gs.take(i + 1).reduce((a, c) => s"xor($a, $c)") + s" AS $g"
      }.mkString(", ") + s" FROM s${k - 1})")
    // parity correction from the last axis
    val tExpr = roundScalesB(b)
      .map(q => s"CASE WHEN (${gs.last} & $q) > 0 THEN ${q - 1} ELSE 0 END")
      .reduce((a, c) => s"xor($a, $c)")
    k += 1
    parts += (s"s$k AS (SELECT $keep, " +
      gs.map(g => s"xor($g, ht) AS $g").mkString(", ") +
      s" FROM (SELECT *, $tExpr AS ht FROM s${k - 1}))")
    // interleave to the scalar index
    val hd = (0 until d).map { i =>
      s"((${ZOrder.spreadNSql(gs(i), d, b)}) << ${d - 1 - i})"
    }.mkString(" | ")
    k += 1
    parts += s"s$k AS (SELECT $keep, $hd AS hd FROM s${k - 1})"
    (parts.mkString(",\n"), s"s$k")
  }

  /** DuckDB oracle fragment: the identical round chain as CTEs
    * `h0..h$Bits`, generated from the SAME [[roundScales]]. `srcCte`
    * must provide columns `$xCol`, `$yCol`, and the passthrough list
    * `keep`; the final CTE `h$Bits` carries (keep, hd).
    *
    * The s² term is explicitly CAST to BIGINT (r13): at s = 2^15,
    * s² = 2^30 is the one round scale that FITS DuckDB's INT32
    * literal typing while s²·(2 or 3) does not — an overflow
    * unreachable below 2^15 key domains (every driver SF) that the
    * synth10 scale-ladder gate caught on first contact with 2·10^5
    * keys.
    */
  private[graft] def oracleCtes(srcCte: String, xCol: String, yCol: String,
                                keep: String): String = {
    val init =
      s"""h0 AS (SELECT $keep, CAST($xCol AS BIGINT) AS hx,
         |  CAST($yCol AS BIGINT) AS hy, CAST(0 AS BIGINT) AS hd
         |  FROM $srcCte)""".stripMargin
    val rounds = roundScales.zipWithIndex.map { case (s, i) =>
      s"""h${i + 1} AS (
         |  SELECT $keep,
         |    CASE WHEN ry = 0 THEN CASE WHEN rx = 1
         |      THEN ${s - 1} - hy ELSE hy END ELSE hx END AS hx,
         |    CASE WHEN ry = 0 THEN CASE WHEN rx = 1
         |      THEN ${s - 1} - hx ELSE hx END ELSE hy END AS hy,
         |    hd + CAST(${s * s} AS BIGINT) * xor(3 * rx, ry) AS hd
         |  FROM (SELECT *,
         |          CASE WHEN (hx & $s) > 0 THEN 1 ELSE 0 END AS rx,
         |          CASE WHEN (hy & $s) > 0 THEN 1 ELSE 0 END AS ry
         |        FROM h$i))""".stripMargin
    }
    (init +: rounds).mkString(",\n")
  }
}
