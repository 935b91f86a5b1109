package graft.functions

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode, FalseLiteral}
import org.apache.spark.sql.catalyst.expressions.codegen.Block._
import org.apache.spark.sql.types.{DataType, LongType}

/** Codegen'd Hilbert-curve indices — the compact-kernel replacements
  * for the per-round `withColumn` chains in [[graft.operators.Hilbert]]
  * (r13).
  *
  * WHY an Expression and not the chain: the chained form fuses into ONE
  * whole-stage-codegen stage (good), but that stage's generated consume
  * method unrolls 31 (2-D) / 19×3 (3-D) rounds of CASE arithmetic into
  * thousands of JVM bytecodes — past HotSpot's 8000-bytecode
  * DontCompileHugeMethods ceiling, so the method runs in the BYTECODE
  * INTERPRETER forever (measured ~18 µs/row at sf0.1, ~11 s for the
  * d-value alone). A native kernel with a real `for` loop is a few
  * hundred bytecodes, JITs immediately, and computes the identical
  * values (the specs pin both kernels against independent imperative
  * references; the DuckDB oracles still replay the round constants
  * from the shared generators, so cross-engine parity is still gated).
  *
  * Inputs are NON-NULLABLE by contract: a null or out-of-domain
  * dimension throws the same `dimension out of [0, 2^b)` error the
  * old column guard raised — a curve over a clipped domain silently
  * breaks locality, so the guard lives INSIDE the kernel.
  */
object HilbertIndex {

  /** The 2-D xy2d walk (top bit down), shared by interpreted eval and
    * the generated code's runtime call. Domain [0, 2^bits).
    */
  def xy2d(x0: Long, y0: Long, bits: Int): Long = {
    if (x0 < 0 || x0 >= (1L << bits))
      throw new IllegalArgumentException(
        s"hilbert: dimension out of [0, 2^$bits): $x0")
    if (y0 < 0 || y0 >= (1L << bits))
      throw new IllegalArgumentException(
        s"hilbert: dimension out of [0, 2^$bits): $y0")
    var x = x0; var y = y0; var d = 0L
    var s = 1L << (bits - 1)
    while (s > 0) {
      val rx = if ((x & s) != 0) 1L else 0L
      val ry = if ((y & s) != 0) 1L else 0L
      d += s * s * ((3L * rx) ^ ry)
      if (ry == 0) {
        if (rx == 1) { x = s - 1 - x; y = s - 1 - y }
        val t = x; x = y; y = t
      }
      s >>= 1
    }
    d
  }

  /** The d-dim Skilling transform + interleave, shared by interpreted
    * eval and generated code. Domain [0, 2^bits) per dimension; axis 0
    * carries the highest interleave significance.
    */
  def skilling(xs0: Array[Long], bits: Int): Long = {
    val n = xs0.length
    val x = new Array[Long](n)
    var i = 0
    while (i < n) {
      val v = xs0(i)
      if (v < 0 || v >= (1L << bits))
        throw new IllegalArgumentException(
          s"hilbertN: dimension out of [0, 2^$bits): $v")
      x(i) = v
      i += 1
    }
    var q = 1L << (bits - 1)
    while (q > 1) {
      val p = q - 1
      i = 0
      while (i < n) {
        if ((x(i) & q) != 0) x(0) ^= p
        else { val t = (x(0) ^ x(i)) & p; x(0) ^= t; x(i) ^= t }
        i += 1
      }
      q >>= 1
    }
    i = 1
    while (i < n) { x(i) ^= x(i - 1); i += 1 }
    var t = 0L
    q = 1L << (bits - 1)
    while (q > 1) { if ((x(n - 1) & q) != 0) t ^= q - 1; q >>= 1 }
    var h = 0L
    var j = 0
    while (j < bits) {
      i = 0
      while (i < n) {
        if ((((x(i) ^ t) >> j) & 1L) != 0L)
          h |= 1L << (j * n + (n - 1 - i))
        i += 1
      }
      j += 1
    }
    h
  }
}

/** 2-D Hilbert d-value of (x, y) at `bits` per dimension — identical
  * values to the xy2d recurrence the DuckDB oracle replays.
  */
case class HilbertIndexXY(left: Expression, right: Expression, bits: Int)
    extends BinaryExpression {

  override def checkInputDataTypes(): TypeCheckResult =
    if (left.dataType == LongType && right.dataType == LongType)
      TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires (bigint, bigint), got " +
        s"(${left.dataType.sql}, ${right.dataType.sql})")

  override def dataType: DataType = LongType
  override def nullable: Boolean = false
  override def prettyName: String = "hilbert_xy"

  override def eval(input: InternalRow): Any = {
    val xv = left.eval(input)
    val yv = right.eval(input)
    if (xv == null)
      throw new IllegalArgumentException(
        s"hilbert: dimension out of [0, 2^$bits): null")
    if (yv == null)
      throw new IllegalArgumentException(
        s"hilbert: dimension out of [0, 2^$bits): null")
    HilbertIndex.xy2d(xv.asInstanceOf[Long], yv.asInstanceOf[Long], bits)
  }

  override protected def doGenCode(ctx: CodegenContext,
                                   ev: ExprCode): ExprCode = {
    val xg = left.genCode(ctx)
    val yg = right.genCode(ctx)
    val block =
      code"""
            |${xg.code}
            |${yg.code}
            |if (${xg.isNull} || ${yg.isNull}) {
            |  throw new IllegalArgumentException(
            |    "hilbert: dimension out of [0, 2^${bits.toString}): null");
            |}
            |final long ${ev.value} = graft.functions.HilbertIndex.xy2d(
            |  ${xg.value}, ${yg.value}, ${bits.toString});
            |""".stripMargin
    ev.copy(code = block, isNull = FalseLiteral)
  }

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): HilbertIndexXY =
    copy(left = newLeft, right = newRight)
}

/** d-dim Hilbert index of `children` at `bits` per dimension —
  * identical values to the Skilling CTE chain the DuckDB oracle
  * replays (children.length ≥ 2, each bigint).
  */
case class HilbertIndexN(children: Seq[Expression], bits: Int)
    extends Expression {
  require(children.length >= 2, "need >= 2 dimensions")

  override def checkInputDataTypes(): TypeCheckResult =
    if (children.forall(_.dataType == LongType))
      TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires bigint dimensions, got " +
        children.map(_.dataType.sql).mkString(", "))

  override def dataType: DataType = LongType
  override def nullable: Boolean = false
  override def foldable: Boolean = children.forall(_.foldable)
  override def prettyName: String = "hilbert_n"

  override def eval(input: InternalRow): Any = {
    val xs = new Array[Long](children.length)
    var i = 0
    while (i < children.length) {
      val v = children(i).eval(input)
      if (v == null)
        throw new IllegalArgumentException(
          s"hilbertN: dimension out of [0, 2^$bits): null")
      xs(i) = v.asInstanceOf[Long]
      i += 1
    }
    HilbertIndex.skilling(xs, bits)
  }

  override protected def doGenCode(ctx: CodegenContext,
                                   ev: ExprCode): ExprCode = {
    val gens = children.map(_.genCode(ctx))
    val arr = ctx.freshName("hdims")
    val fill = gens.zipWithIndex.map { case (g, i) =>
      code"""
            |${g.code}
            |if (${g.isNull}) {
            |  throw new IllegalArgumentException(
            |    "hilbertN: dimension out of [0, 2^${bits.toString}): null");
            |}
            |$arr[${i.toString}] = ${g.value};
            |""".stripMargin
    }.reduce(_ + _)
    val block =
      code"""
            |long[] $arr = new long[${children.length.toString}];
            |$fill
            |final long ${ev.value} =
            |  graft.functions.HilbertIndex.skilling($arr, ${bits.toString});
            |""".stripMargin
    ev.copy(code = block, isNull = FalseLiteral)
  }

  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): HilbertIndexN =
    copy(children = newChildren)
}
