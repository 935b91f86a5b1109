package graft.functions

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode, FalseLiteral}
import org.apache.spark.sql.catalyst.expressions.codegen.Block._
import org.apache.spark.sql.types.{DataType, LongType}

/** Codegen'd d-ary Morton interleave — the compact-kernel replacement
  * for [[graft.operators.ZOrder.spreadN]]'s per-bit Column unroll (the
  * [[HilbertIndexN]] discipline, applied after the r14 JIT audit put
  * q270's fused projection at 6373 of HotSpot's 8000-byte
  * `DontCompileHugeMethods` ceiling: 3 dims × 20 bits × ~3 fused ops
  * per bit plus domain guards — one more fused expression and the
  * whole stage silently drops to the bytecode interpreter).
  *
  * Values are BIT-IDENTICAL to the unrolled form (spec-pinned): bit j
  * of dimension i lands at bit j·d + i, dims(0) on the lowest stride
  * offset — the same convention [[graft.operators.ZOrder.spreadNSql]]
  * replays in the DuckDB oracle. The domain guard ([0, 2^bits) per
  * dimension, null rejected) lives INSIDE the kernel and keeps the
  * old guard's message prefix: a z-curve over a clipped domain
  * silently breaks locality, so violations fail fast.
  */
object ZOrderKernel {

  /** The interleave loop, shared by interpreted eval and generated
    * code. Domain [0, 2^bits) per dimension.
    */
  def zvalueN(xs: Array[Long], bits: Int): Long = {
    val d = xs.length
    var z = 0L
    var i = 0
    while (i < d) {
      val v = xs(i)
      if (v < 0 || v >= (1L << bits))
        throw new IllegalArgumentException(
          s"zValueN: dimension out of [0, 2^$bits): $v")
      var j = 0
      while (j < bits) {
        z |= ((v >> j) & 1L) << (j * d + i)
        j += 1
      }
      i += 1
    }
    z
  }
}

/** d-dim Morton code of `children` at `bits` per dimension — identical
  * values to the unrolled spread/shift chain the DuckDB oracle replays
  * (children.length ≥ 2, each bigint).
  */
case class ZValueN(children: Seq[Expression], bits: Int)
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
  override def prettyName: String = "zvalue_n"

  override def eval(input: InternalRow): Any = {
    val xs = new Array[Long](children.length)
    var i = 0
    while (i < children.length) {
      val v = children(i).eval(input)
      if (v == null)
        throw new IllegalArgumentException(
          s"zValueN: dimension out of [0, 2^$bits): null")
      xs(i) = v.asInstanceOf[Long]
      i += 1
    }
    ZOrderKernel.zvalueN(xs, bits)
  }

  override protected def doGenCode(ctx: CodegenContext,
                                   ev: ExprCode): ExprCode = {
    val gens = children.map(_.genCode(ctx))
    val arr = ctx.freshName("zdims")
    val fill = gens.zipWithIndex.map { case (g, i) =>
      code"""
            |${g.code}
            |if (${g.isNull}) {
            |  throw new IllegalArgumentException(
            |    "zValueN: dimension out of [0, 2^${bits.toString}): null");
            |}
            |$arr[${i.toString}] = ${g.value};
            |""".stripMargin
    }.reduce(_ + _)
    val block =
      code"""
            |long[] $arr = new long[${children.length.toString}];
            |$fill
            |final long ${ev.value} =
            |  graft.functions.ZOrderKernel.zvalueN($arr, ${bits.toString});
            |""".stripMargin
    ev.copy(code = block, isNull = FalseLiteral)
  }

  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): ZValueN =
    copy(children = newChildren)
}
