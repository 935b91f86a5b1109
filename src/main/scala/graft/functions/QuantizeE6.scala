package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.UnsafeArrayData
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, DoubleType, FloatType, LongType}

/** Codegen'd e6 quantization of the first `dims` dimensions of a float/
  * double embedding: `floor(x_d · 10⁶)` as BIGINT, d < dims — the
  * integer coordinate space every exact-arithmetic clustering op
  * ([[graft.operators.Clustering]]) works in.
  *
  * Exists for two reasons over the equivalent
  * `transform(slice(emb,1,dims), x -> floor(x::double*1e6)::long)`:
  *  - higher-order functions are interpreted and break whole-stage
  *    codegen, and this runs once per corpus row on every fit — the
  *    dominant data-sized pass of a small-k fit;
  *  - `slice` silently returns SHORT arrays for embeddings with fewer
  *    than `dims` dimensions, which downstream distance kernels fold
  *    over as a shorter loop — a silently-wrong prefix clustering. This
  *    kernel throws instead (as does a null element: quantized
  *    coordinates must be total).
  *
  * Arithmetic parity with the HOF form on well-formed input: element
  * widened to double, `Math.floor(v·1.0E6)` (exact — every float is a
  * double), truncating long cast of an already-integral double.
  */
case class QuantizeE6(child: Expression, dims: Int)
    extends UnaryExpression {

  require(dims > 0, s"quantize_e6 needs dims > 0, got $dims")

  private lazy val fromFloat = child.dataType match {
    case ArrayType(FloatType, _) => true
    case _ => false
  }

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(FloatType, _) | ArrayType(DoubleType, _) =>
      TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires array<float> or array<double>, got ${t.sql}")
  }

  override def dataType: DataType = ArrayType(LongType, containsNull = false)

  override def prettyName: String = "quantize_e6"

  override protected def nullSafeEval(a: Any): Any = {
    val xs = a.asInstanceOf[ArrayData]
    if (xs.numElements() < dims)
      throw new IllegalArgumentException(
        s"quantize_e6: embedding has ${xs.numElements()} dims, need >= $dims")
    val out = new Array[Long](dims)
    var i = 0
    while (i < dims) {
      if (xs.isNullAt(i))
        throw new IllegalArgumentException(
          s"quantize_e6: null element at dim $i")
      val v = if (fromFloat) xs.getFloat(i).toDouble else xs.getDouble(i)
      out(i) = math.floor(v * 1.0e6).toLong
      i += 1
    }
    UnsafeArrayData.fromPrimitiveArray(out)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    nullSafeCodeGen(ctx, ev, a => {
      val i = ctx.freshName("i")
      val out = ctx.freshName("out")
      val v = ctx.freshName("v")
      val get = if (fromFloat) s"(double) $a.getFloat($i)"
                else s"$a.getDouble($i)"
      s"""
         |if ($a.numElements() < $dims) {
         |  throw new IllegalArgumentException(
         |    "quantize_e6: embedding has " + $a.numElements() +
         |    " dims, need >= " + $dims);
         |}
         |long[] $out = new long[$dims];
         |for (int $i = 0; $i < $dims; $i++) {
         |  if ($a.isNullAt($i)) {
         |    throw new IllegalArgumentException(
         |      "quantize_e6: null element at dim " + $i);
         |  }
         |  double $v = $get;
         |  $out[$i] = (long) Math.floor($v * 1.0E6);
         |}
         |${ev.value} =
         |  org.apache.spark.sql.catalyst.expressions.UnsafeArrayData
         |    .fromPrimitiveArray($out);
       """.stripMargin
    })
  }

  override protected def withNewChildInternal(newChild: Expression): QuantizeE6 =
    copy(child = newChild)
}
