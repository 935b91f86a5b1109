package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, DoubleType, FloatType}

/** Codegen'd dot product of two `array<float>` columns as a double.
  *
  * Why a custom Catalyst expression: the composable form
  * `aggregate(zip_with(a, b, _*_), 0.0, _+_)` is a higher-order function —
  * HOFs are interpreted (no `doGenCode`), allocate a lambda frame per
  * element, and break the surrounding whole-stage-codegen span. For
  * similarity search the dot product runs once per CANDIDATE PAIR (the
  * O(n·k)–O(n²) hot path), which made brute-force cosine the bench
  * bottleneck. This expression compiles to a tight primitive loop inside
  * whole-stage codegen: same arithmetic, ~50× less overhead.
  *
  * Arithmetic contract (what keeps results bit-identical to the DuckDB
  * oracle and to the HOF form it replaces): elements are cast to double
  * FIRST, multiplied in double, and accumulated strictly left-to-right —
  * exactly `list_sum(list_transform(range(n), i -> a[i+1]::DOUBLE *
  * b[i+1]::DOUBLE))`. Null elements are not expected (embedding vectors
  * are dense); length mismatch folds over the shorter prefix.
  */
case class DotFloat(left: Expression, right: Expression)
    extends BinaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = {
    def ok(t: DataType) = t match {
      case ArrayType(FloatType, _) => true
      case _ => false
    }
    if (ok(left.dataType) && ok(right.dataType)) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires two array<float> arguments, " +
        s"got ${left.dataType.sql} and ${right.dataType.sql}")
  }

  override def dataType: DataType = DoubleType

  override def prettyName: String = "dot_float"

  override protected def nullSafeEval(a: Any, b: Any): Any = {
    val xs = a.asInstanceOf[ArrayData].toFloatArray()
    val ys = b.asInstanceOf[ArrayData].toFloatArray()
    val n = math.min(xs.length, ys.length)
    var s = 0.0d
    var i = 0
    while (i < n) {
      s += xs(i).toDouble * ys(i).toDouble
      i += 1
    }
    s
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val xs = ctx.freshName("xs")
      val ys = ctx.freshName("ys")
      val n = ctx.freshName("n")
      val i = ctx.freshName("i")
      val s = ctx.freshName("s")
      s"""
         |float[] $xs = $a.toFloatArray();
         |float[] $ys = $b.toFloatArray();
         |int $n = Math.min($xs.length, $ys.length);
         |double $s = 0.0;
         |for (int $i = 0; $i < $n; $i++) {
         |  $s += (double) $xs[$i] * (double) $ys[$i];
         |}
         |${ev.value} = $s;
       """.stripMargin
    })

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): DotFloat =
    copy(left = newLeft, right = newRight)
}
