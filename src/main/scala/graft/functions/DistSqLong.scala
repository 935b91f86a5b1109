package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, LongType}

/** Codegen'd integer squared L2 distance of an `array<long>` column to a
  * CONSTANT centroid, for the k-means assignment hot path.
  *
  * Why the centroid is a constructor constant and not a literal-unrolled
  * expression tree: Lloyd iterations re-plan the assignment with new
  * centroid values every round. Unrolled `(q[d] − c_d)²` terms bake the
  * values into the generated Java source, so every iteration pays a
  * fresh Janino compile of a k·dims-term projection (~1 s per round,
  * data-independent — the dominant cost of small-corpus fits). Here the
  * centroid arrives via `ctx.addReferenceObj`, so the generated source
  * is IDENTICAL across iterations (only the reference object changes)
  * and the whole-stage codegen cache hits from round 2 on. Runtime is
  * the same tight primitive loop either way (JIT unrolls it).
  *
  * Arithmetic: pure Long ops — (q[i] − c[i])² summed left-to-right;
  * deterministic, overflow-free for e6-quantized embeddings
  * (|diff| ≤ ~10⁷ → term ≤ 10¹⁴, dims·term ≪ 2⁶³). Folds over the
  * shorter of row/centroid length (well-formed inputs agree).
  */
case class DistSqLong(child: Expression, centroid: Array[Long])
    extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(LongType, _) => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires array<bigint>, got ${t.sql}")
  }

  override def dataType: DataType = LongType

  override def prettyName: String = "dist_sq_long"

  override protected def nullSafeEval(a: Any): Any = {
    val xs = a.asInstanceOf[ArrayData].toLongArray()
    val n = math.min(xs.length, centroid.length)
    var s = 0L
    var i = 0
    while (i < n) {
      val d = xs(i) - centroid(i)
      s += d * d
      i += 1
    }
    s
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val cRef = ctx.addReferenceObj("centroid", centroid, "long[]")
    nullSafeCodeGen(ctx, ev, a => {
      val xs = ctx.freshName("xs")
      val n = ctx.freshName("n")
      val i = ctx.freshName("i")
      val s = ctx.freshName("s")
      val d = ctx.freshName("d")
      s"""
         |long[] $xs = $a.toLongArray();
         |int $n = Math.min($xs.length, $cRef.length);
         |long $s = 0L;
         |for (int $i = 0; $i < $n; $i++) {
         |  long $d = $xs[$i] - $cRef[$i];
         |  $s += $d * $d;
         |}
         |${ev.value} = $s;
       """.stripMargin
    })
  }

  override protected def withNewChildInternal(newChild: Expression): DistSqLong =
    copy(child = newChild)
}
