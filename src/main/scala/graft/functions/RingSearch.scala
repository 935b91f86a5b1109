package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{DataType, LongType}

/** Codegen'd consistent-hash ring lookup: the shard owning the first
  * ring position at-or-after the key hash (wrapping to the ring's
  * first entry). The ring — sorted by (position, shard) — arrives via
  * `ctx.addReferenceObj`, so the generated source is a single
  * `Arrays.binarySearch` + first-of-equals walk-back per row instead
  * of the O(ring) INTERPRETED lambda a `filter(array<struct>)`
  * composition pays (higher-order functions never enter whole-stage
  * codegen; at 272 entries × two rings that interpreted scan was ~95%
  * of q261's runtime). Binary search also drops per-row cost from
  * O(R) to O(log R) — the difference between a lookup and a scan when
  * rings grow to thousands of vnodes.
  */
case class RingSearch(child: Expression, positions: Array[Long],
                      shards: Array[Long]) extends UnaryExpression {
  require(positions.nonEmpty && positions.length == shards.length,
          "ring arrays must be non-empty and parallel")

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case LongType => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires bigint (the key hash), got ${t.sql}")
  }

  override def dataType: DataType = LongType

  override def prettyName: String = "ring_search"

  override protected def nullSafeEval(a: Any): Any = {
    val h = a.asInstanceOf[Long]
    var i = java.util.Arrays.binarySearch(positions, h)
    if (i < 0) i = -(i + 1)
    else while (i > 0 && positions(i - 1) == positions(i)) i -= 1
    if (i == positions.length) shards(0) else shards(i)
  }

  override protected def doGenCode(ctx: CodegenContext,
                                   ev: ExprCode): ExprCode = {
    val pRef = ctx.addReferenceObj("ringPos", positions, "long[]")
    val sRef = ctx.addReferenceObj("ringShard", shards, "long[]")
    nullSafeCodeGen(ctx, ev, a => {
      val i = ctx.freshName("i")
      s"""
         |int $i = java.util.Arrays.binarySearch($pRef, $a);
         |if ($i < 0) { $i = -($i + 1); }
         |else { while ($i > 0 && $pRef[$i - 1] == $pRef[$i]) $i--; }
         |${ev.value} = ($i == $pRef.length) ? $sRef[0] : $sRef[$i];
       """.stripMargin
    })
  }

  override protected def withNewChildInternal(newChild: Expression)
      : RingSearch = copy(child = newChild)
}
