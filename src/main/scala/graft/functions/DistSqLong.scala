package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, GenericInternalRow, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, LongType, StructField, StructType}

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

/** Codegen'd argmin over ALL centroids at once: returns
  * `struct(d: bigint, c: bigint)` — the minimum integer squared L2
  * distance and the (lowest, on ties) centroid index attaining it.
  *
  * Why one kernel instead of `array_min(array(struct(DistSqLong(c₀)),
  * …))`: the composed form allocates a k-element array of struct rows
  * per input row and compares them through the INTERPRETED struct
  * ordering — at k in the tens-to-hundreds (trained quantizers, PQ
  * codebooks, SemDeDup cluster counts) that interpreted per-row work
  * dominated the whole fit (measured ~6 s per assignment pass at k=80
  * over 20k rows vs milliseconds of actual arithmetic; the per-centroid
  * kernels also re-copied the row's array k times via `toLongArray`).
  * Here the generated code is one copy + one k×dims primitive loop per
  * row, and the centroid MATRIX arrives via `addReferenceObj`, so Lloyd
  * rounds reuse one compiled projection (the [[DistSqLong]] discipline,
  * lifted over the whole argmin).
  *
  * Semantics are identical to the composed form: distances fold
  * left-to-right per centroid (same arithmetic as [[DistSqLong]]);
  * strictly-smaller wins, so equal distances keep the lowest index —
  * the lexicographic `(d, c)` struct-min tie-break, bit-for-bit.
  */
case class ArgMinDistSqLong(child: Expression,
                            centroids: Array[Array[Long]])
    extends UnaryExpression {
  require(centroids.nonEmpty, "argmin needs at least one centroid")

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(LongType, _) => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires array<bigint>, got ${t.sql}")
  }

  override def dataType: DataType = StructType(Seq(
    StructField("d", LongType, nullable = false),
    StructField("c", LongType, nullable = false)))

  override def prettyName: String = "argmin_dist_sq_long"

  override protected def nullSafeEval(a: Any): Any = {
    val xs = a.asInstanceOf[ArrayData].toLongArray()
    var best = Long.MaxValue
    var bc = 0L
    var c = 0
    while (c < centroids.length) {
      val cent = centroids(c)
      val n = math.min(xs.length, cent.length)
      var s = 0L
      var i = 0
      while (i < n) {
        val d = xs(i) - cent(i)
        s += d * d
        i += 1
      }
      if (s < best) { best = s; bc = c.toLong }
      c += 1
    }
    new GenericInternalRow(Array[Any](best, bc))
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val cRef = ctx.addReferenceObj("centroids", centroids, "long[][]")
    nullSafeCodeGen(ctx, ev, a => {
      val xs = ctx.freshName("xs")
      val best = ctx.freshName("best")
      val bc = ctx.freshName("bc")
      val c = ctx.freshName("c")
      val cent = ctx.freshName("cent")
      val n = ctx.freshName("n")
      val s = ctx.freshName("s")
      val i = ctx.freshName("i")
      val d = ctx.freshName("d")
      s"""
         |long[] $xs = $a.toLongArray();
         |long $best = Long.MAX_VALUE;
         |long $bc = 0L;
         |for (int $c = 0; $c < $cRef.length; $c++) {
         |  long[] $cent = $cRef[$c];
         |  int $n = Math.min($xs.length, $cent.length);
         |  long $s = 0L;
         |  for (int $i = 0; $i < $n; $i++) {
         |    long $d = $xs[$i] - $cent[$i];
         |    $s += $d * $d;
         |  }
         |  if ($s < $best) { $best = $s; $bc = (long) $c; }
         |}
         |${ev.value} = new org.apache.spark.sql.catalyst.expressions
         |  .GenericInternalRow(new Object[]{
         |    java.lang.Long.valueOf($best), java.lang.Long.valueOf($bc)});
       """.stripMargin
    })
  }

  override protected def withNewChildInternal(newChild: Expression)
      : ArgMinDistSqLong = copy(child = newChild)
}
