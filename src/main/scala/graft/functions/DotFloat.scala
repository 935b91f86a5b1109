package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, GenericInternalRow, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, DoubleType, FloatType, LongType, StructField, StructType}

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

/** Codegen'd cosine argmax of an `array<float>` row against ALL constant
  * centroids at once: returns `struct(cos: double, c: bigint)` — the
  * maximum cosine and the (lowest, on ties) centroid index attaining it.
  *
  * This is the IVF nearest-centroid ASSIGNMENT as a per-row expression.
  * The composed alternative — cross-join the corpus with the centroid
  * frame and take `row_number() = 1` over a per-vector window — shuffles
  * n·k scored rows on vec_id just to pick each row's max: a CORPUS-SIZED
  * exchange doing what a map-side loop can. Here assignment is one pass
  * inside whole-stage codegen (the [[ArgMinDistSqLong]] discipline in
  * float cosine space); only the QUERY side (tiny by contract) still
  * ranks through a window, because it needs top-nProbe, not argmax.
  *
  * Arithmetic contract: per centroid, cos = dot(x, c) / (√dot(x,x) ·
  * √dot(c,c)) with [[DotFloat]]'s exact cast-then-multiply left-to-right
  * fold — bit-identical to the `cosine(a, b)` Column form and to the
  * oracle's `list_sum(list_transform(...))` shape. The row norm is
  * computed once per row; centroid norms are folded once at plan build
  * (same IEEE fold). Selection is strictly-greater, so equal cosines
  * keep the lowest index — the `ORDER BY ccos DESC, cid ASC` window
  * tie-break. Zero vectors/centroids (NaN cosine) are out of contract.
  */
case class ArgMaxCosFloat(child: Expression,
                          centroids: Array[Array[Float]])
    extends UnaryExpression {
  require(centroids.nonEmpty, "argmax needs at least one centroid")

  /** √dot(c,c) per centroid, folded exactly like [[DotFloat]]. */
  private lazy val centNorms: Array[Double] = centroids.map { c =>
    var s = 0.0d
    var i = 0
    while (i < c.length) { s += c(i).toDouble * c(i).toDouble; i += 1 }
    math.sqrt(s)
  }

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(FloatType, _) => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires array<float>, got ${t.sql}")
  }

  override def dataType: DataType = StructType(Seq(
    StructField("cos", DoubleType, nullable = false),
    StructField("c", LongType, nullable = false)))

  override def prettyName: String = "argmax_cos_float"

  override protected def nullSafeEval(a: Any): Any = {
    val xs = a.asInstanceOf[ArrayData].toFloatArray()
    var nx = 0.0d
    var i = 0
    while (i < xs.length) { nx += xs(i).toDouble * xs(i).toDouble; i += 1 }
    val nxr = math.sqrt(nx)
    var best = Double.NegativeInfinity
    var bc = 0L
    var c = 0
    while (c < centroids.length) {
      val cent = centroids(c)
      val n = math.min(xs.length, cent.length)
      var s = 0.0d
      i = 0
      while (i < n) { s += xs(i).toDouble * cent(i).toDouble; i += 1 }
      val cos = s / (nxr * centNorms(c))
      if (cos > best) { best = cos; bc = c.toLong }
      c += 1
    }
    new GenericInternalRow(Array[Any](best, bc))
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val cRef = ctx.addReferenceObj("centroids", centroids, "float[][]")
    val nRef = ctx.addReferenceObj("centNorms", centNorms, "double[]")
    nullSafeCodeGen(ctx, ev, a => {
      val xs = ctx.freshName("xs")
      val nx = ctx.freshName("nx")
      val nxr = ctx.freshName("nxr")
      val best = ctx.freshName("best")
      val bc = ctx.freshName("bc")
      val c = ctx.freshName("c")
      val cent = ctx.freshName("cent")
      val n = ctx.freshName("n")
      val s = ctx.freshName("s")
      val i = ctx.freshName("i")
      val cos = ctx.freshName("cos")
      s"""
         |float[] $xs = $a.toFloatArray();
         |double $nx = 0.0;
         |for (int $i = 0; $i < $xs.length; $i++) {
         |  $nx += (double) $xs[$i] * (double) $xs[$i];
         |}
         |double $nxr = Math.sqrt($nx);
         |double $best = Double.NEGATIVE_INFINITY;
         |long $bc = 0L;
         |for (int $c = 0; $c < $cRef.length; $c++) {
         |  float[] $cent = $cRef[$c];
         |  int $n = Math.min($xs.length, $cent.length);
         |  double $s = 0.0;
         |  for (int $i = 0; $i < $n; $i++) {
         |    $s += (double) $xs[$i] * (double) $cent[$i];
         |  }
         |  double $cos = $s / ($nxr * $nRef[$c]);
         |  if ($cos > $best) { $best = $cos; $bc = (long) $c; }
         |}
         |${ev.value} = new org.apache.spark.sql.catalyst.expressions
         |  .GenericInternalRow(new Object[]{
         |    java.lang.Double.valueOf($best), java.lang.Long.valueOf($bc)});
       """.stripMargin
    })
  }

  override protected def withNewChildInternal(newChild: Expression)
      : ArgMaxCosFloat = copy(child = newChild)
}
