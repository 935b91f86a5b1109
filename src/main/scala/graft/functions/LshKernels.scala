package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression, XXH64}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types.{ArrayType, DataType, FloatType, LongType}

/** Loop-shaped kernels for the two LSH banding projections the r14 JIT
  * audit flagged (the [[HilbertIndexXY]] discipline): both were built
  * by UNROLLING per-band/per-table `Column` chains at plan-build time —
  * correct, codegen'd, fused — and the fused whole-stage method crossed
  * HotSpot's 8000-byte `DontCompileHugeMethods` ceiling, so the hot
  * projection ran in the bytecode interpreter:
  *
  *  - MinHash banding (32 × `xxhash64(slice(sig, …))` structs):
  *    8541–8673-byte methods in q22/q52/q64/q218;
  *  - random-hyperplane bucketing (16 tables × 4 plane dot products,
  *    64 [[DotFloat]] loops plus the when/struct chain): 15195-byte
  *    methods in q25/q93/q215/q251.
  *
  * Each kernel emits ONE static call per row; the loop lives in
  * compiled bytecode here, not in generated code. Values are
  * BIT-IDENTICAL to the unrolled forms (specs pin both): band keys
  * replicate Spark's `xxhash64` array fold (seed 42, per-element
  * [[XXH64.hashLong]]) over each signature slice; buckets replicate
  * [[VectorFunctions.planeDot]]'s integer hyperplanes with
  * [[DotFloat]]'s cast-then-multiply left-to-right double fold and the
  * `≥ 0` sign rule.
  */
object LshKernels {

  /** Spark's xxhash64 seed (`XxHash64` expression default). */
  val XxSeed = 42L

  /** Per-band keys of a MinHash signature: key(b) =
    * xxhash64(slice(sig, b·rows + 1, rows)) for b in [0, bands).
    */
  def bandKeys(sig: ArrayData, bands: Int): ArrayData = {
    val n = sig.numElements()
    val rows = n / bands
    val out = new Array[Long](bands)
    var b = 0
    while (b < bands) {
      var acc = XxSeed
      var j = b * rows
      val end = j + rows
      while (j < end) {
        acc = XXH64.hashLong(sig.getLong(j), acc)
        j += 1
      }
      out(b) = acc
      b += 1
    }
    new GenericArrayData(out)
  }

  /** Per-band RAW SLICES of a MinHash signature: slice(b) =
    * sig[b·rows … b·rows+rows) for b in [0, bands). The un-hashed
    * sibling of [[bandKeys]] for consumers whose band join must be
    * replayable by an external SQL engine on VALUE equality (q204's
    * calibration oracle joins on `list(m ORDER BY perm)` — an
    * xxhash64'd key would be engine-private). Same JIT motivation:
    * the 32-way `struct(lit(b), slice(sig, …))` unroll fused into a
    * 7.5 KB whole-stage method (r14 audit `near_limit`), one fused
    * expression away from the interpreter cliff.
    */
  def bandSlices(sig: ArrayData, bands: Int): ArrayData = {
    val n = sig.numElements()
    val rows = n / bands
    val out = new Array[Any](bands)
    var b = 0
    while (b < bands) {
      val s = new Array[Long](rows)
      var j = 0
      while (j < rows) {
        s(j) = sig.getLong(b * rows + j)
        j += 1
      }
      out(b) = new GenericArrayData(s)
      b += 1
    }
    new GenericArrayData(out)
  }

  /** Per-table random-hyperplane buckets of an embedding: bucket(t) =
    * Σ_i [dot(v, plane(t·ppt + i)) ≥ 0] · 2^i, planes and fold exactly
    * [[VectorFunctions.planeDot]] (w(p,d) = ((k ⊻ (k ≫ 5)) mod 7) − 3,
    * k = p·7919 + d·104729, float weights, double cast-then-multiply
    * left-to-right accumulation over min(|v|, dims) elements).
    */
  def tableBuckets(v: ArrayData, tables: Int, planesPerTable: Int,
                   dims: Int): ArrayData = {
    val xs = v.toFloatArray()
    val n = math.min(xs.length, dims)
    val out = new Array[Long](tables)
    var t = 0
    while (t < tables) {
      var bucket = 0L
      var i = 0
      while (i < planesPerTable) {
        val p = t * planesPerTable + i
        var s = 0.0d
        var d = 0
        while (d < n) {
          val k = p.toLong * 7919L + d.toLong * 104729L
          val m = k ^ (k >>> 5)
          val w = ((m % 7) - 3).toFloat
          s += xs(d).toDouble * w.toDouble
          d += 1
        }
        if (s >= 0) bucket |= (1L << i)
        i += 1
      }
      out(t) = bucket
      t += 1
    }
    new GenericArrayData(out)
  }
}

/** `array<long>` of per-band MinHash keys (see [[LshKernels.bandKeys]]);
  * index = band id, so `posexplode` yields the (band, key) rows the
  * banding join shuffles on.
  */
case class MinHashBandKeys(child: Expression, bands: Int)
    extends UnaryExpression {

  require(bands >= 1, s"bands must be >= 1, got $bands")

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(LongType, _) => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires array<bigint> (a MinHash signature), " +
        s"got ${t.sql}")
  }

  override def dataType: DataType = ArrayType(LongType, containsNull = false)

  override def prettyName: String = "minhash_band_keys"

  override protected def nullSafeEval(v: Any): Any =
    LshKernels.bandKeys(v.asInstanceOf[ArrayData], bands)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev,
      c => s"graft.functions.LshKernels.bandKeys($c, $bands)")

  override protected def withNewChildInternal(newChild: Expression): MinHashBandKeys =
    copy(child = newChild)
}

/** `array<array<long>>` of per-band raw signature slices (see
  * [[LshKernels.bandSlices]]); index = band id, so `posexplode` yields
  * the (band, slice-key) rows a value-equality banding join shuffles on.
  */
case class MinHashBandSlices(child: Expression, bands: Int)
    extends UnaryExpression {

  require(bands >= 1, s"bands must be >= 1, got $bands")

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(LongType, _) => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires array<bigint> (a MinHash signature), " +
        s"got ${t.sql}")
  }

  override def dataType: DataType =
    ArrayType(ArrayType(LongType, containsNull = false), containsNull = false)

  override def prettyName: String = "minhash_band_slices"

  override protected def nullSafeEval(v: Any): Any =
    LshKernels.bandSlices(v.asInstanceOf[ArrayData], bands)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev,
      c => s"graft.functions.LshKernels.bandSlices($c, $bands)")

  override protected def withNewChildInternal(newChild: Expression): MinHashBandSlices =
    copy(child = newChild)
}

/** `array<long>` of per-table hyperplane-LSH buckets (see
  * [[LshKernels.tableBuckets]]); index = table id, so `posexplode`
  * yields the (t, bucket) rows the candidate join shuffles on.
  */
case class LshTableBuckets(child: Expression, tables: Int,
                           planesPerTable: Int, dims: Int)
    extends UnaryExpression {

  require(tables >= 1 && planesPerTable >= 1 && planesPerTable <= 63,
    s"need tables >= 1 and 1 <= planesPerTable <= 63, " +
      s"got $tables x $planesPerTable")

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(FloatType, _) => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires array<float> (an embedding), got ${t.sql}")
  }

  override def dataType: DataType = ArrayType(LongType, containsNull = false)

  override def prettyName: String = "lsh_table_buckets"

  override protected def nullSafeEval(v: Any): Any =
    LshKernels.tableBuckets(v.asInstanceOf[ArrayData], tables,
                            planesPerTable, dims)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev,
      c => s"graft.functions.LshKernels.tableBuckets(" +
        s"$c, $tables, $planesPerTable, $dims)")

  override protected def withNewChildInternal(newChild: Expression): LshTableBuckets =
    copy(child = newChild)
}
