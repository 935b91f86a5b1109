package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types._

/** Codegen'd wrappers over [[ShingleUtil]]'s compiled kernels.
  *
  * Why not higher-order functions: `transform`/`aggregate`/`zip_with` are
  * interpreted per element (no `doGenCode`), and shingling + MinHash run
  * per WORD/SHINGLE per document — the dominant per-row cost of the dedup
  * pipeline. These expressions stay inside whole-stage codegen and reduce
  * each document to one static call.
  */
private[graft] trait ShingleKernelExpression extends UnaryExpression {
  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(StringType, _) => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires array<string>, got ${t.sql}")
  }
}

/** Distinct n-word shingles of a word array (see [[ShingleUtil.shingles]]). */
case class WordShingles(child: Expression, n: Int)
    extends ShingleKernelExpression {

  require(n >= 1, s"shingle width must be >= 1, got $n")

  override def dataType: DataType = ArrayType(StringType, containsNull = false)

  override def prettyName: String = "word_shingles"

  override protected def nullSafeEval(v: Any): Any =
    ShingleUtil.shingles(v.asInstanceOf[ArrayData], n)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.ShingleUtil.shingles($c, $n)")

  override protected def withNewChildInternal(newChild: Expression): WordShingles =
    copy(child = newChild)
}

/** MinHash signature (`numPerm` slots) of a shingle array (see
  * [[ShingleUtil.minhashSig]]; values identical to the
  * [[PortableHash.permHash]]/[[PortableHash.h32]] column form).
  */
case class MinHashSignature(child: Expression, numPerm: Int)
    extends ShingleKernelExpression {

  require(numPerm >= 1, s"numPerm must be >= 1, got $numPerm")

  override def dataType: DataType = ArrayType(LongType, containsNull = false)

  override def prettyName: String = "minhash_signature"

  override protected def nullSafeEval(v: Any): Any =
    ShingleUtil.minhashSig(v.asInstanceOf[ArrayData], numPerm)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev,
      c => s"graft.functions.ShingleUtil.minhashSig($c, $numPerm)")

  override protected def withNewChildInternal(newChild: Expression): MinHashSignature =
    copy(child = newChild)
}
