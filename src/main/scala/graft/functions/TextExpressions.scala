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

/** Count of array elements contained in a fixed word set — the stopword
  * frequency signal used by language-ID and quality scoring. Equals
  * `size(filter(arr, x => x.isInCollection(words)))` but codegen'd: the
  * HOF form is interpreted per element AND its CodegenFallback breaks the
  * surrounding whole-stage-codegen span for the entire projection. The set
  * is embedded once per task via `addReferenceObj` (UTF8String hash set,
  * O(1) probes).
  */
case class WordSetCount(child: Expression, words: Seq[String])
    extends ShingleKernelExpression {

  @transient private lazy val set: java.util.HashSet[org.apache.spark.unsafe.types.UTF8String] = {
    val s = new java.util.HashSet[org.apache.spark.unsafe.types.UTF8String](words.size * 2)
    words.foreach(w => s.add(org.apache.spark.unsafe.types.UTF8String.fromString(w)))
    s
  }

  override def dataType: DataType = IntegerType

  override def prettyName: String = "word_set_count"

  override protected def nullSafeEval(v: Any): Any = {
    val arr = v.asInstanceOf[ArrayData]
    var n = 0
    var i = 0
    val m = arr.numElements()
    while (i < m) {
      if (!arr.isNullAt(i) && set.contains(arr.getUTF8String(i))) n += 1
      i += 1
    }
    n
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val setRef = ctx.addReferenceObj("wordSet", set,
      classOf[java.util.HashSet[_]].getName)
    nullSafeCodeGen(ctx, ev, c => {
      val i = ctx.freshName("i")
      val m = ctx.freshName("m")
      val n = ctx.freshName("n")
      s"""
         |int $n = 0;
         |int $m = $c.numElements();
         |for (int $i = 0; $i < $m; $i++) {
         |  if (!$c.isNullAt($i) && $setRef.contains($c.getUTF8String($i))) $n++;
         |}
         |${ev.value} = $n;
       """.stripMargin
    })
  }

  override protected def withNewChildInternal(newChild: Expression): WordSetCount =
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

/** SymSpell deletion neighborhood of a string (see
  * [[ShingleUtil.deletions1]]) — candidate keys for exact-recall
  * edit-distance-1 joins. Codegen'd for the same reason as the other
  * kernels: it runs per row × string length in the fuzzy-dedup hot path.
  */
case class StringDeletions(child: Expression) extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires string, got ${t.sql}")
  }

  override def dataType: DataType = ArrayType(StringType, containsNull = false)

  override def prettyName: String = "string_deletions"

  override protected def nullSafeEval(v: Any): Any =
    ShingleUtil.deletions1(v.asInstanceOf[org.apache.spark.unsafe.types.UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.ShingleUtil.deletions1($c)")

  override protected def withNewChildInternal(newChild: Expression): StringDeletions =
    copy(child = newChild)
}

/** 64-bit SimHash signature of a word array (see [[ShingleUtil.simhash64]]).
  * Replaces the interpreted nested-HOF form (a `transform` + double-nested
  * `aggregate` doing pow/floor double math per word × 32 bits) with one
  * compiled call per row that stays inside whole-stage codegen — and
  * widens the signature to 64 bits so banded pair generation gets 16-bit
  * band keys (65k buckets/band) instead of the 8-bit ceiling that capped
  * the 32-bit form at ~10⁵ docs.
  */
case class SimHashSignature(child: Expression)
    extends ShingleKernelExpression {

  override def dataType: DataType = LongType

  override def prettyName: String = "simhash_signature"

  override protected def nullSafeEval(v: Any): Any =
    ShingleUtil.simhash64(v.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.ShingleUtil.simhash64($c)")

  override protected def withNewChildInternal(newChild: Expression): SimHashSignature =
    copy(child = newChild)
}

/** Unicode normalization (NFC / NFD / NFKC / NFKD) via the JDK's
  * `java.text.Normalizer` — the top-of-funnel step tokenizer-grade
  * pipelines run before any hashing, shingling, or BPE segmentation, so
  * that canonically-equivalent strings ("é" vs "e" + U+0301) share
  * bytes and therefore share fingerprints, dedup keys, and merge
  * tables. Spark ships no normalization function; this expression stays
  * inside whole-stage codegen as one static JDK call per row (the
  * normalizer's quick-check fast-paths already-normalized text, so the
  * common ASCII path is a scan, not a rewrite). NFC is gateable against
  * DuckDB `nfc_normalize`; the compatibility forms (NFKC/NFKD — ﬁ→fi,
  * ²→2, full-width→ASCII) are spec-verified against published vectors.
  */
case class UnicodeNormalize(child: Expression, form: String)
    extends UnaryExpression {

  require(Seq("NFC", "NFD", "NFKC", "NFKD").contains(form),
    s"unknown normalization form: $form")

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case _: StringType => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires string, got ${t.sql}")
  }

  override def dataType: DataType = StringType

  override def prettyName: String = "unicode_normalize"

  override protected def nullSafeEval(v: Any): Any =
    org.apache.spark.unsafe.types.UTF8String.fromString(
      java.text.Normalizer.normalize(
        v.asInstanceOf[org.apache.spark.unsafe.types.UTF8String].toString,
        java.text.Normalizer.Form.valueOf(form)))

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c =>
      "org.apache.spark.unsafe.types.UTF8String.fromString(" +
        s"java.text.Normalizer.normalize($c.toString(), " +
        s"java.text.Normalizer.Form.$form))")

  override protected def withNewChildInternal(newChild: Expression): UnicodeNormalize =
    copy(child = newChild)
}
