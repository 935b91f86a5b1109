package graft.plans

import org.apache.spark.sql.SparkSessionExtensions
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo}

import graft.functions.{DotFloat, MinHashSignature, SimHashSignature, StringDeletions, WordSetCount, WordShingles}

/** Session-extension wiring: registers graft's codegen'd expressions as
  * SQL functions so they compose from `spark.sql(...)` as well as the
  * Column API. Activate either way:
  *
  *  - `SparkSession.builder().withExtensions(new GraftExtensions)`
  *  - `--conf spark.sql.extensions=graft.plans.GraftExtensions`
  *
  * SQL surface:
  *  - `graft_dot_float(a, b)`          → double dot product of float arrays
  *  - `graft_word_shingles(words, n)`  → distinct n-word shingles
  *  - `graft_minhash(shingles, k)`     → k-slot MinHash signature
  *  - `graft_simhash(words)`           → 64-bit SimHash signature
  *  - `graft_string_deletions(s)`      → SymSpell deletion neighborhood
  *  - `graft_word_set_count(words, w1, w2, …)` → count of hits in the set
  *
  * Literal-argument extraction happens at registration (n/k/word lists are
  * plan-time constants for the underlying expressions — that is what lets
  * them embed constant tables and unroll loops in codegen).
  */
class GraftExtensions extends (SparkSessionExtensions => Unit) {
  override def apply(ext: SparkSessionExtensions): Unit = {
    GraftExtensions.functions.foreach(ext.injectFunction)
    // opt-in theta→equi range-join rewrite (fires only when
    // spark.graft.rangeJoin.bucketWidth is set — see RangeJoinRewrite)
    ext.injectOptimizerRule(_ => RangeJoinRewrite)
    // always-on levenshtein-threshold rewrite (pure expression
    // equivalence — see LevenshteinThresholdRewrite)
    ext.injectOptimizerRule(_ => LevenshteinThresholdRewrite)
  }
}

object GraftExtensions {

  private def info(name: String, usage: String): ExpressionInfo =
    new ExpressionInfo(classOf[GraftExtensions].getName, null, name, usage, "")

  private def intLit(e: Expression, what: String): Int = e match {
    case org.apache.spark.sql.catalyst.expressions.Literal(v: Int, _) => v
    case other => throw new IllegalArgumentException(
      s"$what must be an integer literal, got $other")
  }

  private def stringLit(e: Expression, what: String): String = e match {
    case org.apache.spark.sql.catalyst.expressions.Literal(v, _) if v != null =>
      v.toString
    case other => throw new IllegalArgumentException(
      s"$what must be a string literal, got $other")
  }

  /** Clean arity failure (same style as the literal checks above) instead
    * of the raw IndexOutOfBoundsException an unchecked `args(i)` throws —
    * or worse, silently ignored extra arguments.
    */
  private def arity(args: Seq[Expression], n: Int, sig: String)
      : Seq[Expression] = {
    if (args.length != n) throw new IllegalArgumentException(
      s"expected $n arguments: $sig; got ${args.length}")
    args
  }

  private def arityAtLeast(args: Seq[Expression], n: Int, sig: String)
      : Seq[Expression] = {
    if (args.length < n) throw new IllegalArgumentException(
      s"expected at least $n arguments: $sig; got ${args.length}")
    args
  }

  /** The function catalog: (identifier, doc, builder). */
  val functions: Seq[(FunctionIdentifier, ExpressionInfo,
      Seq[Expression] => Expression)] = Seq(
    (new FunctionIdentifier("graft_dot_float"),
      info("graft_dot_float",
        "graft_dot_float(a, b) - dot product of two array<float> as double"),
      (args: Seq[Expression]) => {
        arity(args, 2, "graft_dot_float(a, b)")
        DotFloat(args(0), args(1))
      }),
    (new FunctionIdentifier("graft_word_shingles"),
      info("graft_word_shingles",
        "graft_word_shingles(words, n) - distinct n-word shingles"),
      (args: Seq[Expression]) => {
        arity(args, 2, "graft_word_shingles(words, n)")
        WordShingles(args(0), intLit(args(1), "shingle width"))
      }),
    (new FunctionIdentifier("graft_minhash"),
      info("graft_minhash",
        "graft_minhash(shingles, numPerm) - MinHash signature array<long>"),
      (args: Seq[Expression]) => {
        arity(args, 2, "graft_minhash(shingles, numPerm)")
        MinHashSignature(args(0), intLit(args(1), "numPerm"))
      }),
    (new FunctionIdentifier("graft_simhash"),
      info("graft_simhash",
        "graft_simhash(words) - 64-bit SimHash signature of a word array"),
      (args: Seq[Expression]) =>
        SimHashSignature(arity(args, 1, "graft_simhash(words)").head)),
    (new FunctionIdentifier("graft_string_deletions"),
      info("graft_string_deletions",
        "graft_string_deletions(s) - s plus its 1-char deletions, distinct"),
      (args: Seq[Expression]) => StringDeletions(
        arity(args, 1, "graft_string_deletions(s)").head)),
    (new FunctionIdentifier("graft_word_set_count"),
      info("graft_word_set_count",
        "graft_word_set_count(words, w1, w2, ...) - count of words in set"),
      (args: Seq[Expression]) => {
        arityAtLeast(args, 2, "graft_word_set_count(words, w1, ...)")
        WordSetCount(args.head, args.tail.map(stringLit(_, "set word")))
      }))

  /** Register on a live session — `withExtensions` only applies at
    * session construction; use this when the session is handed to you.
    */
  def register(spark: org.apache.spark.sql.SparkSession): Unit =
    functions.foreach { case (ident, inf, builder) =>
      org.apache.spark.sql.GraftColumns.registerFunction(spark, ident, inf, builder)
    }
}
