package graft.plans

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.plans.logical.LogicalPlan
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.types.IntegerType

/** Optimizer rule: comparisons of an UN-thresholded `levenshtein`
  * against an integer literal rewrite to the banded THRESHOLD kernel —
  * automatically, so a user who writes the natural predicate gets the
  * plan an expert would have written:
  *
  *   lev(a,b) <= k   ⟶   lev(a,b,k)   >= 0
  *   lev(a,b) <  k   ⟶   lev(a,b,k−1) >= 0
  *   lev(a,b) =  k   ⟶   lev(a,b,k)   =  k
  *   lev(a,b) >  k   ⟶   lev(a,b,k)   <  0
  *   lev(a,b) >= k   ⟶   lev(a,b,k−1) <  0
  *   (and the literal-first mirror of each — the lower-bound forms
  *   are the natural "keep only NON-duplicates" predicates)
  *
  * The full DP is O(\|a\|·\|b\|) per pair; the threshold form computes
  * only the 2k+1 diagonal band and early-exits, O(k·len) — on a
  * fuzzy-join filter evaluated millions of times (q193/q226/q230's
  * candidate verify) that factor is the difference measured in the §9
  * probes. Equivalence is exact, including nulls: the threshold form
  * returns −1 where the distance exceeds k (so `>= 0` reproduces
  * `<= k`), distances at most k are returned verbatim (so `= k`
  * survives), and null inputs yield null in both forms, making the
  * comparison null in both plans.
  *
  * Always ON once injected (pure expression equivalence — there is no
  * knob to guess, unlike [[RangeJoinRewrite]]'s bucket width) and
  * idempotent: the rewritten node carries a threshold, which the
  * pattern excludes. Degenerate literals (`<= −1`, `> −1`, `>= 0`,
  * `= −1`, …) are left untouched: their constant-valued equivalents
  * are NOT plain `true`/`false` — a null input must still yield null
  * — and a negative threshold would change the expression's error
  * behavior rather than its value, so the rule only fires where the
  * threshold form is a strict drop-in.
  */
object LevenshteinThresholdRewrite extends Rule[LogicalPlan] {

  /** Runtime enablement for an already-built session (the
    * `withExtensions` path only applies at construction time).
    */
  def enable(session: SparkSession): Unit =
    if (!session.experimental.extraOptimizations.contains(this))
      session.experimental.extraOptimizations =
        session.experimental.extraOptimizations :+ this

  private object IntLit {
    def unapply(e: Expression): Option[Int] = e match {
      case Literal(v: Int, IntegerType) => Some(v)
      case _ => None
    }
  }

  override def apply(plan: LogicalPlan): LogicalPlan =
    plan.transformAllExpressions {
      case LessThanOrEqual(Levenshtein(a, b, None), IntLit(k)) if k >= 0 =>
        GreaterThanOrEqual(Levenshtein(a, b, Some(Literal(k))), Literal(0))
      case GreaterThanOrEqual(IntLit(k), Levenshtein(a, b, None)) if k >= 0 =>
        GreaterThanOrEqual(Levenshtein(a, b, Some(Literal(k))), Literal(0))
      case LessThan(Levenshtein(a, b, None), IntLit(k)) if k >= 1 =>
        GreaterThanOrEqual(Levenshtein(a, b, Some(Literal(k - 1))),
                           Literal(0))
      case GreaterThan(IntLit(k), Levenshtein(a, b, None)) if k >= 1 =>
        GreaterThanOrEqual(Levenshtein(a, b, Some(Literal(k - 1))),
                           Literal(0))
      case EqualTo(Levenshtein(a, b, None), IntLit(k)) if k >= 0 =>
        EqualTo(Levenshtein(a, b, Some(Literal(k))), Literal(k))
      case EqualTo(IntLit(k), Levenshtein(a, b, None)) if k >= 0 =>
        EqualTo(Levenshtein(a, b, Some(Literal(k))), Literal(k))
      // lower bounds: the threshold form returns −1 exactly when the
      // distance exceeds k, so "dist > k" is "lev(a,b,k) < 0"
      case GreaterThan(Levenshtein(a, b, None), IntLit(k)) if k >= 0 =>
        LessThan(Levenshtein(a, b, Some(Literal(k))), Literal(0))
      case LessThan(IntLit(k), Levenshtein(a, b, None)) if k >= 0 =>
        LessThan(Levenshtein(a, b, Some(Literal(k))), Literal(0))
      case GreaterThanOrEqual(Levenshtein(a, b, None), IntLit(k))
          if k >= 1 =>
        LessThan(Levenshtein(a, b, Some(Literal(k - 1))), Literal(0))
      case LessThanOrEqual(IntLit(k), Levenshtein(a, b, None))
          if k >= 1 =>
        LessThan(Levenshtein(a, b, Some(Literal(k - 1))), Literal(0))
    }
}
