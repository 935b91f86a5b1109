package graft.plans

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.plans.Inner
import org.apache.spark.sql.catalyst.plans.logical._
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.types.{ByteType, IntegerType, LongType, ShortType, StringType}

/** Optimizer rule: rewrite a point-in-interval theta-join into the
  * bucket-decomposed EQUI-join of
  * [[graft.operators.TemporalOps.rangeJoin]] — automatically.
  *
  * `SELECT … FROM points p JOIN intervals i ON p.x BETWEEN i.s AND i.e`
  * has no equi-predicate, so Spark can only plan it as
  * BroadcastNestedLoopJoin (O(n·m) probes, and a hard OOM when neither
  * side broadcasts) or a cartesian product. This rule detects the
  * pattern on resolved inner joins — a lower and an upper bound on the
  * same point expression, point from one side, both bounds from the
  * other, all integral-typed — and injects the cell decomposition: the
  * point side gains `cell(x)`, the interval side explodes into the
  * cells each interval overlaps, and the join becomes an ordinary hash
  * join on the cell with the original predicate re-applied as the
  * exact filter. A final Project restores the original output exactly.
  *
  * OPT-IN by configuration: the cell width is domain knowledge the
  * optimizer cannot guess (too small explodes the interval side, too
  * large inflates candidate lists), so the rule fires only when
  * `spark.graft.rangeJoin.bucketWidth` is set (a positive long in the
  * point column's units). `spark.graft.rangeJoin.maxCellsPerInterval`
  * (default 2^20) fail-fasts runaway intervals at execution, exactly
  * like the operator form.
  *
  * Idempotent under the optimizer's fixed-point batches: the rewritten
  * join carries a cross-side equality (on the cells), and joins that
  * already have ANY cross-side equality are skipped (Spark's join
  * selection handles those fine without help).
  */
object RangeJoinRewrite extends Rule[LogicalPlan] {

  val WidthKey = "spark.graft.rangeJoin.bucketWidth"
  val MaxCellsKey = "spark.graft.rangeJoin.maxCellsPerInterval"

  /** Runtime enablement for an already-built session (the
    * `withExtensions` path only applies at construction time).
    */
  def enable(session: SparkSession): Unit =
    if (!session.experimental.extraOptimizations.contains(this))
      session.experimental.extraOptimizations =
        session.experimental.extraOptimizations :+ this

  override def apply(plan: LogicalPlan): LogicalPlan = {
    val width = conf.getConfString(WidthKey, "").trim
    if (width.isEmpty) plan
    else {
      // misconfiguration must surface as an actionable message, not a raw
      // NumberFormatException failing every query in the session
      val w = parseLong(WidthKey, width)
      require(w >= 1, s"$WidthKey must be >= 1, got $w")
      val maxCells =
        parseLong(MaxCellsKey,
                  conf.getConfString(MaxCellsKey, (1L << 20).toString))
      plan.transformDown {
        case j @ Join(l, r, Inner, Some(cond), hint) if j.resolved &&
            eligible(l, r, cond) =>
          rewrite(j, l, r, cond, hint, w, maxCells).getOrElse(j)
      }
    }
  }

  private def parseLong(key: String, value: String): Long =
    try value.trim.toLong
    catch {
      case _: NumberFormatException =>
        throw new IllegalArgumentException(
          s"$key must be a long, got '$value' — unset it or set a " +
            "positive integer (bucket width in the range columns' units)")
    }

  private def conjuncts(e: Expression): Seq[Expression] = e match {
    case And(a, b) => conjuncts(a) ++ conjuncts(b)
    case other => Seq(other)
  }

  private def sideOf(e: Expression, l: LogicalPlan, r: LogicalPlan)
      : Option[Boolean] = { // Some(true)=left, Some(false)=right
    val refs = e.references
    if (refs.isEmpty) None
    else if (refs.subsetOf(l.outputSet)) Some(true)
    else if (refs.subsetOf(r.outputSet)) Some(false)
    else None
  }

  private def crossSideEquality(l: LogicalPlan, r: LogicalPlan,
                                cond: Expression): Boolean =
    conjuncts(cond).exists {
      case EqualTo(a, b) =>
        (for (sa <- sideOf(a, l, r); sb <- sideOf(b, l, r))
          yield sa != sb).getOrElse(false)
      case EqualNullSafe(a, b) =>
        (for (sa <- sideOf(a, l, r); sb <- sideOf(b, l, r))
          yield sa != sb).getOrElse(false)
      case _ => false
    }

  /** (point, lowerBound) pairs normalized from >= / <= in either
    * written order.
    */
  private def lowerBounds(cs: Seq[Expression]): Seq[(Expression, Expression)] =
    cs.collect {
      case GreaterThanOrEqual(p, s) => (p, s)
      case LessThanOrEqual(s, p) => (p, s)
    }

  private def upperBounds(cs: Seq[Expression]): Seq[(Expression, Expression)] =
    cs.collect {
      case LessThanOrEqual(p, e) => (p, e)
      case GreaterThanOrEqual(e, p) => (p, e)
    }

  private def integral(e: Expression): Boolean = e.dataType match {
    case ByteType | ShortType | IntegerType | LongType => true
    case _ => false
  }

  /** Finds (point, lower, upper, pointIsLeft). */
  private def findPattern(l: LogicalPlan, r: LogicalPlan, cond: Expression)
      : Option[(Expression, Expression, Expression, Boolean)] = {
    val cs = conjuncts(cond)
    val cands = for {
      (p1, s) <- lowerBounds(cs)
      (p2, e) <- upperBounds(cs)
      if p1.semanticEquals(p2) && integral(p1) && integral(s) && integral(e)
      pSide <- sideOf(p1, l, r)
      sSide <- sideOf(s, l, r)
      eSide <- sideOf(e, l, r)
      if sSide == eSide && sSide != pSide
    } yield (p1, s, e, pSide)
    cands.headOption
  }

  private def eligible(l: LogicalPlan, r: LogicalPlan,
                       cond: Expression): Boolean =
    !crossSideEquality(l, r, cond) && findPattern(l, r, cond).nonEmpty

  /** floorCell built from RAW catalyst nodes (same arithmetic as
    * TemporalOps). The Column DSL is unusable here: in Spark 4 a Column
    * is a ColumnNode tree that only becomes a catalyst Expression
    * during ANALYSIS — inside an optimizer rule it would smuggle
    * `UnresolvedFunction` nodes into a post-analysis plan. Literal
    * types must also match exactly (type coercion already ran).
    */
  private def cellOf(x: Expression, w: Long): Expression = {
    val cl = Cast(x, LongType)
    val W = Literal(w)
    Subtract(
      IntegralDivide(cl, W),
      If(And(LessThan(cl, Literal(0L)),
             Not(EqualTo(Remainder(cl, W), Literal(0L)))),
         Literal(1L), Literal(0L)))
  }

  private def rewrite(j: Join, l: LogicalPlan, r: LogicalPlan,
                      cond: Expression, hint: JoinHint, w: Long,
                      maxCells: Long): Option[LogicalPlan] =
    findPattern(l, r, cond).map { case (p, s, e, pointIsLeft) =>
      val (pointPlan, ivPlan) = if (pointIsLeft) (l, r) else (r, l)

      val pCell = Alias(cellOf(p, w), "__gcell_p")()
      val pointProj = Project(pointPlan.output :+ pCell, pointPlan)

      val c0 = Alias(cellOf(s, w), "__gc0")()
      val c1 = Alias(cellOf(e, w), "__gc1")()
      val ivProj = Project(ivPlan.output :+ c0 :+ c1, ivPlan)
      val c0r = c0.toAttribute
      val c1r = c1.toAttribute
      val diff = Subtract(c1r, c0r)
      val msg = Concat(Seq(
        Literal("RangeJoinRewrite: interval spans "),
        Cast(Add(diff, Literal(1L)), StringType),
        Literal(s" cells > $MaxCellsKey=$maxCells — raise $WidthKey or " +
          "the cap")))
      val guardedEnd = If(LessThan(diff, Literal(maxCells)), c1r,
        Cast(RaiseError(msg), LongType))
      val genAttr = AttributeReference("__gcell_iv", LongType,
                                       nullable = false)()
      // Sequence is TimeZoneAwareExpression: it is NOT resolved until
      // timeZoneId is set, even for integral sequences
      val seq = new Sequence(c0r, guardedEnd, Some(Literal(1L)))
        .withTimeZone(conf.sessionLocalTimeZone)
      val gen = Generate(
        Explode(seq),
        unrequiredChildIndex = Nil, outer = false, qualifier = None,
        generatorOutput = Seq(genAttr), child = ivProj)

      val cellEq = EqualTo(pCell.toAttribute, genAttr)
      val (newL, newR) = if (pointIsLeft) (pointProj, gen) else (gen, pointProj)
      Project(j.output,
        Join(newL, newR, Inner, Some(And(cellEq, cond)), hint))
    }
}
