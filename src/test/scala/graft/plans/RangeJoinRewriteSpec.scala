package graft.plans

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.SparkSpec

/** Contracts of [[RangeJoinRewrite]]: identical results to the
  * nested-loop plan, the nested loop actually GONE when enabled, strict
  * opt-in (no conf → no rewrite), equi-joins left alone, and both
  * written orders of the BETWEEN recognized.
  */
class RangeJoinRewriteSpec extends SparkSpec {
  import spark.implicits._

  private def points = (0L until 400L).map(i => (i, i * 5 % 997))
    .toDF("pid", "x")
  private def intervals = (0L until 120L).map { i =>
    val s = (i * 37) % 900
    (i + 1000L, s, s + 25)
  }.toDF("iid", "s", "e")

  private def withRule[A](width: Long)(body: => A): A = {
    RangeJoinRewrite.enable(spark)
    spark.conf.set(RangeJoinRewrite.WidthKey, width.toString)
    try body
    finally {
      spark.conf.unset(RangeJoinRewrite.WidthKey)
      spark.experimental.extraOptimizations =
        spark.experimental.extraOptimizations.filterNot(_ == RangeJoinRewrite)
    }
  }

  private def joined: DataFrame =
    points.join(intervals, col("x") >= col("s") && col("x") <= col("e"))
      .select("pid", "iid")

  private def plan(df: DataFrame): String = {
    df.collect()
    df.queryExecution.executedPlan.toString.split("== Initial Plan ==")(0)
  }

  test("rewrite preserves results exactly and kills the nested loop") {
    val expected = joined.collect().map(r => (r.getLong(0), r.getLong(1)))
      .sorted // rule disabled: BNLJ ground truth
    val (got, p) = withRule(30) {
      val df = joined
      (df.collect().map(r => (r.getLong(0), r.getLong(1))).sorted, plan(df))
    }
    assert(got.toSeq === expected.toSeq)
    assert(expected.length > 400, "fixture must produce real matches")
    assert(!p.contains("BroadcastNestedLoopJoin") &&
           !p.contains("CartesianProduct"),
      s"range join must become an equi-join:\n$p")
  }

  test("reversed operand order (s <= x AND e >= x) is recognized too") {
    val expected = joined.collect().length
    val (n, p) = withRule(30) {
      val df = points
        .join(intervals, col("s") <= col("x") && col("e") >= col("x"))
        .select("pid", "iid")
      (df.collect().length, plan(df))
    }
    assert(n === expected)
    assert(!p.contains("BroadcastNestedLoopJoin"))
  }

  test("no conf → no rewrite (strict opt-in)") {
    RangeJoinRewrite.enable(spark)
    try {
      val p = plan(joined)
      assert(p.contains("BroadcastNestedLoopJoin") ||
             p.contains("CartesianProduct"),
        s"without ${RangeJoinRewrite.WidthKey} the plan must be unchanged:\n$p")
    } finally spark.experimental.extraOptimizations =
      spark.experimental.extraOptimizations.filterNot(_ == RangeJoinRewrite)
  }

  test("joins with a cross-side equality are left alone") {
    val p = withRule(30) {
      val df = points.join(intervals,
        col("pid") === col("iid") && col("x") >= col("s") &&
          col("x") <= col("e"))
      plan(df)
    }
    assert(!p.contains("__gcell"),
      s"equi-joins must not be decomposed:\n$p")
  }

  test("interval spanning more cells than the cap fails fast") {
    val wide = Seq((1L, 0L, 10000000L)).toDF("iid", "s", "e")
    withRule(2) {
      spark.conf.set(RangeJoinRewrite.MaxCellsKey, "100")
      try {
        val ex = intercept[Exception] {
          points.join(wide, col("x") >= col("s") && col("x") <= col("e"))
            .collect()
        }
        def msgs(t: Throwable): Seq[String] =
          if (t == null) Nil
          else Option(t.getMessage).toSeq ++ msgs(t.getCause)
        assert(msgs(ex).exists(_.contains("RangeJoinRewrite")), ex.toString)
      } finally spark.conf.unset(RangeJoinRewrite.MaxCellsKey)
    }
  }
}
