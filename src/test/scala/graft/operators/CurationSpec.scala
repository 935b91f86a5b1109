package graft.operators

import org.apache.spark.sql.functions._

import graft.SparkSpec
import graft.functions.TextFunctions

class CurationSpec extends SparkSpec {
  import spark.implicits._

  test("redactPii replaces every category, counts match, clean text untouched") {
    val df = Seq(
      (1L, "mail a.b+c@ex-ample.org or x@y.io, call +1-555-1234, " +
        "host 10.0.3.250 end"),
      (2L, "no pii here, just words and numbers 123 45.6")
    ).toDF("id", "t")
    val out = df.select(
      col("id"),
      TextFunctions.redactPii(col("t")).as("r"),
      TextFunctions.piiCount(col("t"), "email").as("ne"),
      TextFunctions.piiCount(col("t"), "phone").as("np"),
      TextFunctions.piiCount(col("t"), "ip").as("ni"))
      .as[(Long, String, Int, Int, Int)].collect().sortBy(_._1)
    assert(out(0)._2 ===
      "mail <EMAIL> or <EMAIL>, call <PHONE>, host <IP> end")
    assert((out(0)._3, out(0)._4, out(0)._5) === ((2, 1, 1)))
    assert(out(1)._2 === "no pii here, just words and numbers 123 45.6",
      "a bare decimal must not be redacted as an IP")
    assert((out(1)._3, out(1)._4, out(1)._5) === ((0, 0, 0)))
  }

  test("tokenBudget keeps a deterministic hash-ordered prefix per group") {
    val df = Seq(
      ("a", 1L, 400L), ("a", 2L, 400L), ("a", 3L, 400L),
      ("b", 4L, 1001L), // single row over budget: nothing kept
      ("c", 5L, 1000L)  // exactly at budget: kept
    ).toDF("src", "id", "toks")
    val out = Sampling.tokenBudget(df, "src", "id", "toks", budget = 1000L)
      .select("src", "id", "kept").as[(String, Long, Boolean)]
      .collect().map { case (s, i, k) => (s, i) -> k }.toMap
    // group a: 3x400 — exactly two fit (whichever two hash first)
    assert(Seq(1L, 2L, 3L).count(i => out(("a", i))) === 2)
    assert(!out(("b", 4L)), "a row that alone exceeds the budget is dropped")
    assert(out(("c", 5L)), "the budget boundary is inclusive")
    // determinism: same membership on re-evaluation
    val again = Sampling.tokenBudget(df, "src", "id", "toks", budget = 1000L)
      .select("src", "id", "kept").as[(String, Long, Boolean)]
      .collect().map { case (s, i, k) => (s, i) -> k }.toMap
    assert(again === out)
  }

  test("tokenBudget drops the crossing row, not just rows after it") {
    // one group, ids hash in SOME fixed order; cumulative 600+600 crosses
    // at the second row regardless of which comes first
    val df = Seq(("s", 10L, 600L), ("s", 11L, 600L)).toDF("src", "id", "toks")
    val kept = Sampling.tokenBudget(df, "src", "id", "toks", budget = 1000L)
      .filter(col("kept")).count()
    assert(kept === 1)
  }
}
