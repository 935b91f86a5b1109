package graft.queries

import graft.{SparkEntry, SparkSpec}

class RelationalQueriesSpec extends SparkSpec {

  test("q1_agg groups by returnflag x linestatus with exact sums") {
    val rows = RelationalQueries.q1Agg(spark, sf).collect()
    assert(rows.nonEmpty)
    val counts = rows.map(_.getAs[Long]("count_order"))
    assert(counts.sum == 6000L) // sf0.001 lineitem row count
    assert(rows.forall(_.getAs[Double]("sum_qty") > 0))
  }

  test("entry returns rows") {
    assert(SparkEntry.entry(spark).count() > 0)
  }

  test("every query has matching oracle key or is rows-only by design") {
    val q = SparkEntry.queries.keySet
    val o = SparkEntry.oracleSql.keySet
    assert(o.subsetOf(q), s"oracle keys without query: ${o -- q}")
  }

  test("all relational queries execute and return rows at sf0.001") {
    RelationalQueries.queries.foreach { case (name, fn) =>
      val n = fn(spark, sf).count()
      assert(n > 0, s"$name returned no rows")
    }
  }

  test("q6 topN keeps exactly 10 customers, deterministically") {
    val rows = RelationalQueries.q6TopNSemiJoin(spark, sf).collect()
    assert(rows.length == 10)
  }

  test("q7 rolling window rate is bounded [0,1] and windows accumulate") {
    val rows = RelationalQueries.q7RollingWindow(spark, sf).collect()
    assert(rows.forall { r =>
      val rate = r.getAs[Double]("rolling_f_rate")
      rate >= 0.0 && rate <= 1.0 &&
        r.getAs[Long]("rolling_n") >= r.getAs[Long]("n")
    })
  }

  test("q15 shares sum to 1 within each priority") {
    val rows = RelationalQueries.q15TwoDimRatio(spark, sf).collect()
    val byPriority = rows.groupBy(_.getAs[String]("o_orderpriority"))
    byPriority.foreach { case (p, rs) =>
      val tot = rs.map(_.getAs[Double]("share")).sum
      assert(math.abs(tot - 1.0) < 1e-9, s"priority $p shares sum to $tot")
    }
  }
}
