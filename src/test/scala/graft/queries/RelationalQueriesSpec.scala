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
}
