package graft.operators

import graft.SparkSpec

class RobustStatsSpec extends SparkSpec {

  import spark.implicits._

  private def summary(rows: Seq[(String, Long)], k: Long = 3) =
    RobustStats.madOutlierSummary(rows.toDF("g", "x"), "g", "x", k)
      .collect()
      .map(r => r.getString(0) ->
                (r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4)))
      .toMap

  test("hand-derived median, MAD, and outlier count") {
    // g=a: values 1,2,3,4,100 -> median 3 (rank (5-1)/2+1 = 3),
    // deviations 2,1,0,1,97 -> sorted 0,1,1,2,97 -> MAD 1 (rank 3);
    // outliers |x-3| > 3: only 100
    val got = summary(Seq("a" -> 1L, "a" -> 2L, "a" -> 3L, "a" -> 4L,
                          "a" -> 100L))
    assert(got("a") === ((5L, 3L, 1L, 1L)))
  }

  test("even group uses the lower-middle rank on both statistics") {
    // values 10,20,30,40 -> rank (4-1)/2+1 = 2 -> median 20;
    // deviations 10,0,10,20 -> sorted 0,10,10,20 -> MAD 10;
    // outliers: |40-20|=20 <= 30 -> none
    val got = summary(Seq("b" -> 10L, "b" -> 20L, "b" -> 30L, "b" -> 40L))
    assert(got("b") === ((4L, 20L, 10L, 0L)))
  }

  test("zero MAD flags every deviating row, by definition") {
    // over half identical: median 5, MAD 0 -> 7 and 9 are outliers
    val got = summary(Seq("c" -> 5L, "c" -> 5L, "c" -> 5L, "c" -> 7L,
                          "c" -> 9L))
    assert(got("c") === ((5L, 5L, 0L, 2L)))
  }

  test("groups are independent and the result is partition-invariant") {
    val rows = (0L until 500L).map(i => (s"g${i % 4}", (i * 37) % 101))
    val df = rows.toDF("g", "x")
    def run(d: org.apache.spark.sql.DataFrame) =
      RobustStats.madOutlierSummary(d, "g", "x", 3)
        .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2),
                             r.getLong(3), r.getLong(4))).sortBy(_._1)
    assert(run(df).toSeq === run(df.repartition(17)).toSeq)
    assert(run(df).map(_._1).toSeq === Seq("g0", "g1", "g2", "g3"))
  }

  test("fails loud on k < 1") {
    intercept[IllegalArgumentException] {
      RobustStats.madOutlierSummary(Seq(("a", 1L)).toDF("g", "x"),
                                    "g", "x", 0)
    }
  }
}
