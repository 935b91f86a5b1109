package graft.operators

import graft.SparkSpec

/** Contracts of [[Profiling.profile]]: null counting, exact distincts
  * (nulls excluded), native-type min/max rendered as strings, one row
  * per profiled column.
  */
class ProfilingSpec extends SparkSpec {
  import spark.implicits._

  test("profile counts nulls, distincts exclude nulls, min/max use the " +
       "native type ordering") {
    val df = Seq[(java.lang.Long, String)](
      (100L, "b"), (9L, "a"), (9L, null), (null, "a"))
      .toDF("num", "s")
    val got = Profiling.profile(df, Seq("num", "s"))
      .collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3),
                 r.getString(4), r.getString(5)))
      .sortBy(_._1)
    // num: 4 rows, 1 null, distinct {100, 9}, min 9 / max 100 — NUMERIC
    // ordering (string min would be "100")
    assert(got(0) == ("num", 4L, 1L, 2L, "9", "100"), s"got ${got(0)}")
    assert(got(1) == ("s", 4L, 1L, 2L, "a", "b"), s"got ${got(1)}")
  }

  test("profile rejects an empty column list") {
    intercept[IllegalArgumentException] {
      Profiling.profile(Seq((1, "x")).toDF("a", "b"), Seq.empty)
    }
  }
}
