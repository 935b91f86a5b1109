package graft.operators

import graft.SparkSpec

/** Contracts of [[DataDiff.diff]]: the four statuses, null-safe value
  * compare, and schema mismatch rejection.
  */
class DataDiffSpec extends SparkSpec {
  import spark.implicits._

  test("added/removed/changed/same classified; null-safe compare") {
    val v1 = Seq[(Long, java.lang.Long)](
      (1L, 10L), (2L, null), (3L, 30L), (4L, 40L)).toDF("k", "v")
    val v2 = Seq[(Long, java.lang.Long)](
      (1L, 10L), (2L, null), (3L, 31L), (5L, 50L)).toDF("k", "v")
    val got = DataDiff.diff(v1, v2, Seq("k"))
      .collect().map(r => (r.getLong(0), r.getString(1))).sortBy(_._1)
    assert(got.toSeq === Seq(
      (1L, "same"),
      (2L, "same"),     // null <=> null is SAME, not changed
      (3L, "changed"),
      (4L, "removed"),
      (5L, "added")), s"got ${got.toSeq}")
  }

  test("both sides' values are surfaced for changed rows") {
    val v1 = Seq((1L, "a")).toDF("k", "v")
    val v2 = Seq((1L, "b")).toDF("k", "v")
    val r = DataDiff.diff(v1, v2, Seq("k")).collect()(0)
    assert(r.getString(1) === "changed" &&
      r.getString(2) === "a" && r.getString(3) === "b")
  }

  test("schema mismatches are rejected") {
    intercept[IllegalArgumentException] {
      DataDiff.diff(Seq((1L, 1L)).toDF("k", "x"),
                    Seq((1L, 1L)).toDF("k", "y"), Seq("k"))
    }
  }
}
