package graft.operators

import graft.SparkSpec

/** Contracts of [[Dedup.lineDedup]]: first-occurrence keeper ordering,
  * cross-doc AND within-doc removal, ragged tail lines, rebuild order,
  * and the all-removed → empty-text edge.
  */
class LineDedupSpec extends SparkSpec {
  import spark.implicits._

  private def run(rows: Seq[(Long, String)], wpl: Int) =
    Dedup.lineDedup(rows.toDF("doc_id", "text"), "doc_id", "text", wpl)
      .collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getString(3)))
      .sortBy(_._1)

  test("duplicate line survives only at its first occurrence " +
       "(min doc_id, then min line_idx)") {
    // 2-word lines; "a b" appears in doc 1 (line 0), doc 2 (line 1),
    // and twice in doc 3.
    val got = run(Seq(
      1L -> "a b c d",
      2L -> "x y a b",
      3L -> "a b a b z"), wpl = 2)
    assert(got(0) == (1L, 2L, 2L, "a b c d"))
    assert(got(1) == (2L, 2L, 1L, "x y"))
    // doc 3: both "a b" lines removed; ragged tail "z" kept
    assert(got(2) == (3L, 3L, 1L, "z"))
  }

  test("within-doc repeats keep only the first; rebuild preserves " +
       "original line order") {
    val got = run(Seq(1L -> "p q r s p q t u"), wpl = 2)
    assert(got(0) == (1L, 4L, 3L, "p q r s t u"))
  }

  test("doc whose every line first occurred elsewhere rebuilds to the " +
       "empty string") {
    val got = run(Seq(1L -> "a b", 2L -> "a b"), wpl = 2)
    assert(got(0) == (1L, 1L, 1L, "a b"))
    assert(got(1) == (2L, 1L, 0L, ""))
  }

  test("unique corpus is a no-op reconstruction") {
    val rows = Seq(1L -> "one two three four five",
                   2L -> "six seven eight nine")
    val got = run(rows, wpl = 3)
    assert(got.map(_._4).toSeq == rows.map(_._2))
    assert(got.map(t => t._2 -> t._3).forall(t => t._1 == t._2))
  }
}
