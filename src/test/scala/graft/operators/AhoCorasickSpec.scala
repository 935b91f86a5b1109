package graft.operators

import graft.SparkSpec

/** Contracts of [[AhoCorasick]] and [[Intervals]]: all-match semantics
  * (overlaps, nested patterns, fail-link hits), parity with a
  * brute-force positional scanner, interval union, and the span-cut
  * digest view.
  */
class AhoCorasickSpec extends SparkSpec {
  import spark.implicits._

  private def bruteMatches(text: String, pats: Seq[String]) =
    (for {
      p <- pats
      i <- 0 to text.length - p.length
      if text.regionMatches(i, p, 0, p.length)
    } yield (p, i + 1L, p.length.toLong)).sortBy(t => (t._1, t._2))

  test("nested and overlapping patterns all report (fail-link emits)") {
    val pats = Seq("table", "able", "le", "an", "scan")
    val text = "a table scans"
    val got = AhoCorasick.matchSpans(
        Seq((1L, text)).toDF("doc_id", "text"), "doc_id", "text", pats)
      .collect().map(r => (r.getString(1), r.getLong(2), r.getLong(3)))
      .sortBy(t => (t._1, t._2)).toSeq
    assert(got == bruteMatches(text, pats))
    // sanity on the hard cases: "table" at 3 implies "able" at 4 and
    // "le" at 6; "scan" at 9 implies "an" at 11
    assert(got.contains(("able", 4L, 4L)))
    assert(got.contains(("le", 6L, 2L)))
    assert(got.contains(("an", 11L, 2L)))
  }

  test("matches parity with brute force on generated texts, " +
       "self-overlapping pattern included") {
    val pats = Seq("aa", "aba", "ba", "b", "abab")
    val texts = Seq("aaaa", "ababab", "ba", "", "abba", "aabab")
    texts.zipWithIndex.foreach { case (t, i) =>
      val got = AhoCorasick.matchSpans(
          Seq((i.toLong, t)).toDF("doc_id", "text"),
          "doc_id", "text", pats)
        .collect().map(r => (r.getString(1), r.getLong(2), r.getLong(3)))
        .sortBy(x => (x._1, x._2)).toSeq
      assert(got == bruteMatches(t, pats), s"text '$t'")
    }
  }

  test("compile rejects empty and duplicate patterns") {
    intercept[IllegalArgumentException](AhoCorasick.compile(Seq("")))
    intercept[IllegalArgumentException](
      AhoCorasick.compile(Seq("ab", "ab")))
  }

  test("interval union merges overlapping and touching, keeps gaps") {
    val got = Intervals.unionSpans(
        Seq((1L, 1L, 3L), (1L, 2L, 4L),   // overlap -> [1, 6)
            (1L, 6L, 2L),                 // touches  -> [1, 8)
            (1L, 10L, 1L),                // gap      -> own
            (2L, 5L, 5L)).toDF("id", "start", "len"),
        "id", "start", "len")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
      .sortBy(t => (t._1, t._2)).toSeq
    assert(got == Seq((1L, 1L, 7L), (1L, 10L, 1L), (2L, 5L, 5L)))
  }

  test("cutSpans digest view: cuts, zero-span docs, full removal") {
    import org.apache.spark.sql.functions.md5
    val docs = Seq((1L, "abcdefgh"), (2L, "keep"), (3L, "gone"))
      .toDF("id", "text")
    val spans = Seq((1L, 3L, 2L), (1L, 6L, 1L), (3L, 1L, 4L))
      .toDF("id", "start", "len")
    val got = Intervals.cutSpans(docs, "id", "text", spans)
      .collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getString(3)))
      .sortBy(_._1).toSeq
    val exp = Seq("abegh", "keep", "").toDF("s")
      .select(md5($"s")).as[String].collect()
    assert(got.map(x => (x._1, x._2, x._3)) ==
      Seq((1L, 8L, 3L), (2L, 4L, 0L), (3L, 4L, 4L)))
    assert(got.map(_._4).toSeq == exp.toSeq)
  }

  test("dictionary size cap is loud: total pattern chars over the cap " +
       "refuse to compile instead of shipping an unbounded automaton") {
    val ex = intercept[IllegalArgumentException] {
      AhoCorasick.compile(Seq("abcdefghij", "klmnopqrst"),
                          maxPatternChars = 15L)
    }
    assert(ex.getMessage.contains("maxPatternChars") ||
           ex.getMessage.contains("cap"))
    // at the cap boundary it compiles
    val a = AhoCorasick.compile(Seq("abcdefghij", "klmnopqrst"),
                                maxPatternChars = 20L)
    assert(a.matches("xxabcdefghijzz").toSeq.nonEmpty)
  }
}
