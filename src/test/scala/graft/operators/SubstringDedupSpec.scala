package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions.md5

/** Contracts of [[Dedup.duplicatedSubstringSpans]] /
  * [[Dedup.substringDupStats]] — the char-level any-length
  * exact-substring dedup: cross-doc duplicated regions with exact
  * boundaries, gap-L region merging, within-doc self-repeats, the
  * shorter-than-L edge, and zero-filled stats.
  */
class SubstringDedupSpec extends SparkSpec {
  import spark.implicits._

  private def spans(rows: Seq[(Long, String)], l: Int) =
    Dedup.duplicatedSubstringSpans(rows.toDF("doc_id", "text"),
                                   "doc_id", "text", minLen = l)
      .collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
      .sortBy(x => (x._1, x._2))

  test("a shared >= L substring yields one exact region in each doc") {
    // shared block of 12 chars, L = 8; distinct prefixes/suffixes
    val shared = "ABCDEFGHIJKL"
    val got = spans(Seq(
      1L -> s"xxx${shared}yyy",
      2L -> s"qqqqq${shared}ppp"), l = 8)
    // doc 1: region starts at pos 4 (1-based), spans the 12 shared chars
    assert(got.toSeq == Seq((1L, 4L, 12L), (2L, 6L, 12L)))
  }

  test("separate duplicated blocks stay separate regions; OVERLAPPING " +
       "duplicated substrings merge into one maximal region") {
    val a = "AAAAAAAAAA" // 10 chars, L = 6; separators share no 6-gram
    val far = spans(Seq(
      1L -> s"$a-qwertyuiopasdfg-$a",
      2L -> s"$a=zxcvbnmlkjhgfds=$a"), l = 6)
    // each doc: two regions of exactly the 10 duplicated chars (the
    // single uncovered separator char after pos 10 splits regions —
    // windows from p = 5 reach pos 10, the next covered p is past it)
    assert(far.toSeq == Seq((1L, 1L, 10L), (1L, 28L, 10L),
                            (2L, 1L, 10L), (2L, 28L, 10L)))
    // "ABCDEFGH" (dup with doc 2) and "EFGHIJKL" (dup with doc 3)
    // overlap inside doc 1: covered positions {1, 5} with a gap of
    // uncovered-but-window-covered positions between -> ONE maximal
    // region spanning the union, exactly the suffix-array behavior.
    val merged = spans(Seq(
      1L -> "ABCDEFGHIJKL",
      2L -> "qqABCDEFGHzz",
      3L -> "ppEFGHIJKLww"), l = 8)
    assert(merged.toSeq == Seq((1L, 1L, 12L), (2L, 3L, 8L),
                               (3L, 3L, 8L)))
  }

  test("within-doc self-repeat counts as duplication (run of one char)") {
    val got = spans(Seq(1L -> ("z" * 40 + "qwerty")), l = 25)
    // every 25-gram inside the run is identical -> covered 1..16,
    // one region [1, 40]
    assert(got.toSeq == Seq((1L, 1L, 40L)))
  }

  test("removeDuplicatedSubstrings cuts exactly the reported regions " +
       "and md5-matches a brute-force per-char rebuild") {
    import org.apache.spark.sql.functions.md5
    val shared = "ABCDEFGHIJKL"
    val rows = Seq(
      1L -> s"xxx${shared}yyy",                    // one cut, mid-doc
      2L -> s"${shared}ppp",                       // cut at doc start
      3L -> "tiny",                                // untouched (< L)
      4L -> (shared + shared))                     // everything cut
    val got = Dedup.removeDuplicatedSubstrings(
        rows.toDF("doc_id", "text"), "doc_id", "text", minLen = 8)
      .collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getString(3)))
      .sortBy(_._1).toSeq
    // brute-force expectation: remove every position covered by a
    // window [p, p+L-1] whose L-gram appears >= 2 times corpus-wide
    val l = 8
    val gramCounts = rows.flatMap { case (_, t) =>
      (0 to t.length - l).filter(_ >= 0).map(i => t.substring(i, i + l))
    }.groupBy(identity).map { case (g, o) => g -> o.size }
    def cleaned(t: String): String = {
      val cov = Array.fill(t.length)(false)
      for (i <- 0 to t.length - l if gramCounts(t.substring(i, i + l)) >= 2;
           j <- i until i + l) cov(j) = true
      t.zipWithIndex.collect { case (c, i) if !cov(i) => c }.mkString
    }
    val exp = rows.sortBy(_._1).map { case (id, t) =>
      val c = cleaned(t)
      (id, t.length.toLong, (t.length - c.length).toLong, c)
    }
    val expMd5 = exp.map(_._4).toDF("s").select(md5($"s")).as[String]
      .collect()
    assert(got.map(x => (x._1, x._2, x._3)) ==
      exp.map(x => (x._1, x._2, x._3)))
    assert(got.map(_._4).toSeq == expMd5.toSeq)
    assert(exp(3)._4 == "") // doc 4 fully removed, md5("") path exercised
  }

  test("docs shorter than L never contribute; stats zero-fill them") {
    val rows = Seq(1L -> "short", 2L -> ("B" * 30), 3L -> ("B" * 30))
    assert(spans(rows, l = 25).forall(_._1 != 1L))
    val st = Dedup.substringDupStats(rows.toDF("doc_id", "text"),
                                     "doc_id", "text", minLen = 25)
      .collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3),
                 r.getLong(4)))
      .sortBy(_._1)
    assert(st(0) == (1L, 5L, 0L, 0L, 0L))
    assert(st(1) == (2L, 30L, 1L, 30L, 1000000L))
    assert(st(2) == (3L, 30L, 1L, 30L, 1000000L))
  }

  private def keepFirstSpans(rows: Seq[(Long, String)], l: Int) =
    Dedup.keepFirstDuplicatedSubstringSpans(rows.toDF("doc_id", "text"),
                                            "doc_id", "text", minLen = l)
      .collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
      .sortBy(x => (x._1, x._2)).toSeq

  test("keep-first: the earliest occurrence keeps its copy, all later " +
       "occurrences are cut — cross-doc and within-doc") {
    val shared = "ABCDEFGHIJKL"
    // cross-doc: doc 1 holds the first occurrence -> no span in doc 1
    assert(keepFirstSpans(Seq(
      1L -> s"xxx${shared}yyy",
      2L -> s"qqqqq${shared}ppp"), l = 8) == Seq((2L, 6L, 12L)))
    // within-doc self-repeat: first window keeps, the tail is cut.
    // covered positions are 2..16 (non-keeper starts of the 25-run
    // gram) -> one region [2, 40]
    assert(keepFirstSpans(Seq(1L -> ("z" * 40 + "qwerty")), l = 25) ==
      Seq((1L, 2L, 39L)))
    // doc order is the election order, not text order: swap ids and
    // the keeper flips
    assert(keepFirstSpans(Seq(
      2L -> s"xxx${shared}yyy",
      1L -> s"qqqqq${shared}ppp"), l = 8) == Seq((2L, 4L, 12L)))
  }

  test("keep-first apply: keeper docs hash UNCHANGED, non-keepers lose " +
       "exactly the family copy; removal never exceeds q252's") {
    val shared = "ABCDEFGH" * 4 // 32 chars
    val rows = Seq(1L -> s"aaa${shared}bbb",
                   2L -> s"ccc${shared}ddd",
                   3L -> "totally clean text here")
    val df = rows.toDF("doc_id", "text")
    val kf = Dedup.removeDuplicatedSubstringsKeepFirst(
        df, "doc_id", "text", minLen = 25)
      .collect().map(r => (r.getLong(0), r.getLong(2), r.getString(3)))
      .sortBy(_._1)
    val md5Of = (s: String) => Seq(s).toDF("s")
      .select(md5($"s")).as[String].collect()(0)
    assert(kf(0) == (1L, 0L, md5Of(rows(0)._2))) // keeper: unchanged
    assert(kf(1) == (2L, 32L, md5Of("cccddd")))  // family copy cut
    assert(kf(2) == (3L, 0L, md5Of(rows(2)._2)))
    val all = Dedup.removeDuplicatedSubstrings(df, "doc_id", "text",
                                               minLen = 25)
      .collect().map(r => r.getLong(0) -> r.getLong(2)).toMap
    kf.foreach { case (id, rem, _) => assert(rem <= all(id)) }
  }
}
