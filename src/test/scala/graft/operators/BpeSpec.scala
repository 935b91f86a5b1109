package graft.operators

import graft.SparkSpec

/** Contracts of [[Bpe.trainMerges]]: weighted pair counting, argmax
  * tie-break, the left-to-right non-cascading merge rule, rounds that
  * run out of pairs, and the final-apply summary row.
  */
class BpeSpec extends SparkSpec {
  import spark.implicits._

  private def run(text: String, rounds: Int) =
    Bpe.trainMerges(Seq(text).toDF("text"), "text", rounds)
      .collect()
      .map(r => (r.getLong(0), r.getString(1), r.getString(2), r.getLong(3)))
      .sortBy(_._1)

  test("pair counts weight by word frequency and count every adjacent " +
       "position; exhausted rounds emit no merge row") {
    // vocab: aaaa ×2 (3 (a,a) positions each), aa ×1 (1 position) → 7
    val got = run("aaaa aaaa aa", rounds = 3)
    assert(got.toSeq == Seq(
      (1L, "a", "a", 7L),   // merge a+a
      (2L, "aa", "aa", 2L), // aaaa segments as |aa||aa| twice
      // round 3 finds no pairs (aaaa = |aaaa|, aa = |aa|) → no row
      (4L, "", "", 3L)))    // Σ freq·|syms| = 2·1 + 1·1
  }

  test("merge applies left-to-right without cascading into the new token") {
    // 'aaa': round 1 merges positions 1-2 only → |aa||a|; round 2 then
    // merges (aa, a)
    val got = run("aaa", rounds = 2)
    assert(got.toSeq == Seq(
      (1L, "a", "a", 2L),
      (2L, "aa", "a", 1L),
      (3L, "", "", 1L)))
  }

  test("equal-weight pairs break ties lexicographically") {
    val got = run("ab ab ba ba", rounds = 1)
    assert(got.head == (1L, "a", "b", 2L),
      s"(a,b) must beat (b,a) on the tie, got ${got.head}")
  }

  test("merged tokens join later rounds as ordinary symbols") {
    // 'abab' ×3: r1 (a,b)=6 → |ab||ab|; r2 (ab,ab)=3 → |abab|
    val got = run("abab abab abab", rounds = 2)
    assert(got.toSeq == Seq(
      (1L, "a", "b", 6L),
      (2L, "ab", "ab", 3L),
      (3L, "", "", 3L)))
  }

  // ---------------------------------------------------------- encode

  private val encDocs = Seq(
    (1L, "abab aaa xy"),
    (2L, "abab abab"),
    (3L, ""),              // no valid words → empty encoding
    (4L, "a|b ab"),        // pipe-carrying word dropped, like training
    (5L, "abab  aaa")      // double space: empty word dropped
  ).toDF("doc_id", "text")

  private val encMerges = Seq(("a", "b"), ("ab", "ab"))

  test("encode applies merges in training order; wrapped output") {
    val got = Bpe.encode(encDocs, "text", Seq("doc_id"), encMerges)
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(got(1L) === "|abab| |a||a||a| |x||y|") // (a,b) skips 'aaa'
    assert(got(2L) === "|abab| |abab|")
    assert(got(3L) === "")
    assert(got(4L) === "|ab|")
    assert(got(5L) === "|abab| |a||a||a|")
  }

  test("codegen and mapPartitions paths agree bit-for-bit") {
    val viaColumns = Bpe.encode(encDocs, "text", Seq("doc_id"), encMerges)
      .collect().map(r => r.getLong(0) -> r.getString(1)).sortBy(_._1)
    val viaRows = Bpe.encode(encDocs, "text", Seq("doc_id"), encMerges,
                             maxCodegen = 0) // force the broadcast path
      .collect().map(r => r.getLong(0) -> r.getString(1)).sortBy(_._1)
    assert(viaColumns.toSeq === viaRows.toSeq)
  }

  test("encode on the training corpus reproduces the trained token total") {
    val corpus = Seq((1L, "abab abab abab"), (2L, "aaa ab")).toDF("doc_id", "text")
    val trained = Bpe.trainMerges(corpus, "text", rounds = 2).collect()
    val merges = trained.filter(_.getLong(0) <= 2)
      .sortBy(_.getLong(0)).map(r => (r.getString(1), r.getString(2))).toSeq
    val totalFromSummary = trained.filter(_.getString(1).isEmpty)
      .head.getLong(3)
    val enc = Bpe.encode(corpus, "text", Seq("doc_id"), merges)
    import org.apache.spark.sql.functions._
    val totalFromEncode = enc.select(
      sum(shiftright(length(col("encoded")) -
        length(replace(col("encoded"), lit("|"), lit(""))), 1)))
      .collect()(0).getLong(0)
    assert(totalFromEncode === totalFromSummary)
  }

  test("pipe-carrying or empty merge symbols are rejected") {
    intercept[IllegalArgumentException] {
      Bpe.encode(encDocs, "text", Seq("doc_id"), Seq(("a|", "b")))
    }
    intercept[IllegalArgumentException] {
      Bpe.encode(encDocs, "text", Seq("doc_id"), Seq(("", "b")))
    }
  }
}
