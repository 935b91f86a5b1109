package graft.operators

import org.apache.spark.sql.functions._

import graft.SparkSpec

/** Contracts of the per-bucket family-size cap (`maxBucketDocs`) on the
  * pair-graph dedup generators: cap OFF is bit-identical to the exact
  * path, cap ON bounds candidate volume on a viral duplicate family
  * while (a) keeping per-pair arithmetic exact (full-set verify) and
  * (b) still linking every sampled member to the family's min ids —
  * what CC keeper election needs.
  */
class FamilyCapSpec extends SparkSpec {
  import spark.implicits._

  // a viral template family: `m` near-identical docs (shared 12-word
  // template, one trailing distinguisher) + unrelated singletons
  private def corpus(m: Int) = {
    val template = "the quick brown fox jumps over the lazy dog again and again"
    val fam = (0 until m).map(i => (i.toLong, s"$template v$i"))
    val solo = (0 until 5).map(i =>
      (100L + i, s"totally unrelated document number $i with its own words " +
        s"padding pad$i extra$i more$i filler$i tail$i"))
    (fam ++ solo).toDF("doc_id", "text")
  }

  test("jaccardPairs: cap off equals the exact path; cap on bounds " +
       "pairs and keeps them a subset with identical arithmetic") {
    val df = corpus(12)
    def key(r: org.apache.spark.sql.Row) =
      (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3))
    val exact = Dedup.jaccardPairs(df, "doc_id", "text", n = 3,
        num = 4, den = 5)
      .collect().map(key).toSet
    val capOff = Dedup.jaccardPairs(df, "doc_id", "text", n = 3,
        num = 4, den = 5, maxBucketDocs = 0)
      .collect().map(key).toSet
    assert(capOff === exact)
    // family of 12 -> C(12,2) = 66 exact pairs; cap 5 keeps min-id
    // sample {0..4} per shared-shingle bucket -> C(5,2) = 10
    assert(exact.count { case (a, b, _, _) => a < 100 && b < 100 } === 66)
    val capped = Dedup.jaccardPairs(df, "doc_id", "text", n = 3,
        num = 4, den = 5, maxBucketDocs = 5)
      .collect().map(key).toSet
    assert(capped.subsetOf(exact),
      s"capped pairs carry different counts: ${capped diff exact}")
    val famPairs = capped.filter { case (a, b, _, _) => a < 100 && b < 100 }
    assert(famPairs.size === 10, s"got ${famPairs.size}: $famPairs")
    // min-id sampling: every surviving pair is within the 5 smallest ids
    assert(famPairs.forall { case (a, b, _, _) => a <= 4 && b <= 4 })
    // singleton docs never had close pairs; the cap must not invent any
    assert(capped.forall { case (a, b, _, _) => a < 100 === b < 100 })
  }

  test("minhashDedupPairs: cap off equals exact recall on the family; " +
       "cap on bounds the family's pair count, verify stays exact") {
    // IDENTICAL-text family (the viral-template limit): all 16 docs
    // carry the same signature, so every (band, key) bucket holds the
    // whole family and the cap's min-id sample is the same 6 ids in
    // each — the crisp C(cap,2) bound. (Near-identical families split
    // across band keys, so their capped union is larger but still
    // ≤ bands·C(cap,2); the identical case is the worst single-bucket
    // family.)
    import org.apache.spark.sql.functions.col
    val template =
      "the quick brown fox jumps over the lazy dog again and again"
    val fam = (0 until 16).map(i => (i.toLong, template))
    val solo = (0 until 5).map(i =>
      (100L + i, s"totally unrelated document number $i with its own " +
        s"words padding pad$i extra$i more$i filler$i tail$i"))
    val df = (fam ++ solo).toDF("doc_id", "text")
    def key(r: org.apache.spark.sql.Row) =
      (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3))
    val off = Dedup.minhashDedupPairs(df, "doc_id", "text", n = 3,
        num = 4, den = 5)
      .collect().map(key).toSet
    assert(off.count { case (a, b, _, _) => a < 100 && b < 100 } === 120,
      "uncapped LSH should surface all C(16,2) family pairs")
    val on = Dedup.minhashDedupPairs(df, "doc_id", "text", n = 3,
        num = 4, den = 5, maxBucketDocs = 6)
      .collect().map(key).toSet
    assert(on.subsetOf(off),
      s"cap changed pair arithmetic: ${on diff off}")
    val famOn = on.filter { case (a, b, _, _) => a < 100 && b < 100 }
    // identical docs share every band bucket -> each samples the same
    // 6 min ids -> exactly C(6,2) = 15 pairs, all among ids 0..5
    assert(famOn.size === 15, s"got ${famOn.size}")
    assert(famOn.forall { case (a, b, _, _) => a <= 5 && b <= 5 })
  }
}
