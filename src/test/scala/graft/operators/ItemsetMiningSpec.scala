package graft.operators

import graft.SparkSpec

/** Contracts of [[ItemsetMining.frequentPairs]]: exact co-occurrence
  * counts, per-id distinctness, the support threshold on both items and
  * pairs, and canonical pair orientation.
  */
class ItemsetMiningSpec extends SparkSpec {
  import spark.implicits._

  private val baskets = Seq(
    (1L, Seq("a", "b", "c")),
    (2L, Seq("a", "b")),
    (3L, Seq("a", "b", "b", "a")), // duplicates count once per id
    (4L, Seq("a", "c")),
    (5L, Seq("z"))
  ).toDF("id", "items")

  private def run(minSup: Long) =
    ItemsetMining.frequentPairs(baskets, "id", "items", minSup)
      .collect()
      .map(r => (r.getString(0), r.getString(1), r.getLong(2)))
      .sortBy(p => (p._1, p._2))

  test("exact pair counts, duplicates within an id count once") {
    assert(run(2).toSeq === Seq(
      ("a", "b", 3L),  // ids 1,2,3 — id 3's repeats collapse
      ("a", "c", 2L))) // ids 1,4; (b,c) support 1 < 2 pruned
  }

  test("pairs orient item_a < item_b (no mirror rows)") {
    val got = run(2)
    assert(got.forall { case (a, b, _) => a < b })
  }

  test("item-level Apriori prune is lossless for pair support") {
    // 'z' has support 1: pruned as an item; no pair involving it could
    // have reached minSupport anyway (support(pair) <= support(item))
    assert(run(1).map(p => (p._1, p._2)).toSet ===
      Set(("a", "b"), ("a", "c"), ("b", "c")))
  }

  test("an id split across input rows still counts once per pair") {
    val split = Seq(
      (1L, Seq("a", "b")), (1L, Seq("a", "b", "c")), // same id, two rows
      (2L, Seq("a", "b"))
    ).toDF("id", "items")
    val got = ItemsetMining.frequentPairs(split, "id", "items", 2L)
      .collect().map(r => (r.getString(0), r.getString(1), r.getLong(2)))
    assert(got.toSeq.sorted === Seq(("a", "b", 2L))) // NOT 3: distinct ids
  }

  test("minSupport below 1 is rejected") {
    intercept[IllegalArgumentException] {
      ItemsetMining.frequentPairs(baskets, "id", "items", 0L)
    }
  }

  test("pairLift computes the exact integer association ratio") {
    // N = 5 ids with items. n_a=4 (ids 1-4), n_b=3 (1,2,3), n_c=2 (1,4)
    // (a,b): n=3 -> lift = 1e6*3*5 div (4*3) = 1250000  (positive assoc)
    // (a,c): n=2 -> lift = 1e6*2*5 div (4*2) = 1250000
    val got = ItemsetMining.pairLift(baskets, "id", "items", 2L)
      .collect()
      .map(r => (r.getString(0), r.getString(1), r.getLong(2),
                 r.getLong(3)))
      .sortBy(p => (p._1, p._2))
    assert(got.toSeq === Seq(
      ("a", "b", 3L, 1250000L),
      ("a", "c", 2L, 1250000L)))
  }

  test("pairLift: independent items sit at lift <= 1e6") {
    // x co-occurs with y in 1 of 4 ids while both appear in 2 each:
    // lift = 1e6*1*4 div (2*2) = 1000000 — exactly independence
    val df = Seq(
      (1L, Seq("x", "y")), (2L, Seq("x")), (3L, Seq("y")), (4L, Seq("w"))
    ).toDF("id", "items")
    val got = ItemsetMining.pairLift(df, "id", "items", 1L)
      .collect().map(r => (r.getString(0), r.getString(1), r.getLong(3)))
    assert(got.toSeq === Seq(("x", "y", 1000000L)))
  }

  test("frequentTriples: exact counts, ordered items, pair-prune is " +
       "lossless (parity with the naive triple count)") {
    val df = Seq(
      (1L, Seq("a", "b", "c")), (2L, Seq("a", "b", "c", "d")),
      (3L, Seq("a", "b", "d")), (4L, Seq("b", "c", "d")),
      (5L, Seq("a", "c"))
    ).toDF("id", "items")
    val got = ItemsetMining.frequentTriples(df, "id", "items", 2L)
      .collect()
      .map(r => (r.getString(0), r.getString(1), r.getString(2),
                 r.getLong(3)))
      .sortBy(t => (t._1, t._2, t._3))
    // naive: abc in {1,2}, abd in {2,3}, acd in {2}, bcd in {2,4}
    assert(got.toSeq === Seq(
      ("a", "b", "c", 2L), ("a", "b", "d", 2L), ("b", "c", "d", 2L)))
  }

  test("frequentTriples: an infrequent sub-pair kills the candidate " +
       "even when all three items are frequent") {
    // items x,y,z each appear 3x (frequent at minSup=3), but pair
    // (x,z) co-occurs only twice -> triple (x,y,z) must not surface
    // even though it occurs twice; at minSup=2 it would
    val df = Seq(
      (1L, Seq("x", "y", "z")), (2L, Seq("x", "y", "z")),
      (3L, Seq("x", "y")), (4L, Seq("y", "z")),
      (5L, Seq("x")), (6L, Seq("z"))
    ).toDF("id", "items")
    assert(ItemsetMining.frequentTriples(df, "id", "items", 3L).isEmpty)
    val loose = ItemsetMining.frequentTriples(df, "id", "items", 2L)
      .collect().map(r => (r.getString(0), r.getString(1), r.getString(2)))
    assert(loose.toSeq === Seq(("x", "y", "z")))
  }
}
