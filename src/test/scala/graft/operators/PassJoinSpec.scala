package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.SparkSpec

/** [[Dedup.passJoinPairs]] — the segment-signature (PassJoin) exact
  * edit-distance self-join. The load-bearing claim is EXACTNESS: the
  * pigeonhole candidate generation (one preserved segment of the
  * indexed string occurs in the probe string within the shared-budget
  * shift window) finds every pair with levenshtein ≤ maxDist, so the
  * output equals the bare blocked join's — same contract
  * [[BlockedSelfJoinSpec]] pins for the banded path, which is what
  * lets q193 and q226 share one oracle.
  */
class PassJoinSpec extends SparkSpec {

  /** The bare blocked join — the oracle this operator must equal. */
  private def bare(df: DataFrame, maxDist: Int): Set[(Long, Long, Long)] = {
    val a = df.select(col("id").as("id_a"), col("name").as("nm_a"),
                      col("key"))
    val b = df.select(col("id").as("id_b"), col("name").as("nm_b"),
                      col("key"))
    a.join(b, Seq("key"))
      .filter(col("id_a") < col("id_b"))
      .withColumn("dist", levenshtein(col("nm_a"), col("nm_b")).cast("long"))
      .filter(col("dist") <= maxDist)
      .select("id_a", "id_b", "dist")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
  }

  private def pass(df: DataFrame, maxDist: Int): Set[(Long, Long, Long)] =
    Dedup.passJoinPairs(df, "id", "name", Seq("key"), maxDist)
      .select("id_a", "id_b", "dist")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet

  /** Edit types, length changes, and block boundaries all exercised:
    * substitutions (same length), insertions/deletions (Δl = ±1, ±2),
    * edits at the head / middle / tail (the preserved segment moves
    * across the three segment slots), and strings shorter than
    * maxDist + 1 (empty-segment scheme).
    */
  private def fixture: DataFrame = {
    val rows = Seq(
      (1L, "abcdefghi", "k"),   // reference
      (2L, "Xbcdefghi", "k"),   // head substitution, dist 1
      (3L, "abcdXfghi", "k"),   // middle substitution, dist 1
      (4L, "abcdefghX", "k"),   // tail substitution, dist 1
      (5L, "abcdefg", "k"),     // 2 tail deletions, dist 2
      (6L, "ZZabcdefghi", "k"), // 2 head insertions, dist 2
      (7L, "abXdefYhi", "k"),   // 2 substitutions spanning segments
      (8L, "totally-unrelated", "k"),
      (9L, "abcdefghi", "other"), // same text, different block
      (10L, "abcdefghiJKL", "k"), // dist 3 to id 1: excluded at maxDist 2
      (11L, "ab", "k"),         // len < maxDist + 1: empty segments
      (12L, "a", "k"),          // dist 1 to id 11
      (13L, "", "k"))           // empty string, dist 1 to id 12
    spark.createDataFrame(rows).toDF("id", "name", "key")
  }

  test("passjoin equals the bare blocked join on the edit-type fixture") {
    for (d <- Seq(1, 2, 3)) {
      val expected = bare(fixture, d)
      assert(pass(fixture, d) === expected, s"maxDist=$d")
    }
    // the fixture must actually exercise the edges the spec names
    val e2 = bare(fixture, 2)
    assert(e2.contains((1L, 5L, 2L)), "needs a Δl=−2 pair")
    assert(e2.contains((1L, 6L, 2L)), "needs a Δl=+2 head-shift pair")
    assert(e2.contains((12L, 13L, 1L)), "needs an empty-string pair")
    assert(!e2.exists(p => p._1 == 1L && p._2 == 10L), "dist-3 excluded")
    assert(!e2.exists(p => p._1 == 1L && p._2 == 9L), "blocks respected")
  }

  test("randomized corpus: passjoin equals the bare join (1k strings)") {
    // small alphabet + short lengths force dense near-dup structure;
    // fixed seed keeps the case reproducible
    val rnd = new scala.util.Random(42)
    val rows = (1L to 1000L).map { i =>
      val len = 3 + rnd.nextInt(8)
      val s = (0 until len).map(_ => ('a' + rnd.nextInt(3)).toChar).mkString
      (i, s, s"b${rnd.nextInt(2)}")
    }
    val df = spark.createDataFrame(rows).toDF("id", "name", "key")
    for (d <- Seq(1, 2)) {
      val expected = bare(df, d)
      assert(expected.size > 100, "fixture must be pair-dense")
      assert(pass(df, d) === expected, s"maxDist=$d")
    }
  }

  test("pairs are id-ordered exactly once with consistent texts") {
    val byId = fixture.collect()
      .map(r => r.getLong(0) -> r.getString(1)).toMap
    val out = Dedup.passJoinPairs(fixture, "id", "name", Seq("key"), 2)
      .collect()
    val ids = out.map(r => (r.getAs[Long]("id_a"), r.getAs[Long]("id_b")))
    assert(ids.forall { case (a, b) => a < b })
    assert(ids.length === ids.distinct.length, "no duplicate pairs")
    out.foreach { r =>
      assert(r.getAs[String]("name_a") === byId(r.getAs[Long]("id_a")))
      assert(r.getAs[String]("name_b") === byId(r.getAs[Long]("id_b")))
    }
  }

  test("agrees with blockedSelfJoin (the q193/q226 shared-oracle premise)") {
    val banded = Dedup.blockedSelfJoin(fixture, "id", "name", Seq("key"),
                                       maxDist = 2, bandWidth = 3)
      .select("id_a", "id_b", "dist")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    assert(pass(fixture, 2) === banded)
  }

  test("invalid arguments are rejected") {
    intercept[IllegalArgumentException] {
      Dedup.passJoinPairs(fixture, "id", "name", Seq("key"), 0)
    }
    intercept[IllegalArgumentException] {
      Dedup.passJoinPairs(fixture, "id", "name", Seq("__seg"), 2)
    }
  }
}
