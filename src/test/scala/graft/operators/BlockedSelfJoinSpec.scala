package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.SparkSpec

/** [[Dedup.blockedSelfJoin]] — the length-banded blocked edit-distance
  * join (q193/q197's shared candidate stage). The load-bearing claim is
  * EXACTNESS: for any bandWidth > maxDist the banded output equals the
  * bare blocked join's (same+adjacent-band probing loses nothing,
  * cross-band pairs are found exactly once and id-normalized).
  */
class BlockedSelfJoinSpec extends SparkSpec {

  /** Names engineered to span band boundaries: lengths 4–13 under
    * bandWidth 3 occupy bands 1–4, and several qualifying pairs cross
    * a boundary (e.g. len 5 ↔ len 6, bands 1 ↔ 2).
    */
  private def records: DataFrame = {
    val rows = Seq(
      (1L, "aaaa", "k"),        // len 4, band 1
      (2L, "aaaab", "k"),       // len 5, band 1; dist 1 to id 1
      (3L, "aaaabb", "k"),      // len 6, band 2; dist 2 to id 1 (cross)
      (4L, "aaaabbc", "k"),     // len 7, band 2; dist 1 to id 3
      (5L, "aaaabbccc", "k"),   // len 9, band 3; dist 2 to id 4 (cross)
      (6L, "zzzzzzzzzzzzz", "k"), // len 13, band 4; far from all
      (7L, "aaaa", "other"),    // same text, different block
      (8L, "aaab", "other"))    // dist 1 to id 7 inside "other"
    spark.createDataFrame(rows).toDF("id", "name", "key")
  }

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

  private def banded(df: DataFrame, maxDist: Int, bandWidth: Int,
                     cap: Int = 0): Set[(Long, Long, Long)] =
    Dedup.blockedSelfJoin(df, "id", "name", Seq("key"), maxDist,
                          bandWidth, cap)
      .select("id_a", "id_b", "dist")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet

  test("banded output equals the bare blocked join (cross-band pairs kept)") {
    val expected = bare(records, maxDist = 2)
    // the fixture must actually exercise the adjacent-band path
    assert(expected.contains((1L, 3L, 2L)), "fixture needs a cross-band pair")
    assert(banded(records, maxDist = 2, bandWidth = 3) === expected)
  }

  test("exactness holds for every legal band width") {
    val expected = bare(records, maxDist = 2)
    for (w <- Seq(3, 4, 5, 8, 100))
      assert(banded(records, maxDist = 2, bandWidth = w) === expected,
        s"bandWidth=$w must not change the output")
  }

  test("pairs are id-ordered exactly once, including adjacent-band hits") {
    val out = Dedup.blockedSelfJoin(records, "id", "name", Seq("key"),
                                    maxDist = 2, bandWidth = 3)
      .select("id_a", "id_b").collect()
      .map(r => (r.getLong(0), r.getLong(1)))
    assert(out.forall { case (a, b) => a < b })
    assert(out.length === out.distinct.length, "no duplicate pairs")
  }

  test("text columns ride along consistently with their ids") {
    val byId = records.collect()
      .map(r => r.getLong(0) -> r.getString(1)).toMap
    Dedup.blockedSelfJoin(records, "id", "name", Seq("key"),
                          maxDist = 2, bandWidth = 3)
      .collect().foreach { r =>
        assert(r.getAs[String]("name_a") === byId(r.getAs[Long]("id_a")))
        assert(r.getAs[String]("name_b") === byId(r.getAs[Long]("id_b")))
      }
  }

  test("bandWidth <= maxDist is rejected (adjacent probing would lose pairs)") {
    intercept[IllegalArgumentException] {
      Dedup.blockedSelfJoin(records, "id", "name", Seq("key"),
                            maxDist = 2, bandWidth = 2)
    }
  }

  test("maxCellRows caps each cell: output is a subset with bounded volume") {
    // 40 same-length same-key rows: one cell of 40 → 780 exact pairs;
    // cap 5 samples the 5 smallest ids → C(5,2) = 10 pairs
    val hot = spark.createDataFrame(
      (1L to 40L).map(i => (i, "aaaa", "k"))).toDF("id", "name", "key")
    val exact = banded(hot, maxDist = 2, bandWidth = 3)
    assert(exact.size === 780)
    val capped = banded(hot, maxDist = 2, bandWidth = 3, cap = 5)
    assert(capped.size === 10)
    assert(capped.subsetOf(exact))
    assert(capped.forall { case (a, b, _) => a <= 5 && b <= 5 },
      "cap must keep the smallest ids (deterministic sample)")
  }

  test("auto-fallback reroutes hot blocks to the signature path and " +
       "the output is IDENTICAL (r12 verdict #1)") {
    // block "k": 60 rows over three near-dup texts (lengths 4–6, so
    // the rerouted block carries cross-length pairs too); block
    // "cold": the 8-row banded fixture. autoCellRows = 8 marks only
    // "k" hot — cold rows must keep the banded plan and hot rows the
    // signature plan, with the union equal to the bare oracle.
    val texts = Seq("aaaa", "aaaab", "aaaabb")
    val hotRows = (1L to 60L).map(i =>
      (100L + i, texts((i % 3).toInt), "k"))
    val mixed = spark.createDataFrame(
      hotRows ++ Seq((1L, "bbbb", "cold"), (2L, "bbbc", "cold")))
      .toDF("id", "name", "key")
    val expected = bare(mixed, maxDist = 2)
    assert(expected.contains((1L, 2L, 1L)), "fixture needs a cold pair")
    val auto = Dedup.blockedSelfJoin(mixed, "id", "name", Seq("key"),
                                     maxDist = 2, bandWidth = 3,
                                     autoCellRows = 8)
      .select("id_a", "id_b", "dist")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    assert(auto === expected)
    // and the raw banded path agrees (the two routes are interchangeable)
    val raw = Dedup.blockedSelfJoin(mixed, "id", "name", Seq("key"),
                                    maxDist = 2, bandWidth = 3,
                                    autoCellRows = 0)
      .select("id_a", "id_b", "dist")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    assert(raw === expected)
  }

  test("empty blockCols with a hot cell: the WHOLE input routes through " +
       "the signature path deliberately and stays exact (ADVICE r13)") {
    // one global block, 30 rows over three near-dup texts: with
    // autoCellRows = 8 the single (global, band) cell is hot, and with
    // no block key to split on the per-block anti/semi routing would
    // degenerate — the guard must route everything, identically.
    val texts = Seq("aaaa", "aaaab", "aaaabb")
    val rows = (1L to 30L).map(i => (i, texts((i % 3).toInt)))
    val df = spark.createDataFrame(rows).toDF("id", "name")
    val expected = df
      .select(col("id").as("id_a"), col("name").as("nm_a"))
      .crossJoin(df.select(col("id").as("id_b"), col("name").as("nm_b")))
      .filter(col("id_a") < col("id_b"))
      .withColumn("dist",
        levenshtein(col("nm_a"), col("nm_b")).cast("long"))
      .filter(col("dist") <= 2)
      .select("id_a", "id_b", "dist")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    val auto = Dedup.blockedSelfJoin(df, "id", "name", Nil,
                                     maxDist = 2, bandWidth = 3,
                                     autoCellRows = 8)
      .select("id_a", "id_b", "dist")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    assert(auto === expected)
    // cold global block (no hot cell) keeps the banded plan, same output
    val small = spark.createDataFrame(
      Seq((1L, "bbbb"), (2L, "bbbc"), (3L, "zzzzzzzz")))
      .toDF("id", "name")
    val bandedOut = Dedup.blockedSelfJoin(small, "id", "name", Nil,
                                          maxDist = 2, bandWidth = 3,
                                          autoCellRows = 8)
      .select("id_a", "id_b", "dist")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    assert(bandedOut === Set((1L, 2L, 1L)))
  }

  test("an explicit maxCellRows cap takes precedence over the " +
       "auto-fallback (capped sample semantics, not rerouting)") {
    val hot = spark.createDataFrame(
      (1L to 40L).map(i => (i, "aaaa", "k"))).toDF("id", "name", "key")
    val capped = Dedup.blockedSelfJoin(hot, "id", "name", Seq("key"),
                                       maxDist = 2, bandWidth = 3,
                                       maxCellRows = 5, autoCellRows = 8)
      .select("id_a", "id_b").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(capped.size === 10, "cap 5 => C(5,2) pairs, not a reroute")
    assert(capped.forall { case (a, b) => a <= 5 && b <= 5 })
  }

  test("weightedBlockedSelfJoin: the collapsed weighted rollup equals " +
       "the enumeration histogram under heavy multiplicity (q272)") {
    // multiplicities 1/3/4 within a block plus a second block: the
    // weighted identity must cover cnt_a*cnt_b cross terms, the
    // C(cnt,2) diagonal, and block isolation (same text in another
    // block never pairs across)
    val rows =
      Seq.fill(3)(("aaaa", "k")) ++ Seq.fill(4)(("aaaab", "k")) ++
        Seq(("zzzz", "k")) ++ Seq.fill(2)(("aaaa", "other"))
    val df = spark.createDataFrame(
      rows.zipWithIndex.map { case ((t, b), i) => (i.toLong, t, b) })
      .toDF("id", "name", "key")
    val enumerated = Dedup.blockedSelfJoin(df, "id", "name", Seq("key"),
                                           maxDist = 2, bandWidth = 3)
      .groupBy("dist").count()
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val weighted = Dedup.weightedBlockedSelfJoin(
        df, "id", "name", Seq("key"), maxDist = 2, bandWidth = 3)
    val rolled = weighted
      .groupBy("dist").agg(org.apache.spark.sql.functions.sum("n_pairs"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(rolled === enumerated)
    // cross-check one closed form: dist 0 = C(3,2)+C(4,2)+C(2,2) = 10
    assert(rolled(0L) === 10L)
    // and the weighted frame stays DISTINCT-text-sized: 3 diagonal
    // rows + cross pairs among {aaaa,aaaab,zzzz} in "k" (aaaa~aaaab
    // dist 1; zzzz matches nothing) = 4 rows total
    assert(weighted.count() === 4L)
    org.apache.spark.sql.GraftColumns.unpersistCheckpoint(weighted)
  }

  test("reserved working-column names in blockCols are rejected") {
    intercept[IllegalArgumentException] {
      Dedup.blockedSelfJoin(records, "id", "name", Seq("__band"),
                            maxDist = 1, bandWidth = 3)
    }
  }
}
