package graft.operators

import org.apache.spark.sql.functions._

import graft.SparkSpec

/** [[Dedup.sortedNeighborhood]] — the SNM candidate generator. The
  * load-bearing claims: the pair set is EXACTLY the rank-distance
  * pairs of the global (sortCols) order (bucket same+adjacent probing
  * loses nothing, each unordered pair once), and the candidate budget
  * is the closed form n·(w−1) − (w−1)·w/2 regardless of key skew —
  * the property that makes SNM immune to hot blocks.
  */
class SortedNeighborhoodSpec extends SparkSpec {
  import spark.implicits._

  private def fixture = Seq(
    (1L, "apple"), (2L, "apple"), (3L, "apricot"), (4L, "banana"),
    (5L, "cherry"), (6L, "cherry"), (7L, "damson"), (8L, "elder"),
    (9L, "fig"), (10L, "grape"), (11L, "kiwi"), (12L, "lemon"),
    (13L, "mango"), (14L, "melon"), (15L, "olive"), (16L, "peach"),
    (17L, "pear"), (18L, "plum"), (19L, "quince"), (20L, "sloe"))
    .toDF("id", "k")

  /** Brute-force reference: rank in (k, id) order, all pairs with
    * 1 <= gap <= w−1. */
  private def reference(w: Long): Set[(Long, Long, Long)] = {
    val sorted = fixture.collect().map(r => (r.getString(1), r.getLong(0)))
      .sortBy(identity).map(_._2)
    (for {
      i <- sorted.indices; j <- sorted.indices
      if j > i && j - i <= w - 1
    } yield (sorted(i), sorted(j), (j - i).toLong)).toSet
  }

  private def snm(w: Long): Set[(Long, Long, Long)] =
    Dedup.sortedNeighborhood(fixture, Seq("k", "id"), w)
      .select("id_a", "id_b", "gap")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet

  test("pair set equals the brute-force rank-distance pairs (incl. " +
       "cross-bucket), each pair once, for several windows") {
    for (w <- Seq(2L, 3L, 5L, 10L, 25L)) {
      val exp = reference(w)
      val got = snm(w)
      assert(got === exp, s"window=$w")
      // n·(w−1) − (w−1)w/2 closed-form budget (n = 20 >= w here for
      // w <= 20; the general form is Σ_{g=1}^{min(w−1,n−1)} (n−g))
      val n = 20L
      val expect = (1L until w).map(g => math.max(0L, n - g)).sum
      assert(got.size.toLong === expect, s"budget at window=$w")
    }
  }

  test("skewed keys do not change the budget (no hot block)") {
    // all-identical keys: a blocking join would go quadratic; SNM
    // stays at the closed-form budget
    val hot = (1L to 50L).map(i => (i, "same")).toDF("id", "k")
    val got = Dedup.sortedNeighborhood(hot, Seq("k", "id"), 6L).count()
    assert(got === (1L until 6L).map(50L - _).sum)
  }

  test("carried columns ride consistently; _a sorts strictly lower") {
    val byId = fixture.collect()
      .map(r => r.getLong(0) -> r.getString(1)).toMap
    Dedup.sortedNeighborhood(fixture, Seq("k", "id"), 4L)
      .collect().foreach { r =>
        assert(r.getAs[String]("k_a") === byId(r.getAs[Long]("id_a")))
        assert(r.getAs[String]("k_b") === byId(r.getAs[Long]("id_b")))
        val ka = r.getAs[String]("k_a"); val kb = r.getAs[String]("k_b")
        assert(ka < kb ||
          (ka == kb && r.getAs[Long]("id_a") < r.getAs[Long]("id_b")))
        assert(r.getAs[Long]("gap") >= 1L && r.getAs[Long]("gap") <= 3L)
      }
  }

  test("invalid arguments are rejected") {
    intercept[IllegalArgumentException] {
      Dedup.sortedNeighborhood(fixture, Seq("k", "id"), 1L)
    }
    intercept[IllegalArgumentException] {
      Dedup.sortedNeighborhood(fixture, Seq.empty, 5L)
    }
    intercept[IllegalArgumentException] {
      Dedup.sortedNeighborhood(
        fixture.withColumn("__rank", lit(1L)), Seq("k"), 5L)
    }
  }
}
