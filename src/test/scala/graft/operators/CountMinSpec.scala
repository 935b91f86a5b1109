package graft.operators

import org.apache.spark.sql.functions._

import graft.SparkSpec

/** Contracts of the count–min sketch: est ≥ exact always (the CM
  * invariant), est == exact when the width isolates every key, unseen
  * keys read 0 (the left-join contract), carried columns survive the
  * probe, and the counter table is bounded by depth·width.
  */
class CountMinSpec extends SparkSpec {
  import spark.implicits._

  // skewed multiset: key k occurs k times, k = 1..20 (210 rows)
  private def data = (1 to 20).flatMap(k => Seq.fill(k)(k.toLong))
    .toDF("k")

  private def exact = data.groupBy("k")
    .agg(count(lit(1)).as("exact_cnt"))

  test("estimate >= exact for every key at a collision-prone width") {
    val sk = CountMin.sketch(data, "k", depth = 3, width = 4)
    val est = CountMin.estimate(sk, exact, "k", depth = 3, width = 4)
      .collect()
    assert(est.length === 20)
    est.foreach { r =>
      assert(r.getAs[Long]("cm_est") >= r.getAs[Long]("exact_cnt"),
             s"CM must never undercount: $r")
    }
  }

  test("estimate == exact when width isolates keys (no collisions by " +
       "pigeonhole check)") {
    // width 4096 >> 20 keys: collisions are possible in principle but
    // the assertion below FIRST verifies this draw has none (each
    // (r, cell) holds one key), then demands exactness — so the test
    // can never flake on an unlucky hash draw without saying why.
    val w = 4096
    val sk = CountMin.sketch(data, "k", depth = 3, width = w)
    val cellsPerKey = sk.count()
    assume(cellsPerKey === 3L * 20, "hash draw collided; widen w")
    CountMin.estimate(sk, exact, "k", depth = 3, width = w)
      .collect().foreach { r =>
        assert(r.getAs[Long]("cm_est") === r.getAs[Long]("exact_cnt"))
      }
  }

  test("unseen key estimates 0 via the left-join contract") {
    val sk = CountMin.sketch(data, "k", depth = 3, width = 4096)
    val unseen = Seq(999L).toDF("k")
    val est = CountMin.estimate(sk, unseen, "k", depth = 3, width = 4096)
      .collect()
    assert(est.length === 1)
    // an unseen key MAY collide into occupied cells (overestimate),
    // but at width 4096 with 20 keys these cells are empty: exact 0
    assert(est.head.getAs[Long]("cm_est") === 0L)
  }

  test("merge of per-slice sketches equals the direct corpus sketch " +
       "(linearity) for any slicing") {
    val sliced = data.withColumn("slice", pmod(col("k"), lit(3)))
    val parts = (0 until 3).map { s =>
      CountMin.sketch(sliced.filter(col("slice") === s), "k",
                      depth = 3, width = 8)
    }
    val merged = CountMin.merge(parts.reduce(_ unionByName _))
      .collect().map(r => (r.getInt(0), r.getLong(1), r.getLong(2)))
      .toSet
    val direct = CountMin.sketch(data, "k", depth = 3, width = 8)
      .collect().map(r => (r.getInt(0), r.getLong(1), r.getLong(2)))
      .toSet
    assert(merged === direct)
  }

  test("null keys are excluded from sketch and probe (SQL COUNT " +
       "semantics; oracle's r||':'||key is NULL-propagating)") {
    val withNulls = data.unionByName(
      Seq.fill(5)(Option.empty[Long]).toDF("k"))
    val sk = CountMin.sketch(withNulls, "k", depth = 3, width = 4096)
    // counts sum to depth * 210, NOT depth * 215: nulls never counted
    assert(sk.agg(sum("cnt")).collect().head.getLong(0) === 3L * 210)
    // a null probe row is dropped, not estimated against phantom cells
    val probes = Seq(Some(20L), None).toDF("k")
    val est = CountMin.estimate(sk, probes, "k", depth = 3, width = 4096)
      .collect()
    assert(est.length === 1 && est.head.getAs[Long]("k") === 20L)
  }

  test("probe frame may carry columns named r/cell/cnt (collision-proof " +
       "internal names)") {
    val sk = CountMin.sketch(data, "k", depth = 3, width = 4096)
    val probes = exact
      .withColumnRenamed("exact_cnt", "cnt")
      .withColumn("r", lit("carried-r"))
      .withColumn("cell", lit(7))
    val est = CountMin.estimate(sk, probes, "k", depth = 3, width = 4096)
    assert(est.columns.sorted.toSeq === Seq("cell", "cm_est", "cnt", "k", "r"))
    est.collect().foreach { row =>
      assert(row.getAs[String]("r") === "carried-r")
      assert(row.getAs[Int]("cell") === 7)
      assert(row.getAs[Long]("cm_est") === row.getAs[Long]("cnt"),
             s"carried cnt column must not perturb the estimate: $row")
    }
  }

  test("counter table bounded by depth*width and counts sum to " +
       "depth*n") {
    val sk = CountMin.sketch(data, "k", depth = 4, width = 8)
    assert(sk.count() <= 4L * 8)
    val total = sk.agg(sum("cnt")).collect().head.getLong(0)
    assert(total === 4L * 210)
  }

  // exact join size of two multisets on their key: sum over shared
  // keys of the frequency product — the quantity innerProduct estimates
  private def exactJoinSize(a: Seq[Long], b: Seq[Long]): Long = {
    val fa = a.groupBy(identity).view.mapValues(_.size.toLong).toMap
    val fb = b.groupBy(identity).view.mapValues(_.size.toLong).toMap
    fa.keysIterator.map(k => fa(k) * fb.getOrElse(k, 0L)).sum
  }

  test("innerProduct >= exact join size always, == at isolating width " +
       "(the AGMS invariant)") {
    val a = (1 to 20).flatMap(k => Seq.fill(k)(k.toLong))
    val b = (10 to 30).flatMap(k => Seq.fill(31 - k)(k.toLong))
    val exact = exactJoinSize(a, b)
    assert(exact > 0)
    for (w <- Seq(4, 4096)) {
      val sa = CountMin.sketch(a.toDF("k"), "k", depth = 3, width = w)
      val sb = CountMin.sketch(b.toDF("k"), "k", depth = 3, width = w)
      val est = CountMin.innerProduct(sa, sb, 3)
        .collect().head.getAs[Long]("cm_join_est")
      assert(est >= exact, s"w=$w: inner product must never undercount")
      if (w == 4096) assert(est === exact,
        "isolating width must be exact (collision check: widen w)")
    }
  }

  test("innerProduct of disjoint key sets reads 0 when no cells " +
       "collide (the left-join-over-row-frame contract)") {
    val sa = CountMin.sketch(Seq(1L, 2L, 3L).toDF("k"), "k", 3, 65536)
    val sb = CountMin.sketch(Seq(100L, 200L).toDF("k"), "k", 3, 65536)
    val est = CountMin.innerProduct(sa, sb, 3)
      .collect().head.getAs[Long]("cm_join_est")
    assert(est === 0L,
      "zero-overlap rows must contribute 0, not vanish from the min")
  }

  test("self innerProduct estimates F2 and respects merge linearity") {
    val f2 = exactJoinSize(data.collect().map(_.getLong(0)).toSeq,
                           data.collect().map(_.getLong(0)).toSeq)
    val sk = CountMin.sketch(data, "k", depth = 3, width = 4096)
    val direct = CountMin.innerProduct(sk, sk, 3)
      .collect().head.getAs[Long]("cm_join_est")
    assert(direct === f2)
    // per-slice sketches merged, then inner-producted: same answer
    val sliced = data.withColumn("slice", pmod(col("k"), lit(2)))
    val merged = CountMin.merge(
      (0 until 2).map(sl => CountMin.sketch(
        sliced.filter(col("slice") === sl), "k", 3, 4096))
        .reduce(_ unionByName _))
    val viaMerge = CountMin.innerProduct(merged, merged, 3)
      .collect().head.getAs[Long]("cm_join_est")
    assert(viaMerge === direct)
  }
}
