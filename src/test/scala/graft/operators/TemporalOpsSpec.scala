package graft.operators

import java.sql.Timestamp

import org.apache.spark.sql.functions._

import graft.SparkSpec

class TemporalOpsSpec extends SparkSpec {
  import spark.implicits._

  private def ts(s: String): Timestamp = Timestamp.valueOf(s)

  test("sessionize splits on gaps strictly greater than the threshold") {
    val events = Seq(
      (1L, 1L, ts("2024-01-01 00:00:00")),
      (1L, 2L, ts("2024-01-01 00:30:00")), // gap = 30m = threshold → same
      (1L, 3L, ts("2024-01-01 01:00:01")), // gap = 30m1s → new session
      (2L, 4L, ts("2024-01-01 00:00:00"))  // other key: own session 1
    ).toDF("user_id", "event_id", "t")
    val out = TemporalOps
      .sessionize(events, "user_id", "t", Seq("event_id"), gapUs = 1800000000L)
      .select("user_id", "event_id", "session_id")
      .as[(Long, Long, Long)].collect().toSet
    assert(out === Set((1L, 1L, 1L), (1L, 2L, 1L), (1L, 3L, 2L), (2L, 4L, 1L)))
  }

  test("sessionize breaks timestamp ties deterministically") {
    val t0 = ts("2024-01-01 00:00:00")
    val events = Seq((1L, 2L, t0), (1L, 1L, t0)).toDF("user_id", "event_id", "t")
    val out = TemporalOps
      .sessionize(events, "user_id", "t", Seq("event_id"), gapUs = 1L)
      .select("event_id", "session_id").as[(Long, Long)].collect().toSet
    // zero gap between the tied rows → one session regardless of order
    assert(out === Set((1L, 1L), (2L, 1L)))
  }

  test("asofJoin never matches NULL keys to NULL-key right rows") {
    val left = Seq(
      (1L, Option.empty[Long], ts("2024-05-01 00:00:00")),
      (2L, Option(7L), ts("2024-05-01 00:00:00"))
    ).toDF("event_id", "user_id", "t")
    val right = Seq(
      (Option.empty[Long], ts("2024-01-01 00:00:00")), // null key: no match
      (Option(7L), ts("2024-02-01 00:00:00"))
    ).toDF("user_id", "rt")
    val out = TemporalOps.asofJoin(left, right, "user_id", "t", "rt")
      .select(col("event_id"), col("rt").cast("string"))
      .as[(Long, Option[String])].collect().toMap
    assert(out(1L).isEmpty, "NULL = NULL must not match (equi-join semantics)")
    assert(out(2L).get.startsWith("2024-02-01"))
  }

  test("rangeJoin matches the naive BETWEEN join incl. boundary/cross-cell cases") {
    // points chosen to hit: both inclusive ends, a cell boundary (10),
    // intervals spanning multiple cells, overlapping intervals, a
    // degenerate 1-point interval, and an inverted interval (dropped)
    val pts = Seq(0L, 5L, 10L, 15L, 20L, 29L, 30L, 100L).toDF("p")
    val iv = Seq(
      (1L, 5L, 15L),    // spans cells 0..1 (width 10)
      (2L, 10L, 10L),   // degenerate, exactly the boundary point
      (3L, 12L, 35L),   // spans 3 cells, overlaps interval 1
      (4L, 50L, 40L)    // inverted → matches nothing
    ).toDF("iv_id", "s", "e")
    val fast = TemporalOps.rangeJoin(pts, "p", iv, "s", "e", bucketWidth = 10)
      .select("iv_id", "p").as[(Long, Long)].collect().toSet
    val naive = pts.crossJoin(iv)
      .filter(col("p").between(col("s"), col("e")))
      .select("iv_id", "p").as[(Long, Long)].collect().toSet
    assert(fast === naive)
    assert(fast === Set((1L, 5L), (1L, 10L), (1L, 15L), (2L, 10L),
                        (3L, 15L), (3L, 20L), (3L, 29L), (3L, 30L)))
  }

  test("rangeJoin with negative-axis points still cells correctly") {
    // floor division (not truncation) must put -5 in cell -1, not cell 0
    val pts = Seq(-5L, -10L, 4L).toDF("p")
    val iv = Seq((1L, -12L, -2L)).toDF("iv_id", "s", "e")
    val out = TemporalOps.rangeJoin(pts, "p", iv, "s", "e", bucketWidth = 10)
      .select("p").as[Long].collect().toSet
    assert(out === Set(-5L, -10L))
  }

  test("rangeJoin fails fast on an interval spanning more cells than the cap") {
    val pts = Seq(1L).toDF("p")
    val iv = Seq((1L, 0L, 1000L)).toDF("iv_id", "s", "e")
    val e = intercept[Exception] {
      TemporalOps.rangeJoin(pts, "p", iv, "s", "e", bucketWidth = 1,
        maxCellsPerInterval = 100).collect()
    }
    def messages(t: Throwable): Seq[String] =
      Option(t).toSeq.flatMap(x => Option(x.getMessage).toSeq ++ messages(x.getCause))
    assert(messages(e).exists(_.contains("raise bucketWidth")),
      s"expected the cells-cap error, got: $e")
    // exactly at the cap still works
    val ok = TemporalOps.rangeJoin(pts, "p", iv, "s", "e", bucketWidth = 1,
      maxCellsPerInterval = 1001).count()
    assert(ok === 1)
  }

  test("rangeJoin rejects column-name collisions and reserved names") {
    val pts = Seq(1L).toDF("p")
    val shared = Seq((1L, 0L, 5L)).toDF("p", "s", "e") // "p" on both sides
    val e1 = intercept[IllegalArgumentException] {
      TemporalOps.rangeJoin(pts, "p", shared, "s", "e", bucketWidth = 10)
    }
    assert(e1.getMessage.contains("disjoint"))
    val reserved = Seq((1L, 0L, 5L)).toDF("__cell", "s", "e")
    val e2 = intercept[IllegalArgumentException] {
      TemporalOps.rangeJoin(pts, "p", reserved, "s", "e", bucketWidth = 10)
    }
    assert(e2.getMessage.contains("reserved"))
  }

  test("asofJoin picks latest right time <= event time, null when none") {
    val left = Seq(
      (10L, 1L, ts("2024-01-05 12:00:00")),
      (11L, 1L, ts("2024-01-01 00:00:00")), // before any order → null
      (12L, 1L, ts("2024-01-03 00:00:00")), // equality is inclusive
      (13L, 2L, ts("2024-06-01 00:00:00"))  // key with no right rows
    ).toDF("event_id", "user_id", "t")
    val right = Seq(
      (1L, ts("2024-01-02 00:00:00")),
      (1L, ts("2024-01-03 00:00:00")),
      (1L, ts("2024-01-09 00:00:00"))
    ).toDF("user_id", "rt")
    val out = TemporalOps.asofJoin(left, right, "user_id", "t", "rt")
      .select(col("event_id"), col("rt").cast("string"))
      .as[(Long, Option[String])].collect().toMap
    assert(out(10L).get.startsWith("2024-01-03"))
    assert(out(11L).isEmpty)
    assert(out(12L).get.startsWith("2024-01-03"))
    assert(out(13L).isEmpty)
  }

  test("nearestJoin: closest in either direction, equidistant tie " +
       "takes the earlier, null when keyless") {
    val left = Seq(
      (10L, 1L, ts("2024-01-05 12:00:00")), // nearer backward (Jan 5 vs 9)
      (11L, 1L, ts("2024-01-08 00:00:00")), // nearer forward (Jan 9)
      (12L, 1L, ts("2024-01-01 00:00:00")), // before all → forward only
      (13L, 1L, ts("2024-01-07 00:00:00")), // equidistant 5/9 → earlier (5)
      (14L, 1L, ts("2024-01-09 00:00:00")), // exact hit → dist 0
      (15L, 2L, ts("2024-06-01 00:00:00"))  // key with no right rows
    ).toDF("event_id", "user_id", "t")
    val right = Seq(
      (1L, ts("2024-01-05 00:00:00")),
      (1L, ts("2024-01-09 00:00:00")),
      (1L, ts("2024-01-20 00:00:00"))
    ).toDF("user_id", "rt")
    val out = TemporalOps.nearestJoin(left, right, "user_id", "t", "rt")
      .select(col("event_id"), col("rt").cast("string"))
      .as[(Long, Option[String])].collect().toMap
    assert(out(10L).get.startsWith("2024-01-05"))
    assert(out(11L).get.startsWith("2024-01-09"))
    assert(out(12L).get.startsWith("2024-01-05"))
    assert(out(13L).get.startsWith("2024-01-05"), "tie must take earlier")
    assert(out(14L).get.startsWith("2024-01-09"))
    assert(out(15L).isEmpty)
  }

  test("nearestJoin plans ONE key exchange for both direction carries") {
    val left = Seq((10L, 1L, ts("2024-01-05 12:00:00")))
      .toDF("event_id", "user_id", "t")
    val right = Seq((1L, ts("2024-01-05 00:00:00"))).toDF("user_id", "rt")
    val joined = TemporalOps.nearestJoin(left, right, "user_id", "t", "rt")
    joined.collect()
    val plan = joined.queryExecution.executedPlan.toString
      .split("== Initial Plan ==")(0)
    val keyExchanges = plan.linesIterator
      .count(l => l.contains("Exchange hashpartitioning"))
    assert(keyExchanges === 1,
      s"both carries must share one key exchange ($keyExchanges):\n$plan")
  }

  test("intervalOverlapJoin: inclusive overlap semantics, each pair once") {
    val a = Seq((1L, 0L, 10L), (2L, 20L, 30L), (3L, 5L, 55L))
      .toDF("aid", "sa", "ea")
    val b = Seq((10L, 10L, 15L),  // touches a1 at 10 (inclusive), a3
                (20L, 31L, 40L),  // misses a2 by one, overlaps a3
                (30L, 60L, 70L))  // overlaps nothing
      .toDF("bid", "sb", "eb")
    // bucketWidth 7 forces multi-cell intervals: a3 spans 8 cells, the
    // (a3, b1) pair shares cells 1..2 — must still appear exactly once
    val got = TemporalOps
      .intervalOverlapJoin(a, "sa", "ea", b, "sb", "eb", bucketWidth = 7)
      .select("aid", "bid").as[(Long, Long)].collect().sorted
    assert(got.toSeq === Seq((1L, 10L), (3L, 10L), (3L, 20L)))
  }

  test("intervalOverlapJoin: brute-force parity on random intervals") {
    val rng = new scala.util.Random(11)
    def mk(n: Int, idBase: Long) = (1 to n).map { i =>
      val s = rng.nextInt(1000).toLong - 200
      (idBase + i, s, s + rng.nextInt(80))
    }
    val a = mk(120, 1000L).toDF("aid", "sa", "ea")
    val b = mk(150, 2000L).toDF("bid", "sb", "eb")
    val got = TemporalOps
      .intervalOverlapJoin(a, "sa", "ea", b, "sb", "eb", bucketWidth = 50)
      .select("aid", "bid").as[(Long, Long)].collect().sorted
    val expected = a.crossJoin(b)
      .filter(col("sa") <= col("eb") && col("sb") <= col("ea"))
      .select("aid", "bid").as[(Long, Long)].collect().sorted
    assert(got.toSeq === expected.toSeq)
    assert(expected.nonEmpty)
  }

  test("intervalOverlapJoin rejects shared column names") {
    val a = Seq((1L, 0L, 1L)).toDF("id", "s", "e")
    intercept[IllegalArgumentException] {
      TemporalOps.intervalOverlapJoin(a, "s", "e", a, "s", "e", 10)
    }
  }

  test("scd2 collapses runs to half-open intervals with a current row") {
    val log = Seq(
      (1L, "bronze", ts("2024-01-01 00:00:00"), 1L),
      (1L, "bronze", ts("2024-01-02 00:00:00"), 2L), // same run
      (1L, "silver", ts("2024-01-03 00:00:00"), 3L),
      (1L, "bronze", ts("2024-01-04 00:00:00"), 4L), // value can recur
      (2L, "gold",   ts("2024-01-01 00:00:00"), 5L)
    ).toDF("k", "tier", "t", "id")
    val out = TemporalOps.scd2(log, "k", "tier", "t", "id")
      .orderBy("k", "valid_from_us")
      .collect()
      .map(r => (r.getLong(0), r.getString(1), r.getLong(2),
                 if (r.isNullAt(3)) -1L else r.getLong(3), r.getInt(4)))
    def us(s: String) = ts(s).getTime * 1000L
    assert(out.toSeq === Seq(
      (1L, "bronze", us("2024-01-01 00:00:00"), us("2024-01-03 00:00:00"), 0),
      (1L, "silver", us("2024-01-03 00:00:00"), us("2024-01-04 00:00:00"), 0),
      (1L, "bronze", us("2024-01-04 00:00:00"), -1L, 1),
      (2L, "gold",   us("2024-01-01 00:00:00"), -1L, 1)))
  }

  test("scd2: ties break on the tie column; null attrs form runs") {
    val log = Seq(
      (1L, Option("a"), ts("2024-01-01 00:00:00"), 2L),
      (1L, Option("b"), ts("2024-01-01 00:00:00"), 1L), // earlier tie
      (1L, None,        ts("2024-01-02 00:00:00"), 3L),
      (1L, None,        ts("2024-01-03 00:00:00"), 4L)  // same null run
    ).toDF("k", "attr", "t", "id")
    // b's interval is zero-length [t1, t1) — it closes at tied-instant
    // t1 when a (larger tie) takes over; sort from/to puts it first
    val out = TemporalOps.scd2(log, "k", "attr", "t", "id")
      .orderBy(col("valid_from_us"), col("valid_to_us").asc_nulls_last)
      .collect()
      .map(r => (Option(r.getString(1)), r.getInt(4)))
    assert(out.toSeq === Seq((Some("b"), 0), (Some("a"), 0), (None, 1)))
  }

  test("locfResampleDaily fills gaps forward within each key's span") {
    val log = Seq(
      (1L, ts("2024-01-01 09:00:00"), 1L, 10L),
      (1L, ts("2024-01-01 18:00:00"), 2L, 11L), // same day: later wins
      (1L, ts("2024-01-04 12:00:00"), 3L, 40L), // 2-day gap
      (2L, ts("2024-02-10 00:00:00"), 4L, 99L)  // single-point span
    ).toDF("k", "t", "id", "v")
    val out = TemporalOps.locfResampleDaily(log, "k", "t", "id", "v")
      .orderBy("k", "day")
      .collect()
      .map(r => (r.getLong(0), r.getDate(1).toString, r.getLong(2),
                 r.getInt(3)))
    assert(out.toSeq === Seq(
      (1L, "2024-01-01", 11L, 1),
      (1L, "2024-01-02", 11L, 0),
      (1L, "2024-01-03", 11L, 0),
      (1L, "2024-01-04", 40L, 1),
      (2L, "2024-02-10", 99L, 1)))
  }

  test("locfResampleDaily: same-day ties resolve by the tie column") {
    val log = Seq(
      (1L, ts("2024-01-01 09:00:00"), 5L, 50L),
      (1L, ts("2024-01-01 09:00:00"), 6L, 60L) // same instant, higher tie
    ).toDF("k", "t", "id", "v")
    val out = TemporalOps.locfResampleDaily(log, "k", "t", "id", "v")
      .collect().map(r => (r.getLong(0), r.getLong(2)))
    assert(out.toSeq === Seq((1L, 60L)))
  }
}
