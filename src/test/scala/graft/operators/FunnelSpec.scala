package graft.operators

import graft.SparkSpec

/** Contracts of [[Funnel.depths]]: stage ORDER matters (a click before
  * any view doesn't count), the per-stage window gates conversions, the
  * chain restarts never (first qualifying instants only), and keys with
  * no stage-1 event report depth 0.
  */
class FunnelSpec extends SparkSpec {
  import spark.implicits._

  private val stages = Seq("view", "click", "purchase")

  private def run(rows: Seq[(Long, Long, Long, String)], windowUs: Long) =
    Funnel.depths(rows.toDF("user_id", "us", "event_id", "event_type"),
                  "user_id", "us", "event_type", "event_id",
                  stages, windowUs)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap

  test("order, windows, and missing stages classify depths") {
    val rows = Seq(
      // user 1: full funnel in order, within windows → 3
      (1L, 100L, 1L, "view"), (1L, 150L, 2L, "click"),
      (1L, 180L, 3L, "purchase"),
      // user 2: click BEFORE the first view → stalls at 1
      (2L, 100L, 4L, "click"), (2L, 200L, 5L, "view"),
      // user 3: click too late (window 100) → 1
      (3L, 100L, 6L, "view"), (3L, 250L, 7L, "click"),
      // user 4: view+click ok, purchase outside click+window → 2
      (4L, 100L, 8L, "view"), (4L, 150L, 9L, "click"),
      (4L, 300L, 10L, "purchase"),
      // user 5: no view at all → 0
      (5L, 100L, 11L, "purchase"), (5L, 110L, 12L, "click"))
    assert(run(rows, windowUs = 100L) ===
      Map(1L -> 3L, 2L -> 1L, 3L -> 1L, 4L -> 2L, 5L -> 0L))
  }

  test("a second, later view cannot re-open the click window") {
    // first view at 100; clicks at 350 are within 100 of the SECOND
    // view (300) but the funnel anchors on the first qualifying instant
    val rows = Seq(
      (1L, 100L, 1L, "view"), (1L, 300L, 2L, "view"),
      (1L, 350L, 3L, "click"))
    assert(run(rows, windowUs = 100L) === Map(1L -> 1L))
  }

  test("same-instant stage events count (inclusive window start)") {
    val rows = Seq(
      (1L, 100L, 1L, "view"), (1L, 100L, 2L, "click"),
      (1L, 100L, 3L, "purchase"))
    assert(run(rows, windowUs = 10L) === Map(1L -> 3L))
  }

  test("internal-name collisions are rejected") {
    val df = Seq((1L, 1L, 1L, "view", 0L))
      .toDF("u", "us", "id", "t", "__m0")
    intercept[IllegalArgumentException] {
      Funnel.depths(df, "u", "us", "t", "id", stages, 10L)
    }
  }

  test("validation: need two stages and a positive window") {
    val df = Seq((1L, 1L, 1L, "view")).toDF("u", "us", "id", "t")
    intercept[IllegalArgumentException] {
      Funnel.depths(df, "u", "us", "t", "id", Seq("view"), 10L)
    }
    intercept[IllegalArgumentException] {
      Funnel.depths(df, "u", "us", "t", "id", stages, 0L)
    }
  }

  test("repeated stage names are rejected (one event would satisfy both)") {
    val df = Seq((1L, 1L, 1L, "view")).toDF("u", "us", "id", "t")
    intercept[IllegalArgumentException] {
      Funnel.depths(df, "u", "us", "t", "id", Seq("view", "view"), 10L)
    }
  }
}
