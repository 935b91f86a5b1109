package graft.etl

import java.nio.file.Files

import graft.SparkSpec

/** Golden end-to-end ingest tests over fixture archives (FIXTURES.md §2),
  * exercising the §2.10 incremental semantics: dedup idempotency,
  * ledger/status ordering, watermark monotonicity, reprocess-latest.
  */
class IngestJobSpec extends SparkSpec {

  private val base = "https://api.chess.com"

  private def game(url: String, endTime: Long, result: String,
                   wUser: String = "alice", bUser: String = "bob"): String =
    s"""{"url":"$url","time_control":"300+5","end_time":$endTime,
       |"pgn":"[Result \\"$result\\"]\\n1. e4 1-0",
       |"white":{"username":"$wUser","rating":1500,"result":"win"},
       |"black":{"username":"$bUser","rating":1480,"result":"checkmated"}}"""
      .stripMargin.replace("\n", "")

  private def archivesFor(user: String, urls: String*) =
    s"$base/pub/player/$user/games/archives" ->
      Right(s"""{"archives":[${urls.map("\"" + _ + "\"").mkString(",")}]}""")

  private def freshEnv(pages: Map[String, Either[Int, String]]) = {
    val dir = Files.createTempDirectory("graft-ingest").toString
    val store = new GamesStore(s"$dir/warehouse")
    val states = new StateStore(s"$dir/state.json")
    val job = new IngestJob(spark, MapFetcher(pages), store, states, base)
    (job, store, states)
  }

  private val a1 = s"$base/pub/player/alice/games/2025/07"
  private val a2 = s"$base/pub/player/alice/games/2025/08"

  test("golden path: two archives, cross-archive dedup, ledger, watermark") {
    val pages = Map(
      archivesFor("alice", a1, a2),
      a1 -> Right(s"""{"games":[${game("g1", 100, "1-0")},${game("g2", 200, "0-1")}]}"""),
      // g2 duplicated across archives; g3 new
      a2 -> Right(s"""{"games":[${game("g2", 200, "0-1")},${game("g3", 300, "1/2-1/2")}]}"""))
    val (job, store, states) = freshEnv(pages)
    val state = job.run("alice")
    states.save(state)

    val games = store.games(spark).collect()
    assert(games.length == 3, "g2 deduped to one row")
    assert(games.map(_.getAs[String]("game_url")).sorted.toSeq == Seq("g1", "g2", "g3"))

    val ledger = store.ledger(spark).collect()
    assert(ledger.length == 2)
    assert(state("alice").lastEndTime == 300L)
    assert(state("alice").processedArchives.toSet == Set(a1, a2))

    // batched flush: BOTH archives' ledger rows land in ONE parquet file
    // (plus the ensure() empty write) — not one file per archive
    def dataFiles(path: String) =
      new java.io.File(path).listFiles
        .count(f => f.getName.endsWith(".parquet") && f.length() > 0)
    assert(dataFiles(store.ledgerPath) <= 2,
      "ledger rows must be batched per user, not written per archive")
  }

  test("idempotency: rerunning the same archives appends nothing") {
    val pages = Map(
      archivesFor("alice", a1),
      a1 -> Right(s"""{"games":[${game("g1", 100, "1-0")}]}"""))
    val (job, store, states) = freshEnv(pages)
    states.save(job.run("alice"))
    // simulate the CI reprocess-latest policy: pop latest archive, rerun
    states.save(states.unmarkLatest(states.load()))
    val state2 = job.run("alice")
    assert(store.games(spark).count() == 1, "dedup makes reprocessing idempotent")
    assert(state2("alice").lastEndTime == 100L)
  }

  test("ledger replay dedupe: reruns add no duplicate rows, new games add an updated row") {
    val pages = Map(
      archivesFor("alice", a1),
      a1 -> Right(s"""{"games":[${game("g1", 100, "1-0")}]}"""))
    val (job, store, states) = freshEnv(pages)
    states.save(job.run("alice"))
    // replay the same archive (crash-recovery / reprocess-latest with no
    // new games): the (archive, count) row already exists → no duplicate
    states.save(states.unmarkLatest(states.load()))
    states.save(job.run("alice"))
    assert(store.ledger(spark).count() == 1,
      "unchanged archive must not duplicate its ledger row on replay")
    // reprocess after the archive GREW: updated total gets its own row
    val pages2 = Map(
      archivesFor("alice", a1),
      a1 -> Right(s"""{"games":[${game("g1", 100, "1-0")},${game("g2", 200, "0-1")}]}"""))
    val job2 = new IngestJob(spark, MapFetcher(pages2), store, states,
      "https://api.chess.com")
    states.save(states.unmarkLatest(states.load()))
    states.save(job2.run("alice"))
    val rows = store.ledger(spark).collect()
    assert(rows.length == 2)
    assert(rows.map(_.getAs[Int]("game_count")).sorted.toSeq == Seq(1, 2))
  }

  test("empty archive gets a zero-count ledger row") {
    val pages = Map(
      archivesFor("alice", a1),
      a1 -> Right("""{"games":[]}"""))
    val (job, store, _) = freshEnv(pages)
    job.run("alice")
    val ledger = store.ledger(spark).collect()
    assert(ledger.length == 1 && ledger(0).getAs[Int]("game_count") == 0)
    val stages = store.status(spark).collect().map(_.getAs[String]("stage")).toSet
    assert(stages.contains(Stages.ArchiveNoGames))
  }

  test("failed archive download is status-logged and left unprocessed") {
    val pages = Map(
      archivesFor("alice", a1, a2),
      a1 -> Left(503),
      a2 -> Right(s"""{"games":[${game("g9", 900, "1-0")}]}"""))
    val (job, store, _) = freshEnv(pages)
    val state = job.run("alice")
    assert(!state("alice").processedArchives.contains(a1),
      "failed archive stays pending for next run")
    assert(state("alice").processedArchives.contains(a2))
    val errs = store.status(spark)
      .filter(org.apache.spark.sql.functions.col("stage") === Stages.ErrorArchiveDownload)
      .collect()
    assert(errs.length == 1 && errs(0).getAs[String]("http_status") == "503")
    assert(store.games(spark).count() == 1)
  }

  test("unparseable archive body is treated as a failed fetch, not empty") {
    val pages = Map(
      archivesFor("alice", a1, a2),
      a1 -> Right("""{"games": [this is not json"""), // 200 but malformed
      a2 -> Right(s"""{"games":[${game("g1", 100, "1-0")}]}"""))
    val (job, store, _) = freshEnv(pages)
    val state = job.run("alice")
    assert(!state("alice").processedArchives.contains(a1),
      "parse failure must leave the archive pending for retry — marking it " +
        "processed with 0 games would be silent data loss")
    assert(state("alice").processedArchives.contains(a2))
    val errs = store.status(spark)
      .filter(org.apache.spark.sql.functions.col("http_status") ===
        ArchiveSource.ParseFailureStatus.toString)
      .collect()
    assert(errs.nonEmpty, "parse failure must be status-logged")
    assert(store.games(spark).count() == 1)
  }

  test("archive-list failure is logged, run continues") {
    val (job, store, _) = freshEnv(Map.empty) // 404 everything
    val state = job.run("alice")
    assert(state.isEmpty)
    val stages = store.status(spark).collect().map(_.getAs[String]("stage"))
    assert(stages.contains(Stages.ErrorFetchArchives))
  }

  test("watermark is monotone: re-ingesting older games never lowers it") {
    val pages1 = Map(
      archivesFor("alice", a2),
      a2 -> Right(s"""{"games":[${game("g3", 300, "1-0")}]}"""))
    val (job1, store, states) = freshEnv(pages1)
    states.save(job1.run("alice"))
    // next run discovers an OLDER archive
    val pages2 = Map(
      archivesFor("alice", a1, a2),
      a1 -> Right(s"""{"games":[${game("g1", 100, "1-0")}]}"""),
      a2 -> Right(s"""{"games":[${game("g3", 300, "1-0")}]}"""))
    val job2 = new IngestJob(spark, MapFetcher(pages2), store, states, base)
    val state2 = job2.run("alice")
    assert(state2("alice").lastEndTime == 300L)
    assert(store.games(spark).count() == 2)
  }

  test("schema repair: mismatched games table is reset (K4)") {
    import spark.implicits._
    val dir = Files.createTempDirectory("graft-repair").toString
    val store = new GamesStore(s"$dir/warehouse")
    Seq(("bad", 1)).toDF("wrong", "schema")
      .write.parquet(store.gamesPath)
    store.ensureAll(spark)
    assert(store.games(spark).schema.fieldNames.head == "ingest_time")
    assert(store.games(spark).count() == 0)
  }

  test("typed Dataset view matches the fact schema end-to-end") {
    val pages = Map(
      archivesFor("alice", a1),
      a1 -> Right(s"""{"games":[${game("g1", 100, "1-0")}]}"""))
    val (job, store, _) = freshEnv(pages)
    job.run("alice")
    val rows = store.gamesTyped(spark).collect()
    assert(rows.length == 1)
    val g = rows(0)
    assert(g.game_url == "g1" && g.username == "alice")
    assert(g.white_rating.contains(1500) && g.black_rating.contains(1480))
    assert(g.result == "1-0")
  }
}
