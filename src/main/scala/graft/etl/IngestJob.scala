package graft.etl

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** End-to-end incremental ingest run (SURVEY.md §3.1 lifecycle).
  *
  * Per user: list archives → skip already-processed (F2) → fetch payloads
  * (distributed, S3) → project + dedup-append (P1/F1/K1) → ledger (K2) →
  * advance watermark + save state (O5/K5). Write ordering matches the
  * reference: data append BEFORE ledger append, so a crash between the two
  * re-processes the archive next run and the anti-join dedup makes that
  * idempotent (at-least-once + dedup = effectively-once, §2.10).
  *
  * Unlike the reference's one-archive-at-a-time loop, unprocessed archives
  * for a user are fetched in ONE distributed pass; per-archive game counts
  * come from a single groupBy rather than N driver round-trips.
  */
final class IngestJob(
    spark: SparkSession,
    fetcher: Fetcher,
    store: GamesStore,
    stateStore: StateStore,
    baseUrl: String = "https://api.chess.com") {

  def run(usernamesCsv: String, runId: String = java.util.UUID.randomUUID().toString)
      : Map[String, UserState] = {
    // S6: CSV param parse — split, strip, drop empties
    val users = usernamesCsv.split(",").map(_.trim).filter(_.nonEmpty).toSeq
    store.ensureAll(spark)
    var state = stateStore.load()

    users.foreach { user =>
      ArchiveSource.listArchives(fetcher, baseUrl, user) match {
        case Left(status) =>
          store.appendStatus(spark, runId, user, Stages.ErrorFetchArchives,
            s"archive list fetch failed", status.toString)
        case Right(archives) =>
          val prior = state.getOrElse(user, UserState(0L, Vector.empty))
          val todo = archives.filterNot(prior.processedArchives.toSet)
          if (todo.nonEmpty) {
            state = processArchives(user, todo, prior, runId, state)
          }
      }
    }
    state
  }

  /** Fetch + append all pending archives for one user in one distributed
    * pass, then advance state per archive (chronological order, O1-stable).
    */
  private def processArchives(
      user: String, todo: Seq[String], prior: UserState, runId: String,
      state: Map[String, UserState]): Map[String, UserState] = {

    val raw = ArchiveSource
      .readArchives(spark, fetcher, todo.map(user -> _))
      .cache()
    try {
      val failed = raw.filter(col("fetch_status") =!= 200)
        .select("archive_url", "fetch_status").distinct().collect()
      store.appendStatusRows(spark, runId, user,
        failed.toSeq.map(r => (Stages.ErrorArchiveDownload,
          r.getString(0), r.getInt(1).toString)))
      val failedUrls = failed.map(_.getString(0)).toSet

      val games = GameTransforms.projectFact(
        raw.filter(col("fetch_status") === 200 && col("game").isNotNull))
      val appended = store.appendGames(spark, games)
      if (appended > 0)
        store.appendStatus(spark, runId, user, Stages.GamesAppended,
          s"$appended games", "200")

      // per-archive counts for the ledger (single agg, not N queries)
      val counts = raw.filter(col("fetch_status") === 200)
        .groupBy(col("archive_url"))
        .agg(sum(when(col("game").isNotNull, 1).otherwise(0)).as("n"),
             max(col("game.end_time")).as("max_end"))
        .collect()
        .map(r => r.getString(0) ->
          (r.getAs[Long]("n"), Option(r.getAs[Any]("max_end"))
            .map(_.toString.toLong).getOrElse(0L)))
        .toMap

      // Ledger + status flush ONCE per user (chronological row order kept):
      // the per-row form wrote two one-row parquet files per archive — a
      // 10k-archive backfill is 20k+ tiny files. A crash between this
      // append and the state loop below re-processes the batch next run
      // (state-driven skip never advanced); the games side is absorbed by
      // the anti-join dedup, and the LEDGER dedupes here against its own
      // existing (archive, count) rows — a replay row carries a fresh
      // processed_at_utc, so without this filter it would double-count
      // every `game_count` aggregate over K2. Keyed on (archive, count)
      // rather than archive alone so a deliberate reprocess-latest that
      // FOUND new games still records the updated total.
      val ok = todo.sorted.filterNot(failedUrls)
      // Replay dedup is pushed into Spark as a LEFT ANTI join: the full
      // per-user ledger history never collects to the driver — only the
      // surviving candidates do, and those are bounded by THIS run's
      // archive list. K2 contract note: a deliberate reprocess whose
      // content changed but whose game count did not is indistinguishable
      // from a replay here and records no new ledger row; reprocess
      // visibility lives in the status log (ArchiveProcessed rows are
      // written per run regardless).
      import spark.implicits._
      val fresh = ok
        .map(url => (user, url, counts.getOrElse(url, (0L, 0L))._1))
        .toDF("username", "archive_url", "game_count")
        .join(store.ledger(spark).filter(col("username") === user)
                .select(col("archive_url"),
                        col("game_count").cast("long").as("game_count")),
              Seq("archive_url", "game_count"), "left_anti")
        .select("username", "archive_url", "game_count")
        .as[(String, String, Long)].collect().toSeq
        .sortBy(_._2) // restore chronological (sorted-url) row order
      store.appendLedgerRows(spark, fresh)
      store.appendStatusRows(spark, runId, user, ok.flatMap { url =>
        val noGames =
          if (counts.getOrElse(url, (0L, 0L))._1 == 0L)
            Seq((Stages.ArchiveNoGames, url, "200"))
          else Nil
        noGames :+ ((Stages.ArchiveProcessed, url, "200"))
      })

      // advance state chronologically, archive by archive (K5 durability —
      // the per-archive boundary stays HERE, in the state file). A Set
      // mirrors the Vector for membership so a 10k-archive backfill is
      // O(n) total, not the O(n²) of re-running `.distinct` per archive;
      // the Vector keeps the reference's sorted append order.
      var st = prior
      var seen = prior.processedArchives.toSet
      ok.foreach { url =>
        val (_, maxEnd) = counts.getOrElse(url, (0L, 0L))
        st = UserState(
          lastEndTime = math.max(st.lastEndTime, maxEnd), // O5 monotone watermark
          processedArchives =
            if (seen(url)) st.processedArchives
            else st.processedArchives :+ url)
        seen += url
        stateStore.save(state.updated(user, st))
      }
      state.updated(user, st)
    } finally raw.unpersist()
  }
}
