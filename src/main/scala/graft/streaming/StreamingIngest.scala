package graft.streaming

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{DataStreamWriter, Trigger}
import org.apache.spark.sql.Row

import graft.etl.{GameTransforms, GamesStore, Schemas}

/** Structured Streaming variant of the ingest pipeline (SURVEY.md §2.10):
  * the reference's periodic incremental batch (daily cron + `state.json`
  * checkpoint + dedup-on-append) maps 1:1 onto a file-source stream with a
  * checkpointed, idempotent `foreachBatch` sink.
  *
  * | reference mechanism              | here                              |
  * |----------------------------------|-----------------------------------|
  * | daily cron trigger               | `Trigger.AvailableNow` per run    |
  * | `state.json` watermark/ledger    | streaming checkpoint dir          |
  * | re-fetch current month           | file source picks up new files    |
  * | dedup by game_url on append      | `dropDuplicates` + anti-join sink |
  * | append may fail → retried run    | `foreachBatch` replays batch id   |
  *
  * At-least-once file delivery + the idempotent anti-join append =
  * effectively-once rows, the same contract the reference reaches with
  * ledger-after-data write ordering.
  */
object StreamingIngest {

  /** Streaming read of archive-payload JSON files landing in `landingDir`
    * (one archive document per file), exploded to raw games. Schema is
    * explicit — required for streaming sources and identical to the batch
    * reader's (`ArchiveSource.readLanding`).
    */
  def readLandingStream(spark: SparkSession, landingDir: String,
                        maxFilesPerTrigger: Int = 16): DataFrame =
    spark.readStream
      .schema(Schemas.archiveType)
      .option("multiLine", "true")
      .option("maxFilesPerTrigger", maxFilesPerTrigger)
      .json(landingDir)
      .withColumn("archive_url", input_file_name())
      .select(col("archive_url"), explode_outer(col("games")).as("game"))

  /** Full streaming pipeline: landing files → projected 13-col fact rows →
    * idempotent batch append into the store.
    *
    * Dedup lives ENTIRELY in the sink's anti-join (exact, unbounded-safe):
    * a watermarked `dropDuplicates` here would be wrong twice over — a
    * backfilled months-old archive would arrive below the watermark and be
    * dropped as "late" (silent data loss; the reference happily ingests
    * old months), and without the event-time column in the dedup key the
    * state store would never evict, growing O(all history). Optional
    * `streamDedup` enables `dropDuplicatesWithinWatermark(game_url)` as a
    * state-bounded optimization for deployments where duplicates only
    * arrive close together in time — the sink anti-join still backstops
    * exactness either way.
    */
  def ingestStream(spark: SparkSession, landingDir: String, store: GamesStore,
                   username: String, checkpointDir: String,
                   watermarkDelay: String = "30 days",
                   streamDedup: Boolean = false): DataStreamWriter[Row] = {
    val projected = GameTransforms.projectFact(
      readLandingStream(spark, landingDir)
        .filter(col("game").isNotNull)
        .withColumn("username", lit(username)))
    val fact =
      if (streamDedup)
        projected.withWatermark("end_time_utc", watermarkDelay)
          .dropDuplicatesWithinWatermark("game_url")
      else projected
    fact.writeStream
      .option("checkpointLocation", checkpointDir)
      .outputMode("append")
      .foreachBatch { (batch: DataFrame, batchId: Long) =>
        // foreachBatch may replay a batch after a crash; appendGames'
        // anti-join makes the replay a no-op (effectively-once).
        store.ensureAll(batch.sparkSession)
        store.appendGames(batch.sparkSession, batch)
        (): Unit
      }
  }

  /** Run one incremental pass over whatever has landed (the streaming
    * analog of the reference's daily cron run) and block until done.
    */
  def runAvailableNow(writer: DataStreamWriter[Row]): Unit = {
    val q = writer.trigger(Trigger.AvailableNow()).start()
    q.awaitTermination()
  }

  /** Generic streaming aggregation surface: tumbling event-time window
    * counts per key with late-data handling — the standard
    * `readStream → withWatermark → groupBy(window) → writeStream` shape
    * (SURVEY.md §2.10; the reference's only time-window computation is the
    * BI rolling window, which batch covers — this is the streaming-native
    * equivalent for live feeds).
    */
  def windowedCounts(events: DataFrame, tsCol: String, keyCol: String,
                     windowLen: String, watermarkDelay: String): DataFrame =
    events
      .withWatermark(tsCol, watermarkDelay)
      .groupBy(window(col(tsCol), windowLen).as("w"), col(keyCol))
      .agg(count(lit(1)).as("n"))
      .select(col("w.start").as("window_start"),
              col("w.end").as("window_end"),
              col(keyCol), col("n"))
}
