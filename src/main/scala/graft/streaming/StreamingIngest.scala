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
    * watermarked stream dedup → idempotent batch append into the store.
    *
    * Two dedup layers on purpose:
    *  1. `withWatermark + dropDuplicates(game_url)`: drops duplicates
    *     ACROSS micro-batches within the watermark horizon using streaming
    *     state (bounded by the watermark — state for events older than the
    *     horizon is evicted, so state size is O(recent keys), not O(all
    *     history)).
    *  2. the store's anti-join append: catches duplicates beyond the
    *     horizon (e.g. a re-landed month-old archive) — the same
    *     idempotency the batch path relies on.
    */
  def ingestStream(spark: SparkSession, landingDir: String, store: GamesStore,
                   username: String, checkpointDir: String,
                   watermarkDelay: String = "30 days"): DataStreamWriter[Row] = {
    val fact = GameTransforms.projectFact(
        readLandingStream(spark, landingDir)
          .filter(col("game").isNotNull)
          .withColumn("username", lit(username)))
      .withWatermark("end_time_utc", watermarkDelay)
      .dropDuplicates("game_url")
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
