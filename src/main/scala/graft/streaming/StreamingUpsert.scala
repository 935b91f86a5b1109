package graft.streaming

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{StreamingQuery, Trigger}

import graft.operators.IncrementalAgg
import graft.GraftOps._

/** Streaming keyed UPSERT — a changelog stream continuously maintains a
  * snapshot table (the streaming face of
  * [[IncrementalAgg.applyChangelog]], §2.10 discipline).
  *
  * The state table stores one resolved row per key INCLUDING delete
  * TOMBSTONES (the key's latest op and ordering columns ride along);
  * readers take [[snapshotView]], which filters tombstones out. Keeping
  * tombstones is what makes the merge safe under the two streaming
  * realities batch MERGE never faces:
  *  - OUT-OF-ORDER batches: a later micro-batch carrying an OLDER
  *    change for a key must lose. Resolution is latest-wins over
  *    (state ∪ batch) by the ordering columns — the stored row carries
  *    its ord, so a stale update cannot overwrite a newer value.
  *  - REPLAYED batches (at-least-once sources): without tombstones, a
  *    replayed pre-delete update would resurrect a deleted key; the
  *    tombstone outranks it by ord and wins again. Replay is therefore
  *    idempotent — merging the same batch twice is a no-op.
  *
  * Per micro-batch: ONE union + ONE map-combined struct-max aggregate
  * over |state keys| + |batch rows| — the corpus-as-state shape
  * ([[StreamingDedup]]): no executor state store (a snapshot's natural
  * home is a table; state-store upsert state would duplicate it with
  * no read path), no window sort; commits are versioned directories
  * behind an atomically-swapped CURRENT pointer.
  * At 100 TB the state table would be key-bucketed so the merge's
  * exchange disappears; compaction (dropping tombstones older than the
  * source's replay horizon) bounds growth.
  */
object StreamingUpsert {

  /** Resolve (state ∪ batch) to one latest row per key. Both sides must
    * carry `keyCol :: ordCols :: opCol :: payloadCols`. Pure — shared
    * by the stream sink and batch backfills/tests.
    */
  def mergeBatch(state: DataFrame, batch: DataFrame, keyCol: String,
                 ordCols: Seq[String], opCol: String,
                 payloadCols: Seq[String]): DataFrame = {
    val cols = (keyCol +: ordCols) ++ (opCol +: payloadCols)
    val packed = (ordCols.map(col) :+ col(opCol)) ++ payloadCols.map(col)
    state.select(cols.map(col): _*)
      .unionByName(batch.select(cols.map(col): _*))
      .groupBy(col(keyCol))
      .agg(max(struct(packed: _*)).as("__top"))
      .select(col(keyCol) +:
        (ordCols ++ (opCol +: payloadCols)).map(c =>
          col(s"__top.$c").as(c)): _*)
  }

  /** The reader-facing snapshot: resolved rows minus tombstones. */
  def snapshotView(state: DataFrame, opCol: String,
                   deleteOp: String): DataFrame =
    state.filter(col(opCol) =!= deleteOp)

  private def currentPointer(stateDir: String): java.nio.file.Path =
    java.nio.file.Paths.get(stateDir, "CURRENT")

  /** Read the committed state version, or an empty frame with `schema`
    * on first run. The CURRENT pointer file names the live version
    * directory — [[commitState]] only ever moves the pointer over a
    * fully-written version, so a reader (or a recovering batch) never
    * sees a partial table.
    */
  def readState(spark: SparkSession, stateDir: String,
                schema: org.apache.spark.sql.types.StructType): DataFrame = {
    val cur = currentPointer(stateDir)
    if (java.nio.file.Files.exists(cur)) {
      val v = new String(java.nio.file.Files.readAllBytes(cur),
                         java.nio.charset.StandardCharsets.UTF_8).trim
      spark.read.parquet(s"$stateDir/$v")
    } else spark.createDataFrame(
      spark.sparkContext.emptyRDD[org.apache.spark.sql.Row], schema)
  }

  /** Commit `next` as version `v<batchId>`: write the version dir fully,
    * then swap the CURRENT pointer with an atomic file move (the
    * [[graft.etl.StateStore]] K5 discipline — small pointer files move
    * atomically where multi-file directories cannot). A crash before
    * the swap leaves the old version live and the checkpoint replays
    * the batch, which re-merges idempotently; superseded versions are
    * deleted only AFTER the swap succeeds.
    */
  def commitState(next: DataFrame, stateDir: String, batchId: Long): Unit = {
    val vname = s"v$batchId"
    next.write.mode("overwrite").parquet(s"$stateDir/$vname")
    val cur = currentPointer(stateDir)
    val prev =
      if (java.nio.file.Files.exists(cur))
        Some(new String(java.nio.file.Files.readAllBytes(cur),
                        java.nio.charset.StandardCharsets.UTF_8).trim)
      else None
    val tmp = java.nio.file.Paths.get(stateDir, "CURRENT.tmp")
    java.nio.file.Files.write(tmp, vname.getBytes(
      java.nio.charset.StandardCharsets.UTF_8))
    java.nio.file.Files.move(tmp, cur,
      java.nio.file.StandardCopyOption.ATOMIC_MOVE,
      java.nio.file.StandardCopyOption.REPLACE_EXISTING)
    prev.filter(_ != vname).foreach { p =>
      val dir = java.nio.file.Paths.get(stateDir, p)
      scala.util.Try {
        java.nio.file.Files.walk(dir).sorted(
          java.util.Comparator.reverseOrder())
          .forEach(f => java.nio.file.Files.deleteIfExists(f))
      }
    }
  }

  /** Run the changelog stream into the versioned state table at
    * `stateDir`: per micro-batch read CURRENT → [[mergeBatch]] →
    * [[commitState]]. Replay of a committed batch converges to the
    * same state (latest-wins is idempotent); replay of an uncommitted
    * batch finds the previous version intact.
    */
  def run(changelog: DataFrame, stateDir: String, checkpointDir: String,
          keyCol: String, ordCols: Seq[String], opCol: String,
          payloadCols: Seq[String]): StreamingQuery = {
    val cols = (keyCol +: ordCols) ++ (opCol +: payloadCols)
    changelog.writeStream
      .outputMode("update")
      .option("checkpointLocation", checkpointDir)
      .trigger(Trigger.AvailableNow())
      .foreachBatch { (batch: DataFrame, batchId: Long) =>
        val spark = batch.sparkSession
        val state = readState(spark, stateDir,
          org.apache.spark.sql.types.StructType(
            cols.map(batch.schema(_))))
        val next = mergeBatch(state, batch, keyCol, ordCols, opCol,
                              payloadCols)
          .graftCheckpoint() // materialize before any file mutation
        try commitState(next, stateDir, batchId)
        finally org.apache.spark.sql.GraftColumns.unpersistCheckpoint(next)
        ()
      }
      .start()
  }
}
