package graft.streaming

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.streaming.StreamingQueryListener

import graft.etl.GamesStore

/** K3's streaming variant (SURVEY.md §2.2): micro-batch progress and
  * lifecycle events appended to the run/status log table — the streaming
  * analog of the reference's per-stage StatusLog rows. Best-effort like
  * the batch path: `appendStatus` swallows failures, so a broken log sink
  * can never fail the ingest query.
  */
final class IngestProgressListener(spark: SparkSession, store: GamesStore,
                                   username: String)
    extends StreamingQueryListener {

  override def onQueryStarted(
      e: StreamingQueryListener.QueryStartedEvent): Unit =
    store.appendStatus(spark, e.id.toString, username,
      "stream_started", e.name, "")

  override def onQueryProgress(
      e: StreamingQueryListener.QueryProgressEvent): Unit =
    store.appendStatus(spark, e.progress.id.toString, username,
      "stream_progress",
      s"batch=${e.progress.batchId} rows=${e.progress.numInputRows}", "")

  override def onQueryTerminated(
      e: StreamingQueryListener.QueryTerminatedEvent): Unit =
    store.appendStatus(spark, e.id.toString, username,
      "stream_terminated", e.exception.getOrElse(""), "")
}
