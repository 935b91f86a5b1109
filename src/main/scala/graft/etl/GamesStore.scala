package graft.etl

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.StructType

/** Idempotent parquet-backed store for the games fact, ledger, and status
  * log (SURVEY.md §2.2 K1–K4, §2.4 F1).
  *
  * Dedup strategy at scale: the candidate batch is LEFT ANTI joined against
  * the existing `game_url` key set. The key scan is column-pruned (Catalyst
  * reads only the key column from parquet), and the batch side — always the
  * small side during incremental ingest — is broadcast, so the existing
  * table is never shuffled. On a 100 TB fact the anti-join would instead be
  * scoped to the partitions the ledger says may overlap (archive-month
  * partition pruning); the operator shape is identical.
  */
final class GamesStore(root: String) extends Serializable {

  val gamesPath: String  = s"$root/games"
  val ledgerPath: String = s"$root/processed_archives"
  val statusPath: String = s"$root/status_log"

  // --------------------------------------------------------------- DDL/K4

  /** Ensure a table dir exists with the expected schema; on mismatch the
    * table is reset (truncate-and-rewrite-header semantics of the
    * reference's sheet repair, `fetch_and_post.py:197-227`).
    */
  def ensure(spark: SparkSession, path: String, schema: StructType): Unit = {
    def emptyWrite(): Unit =
      spark.createDataFrame(spark.sparkContext.emptyRDD[org.apache.spark.sql.Row], schema)
        .write.mode("overwrite").parquet(path)
    if (!exists(spark, path)) emptyWrite()
    else {
      val actual = spark.read.parquet(path).schema
      val expected = schema.fields.map(f => (f.name, f.dataType)).toSeq
      val got = actual.fields.map(f => (f.name, f.dataType)).toSeq
      if (!got.startsWith(expected)) emptyWrite()
    }
  }

  def ensureAll(spark: SparkSession): Unit = {
    ensure(spark, gamesPath, Schemas.gamesFact)
    ensure(spark, ledgerPath, Schemas.ledger)
    ensure(spark, statusPath, Schemas.statusLog)
  }

  private def exists(spark: SparkSession, path: String): Boolean = {
    val p = new org.apache.hadoop.fs.Path(path)
    p.getFileSystem(spark.sparkContext.hadoopConfiguration).exists(p)
  }

  // --------------------------------------------------------------- reads

  def games(spark: SparkSession): DataFrame = spark.read.parquet(gamesPath)

  /** Typed view of the fact (same scan; encoder-checked against
    * [[Schemas.gamesFact]] — a drifted table fails here at analysis time
    * instead of at first field access).
    */
  def gamesTyped(spark: SparkSession): org.apache.spark.sql.Dataset[GameRow] = {
    import spark.implicits._
    games(spark).as[GameRow]
  }
  def ledger(spark: SparkSession): DataFrame = spark.read.parquet(ledgerPath)
  def status(spark: SparkSession): DataFrame = spark.read.parquet(statusPath)

  /** S4: existing dedup keys — a column-pruned distinct scan. */
  def existingGameUrls(spark: SparkSession): DataFrame =
    games(spark).select("game_url")
      .filter(length(trim(col("game_url"))) > 0).distinct()

  /** F2: archives already marked processed. */
  def processedArchiveUrls(spark: SparkSession): DataFrame =
    ledger(spark).select("archive_url").distinct()

  // --------------------------------------------------------------- writes

  /** K1 + F1: idempotent batched append. Drops rows whose `game_url`
    * already exists (cross-run dedup) and duplicates within the batch
    * itself (intra-batch dedup), keeping rows with empty urls — the
    * reference appends those untracked (`fetch_and_post.py:362-370`).
    * Returns the number of rows appended.
    *
    * The deduped batch is STAGED to a temp dir before the append: the
    * dedup plan reads `gamesPath` (the anti-join side), so appending from
    * the live plan would race its own scan if any partition were
    * recomputed mid-write (cache eviction / executor loss under a mere
    * `cache()` could recompute the anti-join against a half-appended
    * table, dropping or duplicating rows). Writing the staged parquet
    * severs the read-write cycle deterministically; the append then only
    * reads the staging dir.
    */
  def appendGames(spark: SparkSession, batch: DataFrame): Long = {
    val keyed   = batch.filter(length(trim(col("game_url"))) > 0)
    val unkeyed = batch.filter(length(trim(col("game_url"))) <= 0)
    val fresh = keyed
      .dropDuplicates("game_url")
      .join(existingGameUrls(spark), Seq("game_url"), "left_anti")
      .select(batch.columns.map(col).toSeq: _*)
      .union(unkeyed)
    val stagingPath =
      s"$root/_staging/games_${java.util.UUID.randomUUID().toString}"
    fresh.write.mode("overwrite").parquet(stagingPath)
    try {
      val staged = spark.read.parquet(stagingPath)
      val n = staged.count() // parquet footer counts — no recompute
      if (n > 0) staged.write.mode("append").parquet(gamesPath)
      n
    } finally {
      val p = new org.apache.hadoop.fs.Path(stagingPath)
      p.getFileSystem(spark.sparkContext.hadoopConfiguration)
        .delete(p, true)
    }
  }

  /** K2: ledger append, BATCHED — one append job (one file) per call,
    * however many archives it covers. Per-row appends write a one-row
    * parquet file each; a 10k-archive backfill would litter the table with
    * 20k+ tiny files whose footers dominate every later scan. Durability
    * stays per-archive where it matters — in the state file (K5) — while
    * the ledger flushes once per user.
    */
  def appendLedgerRows(spark: SparkSession,
                       rows: Seq[(String, String, Long)]): Unit = {
    if (rows.isEmpty) return
    import spark.implicits._
    val ts = new java.sql.Timestamp(System.currentTimeMillis())
    rows.map { case (u, a, n) => (u, a, ts, n.toInt) }
      .toDF("username", "archive_url", "processed_at_utc", "game_count")
      .coalesce(1)
      .write.mode("append").parquet(ledgerPath)
  }

  def appendLedger(spark: SparkSession, username: String, archiveUrl: String,
                   gameCount: Long): Unit =
    appendLedgerRows(spark, Seq((username, archiveUrl, gameCount)))

  /** K3: best-effort status append, batched like the ledger (errors
    * swallowed, like the reference — a failed log line must never fail the
    * run). Row shape: (stage, message, httpStatus).
    */
  def appendStatusRows(spark: SparkSession, runId: String, username: String,
                       rows: Seq[(String, String, String)]): Unit =
    try {
      if (rows.isEmpty) return
      import spark.implicits._
      val ts = new java.sql.Timestamp(System.currentTimeMillis())
      rows.map { case (stage, msg, http) => (runId, username, stage, msg, http, ts) }
        .toDF("run_id", "username", "stage", "message", "http_status",
              "timestamp_utc")
        .coalesce(1)
        .write.mode("append").parquet(statusPath)
    } catch { case scala.util.control.NonFatal(_) => () }

  def appendStatus(spark: SparkSession, runId: String, username: String,
                   stage: String, message: String, httpStatus: String): Unit =
    appendStatusRows(spark, runId, username, Seq((stage, message, httpStatus)))
}
