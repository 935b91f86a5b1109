package graft.streaming

import java.nio.file.{Files, Path, Paths}

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._

import graft.SparkSpec
import graft.etl.GamesStore

/** Streaming-variant tests (SURVEY.md §2.10): incremental file-source
  * ingest with checkpointed progress and idempotent appends, plus the
  * generic watermarked windowed aggregation.
  */
class StreamingIngestSpec extends SparkSpec {
  import spark.implicits._

  private def game(url: String, endTime: Long, result: String): String =
    s"""{"url":"$url","time_control":"300+5","end_time":$endTime,
       |"pgn":"[Result \\"$result\\"]\\n1. e4 $result",
       |"white":{"username":"alice","rating":1500,"result":"win"},
       |"black":{"username":"bob","rating":1480,"result":"checkmated"}}"""
      .stripMargin.replace("\n", "")

  private def land(dir: Path, name: String, games: String*): Unit =
    Files.writeString(dir.resolve(name),
      s"""{"games":[${games.mkString(",")}]}""")

  test("streaming ingest: incremental files, checkpointed, deduped") {
    val root = Files.createTempDirectory("graft-stream")
    val landing = Files.createDirectory(root.resolve("landing"))
    val store = new GamesStore(s"$root/warehouse")
    val ckpt = s"$root/ckpt"

    // run 1: one archive file with two games
    land(landing, "a1.json", game("g1", 100, "1-0"), game("g2", 200, "0-1"))
    StreamingIngest.runAvailableNow(
      StreamingIngest.ingestStream(spark, landing.toString, store, "alice", ckpt))
    assert(store.games(spark).count() === 2)

    // run 2: a new file lands containing one duplicate + one new game.
    // The checkpoint makes run 2 process ONLY the new file; the sink
    // anti-join dedupes g2.
    land(landing, "a2.json", game("g2", 200, "0-1"), game("g3", 300, "1/2-1/2"))
    StreamingIngest.runAvailableNow(
      StreamingIngest.ingestStream(spark, landing.toString, store, "alice", ckpt))
    val urls = store.games(spark).select("game_url")
      .as[String].collect().sorted.toSeq
    assert(urls === Seq("g1", "g2", "g3"))

    // run 3: nothing new → no change
    StreamingIngest.runAvailableNow(
      StreamingIngest.ingestStream(spark, landing.toString, store, "alice", ckpt))
    assert(store.games(spark).count() === 3)
  }

  test("streaming ingest dedupes within one micro-batch run") {
    val root = Files.createTempDirectory("graft-stream2")
    val landing = Files.createDirectory(root.resolve("landing"))
    val store = new GamesStore(s"$root/warehouse")
    // same game url in two files landed before the first run
    land(landing, "a1.json", game("g1", 100, "1-0"))
    land(landing, "a2.json", game("g1", 100, "1-0"), game("g2", 200, "0-1"))
    StreamingIngest.runAvailableNow(
      StreamingIngest.ingestStream(spark, landing.toString, store, "alice",
                                   s"$root/ckpt"))
    assert(store.games(spark).count() === 2)
  }

  test("progress listener appends micro-batch status rows (K3 streaming)") {
    val root = Files.createTempDirectory("graft-stream3")
    val landing = Files.createDirectory(root.resolve("landing"))
    val store = new GamesStore(s"$root/warehouse")
    store.ensureAll(spark)
    val listener = new IngestProgressListener(spark, store, "alice")
    spark.streams.addListener(listener)
    try {
      land(landing, "a1.json", game("g1", 100, "1-0"))
      StreamingIngest.runAvailableNow(
        StreamingIngest.ingestStream(spark, landing.toString, store, "alice",
                                     s"$root/ckpt"))
      // listener events are async: poll briefly for the rows
      val deadline = System.currentTimeMillis() + 15000
      def stages() = store.status(spark)
        .select("stage").distinct()
        .collect().map(_.getString(0)).toSet
      var s = stages()
      while (!s.contains("stream_progress") &&
             System.currentTimeMillis() < deadline) {
        Thread.sleep(200); s = stages()
      }
      assert(s.contains("stream_started"))
      assert(s.contains("stream_progress"))
    } finally spark.streams.removeListener(listener)
  }

  test("windowedCounts: tumbling event-time windows with watermark") {
    implicit val sqlCtx = spark.sqlContext
    val mem = MemoryStream[(java.sql.Timestamp, String)]
    val events = mem.toDF().toDF("ts", "k")
    val q = StreamingIngest
      .windowedCounts(events, "ts", "k", "10 minutes", "1 hour")
      .writeStream.format("memory").queryName("wc")
      .outputMode("complete").start()
    def t(s: String) = java.sql.Timestamp.valueOf(s)
    mem.addData(
      (t("2024-01-01 00:01:00"), "a"),
      (t("2024-01-01 00:04:00"), "a"),
      (t("2024-01-01 00:11:00"), "a"),
      (t("2024-01-01 00:02:00"), "b"))
    q.processAllAvailable()
    val rows = spark.table("wc")
      .select(col("window_start").cast("string"), col("k"), col("n"))
      .as[(String, String, Long)].collect().toSet
    q.stop()
    assert(rows === Set(
      ("2024-01-01 00:00:00", "a", 2L),
      ("2024-01-01 00:10:00", "a", 1L),
      ("2024-01-01 00:00:00", "b", 1L)))
  }
}
