package graft.sources

import java.nio.file.{Files, Paths}

import org.apache.spark.sql.functions._

import graft.SparkSpec
import graft.etl.{Fetcher, Schemas}

/** A Fetcher the DSv2 reader can build by class name on executors:
  * resolves `test://<name>` URLs against a fixture directory that the
  * spec populates (path passed via system property — same JVM in
  * local mode).
  */
class FixtureFetcher extends Fetcher {
  override def fetch(url: String): Either[Int, String] = {
    val dir = System.getProperty("graft.test.fixturedir")
    val p = Paths.get(dir, url.stripPrefix("test://"))
    if (Files.exists(p)) Right(Files.readString(p)) else Left(404)
  }
}

class ChessArchiveSourceSpec extends SparkSpec {
  import spark.implicits._

  private def archiveJson(urls: String*): String =
    s"""{"games":[${urls.map(u =>
        s"""{"url":"$u","time_control":"60","end_time":100,
           |"pgn":"[Result \\"1-0\\"]","white":{"username":"a","rating":1,
           |"result":"win"},"black":{"username":"b","rating":2,
           |"result":"checkmated"}}""".stripMargin.replace("\n", ""))
      .mkString(",")}]}"""

  test("DSv2 source: one partition per archive, raw rows at the edge") {
    val dir = Files.createTempDirectory("graft-dsv2")
    System.setProperty("graft.test.fixturedir", dir.toString)
    Files.writeString(dir.resolve("a1"), archiveJson("g1", "g2"))
    Files.writeString(dir.resolve("a2"), archiveJson("g3"))

    val raw = spark.read
      .format("graft.sources.ChessArchiveSource")
      .option("urls", "test://a1, test://a2, test://missing")
      .option("fetcher.class", classOf[FixtureFetcher].getName)
      .option("max.retries", "1")
      .load()
    assert(raw.rdd.getNumPartitions === 3, "one task per archive")

    val rows = raw.collect()
    assert(rows.length === 3)
    val byUrl = rows.map(r => r.getString(0) -> r.getInt(1)).toMap
    assert(byUrl("test://a1") === 200)
    assert(byUrl("test://missing") === 404)

    // the declarative tail: parse + explode stays in the plan
    val games = raw.filter(col("fetch_status") === 200)
      .withColumn("parsed", from_json(col("body"), Schemas.archiveType))
      .select(explode(col("parsed.games")).as("game"))
      .select(col("game.url").as("game_url"))
      .as[String].collect().sorted.toSeq
    assert(games === Seq("g1", "g2", "g3"))
  }

  test("sharedFetcherFor reuses one instance per options, and paces reads") {
    val opts = Map("fetcher.class" -> classOf[FixtureFetcher].getName,
                   "request.delay.ms" -> "300", "max.retries" -> "1")
    assert(ChessArchiveSource.sharedFetcherFor(opts) eq
           ChessArchiveSource.sharedFetcherFor(opts))

    val dir = Files.createTempDirectory("graft-dsv2-pace")
    System.setProperty("graft.test.fixturedir", dir.toString)
    (1 to 3).foreach(i => Files.writeString(dir.resolve(s"p$i"), archiveJson(s"g$i")))
    val t0 = System.nanoTime()
    val n = spark.read.format("graft.sources.ChessArchiveSource")
      .option("urls", "test://p1,test://p2,test://p3")
      .option("fetcher.class", classOf[FixtureFetcher].getName)
      .option("request.delay.ms", "300")
      .option("max.retries", "1")
      .load().count()
    val elapsedMs = (System.nanoTime() - t0) / 1e6
    assert(n === 3)
    // 3 fetches through one shared limiter → at least 2 enforced gaps
    assert(elapsedMs >= 600, s"pacing not enforced: ${elapsedMs}ms")
  }

  test("DSv2 source requires the urls option") {
    val e = intercept[Exception] {
      spark.read.format("graft.sources.ChessArchiveSource")
        .option("fetcher.class", classOf[FixtureFetcher].getName)
        .load().collect()
    }
    // the requirement message must surface somewhere in the cause chain
    val msgs = Iterator.iterate(e: Throwable)(_.getCause)
      .takeWhile(_ != null).map(t => Option(t.getMessage).getOrElse(""))
      .mkString(" | ")
    assert(msgs.contains("urls"), s"got: $msgs")
  }
}
