package graft.etl

import org.apache.spark.sql.Row
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.SparkSpec

class GameTransformsSpec extends SparkSpec {
  import spark.implicits._

  private def resultOf(pgn: String, w: String, b: String): String =
    Seq((pgn, w, b)).toDF("pgn", "w", "b")
      .select(GameTransforms.resultExpr(col("pgn"), col("w"), col("b")).as("r"))
      .collect()(0).getString(0)

  test("P5: result header wins over movetext tokens") {
    assert(resultOf("[Result \"1-0\"]\n1. e4 e5 0-1", "win", "checkmated") == "1-0")
  }

  test("P6: without header, LAST standalone token wins") {
    assert(resultOf("1. e4 1-0 2. d4 0-1", null, null) == "0-1")
    assert(resultOf("1. e4 c5 1/2-1/2", null, null) == "1/2-1/2")
  }

  test("P7: side-result fallback and empty chain") {
    assert(resultOf("1. e4 e5", "win", "checkmated") == "win / checkmated")
    assert(resultOf(null, "win", "checkmated") == "win / checkmated")
    assert(resultOf(null, "win", null) == "win / ")
    assert(resultOf(null, null, null) == "")
    assert(resultOf("1. e4 e5 *", "", "") == "")
  }

  test("P12: time control buckets") {
    val got = Seq("60", "179", "180", "300+5", "599+0", "600", "1800",
                  "1/86400", "garbage")
      .toDF("tc")
      .select(col("tc"), GameTransforms.timeControlBucket(col("tc")).as("b"))
      .collect().map(r => r.getString(0) -> r.getString(1)).toMap
    assert(got("60") == "bullet" && got("179") == "bullet")
    assert(got("180") == "blitz" && got("300+5") == "blitz" && got("599+0") == "blitz")
    assert(got("600") == "rapid" && got("1800") == "rapid")
    assert(got("1/86400") == "daily")
    assert(got("garbage") == "unknown")
  }

  test("P13: rating bucket bands and null handling") {
    val got = Seq[Integer](0, 199, 1400, 1599, null).toDF("r")
      .select(GameTransforms.ratingBucket(col("r")).as("b"))
      .collect().map(_.getString(0))
    assert(got.toSeq == Seq("0-199", "0-199", "1400-1599", "1400-1599", "unknown"))
  }

  test("P14: ECO extraction") {
    val got = Seq("[ECO \"B20\"]\n1. e4 c5", "1. e4 e5").toDF("pgn")
      .select(GameTransforms.ecoExpr(col("pgn")).as("e"))
      .collect().map(_.getString(0))
    assert(got.toSeq == Seq("B20", ""))
  }

  test("P2: epoch to timestamp/date, null-safe") {
    val got = Seq[java.lang.Long](1753401600L, null).toDF("t")
      .select(GameTransforms.endTimeUtc(col("t")).as("ts"),
              GameTransforms.dateYmd(col("t")).as("d"))
      .collect()
    assert(got(0).getTimestamp(0).toInstant.toString == "2025-07-25T00:00:00Z")
    assert(got(0).getDate(1).toString == "2025-07-25")
    assert(got(1).isNullAt(0) && got(1).isNullAt(1))
  }

  test("P10/P11: user color + opponent, case-insensitive") {
    val df = Seq(("Alice", "alice", "bob", 1500, 1480),
                 ("alice", "bob", "Alice", 1480, 1500))
      .toDF("username", "white_username", "black_username", "white_rating", "black_rating")
    val out = GameTransforms.withDerived(
      df.withColumn("time_control", lit("300"))
        .withColumn("pgn", lit("")))
      .select("user_color", "opponent_username", "opponent_rating")
      .collect()
    assert(out(0) == Row("white", "bob", 1480))
    assert(out(1) == Row("black", "bob", 1480))
  }

  test("P1: projection handles missing sides and urls") {
    val json =
      """{"games":[{"url":null,"time_control":"300+5","end_time":1753401600,
        |"pgn":"[Result \"1-0\"]","white":null,"black":{"username":"bob","rating":10,"result":"win"}}]}"""
        .stripMargin.replace("\n", "")
    val df = spark.read.schema(Schemas.archiveType)
      .json(Seq(json).toDS())
      .withColumn("username", lit("alice"))
      .withColumn("archive_url", lit("a1"))
      .select(col("username"), col("archive_url"), explode(col("games")).as("game"))
    val row = GameTransforms.projectFact(df).collect()(0)
    assert(row.getAs[String]("game_url") == "")
    assert(row.getAs[String]("white_username") == "")
    assert(row.isNullAt(row.fieldIndex("white_rating")))
    assert(row.getAs[String]("black_username") == "bob")
    assert(row.getAs[String]("result") == "1-0")
  }
}
