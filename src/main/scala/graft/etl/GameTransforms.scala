package graft.etl

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Pure column-level transforms for the chess games pipeline — SURVEY.md
  * §2.3 P1–P15, re-expressed as Catalyst expressions (everything stays
  * inside whole-stage codegen; no UDFs).
  *
  * Reference semantics: `fetch_and_post.py:90-161` (projection, PGN result
  * extraction with fallback chain), Power BI derived columns attested in
  * `Chess Analytics.pbix` Layout (user_color, opponent_username,
  * time_control_bucket, opponent_rating_bucket, ECO — bodies inferred,
  * SURVEY.md §2.3 P10–P14).
  */
object GameTransforms {

  // ------------------------------------------------------- PGN extraction

  /** P5: `[Result "..."]` header tag value, "" when absent. */
  def pgnResultHeader(pgn: Column): Column =
    trim(regexp_extract(pgn, "\\[Result\\s+\"([^\"]*)\"\\]", 1))

  /** P6: last standalone result token in the movetext (`1-0`, `0-1`,
    * `1/2-1/2`); the LAST occurrence wins, matching the reference's
    * findall()[-1].
    */
  def pgnLastResultToken(pgn: Column): Column = {
    val all = regexp_extract_all(pgn, lit("\\b(1/2-1/2|1-0|0-1)\\b"), lit(1))
    coalesce(try_element_at(all, lit(-1)), lit(""))
  }

  /** P7: full result fallback chain:
    * PGN header → last movetext token → `"{white} / {black}"` → `""`.
    */
  def resultExpr(pgn: Column, whiteResult: Column, blackResult: Column): Column = {
    val header = pgnResultHeader(pgn)
    val token  = pgnLastResultToken(pgn)
    val w = coalesce(whiteResult, lit(""))
    val b = coalesce(blackResult, lit(""))
    val sideFallback =
      when(length(trim(w)) > 0 || length(trim(b)) > 0,
        concat(w, lit(" / "), b)).otherwise(lit(""))
    when(length(header) > 0, header)
      .when(length(token) > 0, token)
      .otherwise(sideFallback)
  }

  /** P14: ECO opening code from the PGN `[ECO "..."]` header, "" absent. */
  def ecoExpr(pgn: Column): Column =
    trim(regexp_extract(pgn, "\\[ECO\\s+\"([^\"]*)\"\\]", 1))

  // --------------------------------------------------------- time columns

  /** P2: epoch seconds → UTC timestamp (null-safe; bad/missing → null,
    * the typed analog of the reference's empty string).
    */
  def endTimeUtc(endTime: Column): Column =
    timestamp_seconds(endTime.cast("long"))

  /** P2: epoch seconds → `YYYY-MM-DD` date. */
  def dateYmd(endTime: Column): Column = to_date(endTimeUtc(endTime))

  // ------------------------------------------------------ derived columns

  /** P10: which side the tracked user played (case-insensitive match,
    * chess.com usernames are case-preserving but unique case-insensitively).
    */
  def userColor(username: Column, whiteUsername: Column): Column =
    when(lower(whiteUsername) === lower(username), "white").otherwise("black")

  /** P11: the other player's username. */
  def opponentUsername(userColorCol: Column, whiteU: Column, blackU: Column): Column =
    when(userColorCol === "white", blackU).otherwise(whiteU)

  /** P11b: the other player's rating. */
  def opponentRating(userColorCol: Column, whiteR: Column, blackR: Column): Column =
    when(userColorCol === "white", blackR).otherwise(whiteR)

  /** P12: bucket raw `time_control` into daily/bullet/blitz/rapid.
    * Shapes: `"60"`, `"300+5"` (base+increment), `"1/86400"` (daily).
    */
  def timeControlBucket(timeControl: Column): Column = {
    // digits-only prefix via regexp so non-numeric input nulls out instead
    // of throwing under ANSI mode
    val base = nullif(regexp_extract(split(timeControl, "\\+").getItem(0),
                                     "^(\\d+)$", 1), lit("")).cast("long")
    when(timeControl.contains("/"), "daily")
      .when(base.isNull, "unknown")
      .when(base < 180, "bullet")
      .when(base < 600, "blitz")
      .otherwise("rapid")
  }

  /** P13: 200-point rating band label, e.g. `"1400-1599"`. */
  def ratingBucket(rating: Column): Column = {
    val lo = (floor(rating / 200) * 200).cast("int")
    when(rating.isNull, "unknown")
      .otherwise(concat(lo.cast("string"), lit("-"), (lo + 199).cast("string")))
  }

  // ------------------------------------------------------------ pipeline

  /** P1: exploded raw game struct → the 13-column fact row.
    *
    * Input must have columns: `username`, `archive_url`, `game`
    * (Schemas.gameType struct). Null-safe nested access mirrors the
    * reference's `(game.get("white") or {}).get(...) or ""` chain (P4).
    */
  def projectFact(exploded: DataFrame): DataFrame =
    exploded.select(
      current_timestamp().as("ingest_time"),
      col("username"),
      col("archive_url"),
      coalesce(col("game.url"), lit("")).as("game_url"),
      coalesce(col("game.time_control"), lit("")).as("time_control"),
      endTimeUtc(col("game.end_time")).as("end_time_utc"),
      dateYmd(col("game.end_time")).as("date_ymd"),
      coalesce(col("game.white.username"), lit("")).as("white_username"),
      col("game.white.rating").as("white_rating"),
      coalesce(col("game.black.username"), lit("")).as("black_username"),
      col("game.black.rating").as("black_rating"),
      resultExpr(col("game.pgn"), col("game.white.result"),
                 col("game.black.result")).as("result"),
      coalesce(col("game.pgn"), lit("")).as("pgn"))

  /** Attach the semantic layer's derived columns to a fact DataFrame. */
  def withDerived(fact: DataFrame): DataFrame = {
    val withColor = fact.withColumn(
      "user_color", userColor(col("username"), col("white_username")))
    withColor
      .withColumn("opponent_username",
        opponentUsername(col("user_color"), col("white_username"), col("black_username")))
      .withColumn("opponent_rating",
        opponentRating(col("user_color"), col("white_rating"), col("black_rating")))
      .withColumn("time_control_bucket", timeControlBucket(col("time_control")))
      .withColumn("opponent_rating_bucket", ratingBucket(col("opponent_rating")))
      .withColumn("eco", ecoExpr(col("pgn")))
  }
}
