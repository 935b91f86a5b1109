package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.Tables
import graft.etl.{ArchiveSource, GameTransforms}
import graft.semantic.Dashboard

/** Driver-gated chess-domain queries: the reference dashboard's measures
  * (non-canonical result vocabulary included) hash-checked end-to-end
  * against a DuckDB oracle.
  *
  * The harness tables carry no games fact, so these queries derive one
  * DETERMINISTICALLY from `events` (pure modulo arithmetic on event_id /
  * user_id — identical in any engine) and push it through the REAL
  * semantic stack: [[graft.etl.GameTransforms.withDerived]] →
  * [[graft.semantic.ChessMeasures]] → [[Dashboard]]. The oracle SQL
  * re-derives the same fixture and re-states the measure semantics
  * (outcome classification incl. the `"{white} / {black}"` fallback
  * domain of `fetch_and_post.py:133-144`, time-control bucketing, Top-N
  * with deterministic tie-break) independently in SQL — so a drift in
  * either the transforms or the measures becomes a hash mismatch in the
  * driver gate, not just a spec failure.
  *
  * The fixture result list covers every classification branch: canonical
  * win/loss/draw (`1-0`/`0-1`/`1/2-1/2`), fallback win (`win /
  * checkmated`), fallback loss (`checkmated / win`, `timeout / win`),
  * fallback draw (`agreed / agreed`), and unknown (``); time controls
  * cover bullet/blitz (±increment)/rapid/daily/unknown.
  */
object ChessQueries {

  private val ResultVocab = Seq(
    "1-0", "0-1", "1/2-1/2", "win / checkmated", "checkmated / win",
    "agreed / agreed", "timeout / win", "")

  private val TimeControls = Seq("60", "300", "300+5", "600", "1/86400", "custom")

  private val Pgns = Seq("[ECO \"B20\"]", "[ECO \"C00\"]", "[ECO \"A00\"]", "")

  /** Deterministic games fact from `events` — one game per event, tracked
    * user `alice` alternating colors, 7 distinct opponents, result /
    * time-control / ECO cycling through the full vocabularies.
    */
  def fixtureFact(s: SparkSession, dir: String): DataFrame = {
    val results = array(ResultVocab.map(lit): _*)
    val tcs     = array(TimeControls.map(lit): _*)
    val pgns    = array(Pgns.map(lit): _*)
    val opp = concat(lit("opp"), pmod(col("user_id"), lit(7L)).cast("string"))
    // spread: the testdata parquet is one row group → one scan task; the
    // per-row derivation (regexps in withDerived) would serialize on it
    graft.operators.Partitioning.spread(Tables.events(s, dir)).select(
      lit("alice").as("username"),
      concat(lit("g"), col("event_id").cast("string")).as("game_url"),
      to_date(col("ts")).as("date_ymd"),
      when(pmod(col("event_id"), lit(2L)) === 0, lit("alice")).otherwise(opp)
        .as("white_username"),
      when(pmod(col("event_id"), lit(2L)) === 0, opp).otherwise(lit("alice"))
        .as("black_username"),
      (lit(1000L) + pmod(col("event_id"), lit(997L))).as("white_rating"),
      when(pmod(col("event_id"), lit(11L)) === 0, lit(null).cast("long"))
        .otherwise(lit(900L) + pmod(col("event_id") * 7, lit(997L)))
        .as("black_rating"),
      element_at(results, (pmod(col("event_id"), lit(8L)) + 1).cast("int"))
        .as("result"),
      element_at(tcs, (pmod(col("event_id"), lit(6L)) + 1).cast("int"))
        .as("time_control"),
      element_at(pgns, (pmod(col("event_id"), lit(4L)) + 1).cast("int"))
        .as("pgn"))
  }

  /** A1–A5 over the full vocabulary: global W/L/D/total/rate, one row. */
  def q49ChessCards(s: SparkSession, dir: String): DataFrame =
    new Dashboard(fixtureFact(s, dir)).cards()

  /** A6 matrix: win rate by time-control bucket × user color. */
  def q50ChessMatrix(s: SparkSession, dir: String): DataFrame =
    new Dashboard(fixtureFact(s, dir)).winRateByBucketAndColor()

  /** A9/A10 + F7: Top-5 opponents by games with wins and win rate. */
  def q51ChessOpponents(s: SparkSession, dir: String): DataFrame =
    new Dashboard(fixtureFact(s, dir)).topOpponents(5)

  /** P13 + A6 (pbix!Layout[v10]): win rate by 200-point opponent rating
    * band — closes the last un-gated derived column
    * ([[GameTransforms.ratingBucket]]; null rating → "unknown").
    */
  def q132OpponentBuckets(s: SparkSession, dir: String): DataFrame =
    new Dashboard(fixtureFact(s, dir)).winRateByOpponentBucket()

  /** A7/A8 + F8 (pbix!Layout[v14]): Top-5 openings by games with per-ECO
    * win rate — the last spec-only measure pair, now driver-gated. The
    * fixture PGNs cycle three ECO headers plus an empty PGN (eco = "").
    */
  def q57ChessOpenings(s: SparkSession, dir: String): DataFrame =
    new Dashboard(fixtureFact(s, dir)).topOpenings(5)

  /** A11 true chess form (pbix!Layout[v6]): trailing 12-day win RATE on a
    * dense daily axis with the DateTable's Y/M/D hierarchy attributes.
    * Int date parts are cast to long on both sides (q16 convention).
    */
  def q58ChessRolling(s: SparkSession, dir: String): DataFrame =
    new Dashboard(fixtureFact(s, dir)).rollingWinRate(s, days = 12)
      .select(col("date"),
              col("year").cast("long").as("year"),
              col("month").cast("long").as("month"),
              col("month_name"),
              col("day").cast("long").as("day"),
              col("games"), col("wins"),
              col("window_games"), col("window_wins"),
              col("rolling_win_rate"))
      .orderBy("date")

  /** P1–P4 end-to-end: landed raw-archive JSON → explode →
    * [[GameTransforms.projectFact]], oracle-gated. The committed fixture
    * (`src/test/resources/raw_archives/`, regenerate only via
    * `scripts/gen_raw_archives.py`) covers every branch of the reference
    * projection (`fetch_and_post.py:114-161`): `[Result]` header wins,
    * last movetext token next (`parse_pgn_result`, `:90-112`), the
    * `"{white} / {black}"` side fallback incl. one-sided (`:139-144`),
    * null/missing `end_time` → null ts/date (typed analog of
    * `:119-129`'s empty string), and missing `white`/`black` sub-objects
    * through the null-coalescing chain (`:150-157`). DuckDB re-derives
    * all 12 deterministic columns from the same JSON via `read_json` —
    * `ingest_time` (wall clock) is dropped, ratings cast to long on both
    * sides. Null-game rows from `explode_outer` (the empty archive) are
    * filtered as the store's empty-batch short-circuit would.
    */
  def q130ProjectFact(s: SparkSession, dir: String): DataFrame = {
    val fixtureDir = Seq("src/test/resources/raw_archives",
                         "/root/repo/src/test/resources/raw_archives")
      .map(new java.io.File(_)).find(_.isDirectory).get.getAbsolutePath
    val landed = ArchiveSource.readLanding(s, fixtureDir)
      .withColumn("archive_url",
        regexp_extract(col("archive_url"), "([^/]+)$", 1))
      .withColumn("username",
        regexp_extract(col("archive_url"), "^([^_]+)_", 1))
      .where(col("game").isNotNull)
    GameTransforms.projectFact(landed)
      .drop("ingest_time")
      .withColumn("white_rating", col("white_rating").cast("long"))
      .withColumn("black_rating", col("black_rating").cast("long"))
      .orderBy("archive_url", "game_url", "pgn")
  }

  // -------------------------------------------------------------- wiring

  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q130_project_fact"   -> (q130ProjectFact _),
    "q49_chess_cards"     -> (q49ChessCards _),
    "q50_chess_matrix"    -> (q50ChessMatrix _),
    "q51_chess_opponents" -> (q51ChessOpponents _),
    "q132_opponent_buckets" -> (q132OpponentBuckets _),
    "q57_chess_openings"  -> (q57ChessOpenings _),
    "q58_chess_rolling"   -> (q58ChessRolling _)
  )

  /** Shared SQL: the fixture fact + derived columns + outcome, mirroring
    * GameTransforms.withDerived and ChessMeasures.outcome exactly.
    */
  private val drvCte = {
    // all three vocabularies are SQL-quoted from the SAME Seqs the Spark
    // fixture uses — fixture/oracle drift is structurally impossible
    // (double quotes inside the ECO headers need no SQL escaping)
    val results = ResultVocab.map("'" + _ + "'").mkString("[", ",", "]")
    val tcs  = TimeControls.map("'" + _ + "'").mkString("[", ",", "]")
    val pgns = Pgns.map("'" + _ + "'").mkString("[", ",", "]")
    s"""fx AS (
       |  SELECT
       |    'alice' AS username,
       |    CAST(ts AS DATE) AS date_ymd,
       |    CASE WHEN event_id % 2 = 0 THEN 'alice'
       |         ELSE 'opp' || (user_id % 7) END AS white_username,
       |    CASE WHEN event_id % 2 = 0 THEN 'opp' || (user_id % 7)
       |         ELSE 'alice' END AS black_username,
       |    1000 + (event_id % 997) AS white_rating,
       |    CASE WHEN event_id % 11 = 0 THEN NULL
       |         ELSE 900 + ((event_id * 7) % 997) END AS black_rating,
       |    $results[(event_id % 8)::INT + 1] AS result,
       |    $tcs[(event_id % 6)::INT + 1] AS time_control,
       |    $pgns[(event_id % 4)::INT + 1] AS pgn
       |  FROM events),
       |drv0 AS (
       |  SELECT *,
       |    CASE WHEN lower(white_username) = lower(username)
       |         THEN 'white' ELSE 'black' END AS user_color
       |  FROM fx),
       |drv AS (
       |  SELECT *,
       |    trim(regexp_extract(pgn, '\\[ECO\\s+"([^"]*)"\\]', 1)) AS eco,
       |    CASE WHEN user_color = 'white' THEN black_username
       |         ELSE white_username END AS opponent_username,
       |    CASE WHEN contains(time_control, '/') THEN 'daily'
       |         WHEN NOT regexp_full_match(
       |             string_split(time_control, '+')[1], '[0-9]+')
       |           THEN 'unknown'
       |         WHEN CAST(string_split(time_control, '+')[1] AS BIGINT) < 180
       |           THEN 'bullet'
       |         WHEN CAST(string_split(time_control, '+')[1] AS BIGINT) < 600
       |           THEN 'blitz'
       |         ELSE 'rapid' END AS time_control_bucket,
       |    CASE WHEN result = '1-0' THEN
       |           CASE WHEN user_color = 'white' THEN 'win' ELSE 'loss' END
       |         WHEN result = '0-1' THEN
       |           CASE WHEN user_color = 'black' THEN 'win' ELSE 'loss' END
       |         WHEN result = '1/2-1/2' THEN 'draw'
       |         WHEN contains(result, ' / ') THEN
       |           CASE WHEN (CASE WHEN user_color = 'white'
       |                      THEN string_split(result, ' / ')[1]
       |                      ELSE string_split(result, ' / ')[2] END) = 'win'
       |                  THEN 'win'
       |                WHEN (CASE WHEN user_color = 'white'
       |                      THEN string_split(result, ' / ')[2]
       |                      ELSE string_split(result, ' / ')[1] END) = 'win'
       |                  THEN 'loss'
       |                WHEN (CASE WHEN user_color = 'white'
       |                      THEN string_split(result, ' / ')[1]
       |                      ELSE string_split(result, ' / ')[2] END) IN
       |                  ('agreed','repetition','stalemate','insufficient',
       |                   '50move','timevsinsufficient')
       |                  THEN 'draw'
       |                ELSE 'unknown' END
       |         ELSE 'unknown' END AS outcome
       |  FROM drv0)""".stripMargin
  }

  def oracleSql: Map[String, String] = Map(
    // q130: DuckDB independently re-derives projectFact's 12 deterministic
    // columns from the SAME committed JSON files (absolute path — the
    // fixture is part of the repo contract). unnest() drops empty/null
    // `games` exactly like the Spark side's null-game filter.
    "q130_project_fact" ->
      """WITH raw AS (
        |  SELECT regexp_extract(filename, '([^/]+)$', 1) AS archive_url,
        |         unnest(games) AS game
        |  FROM read_json('/root/repo/src/test/resources/raw_archives/*.json',
        |    columns={games: 'STRUCT(url VARCHAR, time_control VARCHAR,
        |        end_time BIGINT, pgn VARCHAR,
        |        white STRUCT(username VARCHAR, rating BIGINT, result VARCHAR),
        |        black STRUCT(username VARCHAR, rating BIGINT, result VARCHAR))[]'},
        |    filename=true)),
        |proj0 AS (
        |  SELECT
        |    regexp_extract(archive_url, '^([^_]+)_', 1) AS username,
        |    archive_url,
        |    COALESCE(game.url, '') AS game_url,
        |    COALESCE(game.time_control, '') AS time_control,
        |    make_timestamp(game.end_time * 1000000) AS end_time_utc,
        |    CAST(make_timestamp(game.end_time * 1000000) AS DATE) AS date_ymd,
        |    COALESCE(game.white.username, '') AS white_username,
        |    game.white.rating AS white_rating,
        |    COALESCE(game.black.username, '') AS black_username,
        |    game.black.rating AS black_rating,
        |    COALESCE(game.pgn, '') AS pgn,
        |    COALESCE(game.white.result, '') AS wres,
        |    COALESCE(game.black.result, '') AS bres
        |  FROM raw),
        |proj AS (
        |  SELECT * EXCLUDE (wres, bres),
        |    CASE
        |      WHEN trim(regexp_extract(pgn, '\[Result\s+"([^"]*)"\]', 1)) <> ''
        |        THEN trim(regexp_extract(pgn, '\[Result\s+"([^"]*)"\]', 1))
        |      WHEN len(regexp_extract_all(pgn, '\b(1/2-1/2|1-0|0-1)\b', 1)) > 0
        |        THEN regexp_extract_all(pgn, '\b(1/2-1/2|1-0|0-1)\b', 1)[-1]
        |      WHEN trim(wres) <> '' OR trim(bres) <> ''
        |        THEN wres || ' / ' || bres
        |      ELSE '' END AS result
        |  FROM proj0)
        |SELECT username, archive_url, game_url, time_control, end_time_utc,
        |       date_ymd, white_username, white_rating, black_username,
        |       black_rating, result, pgn
        |FROM proj ORDER BY archive_url, game_url, pgn""".stripMargin,
    "q49_chess_cards" ->
      s"""WITH $drvCte
         |SELECT COUNT(*) AS total_games,
         |  CAST(SUM(CASE WHEN outcome = 'win' THEN 1 ELSE 0 END) AS BIGINT)
         |    AS total_wins,
         |  CAST(SUM(CASE WHEN outcome = 'loss' THEN 1 ELSE 0 END) AS BIGINT)
         |    AS total_losses,
         |  CAST(SUM(CASE WHEN outcome = 'draw' THEN 1 ELSE 0 END) AS BIGINT)
         |    AS total_draws,
         |  CAST(SUM(CASE WHEN outcome = 'win' THEN 1 ELSE 0 END) AS DOUBLE)
         |    / COUNT(*) AS win_rate
         |FROM drv""".stripMargin,
    "q50_chess_matrix" ->
      s"""WITH $drvCte
         |SELECT time_control_bucket, user_color,
         |  COUNT(*) AS games_count,
         |  CAST(SUM(CASE WHEN outcome = 'win' THEN 1 ELSE 0 END) AS BIGINT)
         |    AS total_wins,
         |  CAST(SUM(CASE WHEN outcome = 'win' THEN 1 ELSE 0 END) AS DOUBLE)
         |    / COUNT(*) AS win_rate
         |FROM drv GROUP BY 1, 2
         |ORDER BY win_rate DESC, time_control_bucket, user_color""".stripMargin,
    "q51_chess_opponents" ->
      s"""WITH $drvCte,
         |top AS (
         |  SELECT opponent_username, COUNT(*) AS n FROM drv GROUP BY 1
         |  ORDER BY n DESC, opponent_username ASC LIMIT 5)
         |SELECT d.opponent_username,
         |  COUNT(*) AS games_count,
         |  CAST(SUM(CASE WHEN outcome = 'win' THEN 1 ELSE 0 END) AS BIGINT)
         |    AS wins,
         |  CAST(SUM(CASE WHEN outcome = 'win' THEN 1 ELSE 0 END) AS DOUBLE)
         |    / COUNT(*) AS win_rate
         |FROM drv d JOIN top USING (opponent_username)
         |GROUP BY 1 ORDER BY games_count DESC, opponent_username""".stripMargin,
    "q132_opponent_buckets" ->
      s"""WITH $drvCte,
         |opp AS (
         |  SELECT outcome,
         |    CASE WHEN user_color = 'white' THEN black_rating
         |         ELSE white_rating END AS orat
         |  FROM drv),
         |b AS (
         |  SELECT outcome,
         |    CASE WHEN orat IS NULL THEN 'unknown'
         |         ELSE CAST(CAST(floor(orat / 200) * 200 AS INT) AS VARCHAR)
         |              || '-' ||
         |              CAST(CAST(floor(orat / 200) * 200 + 199 AS INT)
         |                   AS VARCHAR)
         |         END AS opponent_rating_bucket
         |  FROM opp)
         |SELECT opponent_rating_bucket,
         |  COUNT(*) AS games_count,
         |  CAST(SUM(CASE WHEN outcome = 'win' THEN 1 ELSE 0 END) AS BIGINT)
         |    AS total_wins,
         |  CAST(SUM(CASE WHEN outcome = 'win' THEN 1 ELSE 0 END) AS DOUBLE)
         |    / COUNT(*) AS win_rate
         |FROM b GROUP BY 1
         |ORDER BY win_rate DESC, opponent_rating_bucket""".stripMargin,
    "q57_chess_openings" ->
      s"""WITH $drvCte,
         |top AS (
         |  SELECT eco, COUNT(*) AS n FROM drv GROUP BY 1
         |  ORDER BY n DESC, eco ASC LIMIT 5)
         |SELECT d.eco,
         |  COUNT(*) AS games_count,
         |  CAST(SUM(CASE WHEN outcome = 'win' THEN 1 ELSE 0 END) AS DOUBLE)
         |    / COUNT(*) AS win_rate
         |FROM drv d JOIN top USING (eco)
         |GROUP BY 1 ORDER BY win_rate DESC, eco""".stripMargin,
    "q58_chess_rolling" ->
      s"""WITH $drvCte,
         |daily AS (
         |  SELECT date_ymd AS date, COUNT(*) AS games,
         |    CAST(SUM(CASE WHEN outcome = 'win' THEN 1 ELSE 0 END) AS BIGINT)
         |      AS wins
         |  FROM drv GROUP BY 1),
         |dim AS (
         |  SELECT unnest(generate_series(
         |    (SELECT MIN(date) FROM daily),
         |    (SELECT MAX(date) FROM daily), INTERVAL 1 DAY))::DATE AS date),
         |dense AS (
         |  SELECT dim.date,
         |    CAST(year(dim.date) AS BIGINT) AS year,
         |    CAST(month(dim.date) AS BIGINT) AS month,
         |    monthname(dim.date) AS month_name,
         |    CAST(day(dim.date) AS BIGINT) AS day,
         |    CAST(COALESCE(daily.games, 0) AS BIGINT) AS games,
         |    CAST(COALESCE(daily.wins, 0) AS BIGINT) AS wins
         |  FROM dim LEFT JOIN daily USING (date))
         |SELECT date, year, month, month_name, day, games, wins,
         |  CAST(SUM(games) OVER w AS BIGINT) AS window_games,
         |  CAST(SUM(wins) OVER w AS BIGINT) AS window_wins,
         |  CAST(SUM(wins) OVER w AS DOUBLE)
         |    / NULLIF(SUM(games) OVER w, 0) AS rolling_win_rate
         |FROM dense
         |WINDOW w AS (ORDER BY date
         |  RANGE BETWEEN INTERVAL 11 DAYS PRECEDING AND CURRENT ROW)
         |ORDER BY date""".stripMargin
  )
}
