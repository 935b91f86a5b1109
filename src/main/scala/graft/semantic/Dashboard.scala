package graft.semantic

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.etl.GameTransforms

/** The reference dashboard's visual queries (SURVEY.md §2.6, pbix Layout
  * v5–v14), compiled to DataFrame plans over the derived games fact.
  * Every query takes a [[FilterContext]] — the page's active slicers —
  * reproducing the BI cross-filter semantics (each visual's aggregate is
  * evaluated under the conjunction of all active filters).
  */
final class Dashboard(gamesFact: DataFrame) {

  /** Derived fact shared by all visuals. */
  val fact: DataFrame = GameTransforms.withDerived(gamesFact)
  private val model = new SemanticModel(fact)
  import ChessMeasures._

  /** v5/v11 KPI cards + donut: global W/L/D/total/rate (one row). */
  def cards(ctx: FilterContext = FilterContext.empty): DataFrame =
    model.query(Nil, Seq(totalGames, totalWins, totalLosses, totalDraws, winRate), ctx)

  /** v7: opponents pivot — Top-10 opponents by games played, with games
    * and wins per opponent (F7 Top-N subquery filter shape).
    */
  def topOpponents(n: Int = 10,
                   ctx: FilterContext = FilterContext.empty): DataFrame =
    model.topNQuery(col("opponent_username"), "opponent_username", n,
      gamesCount, Seq(gamesCount, winsVsOpponent, winRate), ctx)
      .orderBy(col("games_count").desc, col("opponent_username").asc)

  /** v12: win rate by time-control bucket × color (A6 matrix). */
  def winRateByBucketAndColor(ctx: FilterContext = FilterContext.empty): DataFrame =
    model.query(Seq(col("time_control_bucket"), col("user_color")),
                Seq(gamesCount, totalWins, winRate), ctx)
      .orderBy(col("win_rate").desc, col("time_control_bucket").asc,
               col("user_color").asc)

  /** v10: win rate by opponent rating band (P13's 200-point buckets,
    * `pbix!Layout[v10]` slicer) — games/wins/rate per band.
    */
  def winRateByOpponentBucket(ctx: FilterContext = FilterContext.empty): DataFrame =
    model.query(Seq(col("opponent_rating_bucket")),
                Seq(gamesCount, totalWins, winRate), ctx)
      .orderBy(col("win_rate").desc, col("opponent_rating_bucket").asc)

  /** v14: Top-5 openings by games, with per-ECO win rate (A7/A8 + F8). */
  def topOpenings(n: Int = 5,
                  ctx: FilterContext = FilterContext.empty): DataFrame =
    model.topNQuery(col("eco"), "eco", n, gamesCount,
      Seq(gamesCount, winRate), ctx)
      .orderBy(col("win_rate").desc, col("eco").asc)

  /** v6: A11 `Rolling12Days_WinRate` — trailing 12-day win rate on a daily
    * axis. Aggregates to day grain first, scaffold-joins the generated
    * DateTable so zero-game days exist in the frame (a row-frame window
    * over sparse dates would silently widen the window — SURVEY.md §7.4),
    * then a range frame over epoch-days. The visual plots the measure on
    * `DateTable.Date Hierarchy.{Year,Month,Day}` (pbix!Layout[v6]), so the
    * dim's year/month/month_name/day attributes ride along in the output —
    * consumers drill the hierarchy without re-deriving date parts.
    */
  def rollingWinRate(spark: SparkSession, days: Int = 12,
                     ctx: FilterContext = FilterContext.empty): DataFrame = {
    val filtered = ctx(fact)
    val daily = filtered
      .groupBy(col("date_ymd").as("date"))
      .agg(count(lit(1)).as("games"), sum(winExpr).as("wins"))
    Dashboard.rollingFromDaily(spark, daily, days)
  }
}

object Dashboard {

  /** The rolling visual's tail from a DAY-GRAIN aggregate
    * `daily(date, games, wins)`: scaffold-join the spanning DateTable
    * (zero-game days must exist in the frame), trailing range window,
    * null-safe rate. Factored out of [[Dashboard.rollingWinRate]] so
    * the STREAMING dashboard (whose daily grain is maintained
    * incrementally, [[graft.streaming.StreamingDashboard]]) runs the
    * IDENTICAL plan over its state — one definition, no batch/stream
    * drift. The scaffold spans `daily`'s min→max date, which equals
    * the fact's span (groupBy preserves the distinct date set).
    */
  private[graft] def rollingFromDaily(spark: SparkSession, daily: DataFrame,
                                      days: Int): DataFrame = {
    val scaffold = DateDim.spanning(spark, daily, "date")
    val dense = scaffold.join(daily, Seq("date"), "left")
      .select(col("date"), col("year"), col("month"), col("month_name"),
              col("day"),
              coalesce(col("games"), lit(0L)).as("games"),
              coalesce(col("wins"), lit(0L)).as("wins"))
    val w = Window
      .orderBy(datediff(col("date"), lit("1970-01-01")))
      .rangeBetween(-(days - 1), 0)
    dense
      .withColumn("window_games", sum(col("games")).over(w))
      .withColumn("window_wins", sum(col("wins")).over(w))
      .withColumn("rolling_win_rate",
        col("window_wins").cast("double") / nullif(col("window_games"), lit(0L)))
      .orderBy("date")
  }
}
