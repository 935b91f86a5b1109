package graft.semantic

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** The 11-measure chess semantic layer (SURVEY.md §2.6 A1–A11).
  *
  * Measure names attested in the reference's report layout; bodies inferred
  * from name + schema (the model blob is compressed — SURVEY.md §0 note).
  * Operates on the derived fact (GameTransforms.withDerived): requires
  * `result`, `user_color`, and the derived dimension columns.
  */
object ChessMeasures {

  /** Draw vocabulary of the side-result fallback domain (chess.com result
    * codes that end a game drawn).
    */
  val DrawCodes: Seq[String] = Seq(
    "agreed", "repetition", "stalemate", "insufficient",
    "50move", "timevsinsufficient")

  /** Outcome classification for the tracked user: win/loss/draw/unknown.
    *
    * Handles BOTH the canonical domain (`1-0`, `0-1`, `1/2-1/2`) and the
    * reference's non-canonical fallback `"{white} / {black}"` (e.g.
    * `"win / checkmated"`) — SURVEY.md §7.4 "Result-string semantics".
    */
  def outcome(result: Column, userColor: Column): Column = {
    val mySide = when(userColor === "white",
      element_at(split(result, " / "), 1))
      .otherwise(element_at(split(result, " / "), 2))
    val otherSide = when(userColor === "white",
      element_at(split(result, " / "), 2))
      .otherwise(element_at(split(result, " / "), 1))
    when(result === "1-0", when(userColor === "white", "win").otherwise("loss"))
      .when(result === "0-1", when(userColor === "black", "win").otherwise("loss"))
      .when(result === "1/2-1/2", "draw")
      .when(result.contains(" / "),
        when(mySide === "win", "win")
          .when(otherSide === "win", "loss")
          .when(mySide.isin(DrawCodes: _*), "draw")
          .otherwise("unknown"))
      .otherwise("unknown")
  }

  private def o: Column = outcome(col("result"), col("user_color"))

  def winExpr: Column  = (o === "win").cast("long")
  def lossExpr: Column = (o === "loss").cast("long")
  def drawExpr: Column = (o === "draw").cast("long")

  // --------------------------------------------------- the 11 measures

  /** A1 `TotalGames` */
  val totalGames: Measure = Measure("total_games", count(lit(1)))
  /** A2 `Total Wins` */
  val totalWins: Measure = Measure("total_wins", sum(winExpr))
  /** A3 `Total Losses` */
  val totalLosses: Measure = Measure("total_losses", sum(lossExpr))
  /** A4 `Total Draws` */
  val totalDraws: Measure = Measure("total_draws", sum(drawExpr))
  /** A5/A6 `Win%` / `WinRate` — null-safe divide; evaluates correctly in
    * any group context because it's a pure aggregate expression.
    */
  val winRate: Measure = Measure("win_rate",
    sum(winExpr).cast("double") / nullif(count(lit(1)), lit(0)))
  /** A8/A9 `Games_Count` / `Games_vs_Opponent` (same body, group differs) */
  val gamesCount: Measure = Measure("games_count", count(lit(1)))
  /** A10 `Wins_vs_Opponent` */
  val winsVsOpponent: Measure = Measure("wins", sum(winExpr))

  val all: Seq[Measure] =
    Seq(totalGames, totalWins, totalLosses, totalDraws, winRate)
}
