package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType

import graft.Tables
import graft.semantic.{FilterContext, Measure, SemanticModel}

/** The semantic layer (measure registry + filter context + Top-N, SURVEY.md
  * §3.3) exercised through the driver gate by treating `orders` as the fact
  * table: measures evaluate under a slicer-filter conjunction exactly like
  * the BI model's cross-filter semantics.
  */
object SemanticQueries {

  private def model(s: SparkSession, dir: String) =
    new SemanticModel(Tables.orders(s, dir))

  private val measures = Seq(
    Measure("total_orders", count(lit(1))),
    Measure("finished", sum(when(col("o_orderstatus") === "F", 1L).otherwise(0L))),
    Measure("finish_rate",
      sum(when(col("o_orderstatus") === "F", 1L).otherwise(0L)).cast("double") /
        nullif(count(lit(1)), lit(0L))),
    Measure("revenue",
      sum(col("o_totalprice").cast(DecimalType(18, 2))).cast("double")))

  /** KPI-cards shape: global measures under a date-range + categorical
    * filter context (F5+F6 conjunction, zero dims).
    */
  def q17SemanticCards(s: SparkSession, dir: String): DataFrame = {
    val ctx = FilterContext.empty
      .dateBetween(to_date(col("o_orderdate")), "1996-01-01", "1997-12-31")
      .in(col("o_orderpriority"), Seq("1-URGENT", "2-HIGH"))
    model(s, dir).query(Nil, measures, ctx)
  }

  /** Grouped-measures shape: same measures by priority under the same
    * context (the matrix visual pattern).
    */
  def q18SemanticMatrix(s: SparkSession, dir: String): DataFrame = {
    val ctx = FilterContext.empty
      .dateBetween(to_date(col("o_orderdate")), "1996-01-01", "1997-12-31")
    model(s, dir)
      .query(Seq(col("o_orderpriority")), measures, ctx)
      .orderBy("o_orderpriority")
  }

  /** Top-N-by-measure shape: top-5 customers by order count within the
    * filter context, ranked measure respecting the same filters (F7).
    */
  def q19SemanticTopN(s: SparkSession, dir: String): DataFrame = {
    val ctx = FilterContext.empty
      .dateBetween(to_date(col("o_orderdate")), "1996-01-01", "1997-12-31")
    model(s, dir)
      .topNQuery(col("o_custkey"), "o_custkey", 5,
        Measure("total_orders", count(lit(1))), measures, ctx)
      .orderBy("o_custkey")
  }

  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q17_semantic_cards"  -> (q17SemanticCards _),
    "q18_semantic_matrix" -> (q18SemanticMatrix _),
    "q19_semantic_topn"   -> (q19SemanticTopN _)
  )

  private val measureSql =
    """COUNT(*) AS total_orders,
      |  CAST(SUM(CASE WHEN o_orderstatus = 'F' THEN 1 ELSE 0 END) AS BIGINT) AS finished,
      |  CAST(SUM(CASE WHEN o_orderstatus = 'F' THEN 1 ELSE 0 END) AS DOUBLE)
      |    / COUNT(*) AS finish_rate,
      |  CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS revenue""".stripMargin

  def oracleSql: Map[String, String] = Map(
    "q17_semantic_cards" ->
      s"""SELECT $measureSql
         |FROM orders
         |WHERE CAST(o_orderdate AS DATE) BETWEEN DATE '1996-01-01' AND DATE '1997-12-31'
         |  AND o_orderpriority IN ('1-URGENT', '2-HIGH')""".stripMargin,
    "q18_semantic_matrix" ->
      s"""SELECT o_orderpriority, $measureSql
         |FROM orders
         |WHERE CAST(o_orderdate AS DATE) BETWEEN DATE '1996-01-01' AND DATE '1997-12-31'
         |GROUP BY o_orderpriority ORDER BY o_orderpriority""".stripMargin,
    "q19_semantic_topn" ->
      s"""WITH filtered AS (
         |  SELECT * FROM orders
         |  WHERE CAST(o_orderdate AS DATE) BETWEEN DATE '1996-01-01' AND DATE '1997-12-31'),
         |top5 AS (
         |  SELECT o_custkey FROM filtered GROUP BY o_custkey
         |  ORDER BY COUNT(*) DESC, o_custkey ASC LIMIT 5)
         |SELECT o_custkey, $measureSql
         |FROM filtered WHERE o_custkey IN (SELECT o_custkey FROM top5)
         |GROUP BY o_custkey ORDER BY o_custkey""".stripMargin
  )
}
