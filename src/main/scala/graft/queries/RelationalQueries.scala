package graft.queries

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType

import graft.Tables

/** Relational operator pack over the TPC-H-ish testdata.
  *
  * Each query exercises one operator family from SURVEY.md §2 and has a
  * DuckDB-equivalent oracle in [[oracleSql]]. Numeric outputs are computed
  * with decimal-exact aggregation then cast to double so the Spark result
  * and the DuckDB oracle are bit-identical regardless of the order in which
  * partial aggregates combine (double summation is order-dependent; decimal
  * summation is not).
  *
  * Scale notes (100 TB design intent):
  *  - aggregations are plain groupBy → partial + final HashAggregate with
  *    map-side combine; no driver-side collection anywhere.
  *  - joins against `nation`/`region`/`customer`-sized dims are explicit
  *    `broadcast()`; the fact side never shuffles for those joins.
  *  - Top-N is computed as agg → orderBy → limit (Spark plans TakeOrdered,
  *    O(N) per partition), then joined back left-semi — the same shape the
  *    reference's BI layer encodes (SURVEY.md §2.4 F7/F8).
  */
object RelationalQueries {

  /** Decimal-exact sum emitted as double (order-independent). */
  private def dsum(c: Column, scale: Int = 2): Column =
    sum(c.cast(DecimalType(18, scale))).cast("double")

  // ---------------------------------------------------------------- queries

  /** A1/A6-shape aggregation: multi-measure groupBy (SURVEY §2.6). */
  def q1Agg(s: SparkSession, dir: String): DataFrame = {
    Tables.lineitem(s, dir)
      .groupBy(col("l_returnflag"), col("l_linestatus"))
      .agg(
        dsum(col("l_quantity")).as("sum_qty"),
        dsum(col("l_extendedprice")).as("sum_base_price"),
        dsum(col("l_extendedprice") * (lit(1) - col("l_discount")), 6)
          .as("sum_disc_price"),
        count(lit(1)).as("count_order"))
      .orderBy("l_returnflag", "l_linestatus")
  }

  // ---------------------------------------------------------------- wiring

  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q1_agg" -> (q1Agg _)
  )

  def oracleSql: Map[String, String] = Map(
    "q1_agg" ->
      """SELECT l_returnflag, l_linestatus,
        |  CAST(SUM(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS sum_qty,
        |  CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE) AS sum_base_price,
        |  CAST(SUM(CAST(l_extendedprice * (1 - l_discount) AS DECIMAL(18,6))) AS DOUBLE) AS sum_disc_price,
        |  COUNT(*) AS count_order
        |FROM lineitem
        |GROUP BY l_returnflag, l_linestatus
        |ORDER BY l_returnflag, l_linestatus""".stripMargin
  )
}
