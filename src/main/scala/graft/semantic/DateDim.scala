package graft.semantic

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Generated date dimension (the reference model's auto `DateTable` with
  * its Year/Month/Day hierarchy — SURVEY.md §1.1). Produced with
  * `sequence()` + explode, so it is a pure in-plan relation: no files, and
  * small enough that joins against it always broadcast.
  */
object DateDim {

  def range(spark: SparkSession, from: String, to: String): DataFrame =
    spark.range(1).select(
        explode(sequence(to_date(lit(from)), to_date(lit(to)),
                         expr("interval 1 day"))).as("date"))
      .withColumn("year", year(col("date")))
      .withColumn("month", month(col("date")))
      .withColumn("month_name", date_format(col("date"), "MMMM"))
      .withColumn("day", dayofmonth(col("date")))

  /** Date dim spanning the fact's min→max date (two-row aggregate on the
    * fact, then the generated dim). An empty fact (or a filter context
    * matching no rows) yields null min/max → an EMPTY dim with the same
    * schema, so downstream scaffold joins produce empty frames instead of
    * crashing.
    */
  def spanning(spark: SparkSession, fact: DataFrame, dateCol: String): DataFrame = {
    val row = fact.agg(min(col(dateCol)).as("lo"), max(col(dateCol)).as("hi"))
      .collect()(0)
    if (row.isNullAt(0) || row.isNullAt(1))
      range(spark, "1970-01-01", "1970-01-01").limit(0)
    else
      range(spark, row.get(0).toString, row.get(1).toString)
  }
}
