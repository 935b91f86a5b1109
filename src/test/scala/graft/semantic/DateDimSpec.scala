package graft.semantic

import java.sql.Date

import org.apache.spark.sql.functions._

import graft.SparkSpec

class DateDimSpec extends SparkSpec {
  import spark.implicits._

  test("range generates inclusive day rows with hierarchy columns") {
    val dim = DateDim.range(spark, "2024-02-27", "2024-03-02")
    assert(dim.count() === 5) // leap year: Feb 29 exists
    val row = dim.filter(col("date") === lit("2024-02-29")).collect()(0)
    assert(row.getAs[Int]("year") === 2024)
    assert(row.getAs[Int]("month") === 2)
    assert(row.getAs[String]("month_name") === "February")
    assert(row.getAs[Int]("day") === 29)
  }

  test("spanning covers the fact's min..max dates") {
    val fact = Seq(Date.valueOf("2024-01-03"), Date.valueOf("2024-01-07"))
      .toDF("d")
    val dim = DateDim.spanning(spark, fact, "d")
    assert(dim.count() === 5)
  }

  test("spanning on an empty fact returns an EMPTY dim, not an NPE") {
    val empty = Seq.empty[Date].toDF("d")
    val dim = DateDim.spanning(spark, empty, "d")
    assert(dim.count() === 0)
    assert(dim.columns.toSeq ===
      Seq("date", "year", "month", "month_name", "day"))
  }
}
