package graft.functions

import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.SparkSpec

/** Contracts of [[TopKByValue]]: parity with the window-rank formulation
  * across many partitions (exercising map-side partial merges), the k
  * state bound, tie determinism, and k validation.
  */
class TopKAggSpec extends SparkSpec {
  import spark.implicits._

  test("agrees with row_number window on random data across partitions") {
    val rng = new scala.util.Random(3)
    val rows = (1L to 5000L).map(i =>
      (i % 37, rng.nextInt(100).toDouble / 4, i)) // dense ties
    val df = rows.toDF("g", "v", "id").repartition(16) // force merges
    val viaAgg = df.groupBy(col("g"))
      .agg(TopKAgg.topKByValue(5)(col("v"), col("id")).as("top"))
      .select(col("g"), posexplode(col("top")))
      .select(col("g"), (col("pos") + 1).as("rk"),
              col("col._1").as("v"), col("col._2").as("id"))
      .collect().map(r => (r.getLong(0), r.getInt(1).toLong,
                           r.getDouble(2), r.getLong(3)))
      .sortBy(t => (t._1, t._2))
    val w = Window.partitionBy(col("g"))
      .orderBy(col("v").desc, col("id"))
    val viaWindow = df.withColumn("rk", row_number().over(w))
      .filter(col("rk") <= 5)
      .select(col("g"), col("rk").cast("long"), col("v"), col("id"))
      .collect().map(r => (r.getLong(0), r.getLong(1),
                           r.getDouble(2), r.getLong(3)))
      .sortBy(t => (t._1, t._2))
    assert(viaAgg.toSeq === viaWindow.toSeq)
  }

  test("groups smaller than k return all rows; state never exceeds k") {
    val df = Seq((1L, 9.0, 1L), (1L, 8.0, 2L),
                 (2L, 1.0, 3L)).toDF("g", "v", "id")
    val got = df.groupBy(col("g"))
      .agg(TopKAgg.topKByValue(4)(col("v"), col("id")).as("top"))
      .select(col("g"), size(col("top")).as("n"))
      .collect().map(r => r.getLong(0) -> r.getInt(1)).toMap
    assert(got === Map(1L -> 2, 2L -> 1))
  }

  test("k must be positive") {
    intercept[IllegalArgumentException] { TopKByValue(0) }
  }
}
