package graft.operators

import java.nio.file.Files

import org.apache.spark.sql.functions._

import graft.SparkSpec

/** Bucketed join must plan with NO Exchange on either side — the
  * pay-the-shuffle-once-at-write-time contract.
  */
class BucketingSpec extends SparkSpec {

  test("bucketed equi-join has no Exchange; unbucketed join does") {
    val tmp = Files.createTempDirectory("graft-buckets").toString
    // force the shuffle-family join path: at this fixture scale Spark
    // would otherwise broadcast and never exercise bucket co-location
    val prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    val prevA = spark.conf.getOption("spark.sql.adaptive.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    spark.conf.set("spark.sql.adaptive.autoBroadcastJoinThreshold", "-1")
    try {
    val orders = spark.read.parquet(s"$sf/orders.parquet")
      .select("o_orderkey", "o_custkey", "o_totalprice")
    val lineitem = spark.read.parquet(s"$sf/lineitem.parquet")
      .select("l_orderkey", "l_quantity")
      .withColumnRenamed("l_orderkey", "o_orderkey")

    Bucketing.writeBucketed(orders, "orders_b", "o_orderkey", 4,
      Some(s"$tmp/orders_b"))
    Bucketing.writeBucketed(lineitem, "lineitem_b", "o_orderkey", 4,
      Some(s"$tmp/lineitem_b"))

    val joined = spark.table("orders_b")
      .join(spark.table("lineitem_b"), "o_orderkey")
      .groupBy("o_custkey").agg(sum(col("l_quantity")).as("q"))
    joined.collect()
    val plan = joined.queryExecution.executedPlan.toString
    // the join itself must read co-located buckets: the only exchange
    // allowed is the one AFTER the join for the groupBy on o_custkey
    val joinPart = plan.split("SortMergeJoin|ShuffledHashJoin")
    assert(joinPart.length >= 2, s"expected a shuffle-family join:\n$plan")
    assert(!joinPart.last.contains("Exchange"),
      s"bucketed join inputs must not re-shuffle:\n$plan")

    // control: the same join over raw (unbucketed) parquet shuffles both
    val raw = orders.join(lineitem, "o_orderkey")
      .groupBy("o_custkey").agg(sum(col("l_quantity")).as("q"))
    raw.collect()
    val rawJoinInputs = raw.queryExecution.executedPlan.toString
      .split("SortMergeJoin|ShuffledHashJoin").last
    assert(rawJoinInputs.contains("Exchange"),
      "unbucketed control must shuffle its join inputs")

    // results identical either way
    assert(joined.orderBy("o_custkey").collect()
      === raw.orderBy("o_custkey").collect())
    } finally {
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)
      prevA match {
        case Some(v) =>
          spark.conf.set("spark.sql.adaptive.autoBroadcastJoinThreshold", v)
        case None =>
          spark.conf.unset("spark.sql.adaptive.autoBroadcastJoinThreshold")
      }
      spark.sql("DROP TABLE IF EXISTS orders_b")
      spark.sql("DROP TABLE IF EXISTS lineitem_b")
    }
  }
}
