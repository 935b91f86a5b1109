package graft.streaming

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._

import graft.SparkSpec
import graft.operators.TemporalOps

/** Contracts of [[StreamingEnrich.enrichScd2]]: each streamed event
  * enriches with the dimension version valid AT ITS EVENT TIME (not the
  * current one), across micro-batches; pre-history and unknown keys
  * pass through null; and the streaming result matches the identical
  * join run as a batch (the stream↔batch parity gate every streaming
  * operator here carries).
  */
case class EnrichEv(event_id: Long, user: Long, ts_us: Long)

class StreamingEnrichSpec extends SparkSpec {
  import spark.implicits._

  private type Ev = EnrichEv
  private val Ev = EnrichEv

  // change log → SCD2 dim: user 1 is "bronze" [100, 500), "gold"
  // [500, ∞); user 2 is "silver" [200, ∞)
  private def dim() = TemporalOps.scd2(
    Seq((1L, "bronze", 100L), (1L, "gold", 500L), (2L, "silver", 200L))
      .toDF("user", "tier", "ts")
      .withColumn("tie", col("ts"))
      .withColumn("ts", timestamp_micros(col("ts"))),
    keyCol = "user", attrCol = "tier", tsCol = "ts", tieCol = "tie")

  test("events enrich with the version valid at event time, across " +
       "micro-batches; pre-history and unknown keys get null") {
    implicit val sqlCtx = spark.sqlContext
    val em = MemoryStream[Ev]
    val out = StreamingEnrich.enrichScd2(
      em.toDF(), "ts_us", "user", dim(), "user", "tier")
    val q = out.writeStream.format("memory").queryName("enr")
      .outputMode("append").start()
    try {
      em.addData(Ev(10L, 1L, 150L),  // bronze era
                 Ev(11L, 1L, 500L))  // boundary: gold from 500 inclusive
      q.processAllAvailable()
      em.addData(Ev(12L, 1L, 499L),  // a LATE event: still bronze
                 Ev(13L, 1L, 9000L), // current era
                 Ev(14L, 1L, 50L),   // before any version
                 Ev(15L, 2L, 300L),
                 Ev(16L, 7L, 300L))  // unknown key
      q.processAllAvailable()
      val got = spark.table("enr")
        .select(col("event_id"), col("tier"))
        .as[(Long, Option[String])].collect().toMap
      assert(got === Map(
        10L -> Some("bronze"), 11L -> Some("gold"),
        12L -> Some("bronze"), 13L -> Some("gold"),
        14L -> None, 15L -> Some("silver"), 16L -> None))
    } finally q.stop()
  }

  test("stream result equals the identical batch join (parity gate)") {
    implicit val sqlCtx = spark.sqlContext
    val evs = (0L until 40L).map(i => Ev(i, i % 3 + 1, i * 37 % 1200))
    val em = MemoryStream[Ev]
    val out = StreamingEnrich.enrichScd2(
      em.toDF(), "ts_us", "user", dim(), "user", "tier")
    val q = out.writeStream.format("memory").queryName("enrp")
      .outputMode("append").start()
    try {
      val (a, b) = evs.splitAt(17)
      em.addData(a: _*); q.processAllAvailable()
      em.addData(b: _*); q.processAllAvailable()
      val streamed = spark.table("enrp")
        .as[(Long, Long, Long, Option[String])].collect().toSet
      val batch = StreamingEnrich.enrichScd2(
          evs.toDF(), "ts_us", "user", dim(), "user", "tier")
        .as[(Long, Long, Long, Option[String])].collect().toSet
      assert(streamed === batch)
    } finally q.stop()
  }
}
