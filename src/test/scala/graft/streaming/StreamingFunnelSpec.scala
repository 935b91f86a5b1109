package graft.streaming

import java.sql.Timestamp

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream

import graft.SparkSpec
import graft.streaming.StreamingFunnel.{FunnelEvent, Progress}

/** Contracts of [[StreamingFunnel.track]]: stage advances emit the
  * micro-batch they happen, conversion windows gate advances, order
  * matters, and parity with the batch [[graft.operators.Funnel]] on the
  * same event set.
  */
class StreamingFunnelSpec extends SparkSpec {
  import spark.implicits._

  private val stages = Seq("view", "click", "purchase")
  private def t(s: String) = Timestamp.valueOf(s)

  test("advances emit incrementally; windows and order gate them") {
    implicit val sqlCtx = spark.sqlContext
    val mem = MemoryStream[FunnelEvent]
    val q = StreamingFunnel.track(mem.toDS(), stages,
        windowMs = 60 * 60 * 1000, watermarkDelay = "10 seconds")
      .writeStream.format("memory").queryName("funnel")
      .outputMode("append").start()
    try {
      def got: Seq[(Long, Int, Timestamp)] =
        spark.table("funnel").as[Progress].collect()
          .map(p => (p.user_id, p.stage, p.at)).sortBy(x => (x._1, x._2))

      // batch 1: user 1 views then clicks (within 1h); user 2 clicks
      // FIRST (no view yet — must not advance)
      mem.addData(
        FunnelEvent(1L, t("2024-01-01 00:00:00"), "view"),
        FunnelEvent(1L, t("2024-01-01 00:30:00"), "click"),
        FunnelEvent(2L, t("2024-01-01 00:00:00"), "click"))
      q.processAllAvailable()
      assert(got === Seq(
        (1L, 1, t("2024-01-01 00:00:00")),
        (1L, 2, t("2024-01-01 00:30:00"))))

      // batch 2: user 1 purchases within 1h of the click → stage 3;
      // user 2 finally views → stage 1 only (the earlier click is gone)
      mem.addData(
        FunnelEvent(1L, t("2024-01-01 01:00:00"), "purchase"),
        FunnelEvent(2L, t("2024-01-01 01:00:00"), "view"),
        FunnelEvent(2L, t("2024-01-01 02:30:00"), "click")) // window shut
      q.processAllAvailable()
      assert(got === Seq(
        (1L, 1, t("2024-01-01 00:00:00")),
        (1L, 2, t("2024-01-01 00:30:00")),
        (1L, 3, t("2024-01-01 01:00:00")),
        (2L, 1, t("2024-01-01 01:00:00"))))
    } finally q.stop()
  }

  test("streaming depths match the batch Funnel on ordered arrivals") {
    implicit val sqlCtx = spark.sqlContext
    val rng = new scala.util.Random(9)
    val types = Seq("view", "click", "purchase", "other")
    val events = for {
      u <- 1L to 25L
      i <- 0 until 12
    } yield FunnelEvent(u,
      new Timestamp(1700000000000L + i * 600000L + (u % 7) * 1000),
      types(rng.nextInt(types.size)))

    val mem = MemoryStream[FunnelEvent]
    val q = StreamingFunnel.track(mem.toDS(), stages,
        windowMs = 30 * 60 * 1000, watermarkDelay = "1 second")
      .writeStream.format("memory").queryName("funnel_parity")
      .outputMode("append").start()
    try {
      mem.addData(events: _*)
      q.processAllAvailable()
      val streamDepth = spark.table("funnel_parity").as[Progress]
        .collect().groupBy(_.user_id).view.mapValues(_.map(_.stage).max)
        .toMap

      val batch = graft.operators.Funnel.depths(
          events.toDF()
            .selectExpr("user_id", "unix_micros(ts) AS us",
              "monotonically_increasing_id() AS eid", "event_type"),
          "user_id", "us", "event_type", "eid", stages,
          windowUs = 30L * 60 * 1000 * 1000)
        .collect().map(r => r.getLong(0) -> r.getLong(1).toInt)
        .filter(_._2 > 0).toMap
      assert(streamDepth === batch)
    } finally q.stop()
  }
}
