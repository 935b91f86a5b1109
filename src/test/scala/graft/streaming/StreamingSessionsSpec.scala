package graft.streaming

import java.sql.Timestamp

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream

import graft.SparkSpec
import graft.streaming.StreamingSessions.{ClosedSession, SessionEvent}

class StreamingSessionsSpec extends SparkSpec {
  import spark.implicits._

  private def t(s: String) = Timestamp.valueOf(s)

  test("sessions close on in-stream gaps and on watermark timeout") {
    implicit val sqlCtx = spark.sqlContext
    val mem = MemoryStream[SessionEvent]
    val out = StreamingSessions.sessionize(
      mem.toDS(), gapMs = 30 * 60 * 1000, watermarkDelay = "1 second")
    val q = out.writeStream.format("memory").queryName("sessions")
      .outputMode("append").start()

    // batch 1: one session forming for user 1 (10m gap < 30m)
    mem.addData(
      SessionEvent(1L, t("2024-01-01 00:00:00")),
      SessionEvent(1L, t("2024-01-01 00:10:00")))
    q.processAllAvailable()
    assert(spark.table("sessions").count() === 0, "session still open")

    // batch 2: a 2h-later event closes the first session by gap and opens
    // a second one
    mem.addData(SessionEvent(1L, t("2024-01-01 02:00:00")))
    q.processAllAvailable()
    val afterGap = spark.table("sessions").as[ClosedSession].collect()
    assert(afterGap.length === 1)
    assert(afterGap(0).n_events === 2)
    assert(afterGap(0).start_ts === t("2024-01-01 00:00:00"))
    assert(afterGap(0).end_ts === t("2024-01-01 00:10:00"))

    // batch 3: another key's much-later event advances the watermark past
    // 02:00 + 30m, timing out user 1's open session
    mem.addData(SessionEvent(2L, t("2024-01-01 06:00:00")))
    q.processAllAvailable()
    mem.addData(SessionEvent(2L, t("2024-01-01 06:00:01")))
    q.processAllAvailable()
    val all = spark.table("sessions").as[ClosedSession].collect()
    val u1 = all.filter(_.user_id == 1L)
    assert(u1.length === 2, s"timeout must flush the open session, got ${all.toSeq}")
    assert(u1.map(_.n_events).sorted.toSeq === Seq(1L, 2L))
    q.stop()
  }

  test("late events extend the open session; ancient stragglers close alone") {
    implicit val sqlCtx = spark.sqlContext
    val mem = MemoryStream[SessionEvent]
    val out = StreamingSessions.sessionize(
      mem.toDS(), gapMs = 30 * 60 * 1000, watermarkDelay = "6 hours")
    val q = out.writeStream.format("memory").queryName("sessions2")
      .outputMode("append").start()

    mem.addData(SessionEvent(1L, t("2024-01-01 10:00:00")))
    q.processAllAvailable()
    // late but within one gap of the session start → extends it backward
    mem.addData(SessionEvent(1L, t("2024-01-01 09:45:00")))
    q.processAllAvailable()
    // ancient straggler (> gap before start) → its own closed session
    mem.addData(SessionEvent(1L, t("2024-01-01 05:00:00")))
    q.processAllAvailable()
    val closed = spark.table("sessions2").as[ClosedSession].collect()
    assert(closed.length === 1)
    assert(closed(0).start_ts === t("2024-01-01 05:00:00"))
    assert(closed(0).n_events === 1)

    // close the open session by gap and confirm the late event widened it
    mem.addData(SessionEvent(1L, t("2024-01-01 23:00:00")))
    q.processAllAvailable()
    val open = spark.table("sessions2").as[ClosedSession].collect()
      .filter(_.n_events == 2)
    assert(open.length === 1)
    assert(open(0).start_ts === t("2024-01-01 09:45:00"))
    assert(open(0).end_ts === t("2024-01-01 10:00:00"))
    q.stop()
  }
}
