package graft.streaming

import java.sql.Timestamp

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._

import graft.SparkSpec

/** Contracts of [[StreamingJoins.intervalJoin]]: matches inside the
  * interval only, cross-batch buffering (a right row arriving a batch
  * later still joins), and watermark-bounded state (a too-late right row
  * is dropped, not joined).
  */
class StreamingJoinsSpec extends SparkSpec {
  import spark.implicits._

  case class L(k: Long, lts: Timestamp)
  case class R(k: Long, rts: Timestamp, v: Long)

  private def t(s: String) = Timestamp.valueOf(s)

  test("interval join matches in-window rows across micro-batches and " +
       "expires state by watermark") {
    implicit val sqlCtx = spark.sqlContext
    val lm = MemoryStream[L]
    val rm = MemoryStream[R]
    val out = StreamingJoins.intervalJoin(
        lm.toDF(), "lts", "k",
        rm.toDF().withColumnRenamed("k", "v_k"), "rts", "v_k",
        delay = "0 seconds", within = "10 minutes")
    val q = out.select(col("k"), col("lts"), col("rts"), col("v"))
      .writeStream.format("memory").queryName("ij").outputMode("append")
      .start()
    try {
      // batch 1: left arrives alone — nothing matches yet
      lm.addData(L(1L, t("2024-01-01 00:00:00")))
      q.processAllAvailable()
      assert(spark.table("ij").count() === 0)

      // batch 2: in-window right (+5m) joins the BUFFERED left;
      // out-of-window right (+20m) does not
      rm.addData(R(1L, t("2024-01-01 00:05:00"), 50L),
                 R(1L, t("2024-01-01 00:20:00"), 99L))
      q.processAllAvailable()
      val hits = spark.table("ij").collect()
      assert(hits.length === 1 && hits(0).getLong(3) === 50L,
        s"only the +5m right row joins, got ${hits.toSeq}")

      // advance both watermarks far past left(00:00)+10m...
      lm.addData(L(9L, t("2024-01-01 03:00:00")))
      rm.addData(R(9L, t("2024-01-01 03:00:01"), 1L))
      q.processAllAvailable()
      // ...then a right row that WOULD have matched the old left arrives
      // too late: its event time is behind the right watermark, so the
      // expired left state cannot produce a join
      rm.addData(R(1L, t("2024-01-01 00:06:00"), 77L))
      q.processAllAvailable()
      assert(!spark.table("ij").collect().exists(_.getLong(3) == 77L),
        "watermark-expired state must not join late rows")
    } finally q.stop()
  }

  test("streaming interval join has batch parity with intervalOverlapJoin") {
    // same input replayed through MemoryStream in 3 chronological
    // micro-batches (watermark lenient enough that nothing drops) must
    // emit exactly the batch interval-overlap join's matches: lefts as
    // [lts, lts+within] intervals, rights as points, keys equal.
    implicit val sqlCtx = spark.sqlContext
    val MinUs = 60000000L
    val base = t("2024-01-01 00:00:00").getTime * 1000L
    val lefts = (0 until 40).map(i =>
      L(i % 5, new Timestamp((base + i * 7 * MinUs) / 1000L)))
    val rights = (0 until 90).map(j =>
      R(j % 5, new Timestamp((base + j * 3 * MinUs) / 1000L), j.toLong))

    val lm = MemoryStream[L]
    val rm = MemoryStream[R]
    val out = StreamingJoins.intervalJoin(
        lm.toDF(), "lts", "k",
        rm.toDF().withColumnRenamed("k", "v_k"), "rts", "v_k",
        delay = "2 hours", within = "10 minutes")
    val q = out.select(col("k"), col("lts"), col("rts"), col("v"))
      .writeStream.format("memory").queryName("ij_parity")
      .outputMode("append").start()
    try {
      for (part <- 0 until 3) {
        lm.addData(lefts.slice(part * 14, part * 14 + 14): _*)
        rm.addData(rights.slice(part * 30, part * 30 + 30): _*)
        q.processAllAvailable()
      }
      val streamed = spark.table("ij_parity").collect()
        .map(r => (r.getLong(0), r.getTimestamp(1).getTime * 1000L,
                   r.getTimestamp(2).getTime * 1000L, r.getLong(3)))
        .toSet

      val withinUs = 10 * MinUs
      val a = lefts.map(l => (l.k, l.lts)).toDF("ka", "lts")
        .select(col("ka"), unix_micros(col("lts")).as("sa"))
        .withColumn("ea", col("sa") + withinUs)
      val b = rights.map(r => (r.k, r.rts, r.v)).toDF("kb", "rts", "v")
        .select(col("kb"), unix_micros(col("rts")).as("sb"), col("v"))
        .withColumn("eb", col("sb"))
      val batch = graft.operators.TemporalOps
        .intervalOverlapJoin(a, "sa", "ea", b, "sb", "eb",
                             bucketWidth = 5 * MinUs)
        .filter(col("ka") === col("kb"))
        .select(col("ka"), col("sa"), col("sb"), col("v"))
        .collect()
        .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
        .toSet

      assert(batch.nonEmpty, "fixture must produce matches")
      assert(streamed === batch,
        s"stream/batch diverge: only-stream=${streamed -- batch} " +
          s"only-batch=${batch -- streamed}")
    } finally q.stop()
  }

  case class Err(user_id: Long, err_id: Long, lts: Timestamp)
  case class Pur(p_user: Long, pur_id: Long, rts: Timestamp)

  test("streamed interval join equals the oracle-gated batch form " +
       "(q214) on the real events table") {
    // q214's DuckDB oracle gates the batch form; this assertion closes
    // the chain for the streamed form: replaying the SAME events table
    // through MemoryStream micro-batches must emit exactly the batch
    // pairs. Chronological replay + a lenient watermark, so state
    // expiry (tested above) never drops a legitimate match here.
    implicit val sqlCtx = spark.sqlContext
    val ev = spark.read.parquet(s"$sf/events.parquet")
      .select(col("event_id"), col("user_id"), col("ts"),
              col("event_type"))
      .orderBy("ts").collect()
    // ts may surface as LocalDateTime (TIMESTAMP_NTZ) or Instant
    // depending on the reader config; convert WITHOUT losing the
    // microsecond precision the join boundaries depend on
    def asTs(v: Any): Timestamp = v match {
      case t: Timestamp                => t
      case l: java.time.LocalDateTime  => Timestamp.valueOf(l)
      case i: java.time.Instant        => Timestamp.from(i)
    }
    val errs = ev.filter(_.getString(3) == "error")
      .map(r => Err(r.getLong(1), r.getLong(0), asTs(r.get(2))))
    val purs = ev.filter(_.getString(3) == "purchase")
      .map(r => Pur(r.getLong(1), r.getLong(0), asTs(r.get(2))))
    assert(errs.nonEmpty && purs.nonEmpty)

    val em = MemoryStream[Err]
    val pm = MemoryStream[Pur]
    val out = StreamingJoins.intervalJoin(
        em.toDF(), "lts", "user_id",
        pm.toDF(), "rts", "p_user",
        delay = "40 days", within = "1 hour")
    val q = out.select(col("err_id"), col("pur_id"),
                       (unix_micros(col("rts")) -
                         unix_micros(col("lts"))).as("gap_us"))
      .writeStream.format("memory").queryName("ij_q214")
      .outputMode("append").start()
    try {
      val eSlice = (errs.length + 2) / 3
      val pSlice = (purs.length + 2) / 3
      for (part <- 0 until 3) {
        em.addData(errs.slice(part * eSlice, (part + 1) * eSlice): _*)
        pm.addData(purs.slice(part * pSlice, (part + 1) * pSlice): _*)
        q.processAllAvailable()
      }
      val streamed = spark.table("ij_q214").collect()
        .map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
      val batch = graft.queries.AdvancedQueries
        .queries("q214_interval_join")(spark, sf)
        .select("err_id", "pur_id", "gap_us").collect()
        .map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
      assert(batch.nonEmpty, "the real events must produce matches")
      assert(streamed === batch,
        s"stream/batch diverge: only-stream=${streamed -- batch} " +
          s"only-batch=${batch -- streamed}")
    } finally q.stop()
  }

  test("streamed LEFT-OUTER interval join equals the oracle-gated " +
       "batch form (q217) once the watermark flushes unmatched state") {
    implicit val sqlCtx = spark.sqlContext
    val ev = spark.read.parquet(s"$sf/events.parquet")
      .select(col("event_id"), col("user_id"), col("ts"),
              col("event_type"))
      .orderBy("ts").collect()
    def asTs(v: Any): Timestamp = v match {
      case t: Timestamp                => t
      case l: java.time.LocalDateTime  => Timestamp.valueOf(l)
      case i: java.time.Instant        => Timestamp.from(i)
    }
    val errs = ev.filter(_.getString(3) == "error")
      .map(r => Err(r.getLong(1), r.getLong(0), asTs(r.get(2))))
    val purs = ev.filter(_.getString(3) == "purchase")
      .map(r => Pur(r.getLong(1), r.getLong(0), asTs(r.get(2))))
    val maxMs = ev.map(r => asTs(r.get(2)).getTime).max
    // sentinel events far past every interval+delay: advancing the
    // watermark is what licenses the outer null emissions
    def sentinel(plusDays: Int) =
      new Timestamp(maxMs + plusDays * 86400000L)

    val em = MemoryStream[Err]
    val pm = MemoryStream[Pur]
    val out = StreamingJoins.intervalJoinLeftOuter(
        em.toDF(), "lts", "user_id",
        pm.toDF(), "rts", "p_user",
        delay = "1 hour", within = "1 hour")
    val q = out.select(col("user_id"), col("err_id"), col("pur_id"),
                       (unix_micros(col("rts")) -
                         unix_micros(col("lts"))).as("gap_us"))
      .writeStream.format("memory").queryName("ij_q217")
      .outputMode("append").start()
    try {
      val eSlice = (errs.length + 2) / 3
      val pSlice = (purs.length + 2) / 3
      for (part <- 0 until 3) {
        em.addData(errs.slice(part * eSlice, (part + 1) * eSlice): _*)
        pm.addData(purs.slice(part * pSlice, (part + 1) * pSlice): _*)
        q.processAllAvailable()
      }
      // two sentinel rounds: the watermark computed at batch N applies
      // at batch N+1, so eviction (and the outer null flush) needs one
      // more batch after the time advance
      for (d <- Seq(100, 101)) {
        em.addData(Err(-1L, -1L, sentinel(d)))
        pm.addData(Pur(-1L, -1L, sentinel(d)))
        q.processAllAvailable()
      }
      def nl(r: org.apache.spark.sql.Row, i: Int): Option[Long] =
        if (r.isNullAt(i)) None else Some(r.getLong(i))
      val streamed = spark.table("ij_q217").collect()
        .filter(_.getLong(0) >= 0) // drop sentinel rows
        .map(r => (r.getLong(1), nl(r, 2), nl(r, 3))).toSet
      val batch = graft.queries.AdvancedQueries
        .queries("q217_interval_outer")(spark, sf)
        .select("err_id", "pur_id", "gap_us").collect()
        .map(r => (r.getLong(0), nl(r, 1), nl(r, 2))).toSet
      assert(batch.exists(_._2.isEmpty),
        "the real events must include unmatched errors")
      assert(streamed === batch,
        s"stream/batch diverge: only-stream=${streamed -- batch} " +
          s"only-batch=${batch -- streamed}")
    } finally q.stop()
  }
}
