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
}
