package graft.streaming

import java.nio.file.Files


import graft.SparkSpec
import graft.operators.IncrementalAgg

/** Contracts of [[StreamingUpsert]]: final-state parity with the batch
  * [[IncrementalAgg.applyChangelog]] over the same changelog, stale
  * cross-batch updates losing to stored ord, tombstones surviving
  * replayed pre-delete updates, and the versioned-commit recovery
  * story.
  */
case class Chg(k: Long, ts: Long, id: Long, op: String, v: Long)

class StreamingUpsertSpec extends SparkSpec {
  import spark.implicits._

  private def tmpDir(prefix: String) =
    Files.createTempDirectory(prefix).toString

  private def stateNow(dir: String) =
    StreamingUpsert.readState(spark, dir,
      Seq(Chg(0, 0, 0, "U", 0)).toDF().schema)

  test("streamed changelog reaches batch-merge parity; stale updates " +
       "and replayed pre-delete rows lose to stored ord/tombstones") {
    val stateDir = tmpDir("upsert-state")
    val ckpt = tmpDir("upsert-ckpt")
    val landing = tmpDir("upsert-landing")

    val b1 = Seq(Chg(1, 100, 1, "U", 10), Chg(2, 100, 2, "U", 20),
                 Chg(3, 100, 3, "U", 30))
    val b2 = Seq(Chg(2, 200, 4, "D", 0),  // delete k=2
                 Chg(1, 50, 5, "U", 99),  // STALE: older ts than stored
                 Chg(4, 200, 6, "U", 40)) // insert k=4
    val b3 = Seq(Chg(2, 150, 7, "U", 77)) // replayed pre-delete update

    val schema = Seq(Chg(0, 0, 0, "U", 0)).toDF().schema
    def runBatches(batches: Seq[Seq[Chg]]): Unit =
      batches.zipWithIndex.foreach { case (b, i) =>
        Files.writeString(
          java.nio.file.Paths.get(landing, s"b$i.json"),
          b.map(c =>
            s"""{"k":${c.k},"ts":${c.ts},"id":${c.id},""" +
            s""""op":"${c.op}","v":${c.v}}""").mkString("\n"))
        val q = StreamingUpsert.run(
          spark.readStream.schema(schema).json(landing),
          stateDir, ckpt, "k", Seq("ts", "id"), "op", Seq("v"))
        q.awaitTermination() // AvailableNow: drains then stops
      }
    runBatches(Seq(b1, b2, b3))

    val got = StreamingUpsert.snapshotView(stateNow(stateDir), "op", "D")
      .select("k", "v").as[(Long, Long)].collect().sortBy(_._1)
    // k=1 keeps 10 (stale 99 lost), k=2 stays deleted (77 < tombstone
    // ord 200), k=3 untouched, k=4 inserted
    assert(got.toSeq === Seq((1L, 10L), (3L, 30L), (4L, 40L)))

    // batch parity: empty snapshot + the full log through the batch op
    val fullLog = (b1 ++ b2 ++ b3).toDF()
    val emptySnap = Seq.empty[(Long, Long)].toDF("k", "v")
    val batchOut = IncrementalAgg
      .applyChangelog(emptySnap, fullLog, "k", Seq("ts", "id"), "op", "D",
                      Seq("v"))
      .select("k", "v").as[(Long, Long)].collect().sortBy(_._1)
    assert(got.toSeq === batchOut.toSeq,
      "stream state must equal the batch merge of the same changelog")
  }

  test("replaying a whole batch is a no-op (at-least-once safety)") {
    val stateDir = tmpDir("upsert-replay")
    val batch = Seq(Chg(1, 100, 1, "U", 10), Chg(2, 150, 2, "D", 0)).toDF()
    val s0 = stateNow(stateDir)
    val once = StreamingUpsert.mergeBatch(s0, batch, "k",
      Seq("ts", "id"), "op", Seq("v"))
    StreamingUpsert.commitState(once, stateDir, 0L)
    val twice = StreamingUpsert.mergeBatch(stateNow(stateDir), batch, "k",
      Seq("ts", "id"), "op", Seq("v"))
    def norm(df: org.apache.spark.sql.DataFrame) =
      df.as[Chg].collect().sortBy(_.k)
    assert(norm(twice).toSeq === norm(stateNow(stateDir)).toSeq)
  }

  test("commit keeps exactly one live version and survives a torn write") {
    val stateDir = tmpDir("upsert-commit")
    val b = Seq(Chg(1, 1, 1, "U", 5)).toDF()
    StreamingUpsert.commitState(b, stateDir, 0L)
    StreamingUpsert.commitState(
      Seq(Chg(1, 2, 2, "U", 6)).toDF(), stateDir, 1L)
    // superseded v0 is gone, CURRENT points at v1
    val entries = new java.io.File(stateDir).list().toSet
    assert(entries === Set("CURRENT", "v1"), s"got $entries")
    // a torn write (version dir without pointer swap) must not be read
    Seq(Chg(9, 9, 9, "U", 9)).toDF()
      .write.parquet(s"$stateDir/v99")
    val vs = stateNow(stateDir).as[Chg].collect()
    assert(vs.toSeq === Seq(Chg(1, 2, 2, "U", 6)))
  }
}
