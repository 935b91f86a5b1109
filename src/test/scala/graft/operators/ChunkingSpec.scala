package graft.operators

import org.apache.spark.sql.functions._

import graft.SparkSpec

/** Contracts of [[Chunking]]: window/stride arithmetic (tail anchored,
  * short docs single-chunk), full token coverage, and the round-robin
  * interleave layout with its distributed global position.
  */
class ChunkingSpec extends SparkSpec {
  import spark.implicits._

  private def doc(n: Int): String = (1 to n).map(i => s"w$i").mkString(" ")

  test("slidingChunks: short docs one chunk; long docs stride with the " +
       "tail anchored") {
    val df = Seq((1L, doc(10)), (2L, doc(64)), (3L, doc(65)),
                 (4L, doc(160))).toDF("doc_id", "text")
    val got = Chunking.slidingChunks(df, "doc_id", "text", 64, 48)
      .collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
      .sortBy(t => (t._1, t._2))
    assert(got.toSeq == Seq(
      (1L, 0L, 0L, 10L),
      (2L, 0L, 0L, 64L),
      (3L, 0L, 0L, 64L), (3L, 1L, 48L, 17L),
      (4L, 0L, 0L, 64L), (4L, 1L, 48L, 64L), (4L, 2L, 96L, 64L)),
      s"got ${got.toSeq}")
  }

  test("slidingChunks: consecutive chunks overlap by chunkSize - stride " +
       "and every token is covered") {
    val df = Seq((1L, doc(150))).toDF("doc_id", "text")
    val got = Chunking.slidingChunks(df, "doc_id", "text", 64, 48)
      .collect().map(r => (r.getLong(2), r.getLong(3))).sortBy(_._1)
    // starts 0,48,96 cover [0,64) [48,112) [96,150): gapless, tail exact
    val covered = got.flatMap { case (s, l) => s until (s + l) }.toSet
    assert(covered == (0L until 150L).toSet)
    assert(got.map(_._1).toSeq == Seq(0L, 48L, 96L))
  }

  test("interleave: round-robin by rank then key, global pos dense from 1") {
    val df = Seq(
      (1L, "a", 30L), (2L, "a", 20L), (3L, "a", 10L),
      (4L, "b", 99L), (5L, "b", 50L))
      .toDF("doc_id", "source", "q")
    val got = Chunking.interleave(df, "source",
        Seq(col("q").desc, col("doc_id").asc))
      .select("doc_id", "rn", "pos")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
      .sortBy(_._3)
    // layout: (rn1: a→1, b→4), (rn2: a→2, b→5), (rn3: a→3)
    assert(got.toSeq == Seq(
      (1L, 1L, 1L), (4L, 1L, 2L),
      (2L, 2L, 3L), (5L, 2L, 4L),
      (3L, 3L, 5L)), s"got ${got.toSeq}")
  }
}
