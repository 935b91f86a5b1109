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

  // ------------------------------------------- content-defined chunking

  /** Deterministic pseudo-random word stream (seeded) — large enough
    * alphabet that mod-8 bigram boundaries certainly occur.
    */
  private def randWords(seed: Int, n: Int): Seq[String] = {
    val rng = new scala.util.Random(seed)
    Seq.fill(n)("tok" + rng.nextInt(500))
  }

  test("contentDefinedChunks: chunk_ids contiguous from 0, words " +
       "partitioned exactly") {
    val words = randWords(1, 400)
    val df = Seq((1L, words.mkString(" "))).toDF("doc_id", "text")
    val got = Chunking.contentDefinedChunks(df, "doc_id", "text", 8)
      .collect().map(r => (r.getLong(1), r.getLong(2))).sortBy(_._1)
    assert(got.length > 1, "expected multiple chunks from 400 random words")
    assert(got.map(_._1).toSeq === (0L until got.length))
    assert(got.map(_._2).sum === 400L) // every word in exactly one chunk
  }

  test("contentDefinedChunks: boundaries survive a prefix insertion " +
       "(the CDC realignment property)") {
    val base = randWords(2, 400)
    val shifted = randWords(3, 7) ++ base // insert 7 words at the front
    val df = Seq((1L, base.mkString(" ")), (2L, shifted.mkString(" ")))
      .toDF("doc_id", "text")
    val ch = Chunking.contentDefinedChunks(df, "doc_id", "text", 8)
      .collect().map(r => (r.getLong(0), r.getString(3)))
    val h1 = ch.filter(_._1 == 1L).map(_._2).toSet
    val h2 = ch.filter(_._1 == 2L).map(_._2).toSet
    val shared = h1.intersect(h2)
    // all chunks after the first boundary beyond the edit realign;
    // with ~50 chunks of avg 8 words, most must be shared
    assert(shared.size * 2 >= h1.size,
      s"CDC must realign after the edit: shared ${shared.size} of ${h1.size}")
  }

  test("contentDefinedChunks: single-word and empty docs yield one chunk") {
    val df = Seq((1L, "solo"), (2L, "")).toDF("doc_id", "text")
    val got = Chunking.contentDefinedChunks(df, "doc_id", "text", 8)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    assert(got.sortBy(_._1).toSeq === Seq((1L, 0L, 1L), (2L, 0L, 1L)))
  }
}
