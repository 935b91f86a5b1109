package graft.streaming

import java.nio.file.Files

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream

import graft.SparkSpec

/** End-to-end contract of [[StreamingDedup]]: micro-batches dedup
  * within-batch (exact), vs-corpus (exact), and vs-corpus (near-dup)
  * before appending, and a replayed batch appends nothing.
  */
class StreamingDedupSpec extends SparkSpec {
  import spark.implicits._

  private def words(lo: Int, hi: Int): String =
    (lo until hi).map(i => s"w$i").mkString(" ")

  test("three-stage dedup across micro-batches; replay is a no-op") {
    val corpusPath = Files.createTempDirectory("graft-sdedup").toString + "/corpus"
    val ckpt = Files.createTempDirectory("graft-sdedup-ckpt").toString

    implicit val sqlCtx = spark.sqlContext
    val mem = MemoryStream[(Long, String)]
    val docs = mem.toDF().toDF("doc_id", "text")
    val q = StreamingDedup.dedupStream(docs, corpusPath, ckpt).start()

    try {
      // batch 1: A(1), B(2), A-dup(3) — within-batch exact dedup keeps 1,2
      mem.addData((1L, words(0, 60)), (2L, "zz yy xx ww vv uu tt ss rr"),
                  (3L, words(0, 60)))
      q.processAllAvailable()
      val after1 = spark.read.parquet(corpusPath)
        .select("doc_id").as[Long].collect().sorted
      assert(after1.toSeq == Seq(1L, 2L), s"batch 1 kept ${after1.toSeq}")

      // batch 2: C(11) near-dup of A (58/59 shingle overlap), D(12) exact
      // dup of B, E(13) genuinely new — only E survives
      mem.addData((11L, words(0, 61)), (12L, "zz yy xx ww vv uu tt ss rr"),
                  (13L, "aa bb cc dd ee ff gg hh ii jj kk ll"))
      q.processAllAvailable()
      val after2 = spark.read.parquet(corpusPath)
        .select("doc_id").as[Long].collect().sorted
      assert(after2.toSeq == Seq(1L, 2L, 13L), s"batch 2 kept ${after2.toSeq}")
    } finally q.stop()

    // replay batch 2's data directly (the foreachBatch crash-replay
    // path, new ids as a replayed source would assign): everything is
    // now an exact or near dup of the corpus — zero appends
    val replay = Seq((21L, words(0, 61)),
                     (22L, "zz yy xx ww vv uu tt ss rr"),
                     (23L, "aa bb cc dd ee ff gg hh ii jj kk ll"))
      .toDF("doc_id", "text")
    val kept = StreamingDedup.dedupAppendBatch(replay, corpusPath)
    assert(kept == 0, "replayed content must all dedup away")
    assert(spark.read.parquet(corpusPath).count() == 3)
  }

  test("substring stage: maintained postings equal a full recompute " +
       "over the corpus after every micro-batch; shared >=25-char runs " +
       "are cut corpus-first then within-batch; replay is a no-op " +
       "(r12 verdict #4)") {
    import org.apache.spark.sql.functions.col
    import graft.operators.Dedup
    val root = Files.createTempDirectory("graft-sdedup3").toString
    val corpusPath = root + "/corpus"
    val postingsRoot = root + "/postings"
    val ckpt = root + "/ckpt"
    val P = "the quick brown fox jumps over the lazy dog once more"
    val Q = "pack my box with five dozen liquor jugs right now"

    def postingsInvariant(): Unit = {
      val state = StreamingAgg.latestState(spark, postingsRoot)
        .map(_._2.select("gram_h1", "gram_h2").as[(Long, Long)]
               .collect().toSet)
        .getOrElse(Set.empty)
      val full = Dedup.substringGramPostings(
          spark.read.parquet(corpusPath), "doc_id", "text")
        .as[(Long, Long)].collect().toSet
      assert(state === full,
             s"postings state (${state.size}) must equal the corpus " +
               s"recompute (${full.size}) after every batch")
    }

    implicit val sqlCtx = spark.sqlContext
    val mem = MemoryStream[(Long, String)]
    val docs = mem.toDF().toDF("doc_id", "text")
    val q = StreamingDedup
      .dedupSubstrStream(docs, corpusPath, postingsRoot, ckpt).start()
    try {
      // batch 0: two distinct docs, doc 1 carrying phrase P
      mem.addData(
        (1L, P + " alpha beta gamma delta epsilon zeta eta theta"),
        (2L, "completely unrelated content first corpus entry here"))
      q.processAllAvailable()
      assert(spark.read.parquet(corpusPath).count() == 2)
      postingsInvariant()

      // batch 1: doc 11 repeats corpus phrase P (cut vs corpus), docs
      // 13/14 share the corpus-NEW phrase Q (within-batch keep-first:
      // 13 keeps it, 14 loses it), doc 12 is plain new
      mem.addData(
        (11L, P + " one two three four five six seven eight nine ten"),
        (12L, "another genuinely new document with its own words"),
        (13L, Q + " continuation that only this document carries on"),
        (14L, Q + " a different tail so the pair is not an exact dup"))
      q.processAllAvailable()
      val after = spark.read.parquet(corpusPath)
        .select(col("doc_id"), col("text")).as[(Long, String)]
        .collect().toMap
      assert(after.keySet === Set(1L, 2L, 11L, 12L, 13L, 14L))
      assert(!after(11L).contains("quick brown fox"),
             s"corpus phrase must be cut from doc 11: '${after(11L)}'")
      assert(after(11L).contains("one two three"),
             "doc 11's own tail must survive the cut")
      assert(after(13L).contains("five dozen liquor"),
             "within-batch keep-first: the FIRST occurrence keeps Q")
      assert(!after(14L).contains("five dozen liquor"),
             s"doc 14's copy of Q must be cut: '${after(14L)}'")
      postingsInvariant()
    } finally q.stop()

    // crash-replay of batch 1 (same batch id, same content, replayed
    // source ids): the cleaned text of every row is already in the
    // corpus, so nothing appends, and the overwritten postings version
    // equals what the first run committed
    val stateBefore = StreamingAgg.latestState(spark, postingsRoot)
      .map(_._2.as[(Long, Long)].collect().toSet).get
    val replay = Seq(
      (31L, P + " one two three four five six seven eight nine ten"),
      (32L, "another genuinely new document with its own words"),
      (33L, Q + " continuation that only this document carries on"),
      (34L, Q + " a different tail so the pair is not an exact dup"))
      .toDF("doc_id", "text")
    val kept = StreamingDedup.dedupAppendBatchSubstr(
      replay, corpusPath, postingsRoot, batchId = 1L)
    assert(kept == 0, "replayed content must all dedup away")
    assert(spark.read.parquet(corpusPath).count() == 6)
    val stateAfter = StreamingAgg.latestState(spark, postingsRoot)
      .map(_._2.as[(Long, Long)].collect().toSet).get
    assert(stateAfter === stateBefore,
           "replay must overwrite the postings version with identical " +
             "content")
  }

  test("within-batch NEAR-dups collapse to one keeper before appending") {
    val corpusPath =
      Files.createTempDirectory("graft-sdedup2").toString + "/corpus"
    // two near-identical docs (59 vs 60 words, J = 58/59) plus one
    // unrelated — first batch ever, so the corpus offers no protection
    val batch = Seq((5L, words(0, 60)), (6L, words(0, 61)),
                    (7L, "qq rr ss tt uu vv ww xx yy zz aa bb"))
      .toDF("doc_id", "text")
    val kept = StreamingDedup.dedupAppendBatch(batch, corpusPath)
    assert(kept == 2, s"near-dup pair must keep one doc, kept $kept")
    val ids = spark.read.parquet(corpusPath)
      .select("doc_id").as[Long].collect().sorted
    assert(ids.toSeq == Seq(5L, 7L), s"min-id keeper expected, got ${ids.toSeq}")
  }

  test("substring stage fails LOUD on a non-flat corpus layout instead " +
       "of writing an empty postings delta (ADVICE r13)") {
    val root = Files.createTempDirectory("graft-sdedup-nested")
    val corpusPath = root.toString + "/corpus"
    val postingsRoot = root.toString + "/postings"
    // a PARTITIONED corpus: data exists, but none of it at the top
    // level — the flat *.parquet glob the delta derivation uses sees
    // nothing, which without the guard silently breaks the
    // postings == recompute invariant
    import org.apache.spark.sql.functions.{col, lit, md5}
    Seq((1L, words(0, 60))).toDF("doc_id", "text")
      .withColumn("content_md5", md5(col("text")))
      .withColumn("__batch_id", lit(0L))
      .withColumn("part", lit(0))
      .write.partitionBy("part").parquet(corpusPath)
    // an all-duplicate batch appends nothing new at the top level
    val batch = Seq((2L, words(0, 60))).toDF("doc_id", "text")
    val e = intercept[IllegalArgumentException] {
      StreamingDedup.dedupAppendBatchSubstr(
        batch, corpusPath, postingsRoot, batchId = 1L)
    }
    assert(e.getMessage.contains("FLAT directory"),
      s"expected the flat-layout message, got: ${e.getMessage}")
  }
}
