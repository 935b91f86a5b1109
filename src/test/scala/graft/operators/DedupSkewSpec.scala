package graft.operators

import org.apache.spark.sql.functions._

import graft.SparkSpec

class DedupSkewSpec extends SparkSpec {
  import spark.implicits._

  test("saltedJoin returns exactly the plain join's rows") {
    // one hot key (1) with many rows + cold keys
    val left = ((1 to 500).map(i => (1L, i)) ++ Seq((2L, 1), (3L, 2)))
      .toDF("k", "v")
    val right = Seq((1L, "hot"), (2L, "cold"), (4L, "unmatched"))
      .toDF("k", "name")
    val salted = SkewOps.saltedJoin(left, right, Seq("k"), salts = 8)
      .select("k", "v", "name")
    val plain = left.join(right, Seq("k")).select("k", "v", "name")
    assert(salted.count() === plain.count())
    assert(salted.exceptAll(plain).isEmpty && plain.exceptAll(salted).isEmpty)
  }

  test("saltedJoin actually fans a hot key across multiple salt values") {
    val left = (1 to 200).map(i => (1L, i)).toDF("k", "v")
    val nSalts = left
      .withColumn("__salt",
        pmod(xxhash64(struct(col("k"), col("v"))), lit(8L)))
      .select("__salt").distinct().count()
    assert(nSalts > 1, "hash salt must spread a hot key's rows")
  }

  test("saltedJoin rejects join types that would duplicate unmatched rows") {
    val left = Seq((1L, 1)).toDF("k", "v")
    val right = Seq((2L, "r")).toDF("k", "name")
    val e = intercept[IllegalArgumentException] {
      SkewOps.saltedJoin(left, right, Seq("k"), salts = 4, joinType = "right")
    }
    assert(e.getMessage.contains("cannot preserve"))
    intercept[IllegalArgumentException] {
      SkewOps.saltedJoin(left, right, Seq("k"), salts = 4, joinType = "full_outer")
    }
    // left outer is safe: the skewed (preserved) side has exactly one salt
    val lo = SkewOps.saltedJoin(left, right, Seq("k"), salts = 4,
      joinType = "left").collect()
    assert(lo.length === 1 && lo(0).isNullAt(2))
  }

  test("checkpointed minhash variant returns exactly the cached variant's pairs") {
    val docs = spark.read.parquet(s"$sf/documents.parquet")
      .select(col("doc_id"), col("text"))
    val dir = java.nio.file.Files
      .createTempDirectory("graft-minhash-ckpt").toString
    val cached = Dedup
      .minhashDedupPairs(docs, "doc_id", "text", n = 3, num = 4, den = 5)
    val ckpt = Dedup.minhashDedupPairsCheckpointed(
      docs, "doc_id", "text", n = 3, num = 4, den = 5, checkpointDir = dir,
      keepSets = true)
    assert(cached.count() === ckpt.count())
    assert(cached.exceptAll(ckpt).isEmpty && ckpt.exceptAll(cached).isEmpty)
    // keepSets retains the materialized table for resuming…
    assert(new java.io.File(dir).listFiles.exists(
      _.getName.startsWith("minhash_sets_")))
    // …and the default cleans it up once the pairs are materialized
    val dir2 = java.nio.file.Files
      .createTempDirectory("graft-minhash-ckpt2").toString
    Dedup.minhashDedupPairsCheckpointed(
      docs, "doc_id", "text", n = 3, num = 4, den = 5, checkpointDir = dir2)
    assert(!new java.io.File(dir2).listFiles.exists(
      _.getName.startsWith("minhash_sets_")),
      "sets table must not leak one copy per invocation")
  }

  test("maxShingleDf drops shingles above the document-frequency cap") {
    // 'x y z' appears in all 4 docs (hot); 'a b c' in only 2
    val docs = Seq(
      (1L, "x y z a b c"),
      (2L, "x y z a b c"),
      (3L, "x y z q r s"),
      (4L, "x y z t u v")
    ).toDF("doc_id", "text")
    val uncapped = Dedup.shinglePostings(docs, "doc_id", "text", n = 3)
    val capped = Dedup.shinglePostings(docs, "doc_id", "text", n = 3,
      maxShingleDf = 2)
    val cappedShingles = capped.select("shingle").distinct()
      .as[String].collect().toSet
    assert(!cappedShingles.contains("x y z"), "hot shingle must be dropped")
    assert(cappedShingles.contains("a b c"), "df=2 shingle must survive")
    assert(capped.count() < uncapped.count())
  }
}
