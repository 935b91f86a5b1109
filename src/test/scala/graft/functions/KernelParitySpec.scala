package graft.functions

import org.apache.spark.sql.functions._

import graft.SparkSpec

/** The codegen'd kernels (DotFloat, WordShingles, MinHashSignature) must
  * be VALUE-IDENTICAL to the interpreted Column-function forms they
  * replaced — that equivalence is what keeps the DuckDB oracles exact.
  * Each test evaluates both forms over real testdata and compares.
  */
class KernelParitySpec extends SparkSpec {
  import spark.implicits._

  test("DotFloat equals the sequential-fold HOF dot product bit-for-bit") {
    val emb = spark.read.parquet(s"$sf/embeddings.parquet").limit(50)
    val pairs = emb.select(col("vec_id").as("a"), col("embedding").as("va"))
      .crossJoin(emb.select(col("vec_id").as("b"), col("embedding").as("vb")))
    val hof = aggregate(
      zip_with(col("va"), col("vb"),
        (x, y) => x.cast("double") * y.cast("double")),
      lit(0.0d), (acc, x) => acc + x)
    val diff = pairs
      .select(VectorFunctions.dot(col("va"), col("vb")).as("fast"), hof.as("ref"))
      .filter(col("fast") =!= col("ref"))
      .count()
    assert(diff === 0)
  }

  test("WordShingles equals the array_distinct/transform/slice HOF form") {
    val docs = spark.read.parquet(s"$sf/documents.parquet")
    val w = split(col("text"), " ")
    val hof = when(size(w) >= 3,
      array_distinct(transform(
        sequence(lit(0), size(w) - 3),
        i => concat_ws(" ", slice(w, i + 1, lit(3))))))
      .otherwise(array().cast("array<string>"))
    val diff = docs
      .select(TextFunctions.shingles(col("text"), 3).as("fast"), hof.as("ref"))
      .filter(col("fast") =!= col("ref"))
      .count()
    assert(diff === 0)
  }

  test("WordShingles edge cases: short docs, duplicate windows, empties") {
    val out = Seq(
      "a b",            // shorter than n → empty
      "a b c",          // exactly n → one shingle
      "x y x y x y",    // duplicate windows collapse
      ""                // empty text → [""] words → empty
    ).toDF("text")
      .select(TextFunctions.shingles(col("text"), 3).as("sh"))
      .as[Seq[String]].collect()
    assert(out(0) === Seq.empty)
    assert(out(1) === Seq("a b c"))
    assert(out(2) === Seq("x y x", "y x y"))
    assert(out(3) === Seq.empty)
  }

  test("WordSetCount equals the size(filter(isInCollection)) HOF form") {
    val docs = spark.read.parquet(s"$sf/documents.parquet")
    val w = split(col("text"), " ")
    val list = TextFunctions.LangStopwords.toMap.apply("en")
    val hof = size(filter(w, x => x.isInCollection(list)))
    val diff = docs
      .select(TextFunctions.langScore(w, "en").as("fast"), hof.as("ref"))
      .filter(col("fast") =!= col("ref"))
      .count()
    assert(diff === 0)
  }

  test("SimHashSignature equals an independent driver-side md5 reference") {
    // Independent reimplementation (ByteBuffer big-endian read instead of
    // the kernel's manual byte fold) over the same word-split semantics.
    def ref(text: String): Long = {
      val md = java.security.MessageDigest.getInstance("MD5")
      val counts = new Array[Int](64)
      text.split(" ", -1).foreach { w =>
        md.reset()
        val h = java.nio.ByteBuffer.wrap(md.digest(w.getBytes("UTF-8"))).getLong
        (0 until 64).foreach { b =>
          if (((h >>> b) & 1L) == 1L) counts(b) += 1 else counts(b) -= 1
        }
      }
      (0 until 64).foldLeft(0L) { (acc, b) =>
        if (counts(b) > 0) acc | (1L << b) else acc
      }
    }
    val rows = spark.read.parquet(s"$sf/documents.parquet").limit(100)
      .select(col("text"),
              graft.operators.Dedup.simhash(col("text")).as("sig"))
      .collect()
    assert(rows.nonEmpty)
    rows.foreach(r => assert(r.getLong(1) === ref(r.getString(0))))
    // Edge cases: empty text hashes the single empty token; signature of a
    // one-word doc is exactly that word's h64 (every counter is ±1).
    val edge = Seq("", "hello").toDF("text")
      .select(graft.operators.Dedup.simhash(col("text")).as("sig"))
      .as[Long].collect()
    assert(edge(0) === ref(""))
    assert(edge(1) === ref("hello"))
  }

  test("MinHashSignature equals the PortableHash column form per slot") {
    val docs = spark.read.parquet(s"$sf/documents.parquet").limit(100)
    val sh = TextFunctions.shingles(col("text"), 3)
    val hof = transform(
      sequence(lit(0), lit(15)),
      i => array_min(transform(
        transform(sh, s => PortableHash.h32(s)),
        h => PortableHash.permHash(i, h))))
    val diff = docs
      .filter(size(sh) > 0)
      .select(graft.operators.Dedup.minhashSignature(sh, 16).as("fast"),
              hof.as("ref"))
      .filter(col("fast") =!= col("ref"))
      .count()
    assert(diff === 0)
  }

  test("QuantizeE6 equals the transform/slice HOF form on real embeddings") {
    import org.apache.spark.sql.GraftColumns
    val emb = spark.read.parquet(s"$sf/embeddings.parquet")
    val hof = transform(slice(col("embedding"), 1, 64),
      x => floor(x.cast("double") * lit(1000000L)).cast("long"))
    val fast = GraftColumns.column(
      QuantizeE6(GraftColumns.expression(col("embedding")), 64))
    val diff = emb.select(fast.as("fast"), hof.as("ref"))
      .filter(col("fast") =!= col("ref"))
      .count()
    assert(diff === 0)
  }

  test("ArgMinDistSqLong equals the composed array_min(struct(DistSqLong)) " +
       "form, including the lower-cid tie-break") {
    import org.apache.spark.sql.GraftColumns
    val emb = spark.read.parquet(s"$sf/embeddings.parquet")
    val q = GraftColumns.column(
      QuantizeE6(GraftColumns.expression(col("embedding")), 64))
    // centroids deliberately include a DUPLICATE (idx 3 == idx 1) so tie
    // rows exist and must resolve to the lower index in both forms
    val cents: Array[Array[Long]] = Array.tabulate(4) { c =>
      Array.tabulate(64)(d =>
        (((if (c == 3) 1 else c) * 31 + d * 7) % 11 - 5) * 100000L)
    }
    val composed = array_min(array(cents.zipWithIndex.map { case (cv, i) =>
      struct(
        GraftColumns.column(DistSqLong(GraftColumns.expression(col("q")), cv))
          .as("d"),
        lit(i.toLong).as("c"))
    }: _*))
    val fast = GraftColumns.column(ArgMinDistSqLong(
      GraftColumns.expression(col("q")), cents))
    val diff = emb.select(q.as("q"))
      .select(fast.as("fast"), composed.as("ref"))
      .filter(col("fast.d") =!= col("ref.d") ||
              col("fast.c") =!= col("ref.c"))
      .count()
    assert(diff === 0)
  }

  test("ArgMaxCosFloat equals the cosine+window ranking form, " +
       "including the lower-cid tie-break on duplicate centroids") {
    import org.apache.spark.sql.GraftColumns
    import org.apache.spark.sql.expressions.Window
    val emb = spark.read.parquet(s"$sf/embeddings.parquet").limit(200)
    // 4 centroids from real vectors, idx 3 duplicating idx 1 → ties
    val centRows = spark.read.parquet(s"$sf/embeddings.parquet")
      .filter(col("vec_id") < 3).orderBy("vec_id")
      .collect().map(_.getSeq[Float](1).toArray)
    val cents = centRows :+ centRows(1)
    val cdf = cents.zipWithIndex
      .map { case (c, i) => (i.toLong, c) }.toSeq.toDF("cid", "cv")
    val ref = emb.crossJoin(broadcast(cdf))
      .withColumn("ccos",
        graft.functions.VectorFunctions.cosine(col("embedding"), col("cv")))
      .withColumn("crnk", row_number().over(
        Window.partitionBy(col("vec_id"))
          .orderBy(col("ccos").desc, col("cid").asc)))
      .filter(col("crnk") === 1)
      .select(col("vec_id"), col("cid"), col("ccos"))
    val fast = emb.select(col("vec_id"),
      GraftColumns.column(graft.functions.ArgMaxCosFloat(
        GraftColumns.expression(col("embedding")), cents)).as("a"))
      .select(col("vec_id"), col("a.c").as("cid"), col("a.cos").as("ccos"))
    val diff = fast.as("f").join(ref.as("r"), "vec_id")
      .filter(col("f.cid") =!= col("r.cid") ||
              col("f.ccos") =!= col("r.ccos"))
      .count()
    assert(diff === 0)
    // ties really occurred: some rows must sit nearest the duplicated
    // direction, and they must all have resolved to cid 1, never 3
    assert(fast.filter(col("cid") === 1).count() > 0)
    assert(fast.filter(col("cid") === 3).count() === 0)
  }

  test("QuantizeE6 throws on embeddings shorter than dims — never a " +
       "silent prefix clustering") {
    import org.apache.spark.sql.GraftColumns
    val short = Seq(Array(0.1f, 0.2f)).toDF("embedding")
    val ex = intercept[Exception] {
      short.select(GraftColumns.column(
        QuantizeE6(GraftColumns.expression(col("embedding")), 4))).collect()
    }
    def msgs(t: Throwable): List[String] =
      if (t == null) Nil
      else Option(t.getMessage).toList ++ msgs(t.getCause)
    assert(msgs(ex).exists(_.contains("quantize_e6")), s"got $ex")
  }
}
