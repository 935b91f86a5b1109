package graft

import org.apache.spark.sql.functions._

import graft.operators.{Dedup, Similarity}

/** Dev tool: scale-up probe for the heavy operators.
  *
  * Inflates the sf0.1 corpus in-memory (xN copies with distinct ids; copy
  * 0 keeps the original text, later copies get a perturbed token so groups
  * form near-dup clusters) and times the dedup/similarity paths. The
  * point is the GROWTH CURVE, not the absolute number: near-dup pair
  * generation must scale with corpus + matching pairs, never O(n²).
  */
object ScaleProbe {
  def main(args: Array[String]): Unit = {
    val mult = args.headOption.map(_.toInt).getOrElse(10)
    val spark = GraftSession.local("scale-probe")
    spark.sparkContext.setLogLevel("WARN")
    val dir = "/root/testdata/sf0.1"
    def time[A](name: String)(f: => A): A = {
      val t0 = System.nanoTime(); val r = f
      println(f"SCALE $name ${(System.nanoTime() - t0) / 1e9}%.2f s"); r
    }

    val docs0 = Tables.documents(spark, dir).select("doc_id", "text")
    val n0 = docs0.count()
    val copies = spark.range(mult).toDF("copy")
    val docs = docs0.crossJoin(copies)
      .select(
        (col("doc_id") * mult + col("copy")).as("doc_id"),
        when(col("copy") === 0, col("text"))
          .otherwise(concat(col("text"), lit(" perturbcopy"),
                            col("copy").cast("string"))).as("text"))
      .repartition(64)
      .persist()
    println(s"SCALE corpus ${docs.count()} docs (${mult}x of $n0)")

    time(s"minhash_lsh_${mult}x") {
      val pairs = Dedup.minhashDedupPairs(docs, "doc_id", "text", 3, 4, 5)
      println("  near-dup pairs: " + pairs.count())
    }
    time(s"minhash_ckpt_${mult}x") {
      val dir = java.nio.file.Files
        .createTempDirectory("graft-probe-ckpt").toString
      val pairs = Dedup.minhashDedupPairsCheckpointed(
        docs, "doc_id", "text", 3, 4, 5, checkpointDir = dir)
      println("  ckpt near-dup pairs: " + pairs.count())
    }
    time(s"exact_dedup_${mult}x") {
      Dedup.exactByContent(docs, "doc_id", "text").count()
    }
    time(s"simhash_pairs_${mult}x") {
      println("  simhash pairs: " +
        Dedup.simhashPairs(docs, "doc_id", "text").count())
    }

    val emb0 = Tables.embeddings(spark, dir)
    val emb = emb0.crossJoin(copies)
      .select((col("vec_id") * mult + col("copy")).as("vec_id"),
              col("embedding"))
      .repartition(64).persist()
    println(s"SCALE vectors ${emb.count()}")
    time(s"ann_lsh_${mult}x") {
      Similarity.annTopK(emb, col("vec_id") < 20, k = 3).count()
    }
    spark.stop()
  }
}
