package graft
import org.apache.spark.sql.functions._
import graft.functions.TextFunctions
import graft.operators.Dedup
object Prof {
  def main(args: Array[String]): Unit = {
    val spark = GraftSession.local("prof")
    spark.sparkContext.setLogLevel("WARN")
    val dir = "/root/testdata/sf0.1"
    def time[A](name: String)(f: => A): A = {
      val t0 = System.nanoTime(); val r = f
      println(f"PROF $name ${(System.nanoTime()-t0)/1e9}%.2f s"); r
    }
    val docs = Tables.documents(spark, dir)
    println("PROF docs_partitions " + docs.rdd.getNumPartitions)
    println("PROF emb_partitions " + Tables.embeddings(spark, dir).rdd.getNumPartitions)
    val sets = docs.select(col("doc_id"), TextFunctions.shingles(col("text"), 3).as("sh"))
      .filter(size(col("sh")) > 0)
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    time("sets_materialize") { sets.count() }
    val numPerm = 128; val bands = 32; val rows = 4
    val banded = sets
      .withColumn("sig", Dedup.minhashSignature(col("sh"), numPerm))
      .select(col("doc_id"),
        explode(array((0 until bands).map { b =>
          struct(lit(b).as("band"), xxhash64(slice(col("sig"), b*rows+1, rows)).as("key"))
        }: _*)).as("bk"))
      .select(col("doc_id"), col("bk.band").as("band"), col("bk.key").as("key"))
    time("banded_count") { banded.count() }
    val cand = banded.as("x").join(banded.as("y"),
        col("x.band") === col("y.band") && col("x.key") === col("y.key") &&
          col("x.doc_id") < col("y.doc_id"))
      .select(col("x.doc_id").as("doc_a"), col("y.doc_id").as("doc_b")).distinct()
    time("cand_count") { println("  n_cand=" + cand.count()) }
    time("verify_join") {
      val sa = sets.select(col("doc_id").as("doc_a"), col("sh").as("sh_a"))
      val sb = sets.select(col("doc_id").as("doc_b"), col("sh").as("sh_b"))
      sa.join(broadcast(cand), "doc_a").join(sb, "doc_b")
        .withColumn("inter_cnt", size(array_intersect(col("sh_a"), col("sh_b"))).cast("long"))
        .count()
    }
    time("q22_full_again") { Dedup.minhashDedupPairs(docs, "doc_id", "text", 3, 4, 5).count() }
    spark.stop()
  }
}
