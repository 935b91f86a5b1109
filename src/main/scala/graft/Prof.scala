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
    time("shingles_only") {
      docs.select(col("doc_id"), TextFunctions.shingles(col("text"), 3).as("sh"))
        .select(sum(size(col("sh")))).collect()
    }
    time("postings") {
      Dedup.shinglePostings(docs, "doc_id", "text", 3).count()
    }
    time("q21_full") {
      Dedup.jaccardPairs(docs, "doc_id", "text", 3, 1, 2).count()
    }
    val sets = docs.select(col("doc_id"), TextFunctions.shingles(col("text"), 3).as("sh"))
      .filter(size(col("sh")) > 0)
    time("minhash_sig") {
      sets.withColumn("sig", Dedup.minhashSignature(col("sh"), 128))
        .select(sum(element_at(col("sig"), 1))).collect()
    }
    time("q22_full") {
      Dedup.minhashDedupPairs(docs, "doc_id", "text", 3, 4, 5).count()
    }
    spark.stop()
  }
}
