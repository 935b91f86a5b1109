package graft.operators

import org.apache.spark.sql.{DataFrame, Row, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

import graft.functions.TextFunctions

/** Distributed byte-pair-encoding (BPE) merge training — the tokenizer-
  * construction step of a training-data pipeline: repeatedly count
  * adjacent symbol pairs over the corpus vocabulary (weighted by word
  * frequency), merge the most frequent pair, re-segment, repeat.
  *
  * Scale shape: training runs over the DISTINCT-word table (one initial
  * explode + hash agg over the corpus; the vocabulary is orders of
  * magnitude smaller than the corpus, but still distributed — web-scale
  * text has 10⁸+ distinct "words"). Each round is ONE map-combined
  * aggregate (pair explode + sum) and a 1-row argmax collect — the same
  * control-plane-collect discipline as the k-means Lloyd loop in
  * [[Clustering]]. The merge apply is a per-row literal string replace
  * inside codegen, no shuffle.
  *
  * Symbol encoding: a word's segmentation is kept as the wrapped string
  * `|s1||s2||…||sn|` (each symbol in its own pipe pair). Applying merge
  * (a,b) is then the literal replace `|a||b|` → `|ab|`, whose
  * left-to-right non-overlapping replace-all semantics — identical in
  * every engine — realize exactly BPE's "merged token does not cascade
  * within the round" rule (`a a a` merges to `aa`,`a`, not `aaa`).
  * Pipes cannot collide with symbols: the alphabet is split from word
  * characters, and `|` never appears inside a token.
  */
object Bpe {

  /** Train `rounds` merges over the words of `textCol`. Returns one row
    * per merge — (round, left_sym, right_sym, weight) with `weight` the
    * merged pair's corpus frequency — plus a final summary row
    * (round = rounds+1, empty symbols) whose `weight` is the total
    * post-merge symbol count Σ freq·|syms| — gating the LAST round's
    * apply, which no pair count would otherwise observe.
    */
  def trainMerges(docs: DataFrame, textCol: String, rounds: Int)
      : DataFrame = {
    require(rounds >= 1, s"need rounds >= 1, got $rounds")
    val spark = docs.sparkSession
    val vocab0 = Partitioning.spread(docs)
      .select(explode(TextFunctions.words(col(textCol))).as("word"))
      .filter(length(col("word")) > 0 && !col("word").contains("|"))
      .groupBy("word").agg(count(lit(1)).as("freq"))
      .select(
        concat(lit("|"), array_join(split(col("word"), ""), "||"), lit("|"))
          .as("s"),
        col("freq"))
      .localCheckpoint()

    val merges = Seq.newBuilder[(Int, String, String, Long)]
    var vocab = vocab0
    for (r <- 1 to rounds) {
      val syms = split(expr("substring(s, 2, length(s) - 2)"), "\\|\\|")
      val top = vocab
        .select(col("freq"), syms.as("syms"))
        // guard: sequence(1, 0) would DESCEND, not be empty — single-
        // symbol words must explode to no pairs, not a bogus one
        .select(col("freq"), posexplode(expr(
          "CASE WHEN size(syms) >= 2 THEN " +
            "transform(sequence(1, size(syms) - 1), " +
            "i -> struct(syms[i - 1] AS l, syms[i] AS r)) " +
            "ELSE CAST(array() AS array<struct<l:string,r:string>>) END")))
        .groupBy(col("col.l").as("l"), col("col.r").as("r"))
        .agg(sum(col("freq")).as("w"))
        .orderBy(col("w").desc, col("l").asc, col("r").asc)
        .limit(1)
        .collect()
      if (top.nonEmpty) {
        val (l, rr, w) =
          (top(0).getString(0), top(0).getString(1), top(0).getLong(2))
        merges += ((r, l, rr, w))
        vocab = vocab.select(
          replace(col("s"), lit(s"|$l||$rr|"), lit(s"|$l$rr|")).as("s"),
          col("freq"))
      }
    }
    val totalSyms = vocab
      .select(sum(col("freq") *
        size(split(expr("substring(s, 2, length(s) - 2)"), "\\|\\|")))
        .as("t"))
      .collect()(0).getLong(0)
    vocab0.unpersist()

    val rows = merges.result().map { case (r, l, rr, w) =>
      Row(r.toLong, l, rr, w)
    } :+ Row((rounds + 1).toLong, "", "", totalSyms)
    spark.createDataFrame(
      spark.sparkContext.parallelize(rows, 1),
      StructType(Seq(
        StructField("round", LongType, nullable = false),
        StructField("left_sym", StringType, nullable = false),
        StructField("right_sym", StringType, nullable = false),
        StructField("weight", LongType, nullable = false))))
  }
}
