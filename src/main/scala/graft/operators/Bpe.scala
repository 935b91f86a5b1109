package graft.operators

import org.apache.spark.sql.{DataFrame, Row, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

import graft.functions.TextFunctions
import graft.GraftOps._

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

  /** Merge lists at most this long encode as a literal replace-chain
    * inside whole-stage codegen; longer lists (real tokenizers carry
    * 30k–50k merges, far past JIT method limits) take the broadcast
    * mapPartitions path. Same semantics either way — parity is
    * spec-gated (`BpeSpec`).
    */
  val maxCodegenMerges = 32

  /** Sennrich-style merge APPLY (encode): segment each word of `textCol`
    * to characters and apply `merges` in training order, each as a
    * literal replace-all — "apply the learned operations in the order
    * they were learned" (the original subword-nmt semantics), which
    * reproduces the training segmentation exactly on the training
    * corpus. Output: `idCols` + `encoded`, the wrapped segmentation
    * (words space-separated, each token pipe-wrapped as in training).
    *
    * Scale shape: encoding is embarrassingly per-row — NO shuffle at any
    * merge count or corpus size. Small merge lists fold into a codegen
    * replace chain; large ones broadcast the merge array once and run
    * the same loop per row with a contains() short-circuit.
    */
  def encode(docs: DataFrame, textCol: String, idCols: Seq[String],
             merges: Seq[(String, String)],
             maxCodegen: Int = maxCodegenMerges): DataFrame = {
    require(merges.forall { case (l, r) =>
      l.nonEmpty && r.nonEmpty && !l.contains("|") && !r.contains("|")
    }, "merge symbols must be non-empty and pipe-free")
    if (merges.size <= maxCodegen) {
      val seg0 = array_join(
        transform(
          filter(TextFunctions.words(col(textCol)),
                 w => length(w) > 0 && !w.contains("|")),
          w => concat(lit("|"), array_join(split(w, ""), "||"), lit("|"))),
        " ")
      val enc = merges.foldLeft(seg0) { case (e, (l, r)) =>
        replace(e, lit(s"|$l||$r|"), lit(s"|$l$r|"))
      }
      docs.select(idCols.map(col) :+ enc.as("encoded"): _*)
    } else {
      val spark = docs.sparkSession
      val bc = spark.sparkContext.broadcast(merges.toArray)
      val in = docs.select((idCols :+ textCol).map(col): _*)
      val tIdx = in.schema.fields.length - 1
      val outSchema = StructType(
        in.schema.fields.dropRight(1) :+
          StructField("encoded", StringType, nullable = true))
      in.mapPartitions { it =>
        val ms = bc.value
        it.map { r =>
          val text = if (r.isNullAt(tIdx)) null else r.getString(tIdx)
          val enc =
            if (text == null) null
            else {
              // identical segmentation to the codegen path: split on
              // single space KEEPING empties (Spark split semantics),
              // drop empty / pipe-carrying words, wrap chars
              var e = text.split(" ", -1).iterator
                .filter(w => w.nonEmpty && !w.contains("|"))
                .map(w => "|" + w.split("").mkString("||") + "|")
                .mkString(" ")
              var i = 0
              while (i < ms.length) {
                val pat = "|" + ms(i)._1 + "||" + ms(i)._2 + "|"
                if (e.contains(pat))
                  e = e.replace(pat, "|" + ms(i)._1 + ms(i)._2 + "|")
                i += 1
              }
              e
            }
          Row.fromSeq((0 until tIdx).map(r.get) :+ enc)
        }
      }(org.apache.spark.sql.Encoders.row(outSchema))
    }
  }

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
      .graftCheckpoint()

    val merges = Seq.newBuilder[(Int, String, String, Long)]
    // Each round stacks one `replace` projection on the vocab plan, so
    // the LOGICAL PLAN grows linearly with rounds: fine for a handful,
    // but a real 30k–50k-merge training run would blow analysis /
    // codegen long before data size matters (the encode side already
    // has its big-merge-list mapPartitions path, `encode` above). The
    // vocab is therefore re-materialized every CheckpointEvery rounds —
    // lineage and storage stay O(1) in rounds (previous materialization
    // released as soon as the next exists).
    val CheckpointEvery = 16
    var vocab = vocab0
    var lastCkpt = vocab0
    for (r <- 1 to rounds) {
      if (r % CheckpointEvery == 0) {
        val next = vocab.graftCheckpoint()
        org.apache.spark.sql.GraftColumns.unpersistCheckpoint(lastCkpt)
        lastCkpt = next
        vocab = next
      }
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
    org.apache.spark.sql.GraftColumns.unpersistCheckpoint(lastCkpt)

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
