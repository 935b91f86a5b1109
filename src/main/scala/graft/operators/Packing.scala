package graft.operators

import org.apache.spark.sql.{DataFrame, Encoders, Row}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{LongType, StructField, StructType}

/** Sequence packing — laying documents into fixed-length training
  * context windows, the step between curation and the trainer's data
  * loader. Two industry-standard layouts:
  *
  *  - [[chopPack]] — "concatenate and chop" (the GPT/LLaMA pre-training
  *    default): the token streams of all docs are conceptually
  *    concatenated in a global deterministic order and cut every
  *    `ctxLen` tokens; a document may straddle a cut. Pure arithmetic
  *    over the GLOBAL running token sum, which
  *    [[PrefixSum.runningTotal]] provides with one range exchange —
  *    never a single-partition window.
  *  - [[packNextFit]] — boundary-respecting greedy next-fit: documents
  *    never split; a doc that would overflow the open sequence closes it
  *    and starts the next. The scan is inherently sequential, so it runs
  *    PER SHARD (the parallel unit of every production packer): one
  *    shuffle keyed on the shard column, then an O(rows/shard) in-order
  *    pass per shard. Shard count is the parallelism knob; packing
  *    quality is per-shard local, which is exactly the trade production
  *    packers make.
  */
object Packing {

  /** Concat-and-chop layout. Emits one row per document:
    * `start_tok` (global offset of the doc's first token), `first_seq` /
    * `last_seq` (the ctxLen-sized windows the doc touches), `n_seqs`
    * (how many windows it straddles), `off_in_seq` (offset of the first
    * token inside its first window). `orderCols` must be a total order;
    * `tokensCol` must be a positive integral count.
    */
  def chopPack(df: DataFrame, tokensCol: String, orderCols: Seq[String],
               ctxLen: Long): DataFrame = {
    require(ctxLen > 0, s"ctxLen must be positive, got $ctxLen")
    val cum = PrefixSum.runningTotal(df, tokensCol, orderCols)
    val toks = col(tokensCol).cast(LongType)
    val start = col("cum") - toks
    cum
      .withColumn("start_tok", start)
      .withColumn("first_seq", floor(start / ctxLen).cast(LongType))
      .withColumn("last_seq",
        floor((col("cum") - 1) / ctxLen).cast(LongType))
      .withColumn("n_seqs", col("last_seq") - col("first_seq") + 1)
      .withColumn("off_in_seq", start % ctxLen)
  }

  /** Greedy next-fit packing, documents unsplit, per shard. Within each
    * shard (in ascending `idCol` order) a document is appended to the
    * open sequence if it fits (`fill + toks ≤ ctxLen`), else the
    * sequence closes and the doc opens the next one at offset 0. The
    * FIRST doc of a shard always opens sequence 0 at offset 0 — a doc
    * longer than `ctxLen` therefore occupies a (single, overfull)
    * sequence of its own, which packers surface rather than hide
    * (upstream truncation is a separate policy decision).
    *
    * `shardCol` and `idCol` must be integral, `(shard, id)` a total
    * order; `tokensCol` positive. Output: (shard, id, toks, seq_id,
    * seq_off) with seq_id counting from 0 per shard.
    */
  def packNextFit(df: DataFrame, idCol: String, tokensCol: String,
                  shardCol: String, ctxLen: Long): DataFrame = {
    require(ctxLen > 0, s"ctxLen must be positive, got $ctxLen")
    val prepped = df.select(
        col(shardCol).cast(LongType).as("shard"),
        col(idCol).cast(LongType).as("id"),
        col(tokensCol).cast(LongType).as("toks"))
      .repartition(col("shard"))
      .sortWithinPartitions(col("shard"), col("id"))
    val schema = StructType(Seq(
      StructField("shard", LongType, nullable = false),
      StructField("id", LongType, nullable = false),
      StructField("toks", LongType, nullable = false),
      StructField("seq_id", LongType, nullable = false),
      StructField("seq_off", LongType, nullable = false)))
    // the deliberate mapPartitions exception (PrefixSum discipline): a
    // per-shard running fill is genuinely imperative in-order logic, and
    // the shard's rows are already co-located and sorted — any
    // window/join encoding would just re-shuffle what is in place
    prepped.mapPartitions { it =>
      var started = false
      var curShard = 0L
      var fill = 0L
      var seq = 0L
      it.map { r =>
        val shard = r.getLong(0)
        val id = r.getLong(1)
        val toks = r.getLong(2)
        if (!started || shard != curShard) {
          started = true; curShard = shard; fill = 0L; seq = 0L
        }
        if (fill > 0 && fill + toks > ctxLen) { seq += 1; fill = 0L }
        val off = fill
        fill += toks
        Row(shard, id, toks, seq, off)
      }
    }(Encoders.row(schema))
  }
}
