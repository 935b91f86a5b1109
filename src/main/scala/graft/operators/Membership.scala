package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.GraftColumns
import org.apache.spark.sql.catalyst.expressions.{BloomFilterMightContain, Literal}
import org.apache.spark.sql.catalyst.expressions.aggregate.BloomFilterAggregate
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.BinaryType

/** Approximate-membership operators: a distributed Bloom filter as a
  * join PRE-FILTER, with exact results.
  *
  * The target shape is incremental ingest at corpus scale ("which of
  * these keys have we never seen?"). A plain anti-join of a large batch
  * against a 100 TB corpus shuffles both sides on the key; broadcasting
  * either side is impossible. The Bloom filter splits the problem:
  *
  *  1. BUILD — one distributed aggregate over the corpus keys
  *    (Catalyst's `BloomFilterAggregate`: per-partition partial blooms,
  *    OR-merged; no shuffle, output is `numBits/8` bytes on the driver).
  *  2. PROBE — `BloomFilterMightContain` (codegen'd) over the batch:
  *    rows the bloom rejects are DEFINITELY new — they skip the join
  *    entirely. For a mostly-new batch (the crawl-ingest norm) that is
  *    almost every row.
  *  3. CONFIRM — the few survivors (true overlap + fpp false positives)
  *    are exact-anti-joined. Under `broadcastKeyCap` the survivor keys
  *    broadcast into a semi-probe of the corpus scan, so the CORPUS
  *    NEVER SHUFFLES (same asymmetric pattern as
  *    [[Dedup.incrementalMinhashPairs]]); an overlap-heavy batch falls
  *    back to the plain shuffle anti-join.
  *
  * The bloom is a pruning device only — every kept row is confirmed by
  * an exact join, so output equals the plain anti-join EXACTLY at any
  * fpp (a hash/bloom false positive merely demotes a row to the confirm
  * path). Keys are probed as `xxhash64(key)`; build and probe share the
  * hash, so a 64-bit collision likewise only adds a confirm-path row.
  *
  * Sizing: bits ≈ −n·ln(fpp)/ln²2 (~9.6 bits/key at 1%); the driver and
  * every executor hold one copy, so beyond ~10⁹ corpus keys partition
  * the key space and run one bloom per partition. Spark caps the
  * aggregate at `spark.sql.optimizer.runtime.bloomFilter.maxNumBits`
  * (default 64 MiB of bits ≈ 56M keys at 1%) — raise that conf in step
  * with driver memory.
  */
object Membership {

  /** Serialized Bloom filter over `xxhash64(keyCol)` of `corpus`,
    * built distributed (no driver-side iteration). None for an empty
    * corpus (the aggregate yields NULL).
    */
  def buildBloom(corpus: DataFrame, keyCol: String, expectedKeys: Long,
                 fpp: Double): Option[Array[Byte]] = {
    require(expectedKeys > 0, s"expectedKeys must be > 0, got $expectedKeys")
    require(fpp > 0 && fpp < 1, s"fpp must be in (0,1), got $fpp")
    val numBits = math.ceil(
      -expectedKeys * math.log(fpp) / (math.log(2) * math.log(2))).toLong
    val agg = new BloomFilterAggregate(
      GraftColumns.expression(xxhash64(col(keyCol))),
      Literal(expectedKeys), Literal(numBits)).toAggregateExpression()
    Option(corpus.select(GraftColumns.column(agg).as("bf"))
      .head.getAs[Array[Byte]]("bf"))
  }

  /** Codegen'd membership probe against a serialized bloom. */
  def mightContain(bloom: Array[Byte], key: Column): Column =
    GraftColumns.column(BloomFilterMightContain(
      Literal(bloom, BinaryType),
      GraftColumns.expression(xxhash64(key))))

  /** Rows of `batch` whose `keyCol` appears nowhere in `corpus` — the
    * EXACT anti-join result, bloom-accelerated (see object doc for the
    * three-stage shape). Row order is not defined; callers sort.
    *
    * `batch` is scanned up to four times (definite-new filter, survivor
    * count, survivor keys, confirm join) — callers with expensive batch
    * lineage should persist or checkpoint it first.
    */
  def newKeys(batch: DataFrame, corpus: DataFrame, keyCol: String,
              expectedCorpusKeys: Long, fpp: Double = 0.01,
              broadcastKeyCap: Long = Dedup.DefaultBroadcastPairCap)
      : DataFrame =
    buildBloom(corpus, keyCol, expectedCorpusKeys, fpp) match {
      case None => batch // empty corpus: every key is new
      case Some(bloom) =>
        val mc = mightContain(bloom, col(keyCol))
        val definitelyNew = batch.filter(!mc)
        val survivors = batch.filter(mc)
        val corpusKeys = corpus.select(col(keyCol))
        val survivorKeys = survivors.select(col(keyCol)).distinct()
        val confirmedNew =
          if (survivorKeys.count() <= broadcastKeyCap) {
            // corpus streams; only keys that match a survivor come back,
            // and that (small) hit set builds the anti-join hash table
            val hits = corpusKeys
              .join(broadcast(survivorKeys), Seq(keyCol), "left_semi")
              .distinct()
            survivors.join(broadcast(hits), Seq(keyCol), "left_anti")
          } else {
            survivors.join(corpusKeys, Seq(keyCol), "left_anti")
          }
        definitelyNew.unionByName(confirmedNew)
    }
}
