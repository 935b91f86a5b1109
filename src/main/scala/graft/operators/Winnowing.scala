package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.functions.{PortableHash, TextFunctions}

/** WINNOWING document fingerprints (Schleimer, Wilkerson & Aiken 2003,
  * "Winnowing: Local Algorithms for Document Fingerprinting" — the MOSS
  * algorithm): from each document's sequence of word k-gram hashes,
  * slide a window of `w` consecutive hashes and select the MINIMUM in
  * each window, ties to the RIGHTMOST position. The selection carries
  * the paper's guarantee: any run of at least `w + k − 1` shared words
  * between two documents yields at least one shared fingerprint — a
  * detection THRESHOLD, which per-doc MinHash (a similarity estimate,
  * q22) and content-defined chunking (boundary-based, q100) do not
  * give. The fingerprint density is ~2/(w+1) of the k-gram count, so
  * the index is a bounded fraction of the corpus by construction.
  *
  * Scale shape: selection is PER-ROW array arithmetic — k-gram hashes,
  * window minima, and tie-breaks all evaluate inside one projection
  * over the document row, ZERO shuffle until the shared-fingerprint
  * pair join (one keyed self-join on the fingerprint hash). The
  * rightmost tie-break is packed arithmetic, not a search: each
  * (hash, pos) becomes `key = hash·2²¹ + (2²¹ − 1 − pos)`, so
  * `array_min` alone yields min-hash-then-rightmost-pos and the SQL
  * oracle shares the same integer formula (no argmin semantics to
  * drift between engines). Documents need fewer than 2²¹ k-grams for
  * the packing — enforced loudly, not silently wrong.
  *
  * Boilerplate fingerprints shared by many documents make hot join
  * keys (Σ df² pairs); the production lever is the q184 family — cap
  * or drop fingerprints above a df threshold — left OFF here (exact
  * recall, the `maxShingleDf` convention).
  */
object Winnowing {

  /** 2²¹ — position width of the packed (hash, pos) key. */
  val MaxKgrams: Long = 2097152L

  /** Per-document selected fingerprints: `(idCol, h, pos)` — the
    * winnowed (hash, rightmost-position) set, deduplicated. Documents
    * with fewer than `window` k-grams (no full window) contribute no
    * fingerprints — stated, as in the paper's guarantee domain. k = 3
    * words per gram.
    */
  def fingerprints(docs: DataFrame, idCol: String, textCol: String,
                   window: Int = 4): DataFrame = {
    require(window >= 1, s"window must be >= 1: $window")
    // spread: the O(len·window) selection arithmetic below runs inside
    // this projection at the scan's split count — 1–2 partitions for a
    // small single-file table serializes it (q223 ran on 7 tasks); a
    // no-op for scans already at >= defaultParallelism splits
    val d = Partitioning.spread(docs)
      .select(col(idCol).as("doc_id"),
              TextFunctions.words(col(textCol)).as("__w"))
    // The 21-bit position bound is enforced INSIDE the same projection
    // that packs the keys (a raise_error branch ahead of the packing),
    // so the guard rides the single existing pass lazily — an eager
    // driver-side pre-scan would double the tokenize cost of every
    // caller for a bound violation that never occurs on sane corpora.
    val kg = when(size(col("__w")) - 2 >= lit(MaxKgrams),
        expr("raise_error(concat('winnowing packs positions into 21 " +
          s"bits; doc ', CAST(doc_id AS STRING), ' has >= $MaxKgrams " +
          "k-grams — split it upstream'))").cast("array<long>"))
      .when(size(col("__w")) >= 3,
        transform(sequence(lit(0), size(col("__w")) - 3),
          i => PortableHash.h32(concat_ws(" ",
            get(col("__w"), i), get(col("__w"), i + 1),
            get(col("__w"), i + 2)))))
      .otherwise(array().cast("array<long>"))
    val keys = transform(kg,
      (h, i) => h * MaxKgrams + (lit(MaxKgrams - 1) - i))
    val sel = when(size(col("__keys")) >= window,
        array_distinct(transform(
          sequence(lit(0), size(col("__keys")) - window),
          j => array_min(slice(col("__keys"), j + 1, lit(window))))))
      .otherwise(array().cast("array<long>"))
    d.withColumn("__keys", keys)
      .select(col("doc_id"), explode(sel).as("__key"))
      .select(col("doc_id"),
              expr(s"__key div $MaxKgrams").as("h"),
              (lit(MaxKgrams - 1) - pmod(col("__key"), lit(MaxKgrams)))
                .cast("long").as("pos"))
      .distinct()
  }

  /** Document pairs sharing at least `minShared` distinct fingerprint
    * hashes: `(doc_a, doc_b, shared_fps)`, `doc_a < doc_b`. One keyed
    * self-join on the hash + one map-combined pair count.
    */
  def sharedFingerprintPairs(docs: DataFrame, idCol: String,
                             textCol: String, window: Int = 4,
                             minShared: Long = 2L): DataFrame = {
    val fp = fingerprints(docs, idCol, textCol, window)
      .select(col("doc_id"), col("h")).distinct()
    fp.select(col("doc_id").as("doc_a"), col("h"))
      .join(fp.select(col("doc_id").as("doc_b"), col("h")), Seq("h"))
      .filter(col("doc_a") < col("doc_b"))
      .groupBy(col("doc_a"), col("doc_b"))
      .agg(count(lit(1)).as("shared_fps"))
      .filter(col("shared_fps") >= minShared)
  }
}
