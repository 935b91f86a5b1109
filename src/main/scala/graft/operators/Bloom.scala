package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

import graft.functions.PortableHash

/** Bloom filter (Bloom, CACM 1970) as a relational build/probe pair —
  * the RUNTIME JOIN FILTER: build a constant-size bit table over the
  * small (usually already-filtered) side's join keys, then prune the
  * fact side's scan with a per-row membership predicate BEFORE paying
  * the join's shuffle. At 100 TB the filter is what turns "shuffle
  * every fact row to find the 1% that match" into "shuffle ~the 1%":
  * the predicate is codegen-resident in the scan stage, the bit table
  * broadcasts as one array row, and NO false negatives means the join
  * result is provably unchanged (the q279 gate carries the matched-row
  * count through the filter to pin exactly that).
  *
  * Membership is k portable hash probes ([[PortableHash.h32]] over
  * `"j:key"`, j = 0..k−1) into an mBits-bit array; a key MIGHT be
  * present iff all k bits are set. False-positive rate follows the
  * standard (1 − e^(−kn/m))^k curve — width sizing is the whole game,
  * same as count–min: q279 runs a deliberately undersized 512-bit
  * filter next to a 4096-bit one to gate the curve's two regimes
  * bit-for-bit. Like [[CountMin]], the portable hashes mean an
  * external SQL engine replays the ENTIRE bit table and the exact
  * pass/reject decision per key — the filter is oracle-gated, not
  * trusted.
  *
  * Shape: build = ONE map-combined aggregate over a k-fold explode,
  * ≤ mBits/32 output rows regardless of input size (the sketch
  * contract); merge = cell-wise OR, so 1000 executors can build
  * per-partition filters independently and a reduce-side OR yields
  * the exact corpus filter ([[merge]] — the [[CountMin.merge]]
  * linearity contract, idempotent here because OR is); probe = a
  * crossJoin with the broadcast 1-row packed array + a k-term
  * conjunction evaluated per row inside whole-stage codegen — no
  * explode, no join, no shuffle on the probe side.
  */
object Bloom {

  /** Bit position for probe j of a key: portable 32-bit hash of
    * "j:key" mod mBits. Build and probe must share (mBits, k).
    */
  def posOf(j: Column, key: Column, mBits: Int): Column =
    pmod(PortableHash.h32(concat_ws(":", j, key)), lit(mBits.toLong))

  /** Build the filter over `df(keyCol)` as a (word, bits) table:
    * word = pos div 32, bits = OR of 1L << (pos % 32) — at most
    * mBits/32 rows (32-bit words in 64-bit containers: neither engine
    * can shift into a signed 64-bit sign bit, DuckDB rejects the
    * overflow outright), CONSTANT in input size. NULL keys are EXCLUDED
    * (the [[CountMin.sketch]] contract: a NULL key never matches an
    * equi-join, and the NULL-propagating oracle concatenation would
    * never see it).
    */
  def build(df: DataFrame, keyCol: String, mBits: Int, k: Int): DataFrame = {
    require(mBits % 32 == 0, s"mBits must be a multiple of 32, got $mBits")
    df.filter(col(keyCol).isNotNull)
      .select(explode(sequence(lit(0), lit(k - 1))).as("j"), col(keyCol))
      .select(posOf(col("j"), col(keyCol), mBits).as("pos"))
      .groupBy(expr("pos div 32").as("word"))
      .agg(expr("bit_or(shiftleft(CAST(1 AS BIGINT), CAST(pos % 32 AS INT)))")
        .as("bits"))
  }

  /** Merge filters built over slices of one corpus: membership bits OR
    * (idempotent — overlapping slices are fine, unlike counters), so
    * cell-wise bit_or of per-slice tables IS the corpus filter — the
    * distributed-build contract. Input: any union of (word, bits)
    * rows; output: one row per word.
    */
  def merge(filters: DataFrame): DataFrame =
    filters.groupBy(col("word")).agg(expr("bit_or(bits)").as("bits"))

  /** Pack the (word, bits) table into ONE row holding the dense
    * mBits/32-long array (absent words read 0) — the broadcastable
    * probe-side form. Deterministic: words are range-joined and
    * struct-sorted before collection.
    */
  def pack(filter: DataFrame, mBits: Int): DataFrame =
    filter.sparkSession.range(mBits / 32)
      .select(col("id").as("word"))
      .join(filter, Seq("word"), "left")
      .select(col("word"), coalesce(col("bits"), lit(0L)).as("bits"))
      .agg(expr(
        "transform(array_sort(collect_list(struct(word, bits))), s -> s.bits)")
        .as("__bloom_bits"))

  /** Keep the rows of `df` whose `keyCol` MIGHT be in the built set:
    * all k probe bits set in the packed filter. No false negatives —
    * every built key passes — so `df.filterMaybe(...).join(built)` ≡
    * `df.join(built)`; false positives pass through at the standard
    * rate and are eliminated by the join itself. NULL keys are dropped
    * (they cannot match an equi-join). The packed filter broadcasts as
    * one row; the k-term conjunction runs per row inside codegen —
    * probe cost is k md5 calls, no shuffle. Internal column names are
    * collision-proofed `__bloom_*` (the [[CountMin]] `__cm_*`
    * convention): a caller's frame may freely carry any non-reserved
    * columns through the probe.
    */
  def filterMaybe(df: DataFrame, keyCol: String, packed: DataFrame,
                  mBits: Int, k: Int): DataFrame = {
    val posCols = (0 until k).map(j => s"__bloom_pos$j")
    val withPos = (0 until k).foldLeft(
      df.filter(col(keyCol).isNotNull).crossJoin(broadcast(packed))) {
        (acc, j) => acc.withColumn(posCols(j),
          posOf(lit(j), col(keyCol), mBits))
      }
    val allSet = (0 until k).map { j =>
      expr(s"(shiftright(element_at(__bloom_bits, " +
        s"CAST(${posCols(j)} div 32 AS INT) + 1), " +
        s"CAST(${posCols(j)} % 32 AS INT)) & 1) = 1")
    }.reduce(_ && _)
    withPos.filter(allSet).drop("__bloom_bits").drop(posCols: _*)
  }
}
