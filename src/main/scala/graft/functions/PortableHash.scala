package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Engine-portable deterministic hashes.
  *
  * Spark's native `hash`/`xxhash64` are fast but engine-specific, which
  * makes results impossible to cross-check against an external SQL oracle.
  * For operators whose OUTPUT is hash-derived (fingerprints, SimHash,
  * MinHash verification paths) we instead derive integers from `md5` hex
  * prefixes — md5 is identical in every engine, and the prefix parse
  * (`conv(hex,16,10)` here ≡ `('0x'||hex)::bigint` in DuckDB) is exact.
  *
  * Cost note: md5 is ~5× slower than xxhash64 per call, but all uses are
  * embarrassingly parallel per-row expressions inside whole-stage codegen —
  * no shuffle, no driver work — so at 100 TB this scales linearly with
  * cores and is never the bottleneck relative to the joins it feeds.
  */
object PortableHash {

  /** 32-bit hash of a string as a non-negative long in [0, 2^32). */
  def h32(c: Column): Column =
    conv(substring(md5(c), 1, 8), 16, 10).cast("long")

  /** 24-bit hash — small enough to fold into rolling hashes without
    * overflowing 64-bit accumulators.
    */
  def h24(c: Column): Column =
    conv(substring(md5(c), 1, 6), 16, 10).cast("long")

  /** 52-bit hash (13 hex digits) as a non-negative long in [0, 2^52) —
    * collision-safe to ~2^26 distinct keys (birthday bound), the right
    * width for order-statistic sketches ([[graft.operators.Kmv]])
    * where a 32-bit space would collide at corpus-scale key counts
    * and silently merge distinct values.
    */
  def h52(c: Column): Column =
    conv(substring(md5(c), 1, 13), 16, 10).cast("long")

  /** 2^52 — the size of the [[h52]] value space, the numerator scale
    * for order-statistic estimators over it.
    */
  val H52Space: Long = 4503599627370496L

  /** Second 32-bit half (md5 hex digits 9–16). The pair
    * ([[h32]], h32b) is an effectively 64-bit portable key — collision
    * odds ~n²/2⁶⁵ — for group keys where a single 32-bit half would
    * collide at corpus scale (birthday bound ~2¹⁶ keys).
    */
  def h32b(c: Column): Column =
    conv(substring(md5(c), 9, 8), 16, 10).cast("long")

  /** Prime > 2^32 for universal-hash families over [[h32]] values. */
  val MinHashPrime: Long = 4294967311L

  /** i-th universal hash h_i(x) = (a_i*x + b_i) mod p applied to a
    * 32-bit value. a_i < 2^30 (odd), b_i < 2^31, so a_i*x + b_i < 2^63:
    * no overflow. `i` may be a lambda variable (column).
    */
  def permHash(i: Column, x: Column): Column = {
    val a = pmod(i.cast("long") * lit(2654435761L), lit(536870912L)) * 2 + 1
    val b = pmod(i.cast("long") * lit(1013904223L), lit(2147483647L))
    pmod(a * x + b, lit(MinHashPrime))
  }
}
