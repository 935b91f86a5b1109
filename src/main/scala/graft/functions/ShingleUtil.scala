package graft.functions

import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.unsafe.types.UTF8String

/** Compiled kernels for shingling and MinHash, called from the codegen'd
  * expressions [[WordShingles]] / [[MinHashSignature]]. Top-level object →
  * scalac emits static forwarders, so generated Java calls these directly
  * (`graft.functions.ShingleUtil.shingles(...)`) with no reflection.
  *
  * Value parity contracts (each kernel must equal the Column-function form
  * it replaced, so DuckDB oracles remain exact):
  *  - `shingles` ≡ `array_distinct(transform(sequence(0, size(w)-n),
  *    i => concat_ws(" ", slice(w, i+1, n))))` — distinct n-word windows
  *    joined by single spaces, first-occurrence order.
  *  - `minhashSig(sh, k)[i]` ≡ min over shingles s of
  *    `PortableHash.permHash(i, PortableHash.h32(s))`: h32 is the first 4
  *    md5 bytes as an unsigned int (= `conv(substring(md5(s),1,8),16,10)`),
  *    perm params a_i/b_i and the modulus match [[PortableHash]] exactly.
  */
object ShingleUtil {

  private val Space = UTF8String.fromString(" ")

  def shingles(words: ArrayData, n: Int): ArrayData = {
    val m = words.numElements()
    if (m < n) return new GenericArrayData(Array.empty[Any])
    val seen = new java.util.LinkedHashSet[UTF8String]()
    val parts = new Array[UTF8String](n)
    var i = 0
    while (i <= m - n) {
      var j = 0
      while (j < n) { parts(j) = words.getUTF8String(i + j); j += 1 }
      seen.add(UTF8String.concatWs(Space, parts: _*))
      i += 1
    }
    new GenericArrayData(seen.toArray(new Array[AnyRef](seen.size())))
  }

  /** 64-bit SimHash over word OCCURRENCES (duplicates weigh in): bit b of
    * the result is set iff Σ_words (2·bit_b(h64(w)) − 1) > 0, where h64 is
    * the first 8 md5 bytes big-endian — the hi 32 bits equal
    * [[PortableHash.h32]] (`('0x'||substr(md5(w),1,8))::BIGINT` in DuckDB)
    * and the lo 32 bits are `substr(md5(w),9,8)` parsed the same way, so
    * an external oracle can rebuild the signature from two 32-bit halves
    * without unsigned-64 arithmetic. Null array slots are skipped.
    */
  def simhash64(words: ArrayData): Long = {
    val counts = new Array[Int](64)
    val md = java.security.MessageDigest.getInstance("MD5")
    val m = words.numElements()
    var k = 0
    while (k < m) {
      if (!words.isNullAt(k)) {
        md.reset()
        val d = md.digest(words.getUTF8String(k).getBytes)
        var h = 0L
        var j = 0
        while (j < 8) { h = (h << 8) | (d(j) & 0xffL); j += 1 }
        var b = 0
        while (b < 64) {
          if (((h >>> b) & 1L) == 1L) counts(b) += 1 else counts(b) -= 1
          b += 1
        }
      }
      k += 1
    }
    var sig = 0L
    var b = 0
    while (b < 64) { if (counts(b) > 0) sig |= (1L << b); b += 1 }
    sig
  }

  /** The string plus every 1-character deletion of it, distinct,
    * first-occurrence order — the SymSpell deletion neighborhood for
    * edit-distance-1 candidate generation: two strings within distance 1
    * ALWAYS share a neighborhood entry (equal → identity; substitution →
    * both drop the differing position; insertion/deletion → the longer
    * one's deletion equals the shorter), so a join on the neighborhood
    * has exact recall and the expensive levenshtein runs only on
    * candidates. Char-based (documented: supplementary code points count
    * as two units — fine for the ASCII keys this targets).
    */
  def deletions1(s: UTF8String): ArrayData = {
    val str = s.toString
    val seen = new java.util.LinkedHashSet[UTF8String]()
    seen.add(s)
    var i = 0
    while (i < str.length) {
      seen.add(UTF8String.fromString(
        str.substring(0, i) + str.substring(i + 1)))
      i += 1
    }
    new GenericArrayData(seen.toArray(new Array[AnyRef](seen.size())))
  }

  def minhashSig(shingles: ArrayData, numPerm: Int): ArrayData = {
    val p = PortableHash.MinHashPrime
    val as = new Array[Long](numPerm)
    val bs = new Array[Long](numPerm)
    var i = 0
    while (i < numPerm) {
      as(i) = (i * 2654435761L % 536870912L) * 2 + 1
      bs(i) = i * 1013904223L % 2147483647L
      i += 1
    }
    val sig = Array.fill(numPerm)(p)
    val md = java.security.MessageDigest.getInstance("MD5")
    val m = shingles.numElements()
    var k = 0
    while (k < m) {
      md.reset()
      val d = md.digest(shingles.getUTF8String(k).getBytes)
      val h = ((d(0) & 0xffL) << 24) | ((d(1) & 0xffL) << 16) |
        ((d(2) & 0xffL) << 8) | (d(3) & 0xffL)
      i = 0
      while (i < numPerm) {
        val v = (as(i) * h + bs(i)) % p
        if (v < sig(i)) sig(i) = v
        i += 1
      }
      k += 1
    }
    new GenericArrayData(sig)
  }
}
