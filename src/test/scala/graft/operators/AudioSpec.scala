package graft.operators

import graft.SparkSpec

class AudioSpec extends SparkSpec {

  test("WAV bytes round-trip exactly through the real codec") {
    for (id <- Seq(0L, 1L, 4L, 41L, 499L)) {
      val s = Audio.signalFor(id)
      val (rate, decoded) = Audio.decodeWav(Audio.encodeWav(s))
      assert(rate === Audio.Rate)
      assert(decoded.length === s.length, s"length for id=$id")
      assert(decoded.sameElements(s), s"samples for id=$id")
    }
  }

  test("encodeWav writes a standard RIFF/WAVE header") {
    val bytes = Audio.encodeWav(Array[Short](1, -2, 3))
    assert(new String(bytes.slice(0, 4), "US-ASCII") === "RIFF")
    assert(new String(bytes.slice(8, 12), "US-ASCII") === "WAVE")
    assert(new String(bytes.slice(36, 40), "US-ASCII") === "data")
    assert(bytes.length === 44 + 6)
    // LE sample encoding: -2 = 0xFFFE
    assert((bytes(46) & 0xff) === 0xfe && (bytes(47) & 0xff) === 0xff)
  }

  test("decodeWav fails fast on undecodable bytes") {
    intercept[Exception] { Audio.decodeWav(Array[Byte](1, 2, 3, 4)) }
  }

  test("signalFor gates every 4th frame (seed-shifted) to silence") {
    val id = 7L
    val s = Audio.signalFor(id)
    val seed = id % 499
    assert(s.length === (id % 5 + 2) * 800)
    for (t <- s.indices) {
      if ((t / Audio.FrameLen + seed) % 4 == 0) assert(s(t) === 0)
      else assert(s(t) === ((seed + 37L * t) % 2001 - 1000).toShort)
    }
  }

  test("energyHash sets exactly the louder-than-mean frame bits") {
    // 2 frames: loud then quiet -> bit 0 only
    val loudQuiet = Array.tabulate[Short](800)(t => if (t < 400) 100 else 0)
    val (h1, fe1) = Audio.energyHash(loudQuiet)
    assert(h1 === 1L && fe1.toSeq === Seq(40000L, 0L))
    // uniform signal: no strict winner, hash 0
    val flat = Array.fill[Short](1200)(5)
    assert(Audio.energyHash(flat)._1 === 0L)
    // rejects non-multiple-of-frame lengths
    intercept[IllegalArgumentException] {
      Audio.energyHash(new Array[Short](401))
    }
  }

  test("energyHashBands: bands=1 equals the legacy envelope hash, " +
       "bands=4 sets exactly the louder-than-mean slot bits") {
    for (id <- Seq(0L, 3L, 17L, 42L)) {
      val s = Audio.dupSignalFor(id)
      val (h1a, fe1a) = Audio.energyHashBands(s, 1)
      val (h1b, fe1b) = Audio.energyHash(s)
      assert(h1a === h1b && fe1a.toSeq === fe1b.toSeq)
      val (h4, fe4) = Audio.energyHashBands(s, 4)
      // brute-force slot energies: slot k = 100-sample window k
      val slots = s.length / 100
      val be = Array.tabulate(slots)(k =>
        (k * 100 until (k + 1) * 100).map(t => math.abs(s(t).toLong)).sum)
      val total = be.sum
      val want = (0 until slots)
        .filter(k => be(k) * slots > total)
        .map(k => 1L << k).sum
      assert(h4 === want, s"bands=4 hash for id=$id")
      // frame energies are band-independent (the verify contract)
      assert(fe4.toSeq === Audio.energyHash(s)._2.toSeq)
    }
    // nf*bands must fit the 63-bit hash
    intercept[IllegalArgumentException] {
      Audio.energyHashBands(new Array[Short](8 * 400), 8)
    }
  }

  test("audioNearDupPairs bands=4: exact duplicates still pair, and " +
       "the wider key is strictly more selective on fixed-length clips") {
    import spark.implicits._
    // two ids per even block, bases 5..100 step 5: every clip has
    // n = 2*800 samples (nf = 4) — a FIXED-LENGTH corpus, the regime
    // where the 1-band key's 2^nf buckets stop discriminating.
    // Simulated ground truth: 56 candidates at bands=1 vs 44 at
    // bands=4, with all 20 within-block exact-dup pairs in both.
    val ids = (1 to 20).flatMap { k =>
      val b = 5L * k; Seq(16 * b, 16 * b + 1)
    }
    val docs = ids.toDF("doc_id")
    def candCount(bands: Int): Long = Audio.audioNearDupPairs(
        spark, Audio.withDupPayload(spark, docs),
        eadE6Max = Long.MaxValue, bands = bands).count()
    val c1 = candCount(1)
    val c4 = candCount(4)
    assert(c4 < c1,
      s"bands=4 no more selective than bands=1 on fixed-length corpus " +
        s"($c4 vs $c1)")
    // within-block ids are byte-identical: always share the multi-band
    // bucket and verify at distance 0 — recall on true duplicates is
    // not traded for the selectivity
    val kept = Audio.audioNearDupPairs(
        spark, Audio.withDupPayload(spark, docs),
        eadE6Max = 0L, bands = 4)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val wantPairs = ids.grouped(2).map(p => (p(0), p(1))).toSet
    assert(kept === wantPairs, s"got $kept")
  }

  test("extractFeatures matches the signal arithmetic end-to-end") {
    import spark.implicits._
    val docs = Seq(3L, 12L).toDF("doc_id")
    val got = Audio.extractFeatures(spark, Audio.withPayload(spark, docs))
      .collect().map(f => f.doc_id -> f).toMap
    for (id <- Seq(3L, 12L)) {
      val s = Audio.signalFor(id)
      val f = got(id)
      assert(f.sample_rate === Audio.Rate.toLong)
      assert(f.n_samples === s.length.toLong)
      assert(f.duration_ms === s.length * 1000L / Audio.Rate)
      assert(f.peak_abs === s.map(v => math.abs(v.toLong)).max)
      assert(f.sum_abs === s.map(v => math.abs(v.toLong)).sum)
      assert(f.sum_sq === s.map(v => v.toLong * v).sum)
      val silent = s.count(v => math.abs(v.toInt) <= Audio.SilenceAbsMax)
      assert(f.silence_e6 === 1000000L * silent / s.length)
      assert(f.n_bytes === 44L + 2L * s.length)
    }
  }

  test("audioNearDupPairs: identical payloads pair at distance 0") {
    import spark.implicits._
    // ids 0-7 = block 0, ids 8-15 = block 1: blocks of a base are
    // byte-identical within themselves
    val docs = (0L until 8L).toDF("doc_id")
    val pairs = Audio.audioNearDupPairs(
        spark, Audio.withDupPayload(spark, docs), eadE6Max = 0L)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    assert(pairs.length === 28)          // C(8,2) exact duplicates
    assert(pairs.forall(_._3 === 0L))
  }

  test("audioNearDupPairs: close re-encodes pass the threshold, " +
       "degraded copies are cut, foreign bases never bucket") {
    import spark.implicits._
    // one doc per block: bases 0 (degraded: odd-block seed +10),
    // 1 (close: seed +1), and 5 (same length group as base 0,
    // different envelope -> different hash bucket)
    val docs = Seq(0L, 8L, 16L, 24L, 80L).toDF("doc_id")
    val all = Audio.audioNearDupPairs(
        spark, Audio.withDupPayload(spark, docs), eadE6Max = Long.MaxValue)
      .collect().map(r => ((r.getLong(0), r.getLong(1)), r.getLong(2)))
      .toMap
    // base 1's pair (docs 16, 24) is a seed+1 re-encode: small drift
    assert(all.contains((16L, 24L)) && all((16L, 24L)) > 0L)
    assert(all((16L, 24L)) <= 150000L)
    // base 0's pair (docs 0, 8) is a seed+10 degraded copy: candidate
    // surfaces (same envelope -> same bucket) but drifts past the cut
    assert(all.contains((0L, 8L)) && all((0L, 8L)) > 150000L)
    // bases 0 and 5 share n but not the envelope: no candidate at all
    assert(!all.keys.exists { case (a, b) => b == 80L })
    // the shipped threshold keeps exactly the close pair
    val kept = Audio.audioNearDupPairs(
        spark, Audio.withDupPayload(spark, docs), eadE6Max = 150000L)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(kept === Set((16L, 24L)))
  }
}
