package graft.operators

import java.io.ByteArrayInputStream

import javax.sound.sampled.{AudioFormat, AudioSystem}

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._
import graft.GraftOps._

/** Audio-modality plumbing: PCM payloads travel as opaque `binary`
  * columns (RIFF/WAV container, 16-bit signed little-endian mono)
  * beside typed metadata, mirroring the image path in [[Multimodal]].
  *
  * The codec is REAL on both legs: [[encodeWav]] writes the standard
  * RIFF/WAVE header + PCM16LE data chunk byte-for-byte, and
  * [[decodeWav]] parses payloads back through the JDK's
  * `javax.sound.sampled.AudioSystem` (zero extra dependencies) — so a
  * malformed header, wrong byte order, or off-by-one chunk size fails
  * the decode, and a decode bug diverges from the oracle's
  * re-derivation of the deterministic test signal.
  *
  * Scale notes (same discipline as images): payloads dominate row
  * size, so decode/feature-extract is a single narrow `mapPartitions`
  * pass with no shuffle; downstream analytics select only the small
  * feature columns so the bytes never enter an exchange. Near-dup
  * candidate generation buckets on an energy-envelope perceptual hash
  * — bucket-bound, never all-pairs.
  */
object Audio {

  /** Fixture sample rate (Hz). */
  val Rate = 8000

  /** Samples per analysis frame for the energy envelope (50 ms at
    * [[Rate]]); fixture signal lengths are multiples of this, so
    * every frame is exactly full.
    */
  val FrameLen = 400

  /** |sample| at or under this counts as silence. */
  val SilenceAbsMax = 10L

  case class AudioRow(doc_id: Long, payload: Array[Byte])

  /** Decoded-audio features. `n_bytes` is the encoded payload size
    * (container-dependent — useful operationally, excluded from
    * oracle gates); the rest derive from the decoded samples alone.
    */
  case class AudioFeatures(doc_id: Long, n_bytes: Long, sample_rate: Long,
                           n_samples: Long, duration_ms: Long,
                           peak_abs: Long, sum_abs: Long, sum_sq: Long,
                           silence_e6: Long)

  /** Deterministic test signal for `id`: n = (id%5+2)·800 samples at
    * 8 kHz, base wave b(t) = ((seed + 37t) mod 2001) − 1000 with
    * seed = id mod 499, gated to exact silence on every 4th 400-sample
    * frame (frame index shifted by seed): arithmetic a SQL oracle
    * re-derives without any audio library, with a non-trivial silence
    * structure for the silence-ratio feature.
    */
  def signalFor(id: Long): Array[Short] = {
    val n = ((id % 5 + 2) * 800).toInt
    val seed = id % 499
    val out = new Array[Short](n)
    var t = 0
    while (t < n) {
      val gated = (t / FrameLen + seed) % 4 == 0
      out(t) =
        if (gated) 0
        else ((seed + 37L * t) % 2001 - 1000).toShort
      t += 1
    }
    out
  }

  /** Near-dup fixture family. Blocks of 8 consecutive ids are
    * byte-identical (exact duplicates); block pairs (2k, 2k+1) share
    * base k — same length, same per-frame loudness ENVELOPE (frame f
    * is 3× loud iff bit f of `(k·37 + 11) mod 2^n_frames` is set; the
    * envelope is what makes [[energyHash]] buckets selective across
    * bases) — with the odd block's wave seed shifted: +1 for most
    * bases (a close re-encode, small frame-energy drift, KEPT by the
    * verify threshold) but +10 on every 3rd base (a degraded copy
    * whose drift is ~10× larger, DROPPED) — so the threshold is a
    * live cut, not decoration. All pure arithmetic a SQL oracle
    * re-derives.
    */
  def dupSignalFor(id: Long): Array[Short] = {
    val block = id / 8
    val base = block / 2
    val n = ((base % 5 + 2) * 800).toInt
    val nf = n / FrameLen
    val shift = if (block % 2 == 0) 0 else if (base % 3 == 0) 10 else 1
    val seed = base % 499 + shift
    val env = (base * 37 + 11) % (1L << nf)
    val out = new Array[Short](n)
    var t = 0
    while (t < n) {
      val m = if (((env >> (t / FrameLen)) & 1L) == 1L) 3 else 1
      out(t) = (m * ((seed + 37L * t) % 2001 - 1000)).toShort
      t += 1
    }
    out
  }

  /** Encode PCM16 mono samples as a standard RIFF/WAVE byte stream
    * (16-byte fmt chunk, audio format 1 = PCM, little-endian data).
    */
  def encodeWav(samples: Array[Short], rate: Int = Rate): Array[Byte] = {
    val dataLen = samples.length * 2
    val buf = java.nio.ByteBuffer.allocate(44 + dataLen)
      .order(java.nio.ByteOrder.LITTLE_ENDIAN)
    buf.put("RIFF".getBytes("US-ASCII"))
    buf.putInt(36 + dataLen)
    buf.put("WAVE".getBytes("US-ASCII"))
    buf.put("fmt ".getBytes("US-ASCII"))
    buf.putInt(16)             // fmt chunk size
    buf.putShort(1)            // PCM
    buf.putShort(1)            // mono
    buf.putInt(rate)
    buf.putInt(rate * 2)       // byte rate
    buf.putShort(2)            // block align
    buf.putShort(16)           // bits per sample
    buf.put("data".getBytes("US-ASCII"))
    buf.putInt(dataLen)
    samples.foreach(buf.putShort)
    buf.array()
  }

  /** Decode real WAV bytes → (sample rate, PCM16 samples) via
    * `AudioSystem`. Fails fast on undecodable bytes or a non-PCM16LE
    * mono stream — silent nulls would mask corpus corruption.
    */
  def decodeWav(bytes: Array[Byte]): (Int, Array[Short]) = {
    val in = AudioSystem.getAudioInputStream(new ByteArrayInputStream(bytes))
    val fmt = in.getFormat
    require(fmt.getEncoding == AudioFormat.Encoding.PCM_SIGNED &&
            fmt.getSampleSizeInBits == 16 && fmt.getChannels == 1 &&
            !fmt.isBigEndian,
      s"expected PCM16LE mono WAV, got $fmt")
    val nFrames = in.getFrameLength.toInt
    val raw = in.readAllBytes()
    require(raw.length == nFrames * 2,
      s"short read: ${raw.length} bytes for $nFrames frames")
    val out = new Array[Short](nFrames)
    var i = 0
    while (i < nFrames) {
      out(i) = (((raw(2 * i + 1) & 0xff) << 8) | (raw(2 * i) & 0xff)).toShort
      i += 1
    }
    (fmt.getSampleRate.toInt, out)
  }

  /** Attach a real WAV payload to the documents table (binary column
    * beside the id; codec work is JVM-side, not Catalyst columns).
    */
  def withPayload(spark: SparkSession, docs: DataFrame): Dataset[AudioRow] = {
    import spark.implicits._
    docs.select(col("doc_id")).as[Long]
      .mapPartitions(_.map(id => AudioRow(id, encodeWav(signalFor(id)))))
  }

  /** [[withPayload]] for the near-dup fixture family
    * ([[dupSignalFor]]).
    */
  def withDupPayload(spark: SparkSession, docs: DataFrame)
      : Dataset[AudioRow] = {
    import spark.implicits._
    docs.select(col("doc_id")).as[Long]
      .mapPartitions(_.map(id => AudioRow(id, encodeWav(dupSignalFor(id)))))
  }

  /** Feature extraction: one narrow mapPartitions pass decoding each
    * payload with the real `AudioSystem` codec. `silence_e6` is the
    * floor-scaled fraction of samples with |s| ≤ [[SilenceAbsMax]] —
    * exact integer arithmetic the oracle mirrors.
    */
  def extractFeatures(spark: SparkSession, media: Dataset[AudioRow])
      : Dataset[AudioFeatures] = {
    import spark.implicits._
    media.mapPartitions(_.map { r =>
      val (rate, s) = decodeWav(r.payload)
      val n = s.length.toLong
      var peak = 0L; var sumAbs = 0L; var sumSq = 0L; var nSilent = 0L
      var i = 0
      while (i < s.length) {
        val v = s(i).toLong
        val a = math.abs(v)
        if (a > peak) peak = a
        sumAbs += a
        sumSq += v * v
        if (a <= SilenceAbsMax) nSilent += 1
        i += 1
      }
      AudioFeatures(r.doc_id, r.payload.length.toLong, rate.toLong, n,
                    n * 1000L / rate, peak, sumAbs, sumSq,
                    if (n == 0) 0L else 1000000L * nSilent / n)
    })
  }

  case class HashedAudio(doc_id: Long, n_samples: Long, hash: Long,
                         fe: Array[Long])

  /** Energy-envelope perceptual hash + frame energies for one decoded
    * signal: frame f's energy fe(f) = Σ|s| over its [[FrameLen]]
    * samples; bit f is set iff fe(f)·n_frames > total (frame mean vs
    * signal mean, cross-multiplied — exact integer arithmetic, no
    * division to mirror). The audio analog of [[Multimodal.aHash4]]:
    * loudness-pattern buckets for near-dup candidate generation.
    *
    * SELECTIVITY CAVEAT (the r7 `weak`): one bit per frame means a
    * fixed-length corpus of nf-frame clips lands in at most 2^nf
    * buckets — candidates grow ~n²/2^nf, a candidate-stage explosion
    * at 100 TB. [[energyHashBands]] is the production key (the
    * aHash4 → aHash64 move).
    */
  def energyHash(s: Array[Short]): (Long, Array[Long]) =
    energyHashBands(s, 1)

  /** MULTI-BAND energy hash — [[energyHash]] with `bands` sub-frame
    * energies per frame: frame f splits into `bands` equal
    * [[FrameLen]]/bands-sample slots, slot (f, j)'s energy
    * be(f·bands+j) = Σ|s| over its samples, and bit f·bands+j is set
    * iff be·(n_frames·bands) > total — each slot's mean vs the signal
    * mean, cross-multiplied, division-free. Same integer discipline,
    * `bands`× the bits: a fixed-length corpus now spreads over
    * 2^(nf·bands) buckets instead of 2^nf, which is what keeps the
    * candidate stage bucket-bound on uniform-duration audio (voice
    * clips, ad spots) — the exact move that took the image hash from
    * aHash4 to aHash64 ([[Multimodal]]).
    *
    * Returns (hash, PER-FRAME energies): the verify metric stays the
    * frame-level EAD, so band count tunes ONLY candidate selectivity,
    * never the accept/reject arithmetic. nf·bands must fit a long's
    * bit width (≤ 63).
    */
  def energyHashBands(s: Array[Short], bands: Int): (Long, Array[Long]) = {
    require(s.length % FrameLen == 0 && s.length > 0,
      s"signal length ${s.length} not a positive multiple of $FrameLen")
    require(bands >= 1 && FrameLen % bands == 0,
      s"bands must divide FrameLen=$FrameLen: $bands")
    val nf = s.length / FrameLen
    require(nf.toLong * bands <= 63,
      s"nf*bands = ${nf * bands} exceeds the 63-bit hash width")
    val sub = FrameLen / bands
    val fe = new Array[Long](nf)
    val be = new Array[Long](nf * bands)
    var t = 0
    while (t < s.length) {
      val a = math.abs(s(t).toLong)
      fe(t / FrameLen) += a
      be(t / sub) += a
      t += 1
    }
    val total = fe.sum
    val slots = nf * bands
    var acc = 0L
    var k = 0
    while (k < slots) {
      if (be(k) * slots > total) acc |= (1L << k)
      k += 1
    }
    (acc, fe)
  }

  /** Audio near-duplicate pairs over REAL decoded signals: decode each
    * payload once (narrow pass, localCheckpoint = the signature store),
    * bucket candidates by (n_samples, energy hash), verify each
    * candidate EXACTLY by summed absolute frame-energy difference
    * floor-scaled e6 per sample (`(1e6·Σ_f|fea−feb|) div n_samples`),
    * keep pairs at or under `eadE6Max`. The dedup-pipeline index shape
    * (bucket → verify) applied to the audio modality: candidates are
    * hash-bucket-bound, never all-pairs; like every LSH-family index
    * here the gate covers the pairs this index surfaces — recall is
    * the knob (frame count / hash), measured per deployment.
    *
    * `bands` widens the bucket key to nf·bands bits
    * ([[energyHashBands]]): bands = 1 is the legacy envelope hash
    * (kept for the q149 gate); bands = 4 is the production setting
    * for fixed-length corpora, where the 1-band key's 2^nf buckets
    * stop discriminating and candidates grow ~n²/2^nf. The verify
    * arithmetic (frame-level EAD) is band-independent.
    */
  def audioNearDupPairs(spark: SparkSession, media: Dataset[AudioRow],
                        eadE6Max: Long, bands: Int = 1): DataFrame = {
    import spark.implicits._
    val hashed = media.mapPartitions(_.map { r =>
      val (_, s) = decodeWav(r.payload)
      val (hv, fe) = energyHashBands(s, bands)
      HashedAudio(r.doc_id, s.length.toLong, hv, fe)
    }).toDF().graftCheckpoint()
    val a = hashed.select(col("doc_id").as("doc_a"), col("n_samples"),
                          col("hash"), col("fe").as("fea"))
    val b = hashed.select(col("doc_id").as("doc_b"), col("n_samples"),
                          col("hash"), col("fe").as("feb"))
    a.join(b, Seq("n_samples", "hash"))
      .filter(col("doc_a") < col("doc_b"))
      .select(col("doc_a"), col("doc_b"),
              expr("""(1000000 * aggregate(zip_with(fea, feb,
                     |  (x, y) -> abs(x - y)), 0L, (acc, v) -> acc + v))
                     |div n_samples""".stripMargin).as("ead_e6"))
      .filter(col("ead_e6") <= eadE6Max)
  }
}
