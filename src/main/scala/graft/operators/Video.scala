package graft.operators

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._
import graft.GraftOps._

/** Video-modality plumbing: frame-sampled decode and fingerprint
  * near-dup over opaque `binary` payloads, composing the REAL image
  * codec in [[Multimodal]].
  *
  * Container: the JVM ships no video codec, so payloads use a minimal
  * deterministic frame container — `GVID` magic, big-endian frame
  * count, then per frame a big-endian byte length + REAL PNG bytes
  * (encoded and decoded via `javax.imageio`, same as the image path).
  * The container is the FIXTURE leg (a stand-in for mp4/mkv demuxing);
  * everything downstream of "hand me frame f's encoded bytes" — the
  * Spark plumbing, the skip-vs-decode economics, the per-frame codec,
  * the fingerprint index — is real and oracle-gated.
  *
  * Frame SAMPLING is the point of the operator: [[sampleFrames]] walks
  * the container by length fields and decodes ONLY every `stride`-th
  * frame — the skipped frames' bytes are never fed to the codec, which
  * is what makes feature extraction affordable on a video corpus
  * (decode cost ∝ sampled frames, not total frames). One narrow
  * mapPartitions pass; payload bytes never enter an exchange.
  */
object Video {

  /** Frames-per-payload and content seed for `id`'s fixture video
    * (the FEATURE family, q150): groups of 5 consecutive ids share
    * one (frame count, seed) — byte-identical payloads. Frames are
    * 16×16 gradient cards; the near-dup gate uses the separate
    * contrast-pattern family ([[dupParamsFor]]) because a pure
    * gradient's 2×2-block means are near-ties under [[Multimodal.aHash64]]
    * and tiny shifts flip knife-edge bits.
    */
  def paramsFor(id: Long): (Int, Long) = {
    val g = id / 5
    (((g % 3 + 2) * 4).toInt, g % 251)
  }

  val FrameW = 16
  val FrameH = 16

  /** Pixel (x, y) of frame f: the gradient card family with a
    * per-frame phase (`11·f`) so frames within one video differ.
    */
  def framePixel(seed: Long, f: Int, x: Int, y: Int): Int =
    ((seed + 11L * f + 7L * x + 13L * y) % 251).toInt

  /** Encode the fixture video for `id`: real PNG frames in the GVID
    * length-prefixed container.
    */
  def encodeVideo(id: Long): Array[Byte] = {
    val (nFrames, seed) = paramsFor(id)
    packFrames((0 until nFrames).map { f =>
      Multimodal.encodeCard(FrameW, FrameH, (x, y) => framePixel(seed, f, x, y))
    })
  }

  /** Parse the container and decode every `stride`-th frame (frame
    * indices 0, stride, 2·stride, …). Skipped frames are SKIPPED —
    * their bytes are never decoded, only stepped over via the length
    * field. Returns (total frame count, decoded sampled frames as
    * (frame_idx, width, height, pixels)).
    */
  def sampleFrames(bytes: Array[Byte], stride: Int)
      : (Int, Seq[(Int, Int, Int, Array[Long])]) = {
    require(stride >= 1, s"stride must be >= 1: $stride")
    val buf = java.nio.ByteBuffer.wrap(bytes)
    val magic = new Array[Byte](4)
    buf.get(magic)
    require(new String(magic, "US-ASCII") == "GVID",
      "undecodable video payload: bad magic")
    val nFrames = buf.getInt
    require(nFrames >= 0, s"negative frame count $nFrames")
    val sampled = Seq.newBuilder[(Int, Int, Int, Array[Long])]
    var f = 0
    while (f < nFrames) {
      val len = buf.getInt
      if (f % stride == 0) {
        val frame = new Array[Byte](len)
        buf.get(frame)
        val (w, h, px) = Multimodal.decodePixels(frame)
        sampled += ((f, w, h, px))
      } else {
        buf.position(buf.position() + len) // step over, never decode
      }
      f += 1
    }
    (nFrames, sampled.result())
  }

  /** Near-dup fixture family. Groups of 5 ids (g = id/5) are
    * byte-identical; group pairs (2b, 2b+1) share base b — same frame
    * count `(b%3+2)·4`, same 64-block CONTRAST PATTERN (block k is
    * +150 bright iff bit k of the base's md5-derived 64-bit pattern
    * word is set — full-entropy patterns, so bucket selectivity keeps
    * scaling with the corpus; an earlier arithmetic pattern used only
    * 6 bits of the base, cycled mod 64, and the 30× probe measured
    * the resulting quadratic alias-pair growth) — with the odd
    * group's gradient seed shifted: +1 for most bases (a close
    * re-encode, KEPT) but +25 on every 5th base (a degraded copy:
    * `|(c+25) mod 50 − c mod 50|` = 25 at every pixel, ~12× the near
    * drift, DROPPED — and since the signed shift averages ~0 per
    * block, the hash still matches, so the degraded pair SURFACES as
    * a candidate and the verify threshold is a live cut). The strong
    * ±150 block contrast is what the gradient-only family lacks:
    * pattern bits dominate the aHash margin, so a 1-unit gradient
    * drift cannot flip buckets. The md5 is the repo's portable-hash
    * discipline — a SQL oracle re-derives it hex-digit for hex-digit.
    */
  def dupParamsFor(id: Long): (Long, Int, Long) = {
    val g = id / 5
    val base = g / 2
    val shift = if (g % 2 == 0) 0 else if (base % 5 == 0) 25 else 1
    (base, ((base % 3 + 2) * 4).toInt, base % 499 + shift)
  }

  /** The base's 64-bit contrast pattern as two 32-bit words
    * (lo = md5 hex digits 1-8, hi = digits 9-16 of the base's decimal
    * string — the same `('0x' \|\| substr(md5(...), …))::BIGINT`
    * parse the oracles use).
    */
  def dupPatternWords(base: Long): (Long, Long) = {
    val md = java.security.MessageDigest.getInstance("MD5")
    val hex = md.digest(base.toString.getBytes("UTF-8"))
      .map(b => f"${b & 0xff}%02x").mkString
    (java.lang.Long.parseLong(hex.substring(0, 8), 16),
     java.lang.Long.parseLong(hex.substring(8, 16), 16))
  }

  /** Pixel (x, y) of dup-family frame f: block contrast + gradient. */
  def dupFramePixel(base: Long, seed: Long, f: Int, x: Int, y: Int): Int = {
    val blk = (y / 2) * 8 + x / 2
    val (lo, hi) = dupPatternWords(base)
    val word = if (blk < 32) lo else hi
    val pat = ((word >> (blk % 32)) & 1L).toInt
    150 * pat + ((seed + 11L * f + 7L * x + 13L * y) % 50).toInt
  }

  /** Encode the dup-family fixture video for `id` (pattern words
    * hoisted: one md5 per video, not per pixel).
    */
  def encodeDupVideo(id: Long): Array[Byte] = {
    val (base, nFrames, seed) = dupParamsFor(id)
    val (lo, hi) = dupPatternWords(base)
    def pixel(f: Int)(x: Int, y: Int): Int = {
      val blk = (y / 2) * 8 + x / 2
      val pat = (((if (blk < 32) lo else hi) >> (blk % 32)) & 1L).toInt
      150 * pat + ((seed + 11L * f + 7L * x + 13L * y) % 50).toInt
    }
    packFrames((0 until nFrames).map { f =>
      Multimodal.encodeCard(FrameW, FrameH, pixel(f))
    })
  }

  private def packFrames(frames: Seq[Array[Byte]]): Array[Byte] = {
    val out = new java.io.ByteArrayOutputStream()
    val dos = new java.io.DataOutputStream(out)
    dos.writeBytes("GVID")
    dos.writeInt(frames.length)
    frames.foreach { b => dos.writeInt(b.length); dos.write(b) }
    out.toByteArray
  }

  /** Additive offset deriving scene B's contrast pattern from scene
    * A's: independent md5 words, so the cross-cut hamming distance sits
    * near 32 of 64 bits — far above [[sceneChanges]]' threshold, while
    * within-scene consecutive frames differ only in the ±50 gradient
    * residue the ±150 pattern contrast dominates.
    */
  val SceneSeedOffset = 100003L

  /** (frame count, cut index) of `id`'s scene fixture: 8/12/16 frames,
    * the cut at the midpoint — even, so stride-2 sampling LANDS on the
    * cut frame and the detected boundary index is exact.
    */
  def sceneParamsFor(id: Long): (Int, Int) = {
    val nf = ((id % 3 + 2) * 4).toInt
    (nf, nf / 2)
  }

  /** Encode the scene-cut fixture video: the dup family's contrast
    * cards ([[dupFramePixel]] arithmetic) with the 64-bit pattern
    * switching from md5(id) to md5(id + [[SceneSeedOffset]]) at the
    * cut frame.
    */
  def encodeSceneVideo(id: Long): Array[Byte] = {
    val (nf, cut) = sceneParamsFor(id)
    val (aLo, aHi) = dupPatternWords(id)
    val (bLo, bHi) = dupPatternWords(id + SceneSeedOffset)
    def pixel(f: Int)(x: Int, y: Int): Int = {
      val blk = (y / 2) * 8 + x / 2
      val (lo, hi) = if (f < cut) (aLo, aHi) else (bLo, bHi)
      val pat = (((if (blk < 32) lo else hi) >> (blk % 32)) & 1L).toInt
      150 * pat + ((id + 11L * f + 7L * x + 13L * y) % 50).toInt
    }
    packFrames((0 until nf).map { f =>
      Multimodal.encodeCard(FrameW, FrameH, pixel(f))
    })
  }

  case class VideoRow(doc_id: Long, payload: Array[Byte])

  /** Attach a fixture video payload to the documents table. */
  def withPayload(spark: SparkSession, docs: DataFrame): Dataset[VideoRow] = {
    import spark.implicits._
    // spread: codec parallelism guard, no-op at scale
    Partitioning.spread(docs.select(col("doc_id"))).as[Long]
      .mapPartitions(_.map(id => VideoRow(id, encodeVideo(id))))
  }

  /** [[withPayload]] for the near-dup fixture family
    * ([[dupParamsFor]]).
    */
  def withDupPayload(spark: SparkSession, docs: DataFrame)
      : Dataset[VideoRow] = {
    import spark.implicits._
    Partitioning.spread(docs.select(col("doc_id"))).as[Long]
      .mapPartitions(_.map(id => VideoRow(id, encodeDupVideo(id))))
  }

  /** [[withPayload]] for the scene-cut fixture family
    * ([[sceneParamsFor]]).
    */
  def withScenePayload(spark: SparkSession, docs: DataFrame)
      : Dataset[VideoRow] = {
    import spark.implicits._
    Partitioning.spread(docs.select(col("doc_id"))).as[Long]
      .mapPartitions(_.map(id => VideoRow(id, encodeSceneVideo(id))))
  }

  /** SCENE-CHANGE detection: a boundary is a consecutive SAMPLED-frame
    * pair whose [[Multimodal.aHash64]] hamming distance exceeds
    * `hammingMin`. Per video: total/sampled frame counts, boundary
    * count, and the first boundary's frame index (−1 if none — the
    * scene-segmentation signal a video training pipeline cuts clips
    * on). The comparison runs on the hashes of frames stride-sampling
    * ALREADY decoded — detection rides the q150 decode economics and
    * adds zero codec work, one narrow map, no shuffle (consecutive
    * frames of one video never span rows).
    */
  def sceneChanges(spark: SparkSession, media: Dataset[VideoRow],
                   stride: Int, hammingMin: Int): DataFrame = {
    import spark.implicits._
    media.mapPartitions(_.map { r =>
      val (nFrames, frames) = sampleFrames(r.payload, stride)
      val hashes = frames.map { case (f, w, h, px) =>
        (f, Multimodal.aHash64(w, h, px))
      }
      val bounds = hashes.iterator.sliding(2).withPartial(false).collect {
        case Seq((_, h0), (f1, h1))
            if java.lang.Long.bitCount(h0 ^ h1) > hammingMin => f1.toLong
      }.toSeq
      (r.doc_id, nFrames.toLong, hashes.size.toLong, bounds.size.toLong,
       if (bounds.isEmpty) -1L else bounds.min)
    }).toDF("doc_id", "n_frames", "n_sampled", "n_boundaries",
            "first_boundary")
  }

  /** Frame-sampled features: one row per (video, sampled frame) with
    * the decoded frame's exact pixel sum — the schema a downstream
    * vision featurizer consumes. One narrow pass, no shuffle.
    */
  def frameFeatures(spark: SparkSession, media: Dataset[VideoRow],
                    stride: Int): DataFrame = {
    import spark.implicits._
    media.flatMap { r =>
      val (nFrames, frames) = sampleFrames(r.payload, stride)
      frames.map { case (f, w, h, px) =>
        (r.doc_id, nFrames.toLong, f.toLong, w.toLong, h.toLong, px.sum)
      }
    }.toDF("doc_id", "n_frames", "frame_idx", "width", "height",
           "pixel_sum")
  }

  /** Per-video extract-once feature row: everything the downstream
    * video queries consume — sampled frame indices/dims/pixel-sums
    * (q150), the aHash64 fingerprint sequence (q151 buckets, q200
    * hamming), and the concatenated sampled pixels (q151's exact
    * verify). One decode pass produces all of it.
    */
  case class VideoFeatures(doc_id: Long, n_frames: Long,
                           idxs: Array[Long], widths: Array[Long],
                           heights: Array[Long], pxsums: Array[Long],
                           hashes: Array[Long], px: Array[Long])

  /** Extract-once feature table for a fixture `family` at `stride`
    * ([[FeatureStore]] semantics: ONE codec pass per process, every
    * consumer reads the parquet). Payload bytes stay in this narrow
    * extraction pass — downstream plans exchange only feature columns.
    */
  def featureTable(spark: SparkSession, family: String,
                   media: => Dataset[VideoRow], stride: Int): DataFrame =
    FeatureStore.tableFor(spark, s"video-$family-s$stride") {
      import spark.implicits._
      media.mapPartitions(_.map { r =>
        val (nFrames, frames) = sampleFrames(r.payload, stride)
        VideoFeatures(
          r.doc_id, nFrames.toLong,
          frames.map(_._1.toLong).toArray,
          frames.map(_._2.toLong).toArray,
          frames.map(_._3.toLong).toArray,
          frames.map { case (_, _, _, px) => px.sum }.toArray,
          frames.map { case (_, w, h, px) =>
            Multimodal.aHash64(w, h, px) }.toArray,
          frames.flatMap(_._4).toArray)
      }).toDF()
    }

  /** [[frameFeatures]] over an extract-once [[featureTable]]: one
    * narrow explode of the per-video arrays — identical output, zero
    * codec work.
    */
  def frameFeaturesFrom(features: DataFrame): DataFrame =
    features
      .select(col("doc_id"), col("n_frames"),
              explode(arrays_zip(col("idxs"), col("widths"),
                                 col("heights"), col("pxsums"))).as("f"))
      .select(col("doc_id"), col("n_frames"),
              col("f.idxs").as("frame_idx"), col("f.widths").as("width"),
              col("f.heights").as("height"),
              col("f.pxsums").as("pixel_sum"))

  /** [[sceneChanges]] over an extract-once [[featureTable]]: the
    * consecutive-hash hamming test as array HOFs over the fingerprint
    * sequence — identical output, zero codec work, still no shuffle.
    */
  def sceneChangesFrom(features: DataFrame, hammingMin: Int): DataFrame =
    features
      .withColumn("bounds", expr(
        s"""CASE WHEN size(hashes) < 2 THEN array()
           |ELSE filter(transform(sequence(1, size(hashes) - 1),
           |  i -> CASE WHEN bit_count(hashes[i] ^ hashes[i-1])
           |                  > $hammingMin
           |            THEN idxs[i] ELSE CAST(-1 AS BIGINT) END),
           |  x -> x >= 0) END""".stripMargin))
      .select(col("doc_id"), col("n_frames"),
              size(col("hashes")).cast("long").as("n_sampled"),
              size(col("bounds")).cast("long").as("n_boundaries"),
              coalesce(array_min(col("bounds")), lit(-1L))
                .as("first_boundary"))

  /** [[videoNearDupPairs]] over an extract-once [[featureTable]]:
    * same (n_frames, fingerprint) bucket join and exact pixel verify,
    * reading the parquet signature store instead of re-decoding (no
    * localCheckpoint needed — the store IS the materialization).
    */
  def videoNearDupPairsFrom(features: DataFrame,
                            vadE6Max: Long): DataFrame = {
    val fp = features.select(col("doc_id"), col("n_frames"),
                             col("hashes").as("fp"), col("px"))
    val a = fp.select(col("doc_id").as("doc_a"), col("n_frames"),
                      col("fp"), col("px").as("pxa"))
    val b = fp.select(col("doc_id").as("doc_b"), col("n_frames"),
                      col("fp"), col("px").as("pxb"))
    a.join(b, Seq("n_frames", "fp"))
      .filter(col("doc_a") < col("doc_b"))
      .select(col("doc_a"), col("doc_b"),
              expr("""(1000000 * aggregate(zip_with(pxa, pxb,
                     |  (x, y) -> abs(x - y)), 0L, (acc, v) -> acc + v))
                     |div size(pxa)""".stripMargin).as("vad_e6"))
      .filter(col("vad_e6") <= vadE6Max)
  }

  case class FingerprintedVideo(doc_id: Long, n_frames: Long,
                                fp: Array[Long], px: Array[Long])

  /** Video near-duplicate pairs: fingerprint = the sequence of
    * [[Multimodal.aHash64]] hashes of the sampled frames; candidates
    * bucket on (n_frames, full fingerprint) — sampled-hash-sequence
    * equality, the video analog of the image hash bucket — and verify
    * EXACTLY by summed absolute pixel difference over the sampled
    * frames, floor-scaled e6 per compared pixel. Decode-once
    * (localCheckpoint signature store), bucket → verify, never
    * all-pairs.
    *
    * RELEASE CONTRACT: the returned plan reads the internal signature
    * checkpoint, which `GraftColumns.unpersistCheckpoint(result)`'s
    * deep traversal releases once the caller is done — or prefer the
    * extract-once [[videoNearDupPairsFrom]] + [[featureTable]] path,
    * which pins no blocks at all.
    */
  def videoNearDupPairs(spark: SparkSession, media: Dataset[VideoRow],
                        stride: Int, vadE6Max: Long): DataFrame = {
    import spark.implicits._
    val fp = media.mapPartitions(_.map { r =>
      val (nFrames, frames) = sampleFrames(r.payload, stride)
      val hashes = frames.map { case (_, w, h, px) =>
        Multimodal.aHash64(w, h, px)
      }.toArray
      FingerprintedVideo(r.doc_id, nFrames.toLong, hashes,
                         frames.flatMap(_._4).toArray)
    }).toDF().graftCheckpoint()
    val a = fp.select(col("doc_id").as("doc_a"), col("n_frames"),
                      col("fp"), col("px").as("pxa"))
    val b = fp.select(col("doc_id").as("doc_b"), col("n_frames"),
                      col("fp"), col("px").as("pxb"))
    a.join(b, Seq("n_frames", "fp"))
      .filter(col("doc_a") < col("doc_b"))
      .select(col("doc_a"), col("doc_b"),
              expr("""(1000000 * aggregate(zip_with(pxa, pxb,
                     |  (x, y) -> abs(x - y)), 0L, (acc, v) -> acc + v))
                     |div size(pxa)""".stripMargin).as("vad_e6"))
      .filter(col("vad_e6") <= vadE6Max)
  }
}
