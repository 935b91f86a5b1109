package graft.operators

import java.awt.image.BufferedImage
import java.io.{ByteArrayInputStream, ByteArrayOutputStream}

import javax.imageio.ImageIO

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._
import graft.GraftOps._

/** Multimodal-column plumbing: media payloads travel as opaque `binary`
  * columns beside typed metadata; decode/feature-extract runs as a typed
  * `mapPartitions` over the binary bytes.
  *
  * The codec is REAL: PNG encode/decode via the JDK's `javax.imageio`
  * (zero extra dependencies). [[encodePng]] renders a deterministic
  * grayscale test card per doc id; [[decodeImage]] reads actual PNG
  * bytes back through `ImageIO.read` and extracts width / height /
  * exact pixel sum from the raster (raster samples, NOT `getRGB` —
  * color management would perturb the values; raw samples round-trip
  * 8-bit grayscale PNG losslessly).
  *
  * Scale notes: payloads dominate row size, so feature extraction must
  * be a single narrow pass over the scan (it is: mapPartitions, no
  * shuffle) and downstream analytics should select only the small
  * feature columns (column pruning keeps the binary out of any later
  * exchange). For real corpora, store payloads in their own parquet
  * column so predicate pushdown on metadata never drags bytes through
  * the reader. Per-partition iteration is the shape under which heavier
  * codecs amortize per-batch init.
  */
object Multimodal {

  case class MediaRow(doc_id: Long, payload: Array[Byte])

  /** Decoded-image features. `n_bytes` is the encoded payload size
    * (codec-dependent — useful operationally, excluded from oracle
    * gates); the rest derive from the decoded raster alone.
    */
  case class MediaFeatures(doc_id: Long, n_bytes: Long, width: Long,
                           height: Long, n_pixels: Long, pixel_sum: Long)

  /** Deterministic grayscale test card: pixel(x,y) = (seed+7x+13y) mod
    * 251 — arithmetic a SQL oracle can re-derive without any image
    * library. Dims stay tiny (≤8×6) so per-row codec cost is bounded.
    */
  def dimsFor(id: Long): (Int, Int, Long) =
    ((id % 7 + 2).toInt, (id % 5 + 2).toInt, id % 997)

  /** Encode an arbitrary grayscale card (`pixel(x, y)` in [0, 255]) as
    * real PNG bytes — the shared codec leg of every fixture generator.
    */
  def encodeCard(w: Int, h: Int, pixel: (Int, Int) => Int): Array[Byte] = {
    val img = new BufferedImage(w, h, BufferedImage.TYPE_BYTE_GRAY)
    val raster = img.getRaster
    var y = 0
    while (y < h) {
      var x = 0
      while (x < w) {
        raster.setSample(x, y, 0, pixel(x, y))
        x += 1
      }
      y += 1
    }
    val out = new ByteArrayOutputStream()
    ImageIO.write(img, "png", out)
    out.toByteArray
  }

  /** Encode the test card for `id` as real PNG bytes. */
  def encodePng(id: Long): Array[Byte] = {
    val (w, h, seed) = dimsFor(id)
    encodeCard(w, h, (x, y) => ((seed + 7L * x + 13L * y) % 251).toInt)
  }

  /** GRID test-card family: ≥16×16 cards (w, h ∈ {16, 24, 32}) so the
    * 64-bit 8×8-block hash is non-degenerate (every block ≥ 2×2
    * pixels). seed = (id/18) % 251 makes ids 18k+j and 18k+j+9 (j < 9)
    * EXACT duplicates (same dims, same seed) and ids 18 apart
    * brightness-shifted near-duplicates — the duplicate structure a
    * near-dup gate needs, all pure arithmetic a SQL oracle re-derives.
    */
  def dimsGridFor(id: Long): (Int, Int, Long) =
    ((16 + 8 * (id % 3)).toInt, (16 + 8 * ((id / 3) % 3)).toInt,
     (id / 18) % 251)

  /** Encode the grid test card for `id` as real PNG bytes. */
  def encodePngGrid(id: Long): Array[Byte] = {
    val (w, h, seed) = dimsGridFor(id)
    encodeCard(w, h, (x, y) => ((seed + 7L * x + 13L * y) % 251).toInt)
  }

  /** Decode real image bytes → (width, height, exact pixel sum over all
    * raster bands). Fails fast on undecodable bytes — silent nulls here
    * would mask corpus corruption.
    */
  def decodeImage(bytes: Array[Byte]): (Int, Int, Long) = {
    val img = ImageIO.read(new ByteArrayInputStream(bytes))
    require(img != null, s"undecodable image payload (${bytes.length} bytes)")
    val raster = img.getRaster
    val (w, h, bands) = (img.getWidth, img.getHeight, raster.getNumBands)
    var sum = 0L
    var y = 0
    while (y < h) {
      var x = 0
      while (x < w) {
        var b = 0
        while (b < bands) { sum += raster.getSample(x, y, b); b += 1 }
        x += 1
      }
      y += 1
    }
    (w, h, sum)
  }

  /** Attach a real PNG payload to the documents table: binary column
    * beside the id, built in a typed map (codec work is JVM-side, not
    * expressible as Catalyst columns).
    */
  def withPayload(spark: SparkSession, docs: DataFrame): Dataset[MediaRow] = {
    import spark.implicits._
    // spread: the codec pass below runs at the scan's split count (1-2
    // partitions for a small single-file table) — a no-op at scale
    Partitioning.spread(docs.select(col("doc_id"))).as[Long]
      .mapPartitions(_.map(id => MediaRow(id, encodePng(id))))
  }

  /** [[withPayload]] for the ≥16×16 grid-card family ([[dimsGridFor]]). */
  def withGridPayload(spark: SparkSession, docs: DataFrame)
      : Dataset[MediaRow] = {
    import spark.implicits._
    Partitioning.spread(docs.select(col("doc_id"))).as[Long]
      .mapPartitions(_.map(id => MediaRow(id, encodePngGrid(id))))
  }

  /** Feature extraction over media rows: one narrow mapPartitions pass
    * decoding each payload with the real ImageIO codec.
    */
  def extractFeatures(spark: SparkSession, docs: DataFrame)
      : Dataset[MediaFeatures] = {
    import spark.implicits._
    withPayload(spark, docs).mapPartitions(_.map { r =>
      val (w, h, sum) = decodeImage(r.payload)
      MediaFeatures(r.doc_id, r.payload.length.toLong, w.toLong, h.toLong,
                    w.toLong * h, sum)
    })
  }

  /** Decode real image bytes → (width, height, row-major pixel samples,
    * band-summed). The array-returning sibling of [[decodeImage]] for
    * operators that need the raster itself (perceptual hashing, SAD
    * verification) — still one decode per payload, no shuffle.
    */
  def decodePixels(bytes: Array[Byte]): (Int, Int, Array[Long]) = {
    val img = ImageIO.read(new ByteArrayInputStream(bytes))
    require(img != null, s"undecodable image payload (${bytes.length} bytes)")
    val raster = img.getRaster
    val (w, h, bands) = (img.getWidth, img.getHeight, raster.getNumBands)
    val px = new Array[Long](w * h)
    var y = 0
    while (y < h) {
      var x = 0
      while (x < w) {
        var s = 0L
        var b = 0
        while (b < bands) { s += raster.getSample(x, y, b); b += 1 }
        px(y * w + x) = s
        x += 1
      }
      y += 1
    }
    (w, h, px)
  }

  /** 4-bit QUADRANT-MEAN perceptual hash (aHash family): bit q is set
    * iff quadrant q's pixel mean exceeds the image mean — compared
    * cross-multiplied (`qsum·n > total·qn`), so the hash is exact
    * integer arithmetic with no division rounding to mirror. Quadrant
    * q = (x ≥ w/2) + 2·(y ≥ h/2), floor splits. Brightness-shift
    * invariant-ish and cheap: the standard bucketing key for image
    * near-dup candidate generation.
    */
  def aHash4(w: Int, h: Int, px: Array[Long]): Long = {
    val total = px.sum
    val n = px.length.toLong
    val qsum = new Array[Long](4)
    val qn = new Array[Long](4)
    var y = 0
    while (y < h) {
      var x = 0
      while (x < w) {
        val q = (if (x >= w / 2) 1 else 0) + (if (y >= h / 2) 2 else 0)
        qsum(q) += px(y * w + x)
        qn(q) += 1
        x += 1
      }
      y += 1
    }
    (0 until 4).foldLeft(0L) { (acc, q) =>
      if (qsum(q) * n > total * qn(q)) acc | (1L << q) else acc
    }
  }

  /** 64-bit 8×8 BLOCK-GRID perceptual hash — the production-selectivity
    * sibling of [[aHash4]]: the image is cut into an 8×8 grid of blocks
    * (pixel (x, y) falls in block `by·8 + bx` with `bx = x·8 / w`,
    * `by = y·8 / h`, floor — every block non-empty for w, h ≥ 8) and
    * bit b is set iff block b's pixel mean exceeds the image mean,
    * compared cross-multiplied (`bsum·n > total·bn`) so the hash stays
    * exact integer arithmetic a SQL oracle mirrors bit-for-bit.
    *
    * Why 64 bits matter at scale: [[aHash4]]'s bucket count is FIXED at
    * 16 per (w, h) — on a same-dimension corpus candidates grow
    * ~n²/16. The 64-bit grid's bucket count scales with the visual
    * diversity of the corpus itself, keeping candidate generation
    * bucket-bound (the standard aHash deployed by image-dedup
    * pipelines). Bit 63 may set the sign; the value is an opaque
    * bucket key, never ordered on.
    */
  def aHash64(w: Int, h: Int, px: Array[Long]): Long = {
    require(w >= 8 && h >= 8,
      s"aHash64 needs w, h >= 8 for a non-degenerate 8x8 grid: ${w}x$h")
    val total = px.sum
    val n = px.length.toLong
    val bsum = new Array[Long](64)
    val bn = new Array[Long](64)
    var y = 0
    while (y < h) {
      val by = y * 8 / h
      var x = 0
      while (x < w) {
        val b = by * 8 + x * 8 / w
        bsum(b) += px(y * w + x)
        bn(b) += 1
        x += 1
      }
      y += 1
    }
    var acc = 0L
    var b = 0
    while (b < 64) {
      if (bsum(b) * n > total * bn(b)) acc |= (1L << b)
      b += 1
    }
    acc
  }

  case class HashedImage(doc_id: Long, width: Long, height: Long,
                         hash: Long, px: Array[Long])

  /** Image near-duplicate pairs over REAL decoded rasters: decode each
    * payload once (narrow pass), bucket candidates by (width, height,
    * perceptual hash), verify each candidate pair EXACTLY by mean
    * absolute pixel difference, floor-scaled e6
    * (`(1e6·Σ|a−b|) div n_pixels`), and keep pairs at or under
    * `madE6Max`.
    *
    * `hashBits` picks the bucketing hash: 64 ([[aHash64]], the
    * DEFAULT) keeps candidate counts bucket-bound even on a
    * same-dimension corpus — the production setting; 4 ([[aHash4]])
    * is the coarse fixture hash with a FIXED 16 buckets per (w, h):
    * fine for small or dimension-diverse corpora, ~n²/16 candidate
    * growth otherwise.
    *
    * This is the dedup-pipeline index shape (bucket → verify) applied
    * to the image modality: candidates are hash-bucket-bound, never
    * all-pairs, and the verify cost is per-candidate. Like every
    * LSH-family index here, the gate covers "the pairs this index
    * surfaces" — recall is the knob (hash bits / grid), measured per
    * deployment, not silently assumed.
    *
    * RELEASE CONTRACT: the returned plan reads the internal signature
    * checkpoint, which `GraftColumns.unpersistCheckpoint(result)`'s
    * deep traversal releases once the caller is done — or prefer the
    * extract-once [[imageNearDupPairsFrom]] + [[featureTable]] path,
    * which pins no blocks at all.
    */
  def imageNearDupPairs(spark: SparkSession, media: Dataset[MediaRow],
                        madE6Max: Long, hashBits: Int = 64): DataFrame = {
    import spark.implicits._
    require(hashBits == 4 || hashBits == 64,
      s"hashBits must be 4 or 64: $hashBits")
    // localCheckpoint so the self-join below reads the DECODED frame
    // twice, not the decoder — one codec pass per payload, which is the
    // production shape anyway (hash once, store the signature). The
    // materialized rows carry rasters, not payloads: smaller than the
    // encoded corpus for small images, and at raster-heavy scale the
    // checkpoint is exactly the signature store you'd persist.
    val hashed = media.mapPartitions(_.map { r =>
      val (w, h, px) = decodePixels(r.payload)
      val hv = if (hashBits == 64) aHash64(w, h, px) else aHash4(w, h, px)
      HashedImage(r.doc_id, w.toLong, h.toLong, hv, px)
    }).toDF().graftCheckpoint()
    val a = hashed.select(col("doc_id").as("doc_a"), col("width"),
                          col("height"), col("hash"), col("px").as("pxa"))
    val b = hashed.select(col("doc_id").as("doc_b"), col("width"),
                          col("height"), col("hash"), col("px").as("pxb"))
    a.join(b, Seq("width", "height", "hash"))
      .filter(col("doc_a") < col("doc_b"))
      .select(col("doc_a"), col("doc_b"),
              expr("""(1000000 * aggregate(zip_with(pxa, pxb,
                     |  (x, y) -> abs(x - y)), 0L, (acc, v) -> acc + v))
                     |div size(pxa)""".stripMargin).as("mad_e6"))
      .filter(col("mad_e6") <= madE6Max)
  }

  /** Per-image extract-once feature row ([[FeatureStore]] semantics):
    * dims, BOTH bucket hashes, and the raster for exact verification —
    * one decode pass serves every downstream image consumer. `hash64`
    * is None below the 8×8 grid minimum (same images on which
    * [[aHash64]] itself refuses); a 64-bit consumer over such a family
    * fails fast rather than silently dropping the rows.
    */
  case class ImageFeatures(doc_id: Long, width: Long, height: Long,
                           hash4: Long, hash64: Option[Long],
                           px: Array[Long])

  /** Extract-once feature table for an image fixture `family`: one
    * codec pass per process; consumers read the parquet store.
    */
  def featureTable(spark: SparkSession, family: String,
                   media: => Dataset[MediaRow]): DataFrame =
    FeatureStore.tableFor(spark, s"image-$family") {
      import spark.implicits._
      media.mapPartitions(_.map { r =>
        val (w, h, px) = decodePixels(r.payload)
        ImageFeatures(r.doc_id, w.toLong, h.toLong, aHash4(w, h, px),
                      if (w >= 8 && h >= 8) Some(aHash64(w, h, px))
                      else None,
                      px)
      }).toDF()
    }

  /** [[imageNearDupPairs]] over an extract-once [[featureTable]]:
    * identical bucket join + exact MAD verify, reading the signature
    * store instead of re-decoding.
    */
  def imageNearDupPairsFrom(features: DataFrame, madE6Max: Long,
                            hashBits: Int = 64): DataFrame = {
    require(hashBits == 4 || hashBits == 64,
      s"hashBits must be 4 or 64: $hashBits")
    if (hashBits == 64) {
      // parity with the direct path, where aHash64 throws on sub-8x8
      // images: a null hash64 must not silently fall out of the join
      val small = features.filter(col("hash64").isNull).limit(1)
        .select("doc_id", "width", "height").collect()
      require(small.isEmpty,
        s"aHash64 needs w, h >= 8; feature row ${small.mkString} is smaller")
    }
    val hashCol = if (hashBits == 64) "hash64" else "hash4"
    val hashed = features.select(col("doc_id"), col("width"),
                                 col("height"), col(hashCol).as("hash"),
                                 col("px"))
    val a = hashed.select(col("doc_id").as("doc_a"), col("width"),
                          col("height"), col("hash"), col("px").as("pxa"))
    val b = hashed.select(col("doc_id").as("doc_b"), col("width"),
                          col("height"), col("hash"), col("px").as("pxb"))
    a.join(b, Seq("width", "height", "hash"))
      .filter(col("doc_a") < col("doc_b"))
      .select(col("doc_a"), col("doc_b"),
              expr("""(1000000 * aggregate(zip_with(pxa, pxb,
                     |  (x, y) -> abs(x - y)), 0L, (acc, v) -> acc + v))
                     |div size(pxa)""".stripMargin).as("mad_e6"))
      .filter(col("mad_e6") <= madE6Max)
  }

  /** Real-file ingestion path: Spark's `binaryFile` source → decode →
    * per-file features keyed by file name. `binaryFile` streams each
    * file as one row, so payload bytes hit exactly one task and the
    * extracted features (small columns) are all that ever shuffles.
    * Identity stays with the path (`file_name`); callers derive ids
    * from their naming scheme.
    */
  def fromBinaryFiles(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    spark.read.format("binaryFile").load(dir)
      .select(regexp_extract(col("path"), "([^/]+)$", 1).as("file_name"),
              col("content"))
      .as[(String, Array[Byte])]
      .mapPartitions(_.map { case (name, bytes) =>
        val (w, h, sum) = decodeImage(bytes)
        (name, bytes.length.toLong, w.toLong, h.toLong, w.toLong * h, sum)
      })
      .toDF("file_name", "n_bytes", "width", "height", "n_pixels",
            "pixel_sum")
  }
}
