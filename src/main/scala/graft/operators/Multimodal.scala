package graft.operators

import java.awt.image.BufferedImage
import java.io.{ByteArrayInputStream, ByteArrayOutputStream}

import javax.imageio.ImageIO

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._

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

  /** Encode the test card for `id` as real PNG bytes. */
  def encodePng(id: Long): Array[Byte] = {
    val (w, h, seed) = dimsFor(id)
    val img = new BufferedImage(w, h, BufferedImage.TYPE_BYTE_GRAY)
    val raster = img.getRaster
    var y = 0
    while (y < h) {
      var x = 0
      while (x < w) {
        raster.setSample(x, y, 0, ((seed + 7L * x + 13L * y) % 251).toInt)
        x += 1
      }
      y += 1
    }
    val out = new ByteArrayOutputStream()
    ImageIO.write(img, "png", out)
    out.toByteArray
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
    docs.select(col("doc_id")).as[Long]
      .mapPartitions(_.map(id => MediaRow(id, encodePng(id))))
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
