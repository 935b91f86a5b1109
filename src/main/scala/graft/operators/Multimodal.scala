package graft.operators

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._

/** Multimodal-column plumbing: media payloads travel as opaque `binary`
  * columns beside typed metadata; decode/feature-extract runs as a typed
  * `mapPartitions` over the binary bytes.
  *
  * The actual codec call is STUBBED (no image/audio libraries in this
  * environment) behind [[decodeStub]] — a deterministic function of the
  * real bytes — but everything Spark-side is real and load-bearing:
  * binary column through the scan/shuffle, metadata struct, partition-wise
  * batch iteration (the shape under which a codec would amortize per-batch
  * init), and a typed output schema.
  *
  * Scale notes: payloads dominate row size, so feature extraction must be
  * a single narrow pass over the scan (it is: mapPartitions, no shuffle)
  * and downstream analytics should select only the small feature columns
  * (column pruning keeps the binary out of any later exchange). For real
  * corpora, store payloads in their own parquet column so predicate
  * pushdown on metadata never drags bytes through the reader.
  */
object Multimodal {

  case class MediaRow(doc_id: Long, payload: Array[Byte],
                      width: Int, height: Int, channels: Int)

  case class MediaFeatures(doc_id: Long, n_bytes: Long, width: Long,
                           height: Long, n_pixels: Long, checksum16: Long)

  /** Attach a binary payload + media metadata to the documents table.
    * Payload = UTF-8 bytes of `text` (a stand-in for real media bytes);
    * width/height derive deterministically from doc_id.
    */
  def withPayload(docs: DataFrame): DataFrame =
    docs.select(
      col("doc_id"),
      encode(col("text"), "UTF-8").as("payload"),
      ((pmod(col("doc_id"), lit(64)) + 1) * 16).cast("int").as("width"),
      ((pmod(col("doc_id"), lit(48)) + 1) * 16).cast("int").as("height"),
      lit(3).as("channels"))

  /** The stubbed "decode": consumes the real payload bytes and emits
    * deterministic features (byte count + 16-byte prefix checksum). A real
    * deployment swaps only the body for a codec call; the partition-wise
    * iteration, schema, and laziness are unchanged.
    */
  def decodeStub(r: MediaRow): MediaFeatures =
    MediaFeatures(
      doc_id = r.doc_id,
      n_bytes = r.payload.length.toLong,
      width = r.width.toLong,
      height = r.height.toLong,
      n_pixels = r.width.toLong * r.height * r.channels,
      checksum16 = r.payload.take(16).map(b => (b & 0xff).toLong).sum)

  /** Feature extraction over media rows: one narrow mapPartitions pass. */
  def extractFeatures(spark: SparkSession, docs: DataFrame)
      : Dataset[MediaFeatures] = {
    import spark.implicits._
    withPayload(docs).as[MediaRow]
      .mapPartitions(_.map(decodeStub))
  }

  /** Real-file ingestion path: Spark's `binaryFile` source → media rows →
    * the same feature extractor. Ids derive from the file path (stable
    * across runs); metadata comes from source options/sidecars in a real
    * deployment — here parameterized. `binaryFile` streams each file as
    * one row, so payload bytes hit exactly one task and the extracted
    * features (small columns) are all that ever shuffles.
    */
  def fromBinaryFiles(spark: SparkSession, dir: String,
                      width: Int, height: Int): Dataset[MediaFeatures] = {
    import spark.implicits._
    spark.read.format("binaryFile").load(dir)
      .select(
        xxhash64(col("path")).as("doc_id"),
        col("content").as("payload"),
        lit(width).as("width"),
        lit(height).as("height"),
        lit(3).as("channels"))
      .as[MediaRow]
      .mapPartitions(_.map(decodeStub))
  }
}
