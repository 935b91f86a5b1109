package graft.sources

import java.util

import scala.jdk.CollectionConverters._

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.connector.catalog.{SupportsRead, Table, TableCapability, TableProvider}
import org.apache.spark.sql.connector.expressions.Transform
import org.apache.spark.sql.connector.read._
import org.apache.spark.sql.types._
import org.apache.spark.sql.util.CaseInsensitiveStringMap
import org.apache.spark.unsafe.types.UTF8String

import graft.etl.{Fetcher, HttpFetcher, RateLimitedFetcher, RetryingFetcher}

/** DataSourceV2 connector for chess.com monthly archives (SURVEY.md §2.1
  * S1/S3): `spark.read.format("graft.sources.ChessArchiveSource")
  * .option("urls", "u1,u2").option("username", "alice").load()`.
  *
  * Plan shape: ONE input partition per archive URL, so a backfill of N
  * archives fans out across the cluster, each task doing its own
  * fetch-with-retry (the reference's serial driver-side loop,
  * `fetch_and_post.py:331-344`, becomes embarrassingly parallel). The
  * reader emits one row per archive: (archive_url, fetch_status, body) —
  * raw-bytes-at-the-edge; parsing/exploding stays in the declarative plan
  * (`from_json` + `explode`) where Catalyst can prune it.
  *
  * The fetcher is configured by CLASS NAME (`fetcher.class`, no-arg
  * constructor) because readers are constructed from serialized options on
  * executors; defaults to the retrying HTTP fetcher. Tests inject a
  * file-backed fetcher the same way.
  */
class ChessArchiveSource extends TableProvider {

  override def inferSchema(options: CaseInsensitiveStringMap): StructType =
    ChessArchiveSource.schema

  override def getTable(schema: StructType, partitioning: Array[Transform],
                        properties: util.Map[String, String]): Table =
    new ArchiveTable(properties.asScala.toMap)
}

object ChessArchiveSource {
  val schema: StructType = StructType(Seq(
    StructField("archive_url", StringType, nullable = false),
    StructField("fetch_status", IntegerType, nullable = false),
    StructField("body", StringType, nullable = true)))

  /** One SHARED fetcher per (executor JVM, options): pacing state must
    * outlive a single partition — each partition performs exactly one
    * fetch, so a per-reader limiter would never space two archive
    * requests. With a JVM-wide instance (RateLimitedFetcher#fetch is
    * synchronized) every task on the executor serializes through the same
    * minimum gap; cluster-wide request rate ≈ executors / delay seconds.
    */
  private val sharedFetchers =
    new java.util.concurrent.ConcurrentHashMap[Map[String, String], Fetcher]()

  /** Only these options determine fetcher identity. Keying the cache on
    * the FULL options map would give every distinct archive list its own
    * limiter (pacing not shared across reads) and grow the map unboundedly
    * on long-lived executors — one entry per 'urls' value.
    */
  private val PacingKeys = Seq(
    "fetcher.class", "request.delay.ms", "user.agent",
    "max.retries", "backoff.ms")

  def sharedFetcherFor(options: Map[String, String]): Fetcher = {
    val key = PacingKeys.flatMap(k => options.get(k).map(k -> _)).toMap
    sharedFetchers.computeIfAbsent(key, _ => fetcherFor(options))
  }

  /** Build the configured fetcher: base fetcher by class name (or the JDK
    * HTTP one), wrapped in rate limiting (`request.delay.ms`, the
    * reference's `CHESS_REQUEST_DELAY` analog) and retry/backoff. Prefer
    * [[sharedFetcherFor]] on executors so pacing spans tasks.
    */
  def fetcherFor(options: Map[String, String]): Fetcher = {
    val inner = options.get("fetcher.class") match {
      case Some(cls) =>
        Class.forName(cls).getDeclaredConstructor()
          .newInstance().asInstanceOf[Fetcher]
      case None => new HttpFetcher(
        options.getOrElse("user.agent", "graft-spark-etl"))
    }
    val paced = options.get("request.delay.ms")
      .map(d => RateLimitedFetcher(inner, d.toLong))
      .getOrElse(inner)
    RetryingFetcher(paced,
      maxRetries = options.getOrElse("max.retries", "3").toInt,
      baseBackoffMs = options.getOrElse("backoff.ms", "2000").toLong)
  }
}

private[sources] class ArchiveTable(options: Map[String, String])
    extends Table with SupportsRead {
  override def name(): String = "chess_archives"
  override def schema(): StructType = ChessArchiveSource.schema
  override def capabilities(): util.Set[TableCapability] =
    util.EnumSet.of(TableCapability.BATCH_READ)
  override def newScanBuilder(o: CaseInsensitiveStringMap): ScanBuilder =
    new ArchiveScanBuilder(options ++ o.asScala)
}

private[sources] class ArchiveScanBuilder(options: Map[String, String])
    extends ScanBuilder with Scan with Batch {
  override def build(): Scan = this
  override def readSchema(): StructType = ChessArchiveSource.schema
  override def toBatch: Batch = this

  override def planInputPartitions(): Array[InputPartition] = {
    val urls = options.getOrElse("urls", "")
      .split(",").map(_.trim).filter(_.nonEmpty)
    require(urls.nonEmpty, "chess-archives source requires option 'urls'")
    urls.map(u => ArchivePartition(u): InputPartition)
  }

  override def createReaderFactory(): PartitionReaderFactory =
    new ArchiveReaderFactory(options)
}

private[sources] case class ArchivePartition(url: String) extends InputPartition

private[sources] class ArchiveReaderFactory(options: Map[String, String])
    extends PartitionReaderFactory {
  override def createReader(p: InputPartition): PartitionReader[InternalRow] =
    new ArchiveReader(p.asInstanceOf[ArchivePartition].url, options)
}

/** One row per archive; the fetch happens lazily on first `next()`, task
  * retries re-fetch (idempotent GET).
  */
private[sources] class ArchiveReader(url: String, options: Map[String, String])
    extends PartitionReader[InternalRow] {

  private var done = false
  private var row: InternalRow = _

  override def next(): Boolean = {
    if (done) return false
    val (status, body) = ChessArchiveSource.sharedFetcherFor(options).fetch(url) match {
      case Right(b)  => (200, UTF8String.fromString(b))
      case Left(s)   => (s, null)
    }
    row = InternalRow(UTF8String.fromString(url), status, body)
    done = true
    true
  }

  override def get(): InternalRow = row
  override def close(): Unit = ()
}
