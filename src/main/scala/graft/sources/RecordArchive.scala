package graft.sources

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** WARC-style length-delimited record archives — the top-of-funnel
  * container discipline every crawl pipeline starts from: a binary
  * blob of concatenated records, each `REC <id> <len>\n` + len payload
  * bytes + `\n`. The load-bearing rule (same as WARC's Content-Length)
  * is that the WALK must honor the length field — payloads may contain
  * anything, including bytes that look like record headers, so
  * splitting on separators is wrong by construction; the only correct
  * reader is an offset walk.
  *
  * Scale shape: packing is one bounded per-archive aggregate (archives
  * are bounded groups — the thing being modeled is a crawl segment);
  * the walk is a narrow `mapPartitions` over (archive, blob) rows
  * emitting one row per record with its BYTE OFFSET — offsets are what
  * make the layout auditable (an oracle recomputes them from the
  * record sizes alone, so a packing drift of even one byte breaks the
  * gate). Blobs never shuffle after the pack; only record metadata
  * does.
  */
object RecordArchive {

  /** Pack (groupCol, idCol, payloadCol: string) rows into one binary
    * archive per group, records in ascending id order:
    * (groupCol, archive: binary, n_records).
    */
  def pack(rows: DataFrame, groupCol: String, idCol: String,
           payloadCol: String): DataFrame = {
    // the header's length field is BYTE length (WARC's Content-Length
    // rule) — identical to char length on ASCII but the distinction is
    // the whole point of a container format
    val rec = concat(
      encode(concat(lit("REC "), col(idCol).cast("string"), lit(" "),
                    length(encode(col(payloadCol), "utf-8"))
                      .cast("string"), lit("\n")),
             "utf-8"),
      encode(col(payloadCol), "utf-8"),
      encode(lit("\n"), "utf-8"))
    rows
      .select(col(groupCol), col(idCol), rec.as("__rec"))
      .groupBy(col(groupCol))
      .agg(count(lit(1)).as("n_records"),
           expr(s"""aggregate(
             |  transform(array_sort(collect_list(
             |    struct(${idCol} AS i, __rec AS r))), x -> x.r),
             |  CAST(X'' AS BINARY), (a, b) -> concat(a, b))"""
             .stripMargin).as("archive"))
      .select(col(groupCol), col("archive"), col("n_records"))
  }

  /** Walk archives back into records:
    * (groupCol, rec_id, byte_offset, payload_len, payload_md5).
    * Fails loudly on any malformed header/terminator — a container
    * walk that skips garbage silently is how corrupt segments poison
    * a corpus.
    *
    * Bound: one record's payload is capped at Int.MaxValue bytes (the
    * length field parses through `toInt`, and a Spark `binary` cell is
    * a JVM byte array, itself 2 GB-bounded) — the same per-record bound
    * real WARC tooling assumes; a longer length field fails the parse
    * loudly rather than walking a corrupt offset.
    */
  def walk(archives: DataFrame, groupCol: String): DataFrame = {
    val spark = archives.sparkSession
    import spark.implicits._
    archives.select(col(groupCol).cast("string"), col("archive"))
      .as[(String, Array[Byte])]
      .mapPartitions(_.flatMap { case (g, blob) =>
        val out = Seq.newBuilder[(String, Long, Long, Long, String)]
        var off = 0
        while (off < blob.length) {
          val nl = blob.indexOf('\n'.toByte, off)
          require(nl > off, s"archive $g: missing header newline at $off")
          val header = new String(blob, off, nl - off, "UTF-8")
          val parts = header.split(" ")
          require(parts.length == 3 && parts(0) == "REC",
                  s"archive $g: bad header '$header' at $off")
          val id = parts(1).toLong
          val len = parts(2).toInt
          val payloadStart = nl + 1
          require(payloadStart + len < blob.length &&
                    blob(payloadStart + len) == '\n'.toByte,
                  s"archive $g: bad terminator for record $id")
          val md = java.security.MessageDigest.getInstance("MD5")
            .digest(java.util.Arrays.copyOfRange(
              blob, payloadStart, payloadStart + len))
          out += ((g, id, off.toLong, len.toLong,
                   md.map("%02x".format(_)).mkString))
          off = payloadStart + len + 1
        }
        out.result().iterator
      })
      .toDF(groupCol, "rec_id", "byte_offset", "payload_len",
            "payload_md5")
  }
}
