package graft.sources

import graft.SparkSpec

/** Contracts of [[RecordArchive]]: pack→walk roundtrip with
  * header-lookalike payloads, exact byte offsets, empty payloads, and
  * loud failure on corruption.
  */
class RecordArchiveSpec extends SparkSpec {
  import spark.implicits._

  private def roundtrip(rows: Seq[(String, Long, String)]) =
    RecordArchive.walk(
      RecordArchive.pack(rows.toDF("g", "id", "p"), "g", "id", "p"), "g")
      .collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3),
                 r.getString(4)))
      .sortBy(t => (t._1, t._2)).toSeq

  test("roundtrip recovers every record even when payloads contain " +
       "header-lookalike bytes; offsets are exact") {
    val rows = Seq(
      ("a", 1L, "REC 9 4\nfake"), // the adversarial payload
      ("a", 2L, ""),              // empty payload
      ("a", 10L, "hello world"),  // multi-digit id
      ("b", 3L, "x" * 120))       // multi-digit length
    val got = roundtrip(rows)
    // expected offsets: cumulative (header + payload + 1) per group in
    // id order; header = "REC <id> <len>\n"
    def hlen(id: Long, plen: Int) = s"REC $id $plen\n".length
    val expected = rows.groupBy(_._1).toSeq.flatMap { case (g, rs) =>
      var off = 0L
      rs.sortBy(_._2).map { case (_, id, p) =>
        val md = java.security.MessageDigest.getInstance("MD5")
          .digest(p.getBytes("UTF-8")).map("%02x".format(_)).mkString
        val row = (g, id, off, p.length.toLong, md)
        off += hlen(id, p.length) + p.length + 1
        row
      }
    }.sortBy(t => (t._1, t._2))
    assert(got == expected)
  }

  test("corrupt archives fail loudly, never skip") {
    val blob = "REC 1 5\nab".getBytes("UTF-8") // truncated payload
    val df = Seq(("g", blob)).toDF("g", "archive")
    val ex = intercept[org.apache.spark.SparkException] {
      RecordArchive.walk(df, "g").collect()
    }
    assert(ex.getMessage != null)
  }
}
