package graft.functions

import org.apache.spark.sql.functions._

import graft.SparkSpec

/** Contracts of [[TextFunctions.maskTokens]]: position-keyed selection
  * (repeated words mask independently), id-keyed determinism, pct
  * boundaries, and the brute-force hash-rule parity.
  */
class MaskTokensSpec extends SparkSpec {
  import spark.implicits._

  private def mask(rows: Seq[(Long, String)], pct: Int) =
    rows.toDF("id", "text")
      .select(col("id"),
        array_join(TextFunctions.maskTokens(col("id"), col("text"), pct),
                   " ").as("m"))
      .collect().map(r => (r.getLong(0), r.getString(1))).sortBy(_._1)

  test("pct 0 masks nothing, pct 100 masks everything") {
    val rows = Seq(1L -> "a b c")
    assert(mask(rows, 0).head._2 === "a b c")
    assert(mask(rows, 100).head._2 === "<MASK> <MASK> <MASK>")
  }

  test("selection matches the brute-force h32(id:pos) rule and differs " +
       "across ids") {
    def h32(s: String): Long = {
      val d = java.security.MessageDigest.getInstance("MD5")
        .digest(s.getBytes("UTF-8"))
      java.lang.Long.parseLong(d.take(4).map("%02x".format(_)).mkString, 16)
    }
    val text = (0 until 40).map(_ => "tok").mkString(" ")
    for (id <- Seq(7L, 8L)) {
      val want = (0 until 40).map { i =>
        if (h32(s"$id:$i") % 100 < 30) "<MASK>" else "tok"
      }.mkString(" ")
      assert(mask(Seq(id -> text), 30).head._2 === want, s"id=$id")
    }
    // repeated identical words mask independently (position-keyed): with
    // 40 same-word positions at pct 30, SOME but not all are masked
    val out = mask(Seq(7L -> text), 30).head._2.split(" ")
    assert(out.count(_ == "<MASK>") > 0 && out.count(_ == "tok") > 0)
  }

  test("out-of-range pct is rejected") {
    intercept[IllegalArgumentException] {
      Seq(1L -> "a").toDF("id", "text")
        .select(TextFunctions.maskTokens(col("id"), col("text"), 101))
    }
  }
}
