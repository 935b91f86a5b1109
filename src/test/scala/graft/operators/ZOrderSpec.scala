package graft.operators

import org.apache.spark.sql.functions._

import graft.SparkSpec

/** Contracts of [[ZOrder]]: bit-exact Morton codes vs a reference loop
  * interleave, equal-size deterministic file assignment with
  * non-overlapping z-ranges, and the out-of-domain fail-fast.
  */
class ZOrderSpec extends SparkSpec {
  import spark.implicits._

  /** Reference interleave: bit i of a → bit 2i, bit i of b → bit 2i+1. */
  private def mortonRef(a: Long, b: Long): Long = {
    var z = 0L
    var i = 0
    while (i < 32) {
      z |= ((a >> i) & 1L) << (2 * i)
      z |= ((b >> i) & 1L) << (2 * i + 1)
      i += 1
    }
    z
  }

  test("zValue is bit-exact vs the reference interleave, incl. edges") {
    val rng = new scala.util.Random(42)
    val cases = Seq((0L, 0L), (0xFFFFFFFFL, 0xFFFFFFFFL), (1L, 0L),
                    (0L, 1L), (0xFFFFFFFFL, 0L)) ++
      Seq.fill(200)((rng.nextInt(Int.MaxValue).toLong,
                     rng.nextInt(Int.MaxValue).toLong))
    val got = cases.toDF("a", "b")
      .select(col("a"), col("b"), ZOrder.zValue(col("a"), col("b")).as("z"))
      .collect()
    got.foreach { r =>
      val (a, b, z) = (r.getLong(0), r.getLong(1), r.getLong(2))
      assert(z === mortonRef(a, b), s"($a, $b)")
    }
  }

  test("layout: equal file sizes, deterministic, z-ranges do not overlap") {
    val rng = new scala.util.Random(7)
    val rows = (1L to 997L).map(i =>
      (i, rng.nextInt(1000).toLong, rng.nextInt(1000).toLong))
    val df = rows.toDF("id", "a", "b")
    val laid = ZOrder.layout(df, "a", "b", col("id"), rowsPerFile = 100L)
    val rep = ZOrder.localityReport(laid, "a", "b").collect()
    assert(rep.map(_.getLong(0)).toSeq === (0L to 9L))
    assert(rep.map(_.getLong(1)).toSeq ===
      Seq.fill(9)(100L) :+ 97L) // last file short
    rep.sliding(2).foreach { w =>
      assert(w(1).getLong(6) >= w(0).getLong(7), // z_lo(i+1) >= z_hi(i)
        s"overlap between files ${w(0).getLong(0)} and ${w(1).getLong(0)}")
    }
    // determinism: a second run assigns identical file ids per row
    val again = ZOrder.layout(df, "a", "b", col("id"), rowsPerFile = 100L)
      .select("id", "file_id").collect().map(r => r.getLong(0) -> r.getLong(1))
    val first = laid.select("id", "file_id").collect()
      .map(r => r.getLong(0) -> r.getLong(1))
    assert(first.sortBy(_._1).toSeq === again.sortBy(_._1).toSeq)
  }

  test("reserved/output name collisions are rejected") {
    import org.apache.spark.sql.functions.col
    val df = Seq((1L, 2L, 3L)).toDF("a", "b", "z")
    intercept[IllegalArgumentException] {
      ZOrder.layout(df, "a", "b", col("a"), 10L)
    }
  }

  test("out-of-domain dimensions fail fast") {
    val bad = Seq((1L, -1L, 5L)).toDF("id", "a", "b")
    val ex = intercept[Exception] {
      ZOrder.layout(bad, "a", "b", col("id"), 10L).collect()
    }
    assert(ex.getMessage != null)
  }
}
