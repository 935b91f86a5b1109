package graft.operators

import org.apache.spark.sql.functions._

import graft.SparkSpec

/** Contracts of the Bloom runtime join filter: NO false negatives ever
  * (every built key passes, at any width — the guarantee that makes
  * the pre-filtered join provably equal to the unfiltered one), bit
  * table bounded by mBits/32 rows, merge-of-slices ≡ direct build
  * (idempotent under overlap), packed form dense and ordered, and the
  * probe preserving carried columns and row multiplicity.
  */
class BloomSpec extends SparkSpec {
  import spark.implicits._

  private def built = (1L to 200L).toDF("k")
  private def probe = (1L to 400L).flatMap(k => Seq(k, k)).toDF("k")
    .withColumn("payload", col("k") * 10)

  test("no false negatives at ANY width: every built key passes " +
       "(the join-preservation guarantee)") {
    for (m <- Seq(32, 512, 65536)) {
      val packed = Bloom.pack(Bloom.build(built, "k", m, 5), m)
      val passed = Bloom.filterMaybe(built, "k", packed, m, 5)
      assert(passed.count() === 200L,
        s"m=$m: a built key must always pass its own filter")
    }
  }

  test("probe preserves carried columns and row multiplicity, and " +
       "false positives vanish at isolating width") {
    val m = 65536
    val packed = Bloom.pack(Bloom.build(built, "k", m, 5), m)
    val passed = Bloom.filterMaybe(probe, "k", packed, m, 5).collect()
    // this draw must be collision-free for the exactness claim: verify
    // before demanding it, so the test cannot flake silently
    val nFp = passed.map(_.getAs[Long]("k")).filter(_ > 200L).distinct
    assert(nFp.isEmpty,
      s"unlucky hash draw produced false positives at m=$m: widen m")
    assert(passed.length === 400,
      "each of the 200 built keys appears twice in the probe")
    passed.foreach { r =>
      assert(r.getAs[Long]("payload") === r.getAs[Long]("k") * 10,
        "carried columns must survive the probe")
    }
  }

  test("bit table bounded by mBits/32 rows and packed form dense") {
    val m = 512
    val table = Bloom.build(built, "k", m, 5)
    assert(table.count() <= m / 32)
    val arr = Bloom.pack(table, m).collect().head
      .getAs[scala.collection.Seq[Long]]("__bloom_bits")
    assert(arr.length === m / 32, "packed array must be dense")
  }

  test("merge of per-slice filters == direct build, even with " +
       "overlapping slices (OR is idempotent)") {
    val direct = Bloom.build(built, "k", 512, 5)
      .orderBy("word").collect().map(r => (r.getLong(0), r.getLong(1)))
    // three slices, deliberately overlapping at the boundaries
    val slices = Seq((1L, 80L), (70L, 150L), (140L, 200L)).map {
      case (lo, hi) =>
        Bloom.build(built.filter(col("k").between(lo, hi)), "k", 512, 5)
    }.reduce(_ unionByName _)
    val merged = Bloom.merge(slices)
      .orderBy("word").collect().map(r => (r.getLong(0), r.getLong(1)))
    assert(merged.toSeq === direct.toSeq)
  }

  test("null keys are dropped by the probe (a NULL never matches an " +
       "equi-join) and excluded from the build") {
    val withNull = built.unionByName(
      Seq.empty[Option[Long]].toDF("k")
        .unionByName(spark.sql("SELECT CAST(NULL AS BIGINT) AS k")))
    val packed = Bloom.pack(Bloom.build(withNull, "k", 512, 5), 512)
    val passed = Bloom.filterMaybe(withNull, "k", packed, 512, 5)
    assert(passed.filter(col("k").isNull).count() === 0L)
  }
}
