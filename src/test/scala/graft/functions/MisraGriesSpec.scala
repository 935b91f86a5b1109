package graft.functions

import org.apache.spark.sql.functions._

import graft.SparkSpec

/** Contracts of [[MisraGries]]: the recall guarantee (every item with
  * freq > n/(k+1) survives the merged sketch) under real compression
  * pressure and many partitions, bounded state, and undercount-only
  * residuals.
  */
class MisraGriesSpec extends SparkSpec {
  import spark.implicits._

  test("heavy items always survive 50k-distinct pressure at k=100") {
    val rng = new scala.util.Random(13)
    // 10 planted heavy items (1500 each = 15k) + 50k singleton-ish tail
    // (50k) → n = 65k; threshold n/(k+1) ≈ 644 « 1500
    val heavy = (0 until 10).flatMap(h => Seq.fill(1500)(s"heavy_$h"))
    val tail = (0 until 50000).map(i => s"tail_${i}_${rng.nextInt(3)}")
    val data = rng.shuffle(heavy ++ tail)
    val df = data.toDF("tok").repartition(32) // force partial merges
    val sketch = df
      .agg(MisraGriesAgg.sketch(100)(col("tok")).as("m"))
      .collect()(0).getMap[String, Long](0)
    val surviving = sketch.keySet
    (0 until 10).foreach { h =>
      assert(surviving.contains(s"heavy_$h"),
        s"heavy_$h must survive; sketch size ${sketch.size}")
    }
    assert(sketch.size <= 200, s"state must stay <= 2k, got ${sketch.size}")
    // residual counts never exceed true counts (undercount-only)
    (0 until 10).foreach { h =>
      assert(sketch(s"heavy_$h") <= 1500L)
    }
  }

  test("no compression below 2k: counts stay exact") {
    val df = Seq("a", "a", "b", "a", "c", "b").toDF("tok").repartition(3)
    val m = df.agg(MisraGriesAgg.sketch(10)(col("tok")).as("m"))
      .collect()(0).getMap[String, Long](0)
    assert(m === Map("a" -> 3L, "b" -> 2L, "c" -> 1L))
  }

  test("k must be positive") {
    intercept[IllegalArgumentException] { MisraGries(0) }
  }
}
