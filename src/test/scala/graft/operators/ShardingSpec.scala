package graft.operators

import graft.SparkSpec

/** Contracts of [[Sharding]]: assignment parity with a brute-force
  * ring-successor scan, wrap-around, and THE consistent-hashing
  * theorem — growing the ring moves keys only TO the new shard.
  */
class ShardingSpec extends SparkSpec {
  import spark.implicits._

  private def bruteShard(key: String, shards: Int, vnodes: Int): Long = {
    def h32(s: String): Long =
      BigInt(1, java.security.MessageDigest.getInstance("MD5")
        .digest(s.getBytes("UTF-8")).take(4)).toLong
    val ring = (for (s <- 0 until shards; v <- 0 until vnodes)
      yield (h32(s"$s:$v"), s.toLong)).sorted
    val h = h32(key)
    ring.find(_._1 >= h).getOrElse(ring.head)._2
  }

  test("assignment matches the brute-force successor scan (wrap " +
       "included) over many keys") {
    val keys = (1L to 500L).toDF("k")
    val got = Sharding.ringAssign(keys, "k", shards = 4, vnodes = 8)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    (1L to 500L).foreach { k =>
      assert(got(k) == bruteShard(k.toString, 4, 8), s"key $k")
    }
    // wrap exercised: at least one key must hash above the ring's top
    assert((1L to 500L).exists { k =>
      val top = (for (s <- 0 until 4; v <- 0 until 8)
        yield BigInt(1, java.security.MessageDigest.getInstance("MD5")
          .digest(s"$s:$v".getBytes("UTF-8")).take(4)).toLong).max
      BigInt(1, java.security.MessageDigest.getInstance("MD5")
        .digest(k.toString.getBytes("UTF-8")).take(4)).toLong > top
    })
  }

  test("adding one shard moves keys ONLY to the new shard, and far " +
       "fewer than mod-sharding would") {
    val n = 2000L
    val rows = (1L to n).toDF("k")
      .withColumn("s8", Sharding.shardOf(org.apache.spark.sql.functions
        .col("k"), 8, 16))
      .withColumn("s9", Sharding.shardOf(org.apache.spark.sql.functions
        .col("k"), 9, 16))
      .collect().map(r => (r.getLong(1), r.getLong(2)))
    val moved = rows.filter { case (a, b) => a != b }
    assert(moved.nonEmpty)
    assert(moved.forall(_._2 == 8L),
      "a moved key landed somewhere other than the new shard")
    // expectation ~ n/9 ≈ 222; assert it's far below the mod-shard
    // regime (~8n/9 ≈ 1778) with generous slack for vnode variance
    assert(moved.length < n / 3, s"moved ${moved.length}")
  }

  test("ring rejects degenerate parameters") {
    intercept[IllegalArgumentException](Sharding.ring(0, 4))
    intercept[IllegalArgumentException](Sharding.ring(4, 0))
  }
}
