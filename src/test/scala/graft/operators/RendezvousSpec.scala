package graft.operators

import org.apache.spark.sql.functions._

import graft.SparkSpec

/** Contracts of [[Partitioning.rendezvousShard]] and
  * [[Sampling.temperatureQuotas]].
  */
class RendezvousSpec extends SparkSpec {
  import spark.implicits._

  test("rendezvous: removing the top shard moves ONLY its keys") {
    val keys = spark.range(2000).toDF("k")
    val with8 = Partitioning.rendezvousShard(keys, "k", 8)
      .as[(Long, Long)].collect().toMap
    val with7 = Partitioning.rendezvousShard(keys, "k", 7)
      .as[(Long, Long)].collect().toMap
    // every key NOT on shard 7 keeps its assignment exactly
    val moved = with8.filter { case (k, s) => s != 7 && with7(k) != s }
    assert(moved.isEmpty,
      s"${moved.size} survivors reassigned — rendezvous must be stable")
    // shard 7's keys all land somewhere in 0..6
    val orphans = with8.filter(_._2 == 7).keys
    assert(orphans.nonEmpty && orphans.forall(k => with7(k) < 7))
    // contrast: mod-8 -> mod-7 moves most keys (the property mod lacks)
    val modMoved = (0L until 2000L).count(k => k % 8 != 7 && k % 8 != k % 7)
    assert(modMoved > 1000, "fixture sanity: mod sharding is unstable")
  }

  test("rendezvous spreads keys across all shards") {
    val keys = spark.range(800).toDF("k")
    val counts = Partitioning.rendezvousShard(keys, "k", 8)
      .groupBy("shard").count().as[(Long, Long)].collect().toMap
    assert(counts.keySet === (0L until 8L).toSet)
    assert(counts.values.forall(c => c > 40 && c < 200),
      s"grossly unbalanced shards: $counts")
  }

  test("temperatureQuotas: quotas sum to the budget exactly and " +
       "sharpening shifts budget to the big source") {
    // sizes 6, 3, 1 -> sharpened weights 36, 9, 1 (tot 46)
    val df = (Seq.fill(6)("big") ++ Seq.fill(3)("mid") ++ Seq("small"))
      .toDF("src")
    def quotas(sharpen: Boolean) =
      Sampling.temperatureQuotas(df, "src", budget = 10L, sharpen)
        .select("source", "quota").as[(String, Long)].collect().toMap
    val sharp = quotas(sharpen = true)
    // floors: 360/46=7, 90/46=1, 10/46=0 (rems 38, 44, 10) -> 8 seats
    // used, 2 leftover go to the largest remainders: mid then big
    assert(sharp === Map("big" -> 8L, "mid" -> 2L, "small" -> 0L))
    assert(sharp.values.sum === 10L)
    val prop = quotas(sharpen = false)
    assert(prop.values.sum === 10L)
    assert(prop("big") === 6L && prop("mid") === 3L && prop("small") === 1L)
    assert(sharp("big") > prop("big"), "sharpening must favor the big source")
  }
}
