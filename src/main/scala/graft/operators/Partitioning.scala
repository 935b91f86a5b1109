package graft.operators

import org.apache.spark.sql.DataFrame

/** Parallelism guards for CPU-bound operators.
  *
  * A parquet scan yields one task per file split (row group); a small or
  * badly-compacted input can arrive in far fewer partitions than the
  * cluster has cores, and then a compute-heavy per-row stage (shingling,
  * signatures, pairwise similarity) serializes on a handful of tasks no
  * matter how wide the cluster is. [[spread]] repartitions ONLY in that
  * case: when the input already has ≥ default parallelism partitions
  * (the normal state for a 100 TB table) it is a no-op, so well-formed
  * inputs never pay an extra shuffle.
  */
object Partitioning {

  import org.apache.spark.sql.catalyst.plans.logical.{Filter, LeafNode, LogicalPlan, Project}

  /** True iff the plan is a bare scan (projections/filters over a leaf).
    * Only then is the partition count (a) knowable without running
    * anything — `Dataset.rdd` on a shuffling plan under AQE would EXECUTE
    * the upstream stages just to finalize the plan — and (b) worth
    * checking at all: any shuffle in the input already re-partitions to
    * `spark.sql.shuffle.partitions`, so downstream parallelism is fine.
    */
  private def isNarrowScan(plan: LogicalPlan): Boolean = plan match {
    case p: Project => isNarrowScan(p.child)
    case f: Filter => isNarrowScan(f.child)
    case _: LeafNode => true
    case _ => false
  }

  def spread(df: DataFrame): DataFrame = {
    val target = df.sparkSession.sparkContext.defaultParallelism
    if (isNarrowScan(df.queryExecution.optimizedPlan) &&
        df.rdd.getNumPartitions < target)
      df.repartition(target)
    else df
  }

  /** RENDEZVOUS (highest-random-weight) sharding: each key goes to the
    * shard maximizing a portable hash of (key, shard) — the STABLE
    * assignment scheme whose defining property plain `hash(key) mod S`
    * lacks: removing one shard reassigns ONLY that shard's keys (each
    * survivor's argmax is untouched), where mod-S reshuffles nearly
    * everything. The shard map every long-lived corpus layout wants
    * when the shard set must be able to grow/shrink without a global
    * data migration.
    *
    * Exact + engine-portable: the weight is [[graft.functions
    * .PortableHash.h32]] (md5-prefix), ties break to the LOWEST shard
    * id (md5 collisions across a key's S candidates are ~S²/2³³ —
    * effectively never, but the rule makes even that case exact): the
    * argmax is a per-row fold over the ascending shard axis with a
    * strict `>`, so the whole assignment is one narrow projection —
    * S hashes per row, ZERO shuffle, no row ever widened or grouped.
    */
  def rendezvousShard(df: DataFrame, keyCol: String,
                      shards: Int): DataFrame = {
    require(shards >= 1, s"shards must be >= 1: $shards")
    import org.apache.spark.sql.functions._
    val axis = array((0 until shards).map(lit(_)): _*)
    val init = struct(lit(-1L).as("h"), lit(0L).as("sh"))
    val best = aggregate(axis, init, (acc, x) => {
      val hw = graft.functions.PortableHash.h32(
        concat(col(keyCol).cast("string"), lit(":"), x.cast("string")))
      when(hw > acc.getField("h"),
           struct(hw.as("h"), x.cast("long").as("sh")))
        .otherwise(acc)
    })
    df.withColumn("shard", best.getField("sh"))
  }
}
