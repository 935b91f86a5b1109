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
}
