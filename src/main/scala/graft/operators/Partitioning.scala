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

  def spread(df: DataFrame): DataFrame = {
    val target = df.sparkSession.sparkContext.defaultParallelism
    if (df.rdd.getNumPartitions < target) df.repartition(target) else df
  }
}
