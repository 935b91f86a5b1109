package graft

import org.apache.spark.sql.{Dataset, GraftColumns}

/** Library-internal Dataset syntax.
  *
  * `graftCheckpoint()` is the drop-in replacement for
  * `localCheckpoint()` inside graft operators: same eager,
  * lineage-truncating materialization, but the backing RDD is tagged
  * (see [[org.apache.spark.sql.GraftColumns.CheckpointTag]]) so
  * `GraftColumns.unpersistCheckpoint` releases ONLY graft-created
  * checkpoints — a caller's own localCheckpoint embedded in a released
  * plan keeps its (non-recomputable) blocks.
  */
object GraftOps {
  implicit final class GraftDatasetOps[T](private val ds: Dataset[T])
      extends AnyVal {
    def graftCheckpoint(): Dataset[T] = GraftColumns.checkpoint(ds)

    /** Lazy variant — see [[GraftColumns.lazyCheckpoint]]: lineage is
      * truncated now, blocks persist on the FIRST action, so a
      * convergence witness can share the materialization job.
      */
    def graftCheckpointLazy(): Dataset[T] = GraftColumns.lazyCheckpoint(ds)
  }
}
