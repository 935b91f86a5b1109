package org.apache.spark.sql

import org.apache.spark.sql.catalyst.expressions.Expression

/** Bridge from a custom Catalyst [[Expression]] to a user-facing [[Column]].
  *
  * Spark 4 made `new Column(expr)` private; the supported alternatives are
  * `SparkSessionExtensions.injectFunction` + `call_function` (needs session
  * wiring) or `classic.ExpressionUtils.column` (scoped `private[sql]`).
  * This one-liner lives in the `org.apache.spark.sql` package purely to
  * satisfy that scope so graft's expressions (e.g.
  * `graft.functions.DotFloat`) compose like any built-in column function
  * with no per-session registration.
  */
object GraftColumns {
  def column(e: Expression): Column = classic.ExpressionUtils.column(e)
  def expression(c: Column): Expression = classic.ExpressionUtils.expression(c)

  /** RDD name marking a localCheckpoint CREATED BY a graft operator
    * (via [[checkpoint]]). [[unpersistCheckpoint]] releases only RDDs
    * carrying this tag, so a caller-owned checkpoint embedded in a
    * released plan can never be destroyed by the library.
    */
  val CheckpointTag = "graft-ckpt"

  /** `localCheckpoint()` + tag: the graft-library way to materialize an
    * intermediate. Identical semantics to `Dataset.localCheckpoint`
    * (eager, lineage-truncating, blocks NOT recomputable), plus the
    * resulting `LogicalRDD`'s RDD is named [[CheckpointTag]] so
    * [[unpersistCheckpoint]] can later release it while provably
    * leaving foreign (caller-created, untagged) checkpoints alone.
    */
  def checkpoint[T](ds: Dataset[T]): Dataset[T] = tag(ds.localCheckpoint())

  /** LAZY [[checkpoint]]: marks the plan's RDD for local checkpointing
    * and tags it, but runs NO job — the FIRST action a caller fires on
    * the result (a count, an aggregate, a downstream round) computes
    * the partitions and persists the blocks as a side effect. This is
    * the iterative-loop latency lever: a convergence witness
    * (row count, label sum) can ride the SAME job that materializes
    * the round instead of paying one eager-checkpoint job plus one
    * witness job per round. Callers MUST fire exactly one full action
    * before relying on the checkpoint semantics (lineage truncation is
    * already in the returned plan; block persistence happens at first
    * compute).
    */
  def lazyCheckpoint[T](ds: Dataset[T]): Dataset[T] =
    tag(ds.localCheckpoint(eager = false))

  private def tag[T](c: Dataset[T]): Dataset[T] = {
    c.asInstanceOf[classic.Dataset[T]].queryExecution.analyzed.foreach {
      case l: execution.LogicalRDD => l.rdd.setName(CheckpointTag); ()
      case _ => ()
    }
    c
  }

  /** Release the block-manager storage behind graft-created
    * `localCheckpoint`s ([[checkpoint]]) in a Dataset's plan.
    * `Dataset.unpersist` only covers cache-manager entries, not the RDD
    * blocks a local checkpoint pins, so iterative operators (e.g.
    * connected components, one checkpoint per round) would otherwise hold
    * every round's blocks until the driver GC happens to collect the RDD
    * reference (ContextCleaner). Explicit release bounds an iterative
    * operator's storage footprint to O(1) rounds instead of O(rounds) —
    * on a long-lived 100 TB session that difference is executor storage
    * eviction pressure.
    *
    * Traverses EVERY `LogicalRDD` the plan transitively reads (the
    * whole analyzed tree, not just a root), so an operator result that
    * is a narrow projection/join OVER its final checkpoints still works
    * as its own release handle — the "result == handle" contract the
    * graft operators document. Only RDDs tagged [[CheckpointTag]] are
    * unpersisted: a caller-owned localCheckpoint (or RDD-backed cached
    * frame) embedded in a released plan keeps its blocks. The tag
    * distinguishes graft-created checkpoints from FOREIGN ones — it
    * does not arbitrate ownership BETWEEN graft operators (all graft
    * checkpoints share one tag, so a graft checkpoint returned by one
    * operator and embedded in another released plan is released with
    * it); composing graft results still requires the caller to release
    * only plans it owns in full. No-op for plans with no graft
    * checkpoint.
    */
  def unpersistCheckpoint(df: Dataset[_]): Unit =
    df.asInstanceOf[classic.Dataset[_]].queryExecution.analyzed.foreach {
      case l: execution.LogicalRDD if l.rdd.name == CheckpointTag =>
        l.rdd.unpersist(blocking = false); ()
      case _ => ()
    }

  /** Register a SQL function on an ALREADY-BUILT session (the
    * `withExtensions`/`spark.sql.extensions` path only applies at session
    * construction; this covers sessions handed to the library, e.g. by a
    * driver harness or notebook).
    */
  def registerFunction(
      spark: SparkSession,
      ident: org.apache.spark.sql.catalyst.FunctionIdentifier,
      info: org.apache.spark.sql.catalyst.expressions.ExpressionInfo,
      builder: Seq[org.apache.spark.sql.catalyst.expressions.Expression] =>
        org.apache.spark.sql.catalyst.expressions.Expression): Unit =
    spark.asInstanceOf[classic.SparkSession]
      .sessionState.functionRegistry.registerFunction(ident, info, builder)
}
