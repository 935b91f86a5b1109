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
