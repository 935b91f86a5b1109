package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Distributed iterative graph operators.
  *
  * [[connectedComponents]] turns near-duplicate PAIRS into dedup GROUPS
  * (every doc labeled with the min doc id of its component) — the step a
  * real dedup pipeline needs between pair generation and keeper selection.
  */
object GraphOps {

  /** Connected components by iterative min-label propagation.
    *
    * Each round every vertex takes the minimum label among itself and its
    * neighbors; convergence in O(diameter) rounds. Near-dup components are
    * tiny (dozens of docs), so the loop runs 2–4 rounds in practice; the
    * per-round work is one shuffle join + one aggregate, fully
    * distributed. `localCheckpoint` truncates the lineage each round so
    * plan size stays constant regardless of iteration count (an unbounded
    * iterative lineage would blow up optimizer time and executor stacks at
    * scale). Termination is exact: stop when no label changed — and if the
    * label sum is still moving at `maxIter` (a component whose diameter
    * exceeds the cap, e.g. a very long templated-doc chain), this THROWS
    * rather than silently returning split components; callers with
    * genuinely deep graphs pass a larger cap (rounds are cheap — one join
    * + one aggregate each).
    *
    * Output: (vertex, component) — component = min vertex id reachable.
    * Only vertices appearing in `edges` are labeled.
    */
  def connectedComponents(edges: DataFrame, srcCol: String, dstCol: String,
                          maxIter: Int = 50): DataFrame = {
    // materialize the (possibly expensive) edge plan ONCE before
    // symmetrizing — a union of two branches over the raw plan would
    // evaluate it twice
    val e = edges.select(col(srcCol).as("src"), col(dstCol).as("dst"))
      .localCheckpoint()
    val sym = e.union(e.select(col("dst").as("src"), col("src").as("dst")))

    var labels = sym.select(col("src").as("id"))
      .distinct()
      .withColumn("comp", col("id"))
      .localCheckpoint()

    if (labels.isEmpty) {
      org.apache.spark.sql.GraftColumns.unpersistCheckpoint(e)
      return labels
    }

    // Labels only ever DECREASE (min of self + neighbors), so the global
    // label sum is a strictly decreasing convergence witness: unchanged
    // sum ⟺ no label changed. One cheap aggregate per round instead of a
    // join-and-compare pass. Summed as decimal(38,0): a 64-bit sum could
    // wrap at billions-of-vertices scale and a wrapped collision would
    // end propagation early with wrong components.
    def labelSum(df: DataFrame): java.math.BigDecimal =
      df.agg(sum(col("comp").cast("decimal(38,0)")))
        .collect()(0).getDecimal(0)

    var prevSum = labelSum(labels)
    var iter = 0
    var converged = false
    while (!converged && iter < maxIter) {
      // neighbor labels + own label, min per vertex
      val prop = sym
        .join(labels, sym("dst") === labels("id"))
        .select(sym("src").as("id"), col("comp"))
        .union(labels)
        .groupBy("id")
        .agg(min(col("comp")).as("comp"))
        .localCheckpoint()
      val s = labelSum(prop)
      // the new round is materialized — release the previous round's
      // blocks now, so the loop holds O(1) rounds of storage, not O(iter)
      org.apache.spark.sql.GraftColumns.unpersistCheckpoint(labels)
      labels = prop
      converged = s.compareTo(prevSum) == 0
      prevSum = s
      iter += 1
    }
    org.apache.spark.sql.GraftColumns.unpersistCheckpoint(e)
    if (!converged) throw new IllegalStateException(
      s"connectedComponents did not converge in $maxIter rounds — " +
        "component diameter exceeds the cap; rerun with a larger maxIter")
    labels
  }
}
