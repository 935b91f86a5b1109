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

  /** Connected components by min-label propagation with POINTER JUMPING.
    *
    * Each round does two label-shrinking steps: (1) edge propagation —
    * every vertex takes the minimum label among itself and its neighbors
    * (1 hop of progress); (2) pointer jump — every vertex replaces its
    * label with its label's label (`comp(comp(v))`), which doubles the
    * distance already covered, Shiloach–Vishkin style. The distance left
    * to the component's min vertex therefore shrinks geometrically:
    * convergence in O(log diameter) rounds, not O(diameter) — a 100k-doc
    * templated chain settles in ~18 rounds where plain propagation needs
    * 100k. Near-dup components are usually tiny (2–4 rounds either way);
    * the jump is what makes the worst case survivable at scale.
    * Per round: two shuffle joins + one aggregate, fully distributed.
    * `localCheckpoint` truncates lineage each round so plan size stays
    * constant, and each round releases the previous round's blocks.
    * Termination is exact: labels only decrease, so the global label sum
    * is a strictly decreasing convergence witness; stop when unchanged.
    * If it is still moving at `maxIter` this THROWS rather than silently
    * returning split components (with jumping, hitting 50 rounds means a
    * component diameter around 2^50 — pathological input, not data).
    *
    * Output: (vertex, component) — component = min vertex id reachable.
    * Only vertices appearing in `edges` are labeled.
    */
  def connectedComponents(edges: DataFrame, srcCol: String, dstCol: String,
                          maxIter: Int = 50): DataFrame =
    connectedComponentsWithStats(edges, srcCol, dstCol, maxIter)._1

  /** [[connectedComponents]] plus the number of rounds it ran — the
    * convergence diagnostic ScaleProbe graphs (rounds vs diameter).
    */
  def connectedComponentsWithStats(edges: DataFrame, srcCol: String,
                                   dstCol: String, maxIter: Int = 50)
      : (DataFrame, Int) = {
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
      return (labels, 0)
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
      // step 1 — edge propagation: per-vertex min over neighbor labels,
      // then fold in the vertex's own label via a left join + least().
      // (Formulated WITHOUT a union: unioning a checkpointed outer-join
      // product trips UnionBase.rewriteConstraints on the LogicalRDD's
      // origin constraints, which reference the join's non-output
      // attributes — a Catalyst edge the join+least shape avoids.)
      val nbr = sym
        .join(labels, sym("dst") === labels("id"))
        .groupBy(sym("src").as("nid"))
        .agg(min(col("comp")).as("ncomp"))
      val prop = labels
        .join(nbr, col("id") === col("nid"), "left")
        .select(col("id"),
                least(coalesce(col("ncomp"), col("comp")), col("comp"))
                  .as("comp"))
        .localCheckpoint()
      // step 2 — pointer jump: comp(v) := comp(comp(v)). Labels are
      // always vertex ids present in `prop` (inductively: initialized to
      // the vertex itself; every later value is a min over such labels),
      // so the left join's coalesce is a guard, not a code path.
      val jump = prop
        .select(col("id").as("jid"), col("comp").as("jcomp"))
      val jumped = prop
        .join(jump, col("comp") === col("jid"), "left")
        .select(col("id"),
                coalesce(col("jcomp"), col("comp")).as("comp"))
        .localCheckpoint()
      org.apache.spark.sql.GraftColumns.unpersistCheckpoint(prop)
      val s = labelSum(jumped)
      // the new round is materialized — release the previous round's
      // blocks now, so the loop holds O(1) rounds of storage, not O(iter)
      org.apache.spark.sql.GraftColumns.unpersistCheckpoint(labels)
      labels = jumped
      converged = s.compareTo(prevSum) == 0
      prevSum = s
      iter += 1
    }
    org.apache.spark.sql.GraftColumns.unpersistCheckpoint(e)
    if (!converged) throw new IllegalStateException(
      s"connectedComponents did not converge in $maxIter rounds — " +
        "component diameter exceeds the cap; rerun with a larger maxIter")
    (labels, iter)
  }

  /** Triangle enumeration (a < b < c) — the transitivity/density measure
    * of a similarity or duplicate graph. Input edges are canonicalized
    * (undirected, deduped, self-loops dropped) so callers can hand in
    * raw pair lists.
    *
    * Shape: orient every edge low→high, join wedges a–b–c on the shared
    * middle, close them against the edge set — two hash equi-joins, no
    * products. Orientation makes each triangle appear exactly once AND
    * bounds wedge fan-out by out-degree; the production refinement at
    * 100 TB is degree-ordered orientation (highest-degree node last),
    * which caps out-degree at O(√m) for any graph — same plan, one extra
    * degree join. Hub guard: a node of out-degree d contributes C(d,2)
    * wedges; treat pathological hubs upstream like hot shingles
    * (`maxShingleDf` precedent).
    */
  def triangles(edges: DataFrame, uCol: String, vCol: String): DataFrame = {
    val e = edges
      .select(least(col(uCol), col(vCol)).as("u"),
              greatest(col(uCol), col(vCol)).as("v"))
      .filter(col("u") < col("v"))
      .distinct()
    val wedges = e.select(col("u").as("a"), col("v").as("b"))
      .join(e.select(col("u").as("b2"), col("v").as("c")),
            col("b") === col("b2"))
      .select(col("a"), col("b"), col("c"))
    wedges.join(e.select(col("u").as("a2"), col("v").as("c2")),
                col("a") === col("a2") && col("c") === col("c2"), "left_semi")
  }
}
