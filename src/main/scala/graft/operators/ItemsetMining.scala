package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Frequent-itemset mining (pair level) — "which tokens/tags/entities
  * co-occur in the same document" — the corpus-analysis op behind
  * co-occurrence matrices, phrase discovery, and tag correlation.
  *
  * Scale shape (the Apriori insight, Spark-first): support(pair) ≤
  * support(item), so items below `minSupport` are pruned BEFORE the
  * within-id self-join — losslessly. That prune is what bounds the
  * quadratic: a document contributes C(k,2) pairs only in its FREQUENT
  * items k, and the frequent-item table is support-bounded (≤ n/minSup
  * per id on average). Plan: one explode + distinct (id,item) pairs —
  * partial-agg'd map-side, so dup-heavy input shrinks before its
  * exchange — then a hash agg for item counts, a semi-join prune, ONE
  * shuffle by id for the self-join, and a map-combined pair count. No broadcast of anything unbounded; the
  * remaining skew key is an id with many frequent items — at 100 TB cap
  * it upstream (drop or sample pathological docs) rather than here,
  * where silently dropping ids would corrupt counts.
  */
object ItemsetMining {

  /** Pairs of distinct items (from the array column `itemsCol`)
    * co-occurring under at least `minSupport` distinct `idCol` values.
    * Output: `item_a` < `item_b`, `n_ids` — exact counts.
    */
  def frequentPairs(df: DataFrame, idCol: String, itemsCol: String,
                    minSupport: Long): DataFrame = {
    require(minSupport >= 1, s"minSupport must be >= 1: $minSupport")
    // distinct AFTER the explode: array_distinct covers within-row dups,
    // this covers the same id appearing in multiple input rows — counts
    // are per distinct id, as documented, regardless of input row shape
    val items = df.select(col(idCol).as("__id"),
                          explode(array_distinct(col(itemsCol))).as("item"))
      .distinct()
    val freq = items.groupBy(col("item"))
      .agg(count(lit(1)).as("n_item"))
      .filter(col("n_item") >= minSupport)
      .select("item")
    val ft = items.join(freq, Seq("item"), "left_semi")
    val a = ft.select(col("__id"), col("item").as("item_a"))
    val b = ft.select(col("__id").as("__id2"), col("item").as("item_b"))
    a.join(b, col("__id") === col("__id2") && col("item_a") < col("item_b"))
      .groupBy(col("item_a"), col("item_b"))
      .agg(count(lit(1)).as("n_ids"))
      .filter(col("n_ids") >= minSupport)
  }

  /** PMI-style association LIFT for the frequent co-occurring pairs:
    * `lift_e6 = (1e6 · n_pair · N) div (n_a · n_b)` — the floor-scaled
    * p(a,b) / (p(a)·p(b)) ratio (PMI without the log, so the exact
    * integer discipline holds; log is monotone, ranking is identical).
    * lift > 1e6 ⟺ positive association. N = distinct ids carrying at
    * least one item (the event space the probabilities live in).
    *
    * Same pair plan as [[frequentPairs]] (Apriori-pruned self-join, one
    * pair aggregate) plus the 1-row N broadcast; unigram counts ride the
    * pruning join. Bound check before trusting at extreme scale:
    * 1e6·n_pair·N must fit int64 — at N beyond ~3·10⁶ ids rescale the
    * constant (the ranking is scale-invariant).
    */
  def pairLift(df: DataFrame, idCol: String, itemsCol: String,
               minSupport: Long): DataFrame = {
    require(minSupport >= 1, s"minSupport must be >= 1: $minSupport")
    val items = df.select(col(idCol).as("__id"),
                          explode(array_distinct(col(itemsCol))).as("item"))
      .distinct()
    val nIds = items.select(col("__id")).distinct()
      .agg(count(lit(1)).as("__n"))
    val freq = items.groupBy(col("item"))
      .agg(count(lit(1)).as("n_item"))
      .filter(col("n_item") >= minSupport)
    val ft = items.join(freq, Seq("item"))
    val a = ft.select(col("__id"), col("item").as("item_a"),
                      col("n_item").as("__na"))
    val b = ft.select(col("__id").as("__id2"), col("item").as("item_b"),
                      col("n_item").as("__nb"))
    a.join(b, col("__id") === col("__id2") && col("item_a") < col("item_b"))
      .groupBy(col("item_a"), col("item_b"), col("__na"), col("__nb"))
      .agg(count(lit(1)).as("n_ids"))
      .filter(col("n_ids") >= minSupport)
      .crossJoin(broadcast(nIds))
      .select(col("item_a"), col("item_b"), col("n_ids"),
              expr("(1000000 * n_ids * __n) div (__na * __nb)")
                .as("lift_e6"))
  }

  /** Frequent TRIPLES — Apriori at depth 3, with the full downward-
    * closure prune: a (a,b,c) candidate exists only when ALL THREE of
    * its sub-pairs are frequent (not merely its items), so the
    * within-id expansion joins PAIR-pruned occurrences against the
    * support-bounded frequent-pair table — three broadcastable
    * semi-joins between the id-keyed joins, which is what keeps depth
    * 3 from cubing: a document expands only into candidates every
    * depth-2 gate already admitted.
    * Output: `item_a` < `item_b` < `item_c`, `n_ids` — exact counts.
    */
  def frequentTriples(df: DataFrame, idCol: String, itemsCol: String,
                      minSupport: Long): DataFrame = {
    require(minSupport >= 1, s"minSupport must be >= 1: $minSupport")
    val items = df.select(col(idCol).as("__id"),
                          explode(array_distinct(col(itemsCol))).as("item"))
      .distinct()
    val freq = items.groupBy(col("item"))
      .agg(count(lit(1)).as("n_item"))
      .filter(col("n_item") >= minSupport)
      .select("item")
    val ft = items.join(freq, Seq("item"), "left_semi")
    val a = ft.select(col("__id"), col("item").as("item_a"))
    val b = ft.select(col("__id").as("__id2"), col("item").as("item_b"))
    val idPairs = a
      .join(b, col("__id") === col("__id2") && col("item_a") < col("item_b"))
      .select(col("__id"), col("item_a"), col("item_b"))
    val fp = idPairs.groupBy(col("item_a"), col("item_b"))
      .agg(count(lit(1)).as("__np"))
      .filter(col("__np") >= minSupport)
      .select(col("item_a"), col("item_b"))
    val prunedPairs = idPairs.join(fp, Seq("item_a", "item_b"), "left_semi")
    val c = ft.select(col("__id").as("__id3"), col("item").as("item_c"))
    prunedPairs
      .join(c, col("__id") === col("__id3") && col("item_b") < col("item_c"))
      .join(fp.select(col("item_a"), col("item_b").as("item_c")),
            Seq("item_a", "item_c"), "left_semi")
      .join(fp.select(col("item_a").as("item_b"),
                      col("item_b").as("item_c")),
            Seq("item_b", "item_c"), "left_semi")
      .groupBy(col("item_a"), col("item_b"), col("item_c"))
      .agg(count(lit(1)).as("n_ids"))
      .filter(col("n_ids") >= minSupport)
  }
}
