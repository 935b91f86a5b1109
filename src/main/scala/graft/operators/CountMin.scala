package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

import graft.functions.PortableHash

/** Count–min sketch (Cormode & Muthukrishnan, J. Algorithms 2005) as a
  * relational aggregate.
  *
  * The sketch is a depth×width counter table: every element increments
  * one counter per row r, at column h_r(key) mod width; a point query
  * reads the MIN over its depth counters — an overestimate by at most
  * the collision mass in the element's lightest cell (est ≥ exact
  * always; est ≤ exact + εN with probability 1−δ at width = ⌈e/ε⌉,
  * depth = ⌈ln 1/δ⌉). The streaming-sketch answer to "how often does X
  * occur in 100 TB" when X isn't known until after the scan — the
  * batch complement to the Misra–Gries heavy-hitter aggregate
  * ([[graft.functions.MisraGriesAgg]]), which needs no width but only
  * answers for the heaviest keys.
  *
  * Shape: ONE map-combined aggregate over a depth-fold row explode —
  * at most depth·width output rows regardless of input size, so the
  * shuffle is CONSTANT in the corpus (the point of a sketch) and the
  * build parallelizes per-partition exactly like a groupBy count.
  * Hashes are [[PortableHash.h32]] over `"r:key"` so an external SQL
  * engine replays the exact counter table — estimates here are
  * DETERMINISTIC and oracle-comparable, not merely banded (contrast
  * the q40/q45 envelope gates for HLL/GK, whose hashes are
  * engine-private).
  */
object CountMin {

  /** Counter column for row `r`: portable 32-bit hash of "r:key" mod
    * width. Callers pass the SAME (depth, width) to build and probe.
    */
  def cellOf(r: Column, key: Column, width: Int): Column =
    pmod(PortableHash.h32(concat_ws(":", r, key)), lit(width.toLong))

  /** Build the depth×width counter table for `df(keyCol)` occurrences:
    * columns (r, cell, cnt), at most depth·width rows.
    *
    * NULL keys are EXCLUDED (ADVICE r14): `concat_ws` would silently
    * hash a null key as just `"<r>"`, incrementing real counters the
    * DuckDB oracle's `r || ':' || key` (NULL-propagating) never sees —
    * a latent estimate/oracle divergence on any nullable key column.
    * Matching SQL semantics (COUNT over a key excludes NULLs) is both
    * the oracle-stable and the least-surprising contract.
    */
  def sketch(df: DataFrame, keyCol: String,
             depth: Int, width: Int): DataFrame =
    df.filter(col(keyCol).isNotNull)
      .select(explode(sequence(lit(0), lit(depth - 1))).as("r"),
              col(keyCol))
      .groupBy(col("r"), cellOf(col("r"), col(keyCol), width).as("cell"))
      .agg(count(lit(1)).as("cnt"))

  /** Merge sketches built over disjoint slices of one corpus: CM is
    * LINEAR (every counter is a sum over rows), so cell-wise addition
    * of per-slice tables IS the global table — the property that lets
    * 1000 executors sketch their partitions independently and a
    * reduce-side add produce the exact corpus sketch. Input: any
    * union/frame of (r, cell, cnt) rows; output: one row per (r, cell).
    */
  def merge(sketches: DataFrame): DataFrame =
    sketches.groupBy(col("r"), col("cell"))
      .agg(sum(col("cnt")).as("cnt"))

  /** Inner-product estimate of an equi-join's CARDINALITY from the two
    * sides' key sketches (the count–min form of the AGMS join-size
    * estimate, Alon–Gilbert–Matias–Szegedy SIGMOD'99 / Cormode &
    * Muthukrishnan §4.2): est = min over rows r of
    * Σ_cell cntA(r,cell)·cntB(r,cell). Per row the sum is
    * Σ_k fA(k)·fB(k) plus nonnegative collision cross-terms, so
    * est ≥ |A ⋈ B| ALWAYS, and ≤ exact + ε·|A|·|B| w.p. 1−δ at the
    * usual (depth, width) sizing — the planner's answer to "how large
    * is this join" for the price of two constant-size sketches,
    * BEFORE paying the join's shuffle at 100 TB (self-join form =
    * the second frequency moment F2, the skew witness). Both sketches
    * must share (depth, width) and the portable cell hash.
    *
    * Returns ONE row (`cm_join_est`). The per-(r,cell) join touches
    * ≤ depth·width rows per side; rows r with ZERO overlapping cells
    * must read 0 (a disjoint-key join has true size 0), so the
    * per-row sums are LEFT-joined from the full 0..depth-1 row frame
    * — an inner-only min would silently skip empty rows and
    * overestimate from the others.
    */
  def innerProduct(a: DataFrame, b: DataFrame, depth: Int): DataFrame = {
    val sa = a.select(col("r").as("__cm_r"), col("cell").as("__cm_cell"),
                      col("cnt").as("__cm_ca"))
    val sb = b.select(col("r").as("__cm_r"), col("cell").as("__cm_cell"),
                      col("cnt").as("__cm_cb"))
    val perRow = sa.join(sb, Seq("__cm_r", "__cm_cell"))
      .groupBy(col("__cm_r"))
      .agg(sum(col("__cm_ca") * col("__cm_cb")).as("__cm_ip"))
    a.sparkSession.range(depth)
      .select(col("id").cast("int").as("__cm_r"))
      .join(broadcast(perRow), Seq("__cm_r"), "left")
      .agg(min(coalesce(col("__cm_ip"), lit(0L))).as("cm_join_est"))
  }

  /** Point estimates for every row of `keys` (its `keyCol` plus any
    * carried columns survive): adds `cm_est` = min over the depth
    * counters. The sketch side is broadcast — it is ≤ depth·width rows
    * BY CONSTRUCTION, the caller sized it, and that bound is why a
    * sketch exists at all. LEFT join + coalesce(0): a key the sketch
    * never saw has empty cells, and min-over-missing must read 0, not
    * drop rows (an inner join would silently under-join unseen keys).
    *
    * NULL probe keys are dropped, mirroring [[sketch]]'s exclusion (a
    * null key has no counters to read; see the null note there). The
    * probe-side working columns use collision-proof internal names
    * (`__cm_*`, ADVICE r14) so a caller's frame may freely carry
    * columns named `r`, `cell`, or `cnt` — the sketch side is renamed
    * to match before the join and every internal column is dropped by
    * the closing groupBy over the carried columns.
    */
  def estimate(sketch: DataFrame, keys: DataFrame, keyCol: String,
               depth: Int, width: Int): DataFrame = {
    val carried = keys.columns.map(col)
    val sk = sketch.select(col("r").as("__cm_r"),
                           col("cell").as("__cm_cell"),
                           col("cnt").as("__cm_cnt"))
    keys
      .filter(col(keyCol).isNotNull)
      .select(carried :+
        explode(sequence(lit(0), lit(depth - 1))).as("__cm_r"): _*)
      .withColumn("__cm_cell", cellOf(col("__cm_r"), col(keyCol), width))
      .join(broadcast(sk), Seq("__cm_r", "__cm_cell"), "left")
      .groupBy(carried: _*)
      .agg(min(coalesce(col("__cm_cnt"), lit(0L))).as("cm_est"))
  }
}
