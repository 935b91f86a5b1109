package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import graft.GraftOps._

/** Distributed k-means clustering (Lloyd's algorithm), QUANTIZED so every
  * step is exact integer arithmetic and therefore deterministic and
  * engine-portable.
  *
  * Why quantized: classic float k-means sums coordinates in partition
  * order, so centroid means (and downstream assignments) are not
  * bit-reproducible across runs or engines — un-oracle-able and subtly
  * flaky. Scaling each coordinate to `floor(x·10⁶)` (a BIGINT) makes
  * sums order-independent and exact; means use truncating integer
  * division (Scala `/` ≡ DuckDB `//` toward zero), so an external SQL
  * engine replicates every iteration bit-for-bit. The ~1e-6 coordinate
  * quantization is far below embedding noise.
  *
  * Scale shape (the standard distributed Lloyd):
  *  - Assignment is a per-row codegen'd expression — ONE
  *    [[graft.functions.ArgMinDistSqLong]] kernel looping all k
  *    centroids (the matrix as a reference object, so Lloyd rounds
  *    reuse ONE compiled projection), ties → lower cid. No shuffle,
  *    no UDF, no per-centroid struct allocation.
  *  - The update is one `groupBy(cid, dim).sum` over posexploded
  *    coordinates — k·dims result rows COLLECTED to the driver (tiny,
  *    control-plane); the per-iteration cost is one map-side-combined
  *    shuffle of k·dims partials per task, not data-sized.
  *  - Iterations are a driver loop over broadcast-literal centroids —
  *    exactly how IVF coarse quantizers are trained in practice (fixed
  *    small iteration count over a sample or the full corpus).
  * A centroid that loses every member keeps its previous position
  * (arises on degenerate inputs, e.g. duplicate init vectors); the SQL
  * oracle mirrors this keep-position rule (COALESCE against the prior
  * round's centroids), so the degenerate case stays oracle-exact too.
  */
object Clustering {

  /** Quantize an `array<float|double>` embedding to `array<long>` at
    * 10⁶, truncated to the first `dims` dimensions (clustering on a
    * prefix is a caller choice); an embedding SHORTER than `dims`, or a
    * null element, throws — never a silent prefix clustering. Codegen'd
    * ([[graft.functions.QuantizeE6]]): this is a full-corpus per-row
    * pass on every fit, exactly the hot path where interpreted
    * higher-order functions are banned.
    */
  def quantize(emb: Column, dims: Int): Column = {
    import org.apache.spark.sql.GraftColumns
    GraftColumns.column(graft.functions.QuantizeE6(
      GraftColumns.expression(emb), dims))
  }

  /** Run `iters` Lloyd iterations from centroids = the `k` lowest-id
    * vectors; returns the fitted quantized centroids, index = cid.
    * (Driver-side array: k·dims longs — the coarse-quantizer scale, not
    * the data scale.)
    */
  def kmeansFit(emb: DataFrame, idCol: String, vecCol: String,
                k: Int, dims: Int, iters: Int): Array[Array[Long]] = {
    val (cents, scaled) = fitImpl(emb, idCol, vecCol, k, dims, iters)
    scaled.unpersist()
    cents
  }

  /** Run `iters` Lloyd iterations from centroids = the `k` lowest-id
    * vectors; returns (vec_id, cid, dist2) — each vector's final cluster
    * and its integer squared distance to that centroid.
    *
    * RELEASE CONTRACT: result == handle (the
    * [[graft.operators.Dedup.containmentPairs]] convention).
    */
  def kmeansAssign(emb: DataFrame, idCol: String, vecCol: String,
                   k: Int, dims: Int, iters: Int): DataFrame = {
    val (centroids, scaled) = fitImpl(emb, idCol, vecCol, k, dims, iters)
    // materialize the (3-column) assignment before releasing the cache
    val out = scaled
      .select(col("vec_id"), scoredMin(centroids).as("a"))
      .select(col("vec_id"), col("a.c").as("cid"), col("a.d").as("dist2"))
      .graftCheckpoint()
    scaled.unpersist()
    out
  }

  /** THE scoring expression — struct argmin over integer dist² of a
    * QUANTIZED (`array<long>`) column against constant centroids, ties
    * to the lower cid; returns a `(d, c)` struct. Single definition
    * shared by the fit loop, the final assignment, and external encoders
    * (PQ) so the tie-break and score shape can never drift — both are
    * oracle-visible.
    */
  /** De-quantize fitted centroids to float rows `(cid, cv)` for cosine
    * consumers (IVF probing). BIGINT/10⁶ → double → float rounds
    * identically in IEEE across engines, and the expression is
    * ORACLE-VISIBLE (`CAST(x / 1000000.0 AS FLOAT)` in the q69/q71
    * mirrors) — single definition so the two gates can't drift.
    */
  def dequantize(cents: Array[Array[Long]]): Seq[(Long, Array[Float])] =
    cents.zipWithIndex.toSeq.map { case (c, i) =>
      (i.toLong, c.map(v => (v.toDouble / 1000000.0).toFloat))
    }

  def nearest(q: Column, centroids: Array[Array[Long]]): Column = {
    import org.apache.spark.sql.GraftColumns
    GraftColumns.column(graft.functions.ArgMinDistSqLong(
      GraftColumns.expression(q), centroids))
  }

  private def scoredMin(centroids: Array[Array[Long]]): Column =
    nearest(col("q0"), centroids)

  /** Shared fit loop: returns (centroids, still-persisted quantized
    * corpus with the coordinates in column `q0`) — the caller owns the
    * unpersist. Delegates to the multi-subspace trainer with m = 1, so
    * there is exactly ONE Lloyd implementation behind q68/q69/q70.
    */
  private def fitImpl(emb: DataFrame, idCol: String, vecCol: String,
                      k: Int, dims: Int, iters: Int)
      : (Array[Array[Long]], DataFrame) = {
    val (books, scaled) =
      kmeansFitMulti(emb, idCol, Seq(col(vecCol)), k, dims, iters)
    (books(0), scaled)
  }

  /** Train `m` independent codebooks — one per entry of `vecCols`
    * (typically `slice`s of a single embedding column: the PQ subspace
    * split) — JOINTLY: each Lloyd round is ONE job whose assignment
    * projection evaluates every subspace's argmin kernels and whose
    * single map-side-combined `groupBy(sub, cid, pos)` shuffle carries
    * m·k·dims partials per task. Training m books this way costs the
    * same number of jobs/scans as training one (the alternative — m
    * sequential [[kmeansFit]] calls — pays m× the scans and m×(iters+1)
    * scheduling rounds for identical results: the chains are
    * arithmetically independent, so batching is a pure physical win and
    * the per-subspace SQL oracle stays valid unchanged).
    *
    * Returns (books, scaled): `books(j)` = k×dims quantized centroids of
    * subspace j; `scaled` = the STILL-PERSISTED quantized corpus
    * (`vec_id`, `q0`..`q{m-1}`) for the caller to encode from (zero
    * re-quantization) and then unpersist.
    */
  def kmeansFitMulti(emb: DataFrame, idCol: String, vecCols: Seq[Column],
                     k: Int, dims: Int, iters: Int)
      : (Array[Array[Array[Long]]], DataFrame) = {
    require(k > 0 && iters >= 0, s"need k>0, iters>=0; got $k/$iters")
    require(vecCols.nonEmpty, "need at least one subspace column")
    val m = vecCols.length
    // every iteration (plus init and the final assignment) scans the
    // quantized corpus: persist it once instead of re-shuffling per
    // action — the same cache-the-training-set discipline any iterative
    // fit loop needs (spills to disk when it outgrows executor memory)
    val scaled = Partitioning.spread(emb).select(
        col(idCol).as("vec_id") +:
          vecCols.zipWithIndex.map { case (c, j) =>
            quantize(c, dims).as(s"q$j")
          }: _*)
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)

    // init: the k lowest-id vectors seed every subspace's book,
    // deterministic and oracle-replicable
    var books: Array[Array[Array[Long]]] = {
      val rows = scaled.orderBy("vec_id").limit(k).collect()
      Array.tabulate(m)(j => rows.map(_.getSeq[Long](j + 1).toArray))
    }

    for (_ <- 0 until iters) {
      // per-(sub, cid, dim) integer sums + counts: map-side combined,
      // m·k·dims rows back to the driver
      val sums = scaled
        .select(explode(array((0 until m).map { j =>
          struct(lit(j).as("sub"),
                 nearest(col(s"q$j"), books(j)).getField("c").as("cid"),
                 col(s"q$j").as("q"))
        }: _*)).as("e"))
        .select(col("e.sub"), col("e.cid"), posexplode(col("e.q")))
        .groupBy("sub", "cid", "pos")
        .agg(sum("col").as("s"), count(lit(1)).as("n"))
        .collect()
        .map(r => (r.getInt(0), r.getLong(1).toInt, r.getInt(2)) ->
               (r.getLong(3), r.getLong(4)))
        .toMap
      books = Array.tabulate(m) { j =>
        books(j).zipWithIndex.map { case (old, cid) =>
          old.indices.map { d =>
            sums.get((j, cid, d)) match {
              case Some((s, n)) => s / n // truncating ≡ SQL `//`
              case None => old(d) // empty cluster keeps its position
            }
          }.toArray
        }
      }
    }

    (books, scaled)
  }
}
