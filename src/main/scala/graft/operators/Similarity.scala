package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.functions.VectorFunctions._
import graft.GraftOps._

/** Similarity search over `array<float>` embedding columns: brute-force
  * cosine top-k (the exactness baseline) and random-hyperplane LSH
  * (the scale path), plus threshold near-dup pairs.
  *
  * Scale design: brute force is O(|Q|·n) — right when the query set is
  * small enough to broadcast (|Q| rows replicated to every task; the
  * corpus side streams straight off the scan, never shuffled). The LSH
  * variant replaces the corpus sweep with a bucket equi-join: signatures
  * are per-row expressions, candidates only materialize within buckets
  * (shuffle keyed on (table, bucket)), and exact cosine runs on
  * candidates only. Recall is tunable with tables × planes.
  */
object Similarity {

  /** Exact top-k cosine neighbors for each query vector.
    * Output: (qid, neighbor_id, rnk, sim_e6). Ranking uses the raw
    * double (deterministic sequential-fold arithmetic), ties broken by
    * neighbor id; sim is floor-scaled for exact comparison.
    */
  def bruteForceTopK(corpus: DataFrame, queries: DataFrame, k: Int)
      : DataFrame = {
    val scored = Partitioning.spread(corpus).crossJoin(broadcast(queries))
      .filter(col("vec_id") =!= col("qid"))
      .withColumn("cos", cosine(col("qv"), col("embedding")))
    val w = Window.partitionBy(col("qid"))
      .orderBy(col("cos").desc, col("vec_id").asc)
    scored
      .withColumn("rnk", row_number().over(w))
      .filter(col("rnk") <= k)
      .select(col("qid"), col("vec_id").as("neighbor_id"), col("rnk"),
              e6(col("cos")).as("sim_e6"))
  }

  /** Hard-negative mining — the contrastive-training prep step: for each
    * query, the k most-similar corpus vectors with a DIFFERENT label
    * (same-label hits are positives, not negatives; self excluded).
    * Same plan shape as [[bruteForceTopK]] — queries broadcast, corpus
    * streams off the scan unshuffled, the label test is one more
    * codegen'd predicate on the scored stream — so the exclusion is
    * free at any corpus size. `queries` carries (qid, qv, qlabel).
    */
  def hardNegatives(corpus: DataFrame, queries: DataFrame, k: Int)
      : DataFrame = {
    val scored = Partitioning.spread(corpus).crossJoin(broadcast(queries))
      .filter(col("vec_id") =!= col("qid") &&
        col("label") =!= col("qlabel"))
      .withColumn("cos", cosine(col("qv"), col("embedding")))
    val w = Window.partitionBy(col("qid"))
      .orderBy(col("cos").desc, col("vec_id").asc)
    scored
      .withColumn("rnk", row_number().over(w))
      .filter(col("rnk") <= k)
      .select(col("qid"), col("vec_id").as("neighbor_id"), col("label"),
              col("rnk"), e6(col("cos")).as("sim_e6"))
  }

  /** Multi-table random-hyperplane LSH bucket rows:
    * (vec_id, t, bucket) for `tables` tables × `planesPerTable` sign bits.
    * Deterministic integer hyperplanes (see [[VectorFunctions.planeDot]])
    * so any engine can replicate the bucketing exactly.
    *
    * The per-table bucket ids are unrolled at plan-build time into plain
    * (codegen'd) column arithmetic — each hyperplane projection is computed
    * exactly once per row, vs. the earlier HOF form that re-evaluated the
    * bit array per table inside interpreted lambdas.
    */
  def lshBuckets(emb: DataFrame, tables: Int, planesPerTable: Int)
      : DataFrame = {
    // Loop-shaped kernel, not an unrolled per-table Column chain: the
    // 16×4 unroll (64 hyperplane dot products + the when/struct chain)
    // fused into a 15.2 KB whole-stage method — past HotSpot's
    // 8000-byte JIT ceiling, so the bucketing projection ran
    // INTERPRETED (r14 JIT audit: q25/q93/q215/q251). Buckets are
    // bit-identical to the planeDot/sign-bit form (`LshKernelsSpec`
    // pins it); posexplode's index IS the table id.
    import org.apache.spark.sql.GraftColumns
    Partitioning.spread(emb)
      .select(
        col("vec_id"),
        posexplode(GraftColumns.column(graft.functions.LshTableBuckets(
          GraftColumns.expression(col("embedding")),
          tables, planesPerTable, 64))))
      .select(col("vec_id"), col("pos").as("t"), col("col").as("bucket"))
  }

  /** ANN top-k: candidates = union over tables of same-bucket vectors,
    * then exact cosine + rank on candidates only.
    * Output: (qid, neighbor_id, rnk, sim_e6).
    *
    * Default = the measured ≥0.8-recall point of the round-6 sweep
    * (16×4 → recall 0.95 at k=3 on the sf0.1 panel; 8×4 → 0.78,
    * 4×4 → 0.62). More tables widen the candidate net linearly; more
    * planes per table shrink buckets exponentially (4×4 → 8-plane bands
    * measured ≤0.34 recall at ≤16 tables — cheap but unusable alone).
    */
  def annTopK(emb: DataFrame, queryPred: org.apache.spark.sql.Column, k: Int,
              tables: Int = 16, planesPerTable: Int = 4): DataFrame = {
    val cand = lshCandidates(emb, queryPred, tables, planesPerTable)
    val qv = emb.filter(queryPred)
      .select(col("vec_id").as("qid"), col("embedding").as("qv"))
    val cv = emb.select(col("vec_id"), col("embedding").as("cv"))
    val scored = cand.join(broadcast(qv), "qid").join(cv, "vec_id")
      .withColumn("cos", cosine(col("qv"), col("cv")))
    val w = Window.partitionBy(col("qid"))
      .orderBy(col("cos").desc, col("vec_id").asc)
    scored
      .withColumn("rnk", row_number().over(w))
      .filter(col("rnk") <= k)
      .select(col("qid"), col("vec_id").as("neighbor_id"), col("rnk"),
              e6(col("cos")).as("sim_e6"))
  }

  /** LSH candidate set for `queryPred` queries — same-bucket vectors
    * across all tables, self excluded, deduplicated. Shared by
    * [[annTopK]] (which re-ranks these by exact cosine) and the q251
    * index-frontier audit (which COUNTS them: candidates scanned is
    * the cost axis every index-selection decision trades against
    * recall).
    */
  def lshCandidates(emb: DataFrame, queryPred: org.apache.spark.sql.Column,
                    tables: Int, planesPerTable: Int): DataFrame = {
    val buckets = lshBuckets(emb, tables, planesPerTable)
    val qb = buckets.filter(queryPred)
      .select(col("vec_id").as("qid"), col("t"), col("bucket"))
    qb.join(buckets, Seq("t", "bucket"))
      .filter(col("vec_id") =!= col("qid"))
      .select("qid", "vec_id").distinct()
  }

  /** Raise `planesPerTable` until the EXPECTED bucket occupancy
    * `n / 2^planes` is at most `targetBucketDocs` (one control-plane
    * `count()` — the q185 auto-k precedent). A fixed plane count makes
    * bucket COUNT n-independent, so the all-queries candidate
    * self-join grows as n²/2^planes — exactly the quadratic the §9
    * probe caught OOMing at 60k vectors under 16 buckets. Bounding
    * expected occupancy restores candidates ≈ n·target·tables
    * (linear); duplicate FAMILIES still share buckets under any plane
    * count (identical vectors agree on every sign bit), so true
    * near-dup candidates are never split away — only random
    * collisions are. Recall for moderate-similarity pairs falls as
    * planes rise: that stays the measured knob (the q93 audit), which
    * is why the gated configs pin planes explicitly and this lever
    * defaults OFF (the `maxShingleDf` convention).
    */
  private def autoPlanes(emb: DataFrame, planesPerTable: Int,
                         targetBucketDocs: Long): Int =
    if (targetBucketDocs <= 0) planesPerTable
    else {
      val n = emb.count()
      var p = planesPerTable
      while (p < 30 && (n >> p) > targetBucketDocs) p += 1
      p
    }

  /** MUTUAL top-k near-neighbor pairs (reciprocal-kNN) over the LSH
    * candidate graph: (a, b) survives iff b is in a's top-k AND a is in
    * b's top-k among each side's bucket-collision candidates. One-sided
    * kNN keeps hub vectors (a centroid-ish vector lands in everyone's
    * top-k without anyone landing in its own); MUTUAL kNN is the
    * standard symmetric near-dup/match criterion (RNN matching) that
    * kills hubs without a similarity threshold to tune.
    *
    * Plan: one bucket self-join for candidates, exact cosine on
    * candidates, ONE window shuffle on qid for both directions' ranks,
    * then ONE map-combined agg on the normalized pair (never a
    * two-branch self-join, which would recompute the ranking window
    * per branch). EVERY vector is a query here, so candidate volume is
    * Σ bucket² over all buckets — with a fixed plane count that is
    * n²/2^planes (the §9 probe measured the blowup at 12× the gated
    * corpus). At scale, callers MUST set `targetBucketDocs` (> 0):
    * [[autoPlanes]] then bounds expected bucket occupancy so
    * candidates grow ≈ n·target·tables, and recall becomes the
    * measured knob (the q93-style audit) instead of an accident of n.
    * The gated default keeps the pinned 16×4 config (the measured
    * ≥0.95-recall point at panel scale).
    *
    * Output: (vec_a, vec_b, rnk_ab, rnk_ba, sim_e6), vec_a < vec_b.
    */
  def mutualTopK(emb: DataFrame, k: Int, tables: Int = 16,
                 planesPerTable: Int = 4,
                 targetBucketDocs: Long = 0L): DataFrame = {
    require(k >= 1, s"k must be >= 1, got $k")
    val buckets = lshBuckets(
      emb, tables, autoPlanes(emb, planesPerTable, targetBucketDocs))
    val qb = buckets.select(col("vec_id").as("qid"), col("t"),
                            col("bucket"))
    val cand = qb.join(buckets, Seq("t", "bucket"))
      .filter(col("vec_id") =!= col("qid"))
      .select("qid", "vec_id").distinct()
    val qv = emb.select(col("vec_id").as("qid"), col("embedding").as("qv"))
    val cv = emb.select(col("vec_id"), col("embedding").as("cv"))
    val scored = cand.join(qv, "qid").join(cv, "vec_id")
      .withColumn("cos", cosine(col("qv"), col("cv")))
    val w = Window.partitionBy(col("qid"))
      .orderBy(col("cos").desc, col("vec_id").asc)
    val topk = scored.withColumn("rnk", row_number().over(w))
      .filter(col("rnk") <= k)
      .select(col("qid"), col("vec_id"), col("rnk"),
              e6(col("cos")).as("sim_e6"))
    // reciprocity as ONE hash agg over the normalized pair — the ranked
    // frame is consumed once (a two-branch self-join would recompute
    // the ranking window per branch); a pair is mutual iff both
    // directions contributed a row
    topk
      .select(least(col("qid"), col("vec_id")).as("vec_a"),
              greatest(col("qid"), col("vec_id")).as("vec_b"),
              (col("qid") < col("vec_id")).as("fwd"),
              col("rnk"), col("sim_e6"))
      .groupBy(col("vec_a"), col("vec_b"))
      .agg(max(when(col("fwd"), col("rnk"))).as("rnk_ab"),
           max(when(!col("fwd"), col("rnk"))).as("rnk_ba"),
           max(col("sim_e6")).as("sim_e6"))
      .filter(col("rnk_ab").isNotNull && col("rnk_ba").isNotNull)
      .select("vec_a", "vec_b", "rnk_ab", "rnk_ba", "sim_e6")
  }

  /** IVF (inverted-file) ANN top-k: the other classic scale path next to
    * LSH. A small set of coarse centroids partitions the corpus
    * (assignment = nearest centroid by cosine); a query probes only its
    * `nProbe` nearest centroids' posting lists and runs exact cosine on
    * those candidates. Corpus work is O(n·K) assignment (codegen'd dots
    * against broadcast centroids) + one shuffle on centroid id; query work
    * is O(|probe lists|), not O(n).
    *
    * Centroids here are the deterministic first `k` vectors (an IVF-FLAT
    * skeleton with a fixed coarse quantizer) so an external SQL oracle can
    * replicate bucketing exactly; swapping in k-means centroids changes
    * only the `centroids` frame, not the operator shape.
    */
  def ivfTopK(emb: DataFrame, queryPred: org.apache.spark.sql.Column, k: Int,
              nCentroids: Int = 8, nProbe: Int = 2): DataFrame =
    ivfTopKWith(emb, queryPred, k,
      emb.filter(col("vec_id") < nCentroids)
        .select(col("vec_id").as("cid"), col("embedding").as("cv")),
      nProbe)

  /** [[ivfTopK]] with an EXTERNAL coarse quantizer — `centroids` is any
    * small (cid, cv: array<float>) frame, e.g. the fitted
    * [[Clustering.kmeansFit]] centroids de-quantized to floats. The
    * operator shape is unchanged: centroids broadcast, corpus assignment
    * is one pass + one shuffle on cid, queries probe `nProbe` posting
    * lists.
    */
  def ivfTopKWith(emb: DataFrame, queryPred: org.apache.spark.sql.Column,
                  k: Int, centroids: DataFrame, nProbe: Int = 2)
      : DataFrame =
    ivfTopKFrom(emb, queryPred,
                ivfCandidates(emb, queryPred, centroids, nProbe), k)

  /** [[ivfTopKWith]]'s exact-cosine re-rank over an ALREADY-COMPUTED
    * candidate frame — the [[pqTopKFrom]] sharing seam for the coarse
    * index: a frontier query that audits IVF and IVF-PQ side by side
    * probes the same posting lists, so the candidate generation
    * (corpus argmax pass + probe join + distinct) runs once and both
    * rows read the checkpoint.
    */
  private[graft] def ivfTopKFrom(emb: DataFrame,
                                 queryPred: org.apache.spark.sql.Column,
                                 cand: DataFrame, k: Int): DataFrame = {
    val qv = emb.filter(queryPred)
      .select(col("vec_id").as("qid"), col("embedding").as("qv"))
    val cv = emb.select(col("vec_id"), col("embedding").as("dv"))
    val scored = cand.join(broadcast(qv), "qid").join(cv, "vec_id")
      .withColumn("cos", cosine(col("qv"), col("dv")))
    scored
      .withColumn("rnk", row_number().over(
        Window.partitionBy(col("qid"))
          .orderBy(col("cos").desc, col("vec_id").asc)))
      .filter(col("rnk") <= k)
      .select(col("qid"), col("vec_id").as("neighbor_id"), col("rnk"),
              e6(col("cos")).as("sim_e6"))
  }

  /** IVF candidate generation, shared by [[ivfTopKWith]] (exact-cosine
    * re-rank) and [[ivfPqTopK]] (ADC re-rank): corpus ASSIGNMENT is one
    * per-row [[graft.functions.ArgMaxCosFloat]] pass (no shuffle — the
    * earlier form cross-joined the corpus with the centroid frame and
    * window-ranked n·k scored rows on vec_id, a corpus-sized exchange
    * just to take each row's max); only the QUERY side, tiny by
    * contract, ranks through a window because it needs top-nProbe, not
    * argmax. Both paths share the identical cosine fold and the
    * `ccos DESC, cid ASC` tie-break, so probing and assignment stay
    * mutually consistent (and oracle-mirrorable). Candidates = probed
    * posting lists, self excluded — one shuffle keyed on cid.
    */
  def ivfCandidates(emb: DataFrame,
                    queryPred: org.apache.spark.sql.Column,
                    centroids: DataFrame, nProbe: Int): DataFrame = {
    import org.apache.spark.sql.GraftColumns
    // the centroid frame is control-plane sized (coarse quantizer):
    // collect for the kernel, cids sorted so argmax's lowest-INDEX
    // tie-break is the lowest-CID tie-break
    val centRows = centroids.select(col("cid"), col("cv")).collect()
      .map(r => (r.getLong(0), r.getSeq[Float](1).toArray))
      .sortBy(_._1)
    val cidLits = array(centRows.map(c => lit(c._1)): _*)
    val argmax = GraftColumns.column(graft.functions.ArgMaxCosFloat(
      GraftColumns.expression(col("embedding")), centRows.map(_._2)))
    val assign = Partitioning.spread(emb)
      .select(col("vec_id"),
              element_at(cidLits, argmax.getField("c").cast("int") + 1)
                .as("cid"))
    val probes = emb.filter(queryPred)
      .crossJoin(broadcast(centroids))
      .withColumn("ccos", cosine(col("embedding"), col("cv")))
      .withColumn("crnk", row_number().over(
        Window.partitionBy(col("vec_id"))
          .orderBy(col("ccos").desc, col("cid").asc)))
      .filter(col("crnk") <= nProbe)
      .select(col("vec_id").as("qid"), col("cid"))
    probes.join(assign, "cid")
      .filter(col("vec_id") =!= col("qid"))
      .select("qid", "vec_id").distinct()
  }

  /** Embedding near-dup pairs via LSH buckets — the scale path next to
    * [[nearDupPairs]]'s exact quadratic baseline. Candidates are bucket
    * collisions (equi-join on (table, bucket): O(n·tables) signature rows
    * and only same-bucket pairs materialize, never the n² cross product);
    * exact cosine then verifies candidates against the threshold, so
    * PRECISION is exact and recall is the LSH collision probability
    * (tunable with tables × planesPerTable — more tables widen the net).
    * Because the hyperplanes are deterministic integers
    * ([[VectorFunctions.planeDot]]), an external engine can replicate the
    * bucketing exactly — the operator's oracle mirrors candidates AND
    * verification, making the gate exact rather than recall-fuzzy.
    * Output matches [[nearDupPairs]]: (vec_a, vec_b, sim_e6), a < b.
    */
  def lshNearDupPairs(emb: DataFrame, minSimE6: Long,
                      tables: Int = 4, planesPerTable: Int = 4): DataFrame = {
    val buckets = lshBuckets(emb, tables, planesPerTable)
    val cand = buckets.as("x")
      .join(buckets.as("y"),
            col("x.t") === col("y.t") && col("x.bucket") === col("y.bucket") &&
              col("x.vec_id") < col("y.vec_id"))
      .select(col("x.vec_id").as("vec_a"), col("y.vec_id").as("vec_b"))
      .distinct()
    // candidate verification: norms precomputed below the joins (one dot
    // per candidate); candidate side is the small one — AQE broadcasts it
    val prepped = emb.select(col("vec_id"), col("embedding"),
      sqrt(norm2(col("embedding"))).as("nrm"))
    cand
      .join(prepped.select(col("vec_id").as("vec_a"),
        col("embedding").as("va"), col("nrm").as("na")), "vec_a")
      .join(prepped.select(col("vec_id").as("vec_b"),
        col("embedding").as("vb"), col("nrm").as("nb")), "vec_b")
      .withColumn("sim_e6",
        e6(dot(col("va"), col("vb")) / (col("na") * col("nb"))))
      .filter(col("sim_e6") >= minSimE6)
      .select("vec_a", "vec_b", "sim_e6")
  }

  /** Semantic dedup (the SemDeDup shape): cluster embeddings with the
    * quantized k-means coarse quantizer, compute pairwise cosine WITHIN
    * each cluster only, and greedily drop any vector that has a
    * lower-id in-cluster neighbor above the similarity threshold — the
    * "keep one representative per semantic duplicate set" pruning of
    * embedding-level dataset curation, without the O(n²) all-pairs sweep
    * of [[nearDupPairs]].
    *
    * Scale shape: clustering is linear scans (see
    * [[Clustering.kmeansAssign]]); the pair stage is an EQUI-JOIN on
    * cluster id, so only same-cluster pairs materialize — Σ|cluster|²
    * work, ≈ n²/k for balanced clusters. The cluster count is the knob:
    * production semantic dedup runs k in the tens of thousands so each
    * cluster holds hundreds of vectors and the quadratic term is
    * per-cluster small (a hot cluster is an AQE skew-join split). The
    * keeper policy here is deterministic greedy-by-id (drop iff a
    * lower-id neighbor is close enough) rather than the
    * furthest-from-centroid variant — same pruning power, but exactly
    * SQL-replicable, so the whole train→cluster→pair→keep pipeline is
    * oracle-gated end-to-end (q73).
    *
    * Output: (vec_id, cid, n_close, kept) — cluster id, count of
    * in-cluster neighbors at sim ≥ minSimE6/1e6 (either direction), and
    * the keep flag (no lower-id close neighbor).
    *
    * AUTO-K: `k = 0` derives k = ⌈n / targetClusterSize⌉ from a one-row
    * corpus count, so the cluster count SCALES WITH THE CORPUS and the
    * per-cluster quadratic term stays bounded by the caller's knob —
    * a fixed k on a growing corpus is the degenerate regime where
    * Σ|cluster|² reverts toward n² (the §9 fixed-k curve). Explicit
    * k > 0 is honored unchanged (the q73 gate pins k = 8).
    *
    * RELEASE CONTRACT: result == handle (the
    * [[graft.operators.Dedup.containmentPairs]] convention).
    */
  def semDedup(emb: DataFrame, minSimE6: Long, k: Int = 8,
               dims: Int = 64, iters: Int = 3,
               targetClusterSize: Long = 256L): DataFrame = {
    import org.apache.spark.sql.GraftColumns.unpersistCheckpoint
    require(k >= 0, s"k must be >= 0 (0 = auto): $k")
    require(targetClusterSize >= 1,
      s"targetClusterSize must be >= 1: $targetClusterSize")
    val kEff =
      if (k > 0) k
      else {
        // control-plane count (one long), the bounded-collect discipline
        val n = emb.count()
        math.max(1L, (n + targetClusterSize - 1) / targetClusterSize)
          .min(Int.MaxValue.toLong).toInt
      }
    val assign = Clustering.kmeansAssign(emb, "vec_id", "embedding",
                                         kEff, dims, iters)
    try {
      // one norm per vector below the pair join (the nearDupPairs
      // discipline: the quadratic stage does a single dot per pair)
      val prepped = Partitioning.spread(emb)
        .select(col("vec_id"), col("embedding"),
                sqrt(norm2(col("embedding"))).as("nrm"))
        .join(assign.select(col("vec_id"), col("cid")), "vec_id")
      val a = prepped.select(col("cid"), col("vec_id").as("vec_a"),
        col("embedding").as("va"), col("nrm").as("na"))
      val b = prepped.select(col("cid"), col("vec_id").as("vec_b"),
        col("embedding").as("vb"), col("nrm").as("nb"))
      // the quadratic stage runs once: the three flag branches below
      // (drop set, both close-count scans, final join) read the
      // materialized pairs, not three replays of the cid join
      val pairs = a.join(b, "cid")
        .filter(col("vec_a") < col("vec_b"))
        .withColumn("sim_e6",
          e6(dot(col("va"), col("vb")) / (col("na") * col("nb"))))
        .filter(col("sim_e6") >= minSimE6)
        .select("vec_a", "vec_b")
        .graftCheckpoint()
      try {
        val dropped = pairs.select(col("vec_b").as("vec_id")).distinct()
          .withColumn("is_dropped", lit(true))
        val closeCounts = pairs.select(col("vec_a").as("vec_id"))
          .unionAll(pairs.select(col("vec_b").as("vec_id")))
          .groupBy("vec_id").agg(count(lit(1)).as("n_close"))
        assign.select(col("vec_id"), col("cid"))
          .join(dropped, Seq("vec_id"), "left")
          .join(closeCounts, Seq("vec_id"), "left")
          .select(col("vec_id"), col("cid"),
                  coalesce(col("n_close"), lit(0L)).as("n_close"),
                  (!coalesce(col("is_dropped"), lit(false))).as("kept"))
          .graftCheckpoint()
      } finally unpersistCheckpoint(pairs)
    } finally unpersistCheckpoint(assign)
  }

  /** Embedding near-duplicate pairs: all (a,b), a<b, with cosine ≥
    * minSimE6/1e6. Exact quadratic baseline — at corpus scale run
    * [[annTopK]]-style bucketing first and verify candidates instead;
    * this form exists as the correctness reference and for query sets
    * small enough that O(n²) is the fastest plan (no index build).
    */
  def nearDupPairs(emb: DataFrame, minSimE6: Long): DataFrame = {
    // Precompute each vector's norm ONCE below the join (O(n) work) so the
    // O(n²) pair loop does a single dot product per pair instead of three.
    // sqrt(norm2(x)) here is the identical double to the one cosine()
    // would compute per-pair, so sim values are unchanged bit-for-bit.
    val prepped = emb.select(col("vec_id"), col("embedding"),
      sqrt(norm2(col("embedding"))).as("nrm"))
    // stream side spread across cores (O(n²) work must parallelize even
    // when the scan is one split); build side broadcast explicitly
    val a = Partitioning.spread(prepped).select(col("vec_id").as("vec_a"),
      col("embedding").as("va"), col("nrm").as("na"))
    val b = prepped.select(col("vec_id").as("vec_b"),
      col("embedding").as("vb"), col("nrm").as("nb"))
    a.join(broadcast(b), col("vec_a") < col("vec_b"))
      .withColumn("sim_e6",
        e6(dot(col("va"), col("vb")) / (col("na") * col("nb"))))
      .filter(col("sim_e6") >= minSimE6)
      .select("vec_a", "vec_b", "sim_e6")
  }

  /** Product-quantization ANN — the memory-compressed member of the ANN
    * family (brute → LSH buckets → IVF postings → PQ codes): each vector
    * is stored as `m` byte-sized codebook indices instead of `dims`
    * floats (here 4 codes for 64 floats, a 64× compression of the
    * scan side), and queries rank by Asymmetric Distance Computation —
    * summing per-subspace distances from the QUERY's exact subvector to
    * each DB vector's codebook centroid.
    *
    * Everything is exact integer arithmetic end-to-end, so an external
    * SQL engine replicates training, encoding, AND scoring bit-for-bit:
    *  - codebooks: [[Clustering.kmeansFit]] per subspace (quantized
    *    Lloyd, deterministic first-k init);
    *  - encoding: one per-row codegen'd argmin ([[Clustering.nearest]])
    *    per subspace — no shuffle, linear scan;
    *  - ADC lookup tables: nq·m·codeK integer distances computed
    *    driver-side from the collected query vectors (control-plane:
    *    ~640 longs for 10 queries) and broadcast;
    *  - scoring: codes posexploded to (vec_id, sub, code) — m rows per
    *    vector — broadcast-joined to the lookup, then one hash aggregate
    *    keyed (qid, vec_id) sums the m partial distances (map-side
    *    combined; the only shuffle, O(n·m·nq) tiny rows).
    *
    * At 100 TB the ADC scan is still linear in n per query — PQ buys
    * compressed-domain scanning, not sub-linearity; compose with IVF
    * (probe posting lists first, ADC-score only the probed lists) for
    * IVF-PQ. The m codebooks train JOINTLY ([[Clustering.kmeansFitMulti]]):
    * one quantized cache, one job per Lloyd round — m× fewer scans and
    * scheduling rounds than m sequential fits, identical results.
    *
    * `queryPred` must be a predicate over `vec_id` (it is applied to the
    * quantized cache, which carries only id + subvector columns).
    * Output: (qid, vec_id, adc2, rnk) — integer ADC dist², rank ascending
    * (nearest first), ties → lower vec_id, self excluded.
    *
    * RELEASE CONTRACT: result == handle (the
    * [[graft.operators.Dedup.containmentPairs]] convention).
    */
  def pqTopK(emb: DataFrame, queryPred: org.apache.spark.sql.Column, k: Int,
             m: Int = 4, subDims: Int = 16, codeK: Int = 16,
             iters: Int = 2): DataFrame = {
    val (codes, adc, scaled) =
      pqCodesAndAdc(emb, queryPred, m, subDims, codeK, iters)
    val out = pqTopKFrom(codes, adc, k, m)
    scaled.unpersist()
    out
  }

  /** [[pqTopK]]'s score+rank tail over an ALREADY-TRAINED PQ model
    * ([[pqCodesAndAdc]]'s codes + ADC tables) — exposed so a frontier
    * query evaluating several index stacks trains the model ONCE and
    * feeds both the full-scan PQ row and the IVF-PQ row (r15 verdict
    * #2: q251 paid the joint codebook training twice for bit-identical
    * books — the trainer is deterministic, so sharing is
    * equivalence-preserving by construction). The caller owns the
    * model's `scaled` cache (unpersist after every consumer
    * materializes).
    */
  private[graft] def pqTopKFrom(codes: DataFrame, adc: DataFrame, k: Int,
                                m: Int): DataFrame = {
    // score + rank: explode codes, look up, sum the m partials;
    // materialize before releasing the cache both passes read
    val exploded = codes.select(col("vec_id"),
      posexplode(array((0 until m).map(j => col(s"code_$j")): _*))
        .as(Seq("sub", "code")))
    adcRank(
      exploded.join(broadcast(adc), Seq("sub", "code"))
        .filter(col("vec_id") =!= col("qid")),
      k).graftCheckpoint()
  }

  /** IVF-PQ — the production composition: the trained coarse quantizer
    * prunes the corpus to `nProbe` posting lists per query
    * ([[ivfCandidates]], sub-linear candidates), and PQ's integer ADC
    * scores ONLY those candidates from the compressed codes. Every
    * stage — coarse k-means, posting-list probing, sub-codebook
    * training, encoding, ADC — is deterministic and SQL-replicable, so
    * the whole two-index pipeline is oracle-exact end-to-end. The two
    * trainers scan separately (64-dim coarse, 16-dim subspaces: k and
    * dims differ) — at corpus scale train both on a sample instead.
    *
    * `queryPred` must be a predicate over `vec_id` (see [[pqTopK]]).
    * Output: (qid, vec_id, adc2, rnk).
    *
    * RELEASE CONTRACT: result == handle (the
    * [[graft.operators.Dedup.containmentPairs]] convention).
    */
  def ivfPqTopK(emb: DataFrame, queryPred: org.apache.spark.sql.Column,
                k: Int, nCentroids: Int = 8, nProbe: Int = 2,
                coarseIters: Int = 3, m: Int = 4, subDims: Int = 16,
                codeK: Int = 16, iters: Int = 2): DataFrame = {
    val spark = emb.sparkSession
    import spark.implicits._
    // coarse quantizer: trained k-means centroids de-quantized to float
    // (BIGINT/1e6 → FLOAT rounds identically in IEEE — the q69 path)
    val coarse = Clustering.kmeansFit(emb, "vec_id", "embedding",
                                      nCentroids, m * subDims, coarseIters)
    val cdf = Clustering.dequantize(coarse).toDF("cid", "cv")
    val cand = ivfCandidates(emb, queryPred, cdf, nProbe)

    val (codes, adc, scaled) =
      pqCodesAndAdc(emb, queryPred, m, subDims, codeK, iters)
    val out = ivfPqTopKFrom(cand, codes, adc, k, m)
    scaled.unpersist()
    out
  }

  /** [[ivfPqTopK]]'s ADC-over-candidates tail, decoupled from its
    * trainers: takes the coarse quantizer's candidate frame
    * ([[ivfCandidates]]) and an already-trained PQ model — the sharing
    * seam [[pqTopKFrom]] documents, covering the coarse side too (the
    * q251 frontier's IVF and IVF-PQ rows probe the SAME posting lists
    * by definition, so the candidate frame is computed once and read
    * twice).
    */
  private[graft] def ivfPqTopKFrom(cand: DataFrame, codes: DataFrame,
                                   adc: DataFrame, k: Int,
                                   m: Int): DataFrame = {
    // ADC-score candidates only: codes semi-restricted by the candidate
    // set, lookup keyed per query
    val candCodes = cand.join(codes, "vec_id")
    val exploded = candCodes.select(col("qid"), col("vec_id"),
      posexplode(array((0 until m).map(j => col(s"code_$j")): _*))
        .as(Seq("sub", "code")))
    adcRank(
      exploded.join(broadcast(adc), Seq("qid", "sub", "code")),
      k).graftCheckpoint()
  }

  /** Shared PQ model build (see [[pqTopK]] for the full design notes):
    * joint codebook training, one-projection encoding, driver-built ADC
    * lookups from the cached quantized query subvectors. Returns
    * (codes, adc, scaled) — the caller scores, materializes, and then
    * unpersists `scaled`.
    */
  private[graft] def pqCodesAndAdc(emb: DataFrame,
                            queryPred: org.apache.spark.sql.Column,
                            m: Int, subDims: Int, codeK: Int, iters: Int)
      : (DataFrame, DataFrame, DataFrame) = {
    val spark = emb.sparkSession
    import spark.implicits._

    // Dimension contract, enforced PER ROW: QuantizeE6 throws on arrays
    // SHORTER than dims, but a LONGER embedding would silently cluster
    // on its first m·subDims dims — the prefix-clustering failure mode
    // again, from the other side. The guard rides the first subspace
    // slice (any row reaching j=0 errors), costing no extra job.
    val total = m * subDims
    val guarded = when(size(col("embedding")) === total, col("embedding"))
      .otherwise(raise_error(concat(
        lit(s"pq: embedding must have exactly $total dims, got "),
        size(col("embedding")).cast("string"))))

    // 1. all m codebooks trained JOINTLY (one job per Lloyd round, one
    // quantized cache shared with encoding below)
    val (books, scaled) = Clustering.kmeansFitMulti(
      emb, "vec_id",
      (0 until m).map { j =>
        slice(if (j == 0) guarded else col("embedding"),
              j * subDims + 1, subDims)
      },
      codeK, subDims, iters)

    // 2. encode: m argmin kernels in ONE projection over the cache
    val codes = scaled.select(
      col("vec_id") +:
        (0 until m).map { j =>
          Clustering.nearest(col(s"q$j"), books(j))
            .getField("c").as(s"code_$j")
        }: _*)

    // 3. ADC lookup tables from the cached quantized query subvectors —
    // the identical integers the fit itself trained on (no re-derived
    // quantization arithmetic anywhere) — and the same (q−c)² fold
    val queryRows = scaled.filter(queryPred)
      .select(col("vec_id") +: (0 until m).map(j => col(s"q$j")): _*)
      .collect()
    val adcRows = for {
      r <- queryRows.toSeq
      qid = r.getLong(0)
      j <- 0 until m
      q = r.getSeq[Long](j + 1)
      (cent, code) <- books(j).zipWithIndex
    } yield {
      var d2 = 0L
      var d = 0
      while (d < subDims) {
        val diff = q(d) - cent(d)
        d2 += diff * diff
        d += 1
      }
      (qid, j, code.toLong, d2)
    }
    val adc = adcRows.toDF("qid", "sub", "code", "d2")
    (codes, adc, scaled)
  }

  /** Sum the per-subspace ADC partials and rank ascending (ties → lower
    * vec_id) — the shared tail of [[pqTopK]] and [[ivfPqTopK]].
    */
  private def adcRank(scoredPartials: DataFrame, k: Int): DataFrame =
    scoredPartials
      .groupBy(col("qid"), col("vec_id"))
      .agg(sum(col("d2")).as("adc2"))
      .withColumn("rnk", row_number().over(
        Window.partitionBy(col("qid"))
          .orderBy(col("adc2").asc, col("vec_id").asc)))
      .filter(col("rnk") <= k)
}
