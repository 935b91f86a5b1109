package graft

import org.apache.spark.sql.functions._

import graft.operators.{Clustering, Dedup, GraphOps, Membership, Packing, Similarity, TemporalOps, Video}
import graft.GraftOps._

/** Dev tool: scale-up probe for the heavy operators.
  *
  * Inflates the sf0.1 corpus in-memory (xN copies with distinct ids; copy
  * 0 keeps the original text, later copies get a perturbed token so groups
  * form near-dup clusters) and times the dedup/similarity paths. The
  * point is the GROWTH CURVE, not the absolute number: near-dup pair
  * generation must scale with corpus + matching pairs, never O(n²).
  */
object ScaleProbe {
  def main(args: Array[String]): Unit = {
    val mult = args.headOption.map(_.toInt).getOrElse(10)
    // optional comma-separated substring filter on probe names
    val only = args.lift(1).map(_.split(',').toSeq)
    val spark = GraftSession.local("scale-probe")
    spark.sparkContext.setLogLevel("WARN")
    // task-level shuffle meter for the cap-lever probe (the Bench
    // listener's shape; events are async — settle until stable)
    val shuffleBytes = new java.util.concurrent.atomic.AtomicLong
    spark.sparkContext.addSparkListener(
      new org.apache.spark.scheduler.SparkListener {
        override def onTaskEnd(
            te: org.apache.spark.scheduler.SparkListenerTaskEnd): Unit = {
          val m = te.taskMetrics
          if (m != null)
            shuffleBytes.addAndGet(m.shuffleWriteMetrics.bytesWritten +
              m.shuffleReadMetrics.totalBytesRead)
          ()
        }
      })
    def settledShuffle(): Long = {
      var prev = -1L; var same = 0
      while (same < 2) {
        Thread.sleep(30)
        val cur = shuffleBytes.get
        if (cur == prev) same += 1 else { same = 0; prev = cur }
      }
      prev
    }
    val dir = "/root/testdata/sf0.1"
    // expensive setups below are `lazy val`s so a filtered run only pays
    // for the inputs its probes actually consume; time() returns whether
    // the probe ran so conditional teardown (unpersist) can follow suit
    def wanted(name: String): Boolean =
      only.forall(_.exists(name.contains))
    def time(name: String)(f: => Unit): Boolean =
      if (!wanted(name)) { println(s"SCALE $name skipped"); false }
      else {
        val t0 = System.nanoTime(); f
        println(f"SCALE $name ${(System.nanoTime() - t0) / 1e9}%.2f s")
        true
      }

    val docs0 = Tables.documents(spark, dir).select("doc_id", "text")
    val copies = spark.range(mult).toDF("copy")
    lazy val docs = {
      val d = docs0.crossJoin(copies)
        .select(
          (col("doc_id") * mult + col("copy")).as("doc_id"),
          when(col("copy") === 0, col("text"))
            .otherwise(concat(col("text"), lit(" perturbcopy"),
                              col("copy").cast("string"))).as("text"))
        .repartition(64)
        .persist()
      println(s"SCALE corpus ${d.count()} docs (${mult}x of ${docs0.count()})")
      d
    }

    time(s"minhash_lsh_${mult}x") {
      val pairs = Dedup.minhashDedupPairs(docs, "doc_id", "text", 3, 4, 5)
      println("  near-dup pairs: " + pairs.count())
    }
    time(s"minhash_ckpt_${mult}x") {
      val dir = java.nio.file.Files
        .createTempDirectory("graft-probe-ckpt").toString
      val pairs = Dedup.minhashDedupPairsCheckpointed(
        docs, "doc_id", "text", 3, 4, 5, checkpointDir = dir)
      println("  ckpt near-dup pairs: " + pairs.count())
    }
    time(s"exact_dedup_${mult}x") {
      Dedup.exactByContent(docs, "doc_id", "text").count()
    }
    time(s"simhash_pairs_${mult}x") {
      println("  simhash pairs: " +
        Dedup.simhashPairs(docs, "doc_id", "text").count())
    }

    // --- keyless range join (q55 shape): the axis EXTENDS per copy (more
    // history at constant event density — the realistic growth model), so
    // true matches grow linearly with the corpus; a quadratic time curve
    // here would mean the bucket decomposition degenerated.
    val events = Tables.events(spark, dir)
    val HourUs = 3600000000L
    lazy val span = {
      val bounds = events.agg(
        min(unix_micros(col("ts"))).as("lo"),
        max(unix_micros(col("ts"))).as("hi")).collect()(0)
      bounds.getLong(1) - bounds.getLong(0) + HourUs
    }
    def shifted(tpe: String) = events
      .filter(col("event_type") === tpe)
      .crossJoin(copies)
      .select((col("event_id") * mult + col("copy")).as("event_id"),
              (unix_micros(col("ts")) + col("copy") * span).as("us"),
              col("value"))
      .repartition(64)
    time(s"range_join_${mult}x") {
      val err = shifted("error")
        .select(col("event_id").as("err_id"), col("us").as("s"))
        .withColumn("e", col("s") + HourUs)
      val pur = shifted("purchase").select(col("us").as("p"), col("value"))
      println("  range matches: " +
        TemporalOps.rangeJoin(pur, "p", err, "s", "e",
                              bucketWidth = HourUs).count())
    }

    // --- interval-overlap join (q105 shape): session intervals, axis
    // EXTENDED per copy (users remapped, times shifted by the span) so
    // overlap density is constant — true pairs grow linearly with the
    // corpus; quadratic time would mean the cell decomposition
    // degenerated.
    lazy val sessInf = {
      val sess0 = graft.operators.TemporalOps.sessionize(
          events.filter(pmod(col("user_id"), lit(10L)) === 1)
            .select(col("user_id"), col("ts"), col("event_id")),
          "user_id", "ts", Seq("event_id"), gapUs = 14400000000L)
        .withColumn("us", unix_micros(col("ts")))
        .groupBy(col("user_id"), col("session_id"))
        .agg(min(col("us")).as("s0"), max(col("us")).as("e0"))
      val s = sess0.crossJoin(copies)
        .select((col("user_id") * mult + col("copy")).as("uid"),
                (col("s0") + col("copy") * span).as("ss"),
                (col("e0") + col("copy") * span).as("ee"))
        .repartition(64).persist()
      println(s"SCALE sessions ${s.count()}")
      s
    }
    val ranOverlap = time(s"interval_overlap_${mult}x") {
      val a = sessInf.select(col("uid").as("ua"), col("ss").as("sa"),
                             col("ee").as("ea"))
      val b = sessInf.select(col("uid").as("ub"), col("ss").as("sb"),
                             col("ee").as("eb"))
      println("  overlap pairs: " + graft.operators.TemporalOps
        .intervalOverlapJoin(a, "sa", "ea", b, "sb", "eb",
                             bucketWidth = 21600000000L)
        .filter(col("ua") < col("ub")).count())
    }
    if (ranOverlap) sessInf.unpersist()

    // --- fuzzy keys (q56 shape): copy 0 keeps the original key, later
    // copies append a repeated-digit suffix (pairwise edit distance ≥ 2,
    // so no cross-copy pairs) — true pairs grow linearly with the corpus.
    lazy val cust = {
      val c = Tables.customer(spark, dir)
        .select(col("c_custkey"), col("c_name"))
        .crossJoin(copies)
        .select((col("c_custkey") * mult + col("copy")).as("c_custkey"),
                when(col("copy") === 0, col("c_name"))
                  .otherwise(concat(col("c_name"),
                    repeat(col("copy").cast("string"), 2))).as("c_name"))
        .repartition(64).persist()
      println(s"SCALE keys ${c.count()}")
      c
    }
    val ranFuzzy = time(s"fuzzy_keys_${mult}x") {
      println("  fuzzy pairs: " +
        Dedup.editDistance1Pairs(cust, "c_custkey", "c_name").count())
    }
    if (ranFuzzy) cust.unpersist()

    // --- connected components on deep chains: rounds must grow like
    // log(n) (alternating star contraction), never linearly.
    Seq(1000L, 10000L, 100000L).foreach { n =>
      time(s"cc_chain_$n") {
        val edges = spark.range(1, n)
          .selectExpr("id AS a", "id + 1 AS b").repartition(32)
        val (out, rounds) =
          GraphOps.connectedComponentsWithStats(edges, "a", "b")
        println(s"  rounds=$rounds comps=" +
          out.select("comp").distinct().count())
      }
    }

    // --- triangles on a star-heavy graph: hub degree n−1, chain among
    // the leaves → n−2 triangles. Id-orientation would enumerate the
    // hub's C(n−1,2) wedges (quadratic — 100k nodes ⇒ 5·10⁹ wedges);
    // degree-ordered orientation points every edge INTO the hub, so
    // wedge count stays O(n) and time must grow linearly.
    time(s"triangles_star_${mult}x") {
      val n = 100000L * mult
      val hub = spark.range(1, n).selectExpr("CAST(0 AS BIGINT) AS u",
                                             "id AS v")
      val chain = spark.range(1, n - 1).selectExpr("id AS u",
                                                   "id + 1 AS v")
      val tri = GraphOps.triangles(hub.union(chain).repartition(64),
                                   "u", "v")
      println("  triangles: " + tri.count())
    }

    // --- incremental dedup (q64 shape): the batch stays CONSTANT (a
    // day's crawl) while the corpus inflates — cross pairs grow linearly
    // with the corpus (each batch doc near-matches its corpus copies);
    // time must track the two corpus streaming passes, never
    // corpus × batch. Batch ids offset out of the inflated id range.
    lazy val batch = {
      val b = docs0.filter(col("doc_id") % 11 === 0)
        .select((col("doc_id") + 1000000000L).as("doc_id"), col("text"))
      println(s"SCALE batch ${b.count()} docs")
      b
    }
    time(s"incremental_dedup_${mult}x") {
      println("  cross pairs: " + Dedup.incrementalMinhashPairs(
        docs, batch, "doc_id", "text", 3, 4, 5).count())
    }

    // --- incremental exact-substring dedup (q239 shape): same constant
    // batch vs inflating corpus. The posting build is the corpus-linear
    // term (one distinct over corpus grams — the state a real pipeline
    // maintains incrementally, paid here per probe); detection itself is
    // batch-sized plus ONE probe pass over the postings, so span time
    // must grow with corpus only through those two streaming terms,
    // never corpus × batch.
    time(s"incr_substr_${mult}x") {
      val postings = Dedup.substringGramPostings(
        docs, "doc_id", "text", minLen = 25)
      val spans = Dedup.incrementalDuplicatedSubstringSpans(
        postings, batch, "doc_id", "text", minLen = 25)
      println("  batch spans: " + spans.count())
      org.apache.spark.sql.GraftColumns.unpersistCheckpoint(spans)
    }

    // --- bloom-prefiltered anti-join (q66 shape): a LARGE mostly-new
    // batch (the crawl-ingest norm) vs an inflating corpus key set — the
    // bloom must reject the new majority map-side so only the true
    // overlap reaches the confirm join.
    lazy val corpusK = {
      val k = Tables.orders(spark, dir).select(col("o_orderkey"))
        .crossJoin(copies)
        .select((col("o_orderkey") * mult + col("copy")).as("k"))
        .repartition(64)
      println(s"SCALE corpus keys ${k.count()}")
      k
    }
    lazy val batchK = spark.range(5000000).toDF("k")
    time(s"bloom_new_keys_${mult}x") {
      println("  new keys: " + Membership.newKeys(
        batchK, corpusK, "k", expectedCorpusKeys = 200000L * mult).count())
    }

    // --- sequence packing: chop is the distributed prefix scan (one
    // range exchange — linear); next-fit keeps the shard count constant
    // so rows-per-shard grow with the corpus and the per-shard
    // sequential pass must stay linear (shard count is the real
    // deployment's parallelism knob, held fixed here to expose the
    // per-shard term).
    lazy val toks = docs.select(col("doc_id"),
      pmod(col("doc_id"), lit(64L)).as("shard"),
      size(split(col("text"), " ")).cast("long").as("toks"))
    time(s"chop_pack_${mult}x") {
      println("  docs laid out: " + Packing.chopPack(
        toks.drop("shard"), "toks", Seq("doc_id"), ctxLen = 128L).count())
    }
    time(s"nextfit_pack_${mult}x") {
      val packed = Packing.packNextFit(toks, "doc_id", "toks", "shard",
                                       ctxLen = 128L)
      println("  sequences: " + packed
        .select(col("shard"), col("seq_id")).distinct().count())
    }

    // --- corpus line dedup (q82 shape): copies duplicate the base doc's
    // aligned 8-word lines (the perturb token only touches each copy's
    // LAST line), so removed lines grow linearly with the corpus; the
    // plan is one explode + two map-combined hash aggs — time must track
    // total line count, never pairwise anything.
    time(s"line_dedup_${mult}x") {
      val out = Dedup.lineDedup(docs, "doc_id", "text", wordsPerLine = 8)
      val r = out.agg(sum(col("n_lines")).as("nl"),
                      sum(col("n_kept")).as("nk")).collect()(0)
      println(s"  lines=${r.getLong(0)} kept=${r.getLong(1)} " +
        s"removed=${r.getLong(0) - r.getLong(1)}")
    }
    // --- BPE training (q85 shape): the corpus scan feeds ONE word-count
    // agg; every round then works on the DISTINCT-word table, whose size
    // is constant under inflation — so total time must approach the
    // initial scan's linear term, with flat per-round cost.
    time(s"bpe_train_${mult}x") {
      val m = graft.operators.Bpe.trainMerges(docs, "text", rounds = 4)
        .collect()
      println("  merges: " + m.map(r =>
        s"${r.getString(1)}+${r.getString(2)}:${r.getLong(3)}").mkString(" "))
    }

    // --- BPE encode (q98 shape): merges trained once on the CONSTANT
    // base corpus (tokenizer training is a separate job at scale), then
    // the inflated corpus is encoded — a pure per-row pass, so time must
    // grow linearly with corpus rows and the token total with content.
    lazy val encMerges = graft.operators.Bpe.trainMerges(docs0, "text", 4)
      .filter(col("round") <= 4).orderBy("round").collect()
      .map(r => (r.getString(1), r.getString(2))).toSeq
    time(s"bpe_encode_${mult}x") {
      val enc = graft.operators.Bpe.encode(docs, "text", Seq("doc_id"),
                                           encMerges)
      println("  tokens: " + enc.select(
        sum(shiftright(length(col("encoded")) -
          length(replace(col("encoded"), lit("|"), lit(""))), 1)))
        .collect()(0).getLong(0))
    }

    // --- frequent pairs (q99 shape): the vocabulary is CONSTANT under
    // inflation while support scales relatively (20% of docs), so the
    // frequent-item table and pairs-per-doc stay flat — time must track
    // the explode + self-join linearly, never vocab² or corpus².
    time(s"cooccur_${mult}x") {
      val baskets = docs.select(col("doc_id"),
        filter(split(col("text"), " "), w => length(w) > 0).as("toks"))
      println("  freq pairs: " + graft.operators.ItemsetMining
        .frequentPairs(baskets, "doc_id", "toks", docs.count() / 5).count())
    }

    // --- CDC chunking (q100 shape): boundaries are per-word local
    // decisions; chunk count grows linearly with total words, and the
    // single id-shuffle means time must track corpus size.
    time(s"cdc_chunks_${mult}x") {
      println("  chunks: " + graft.operators.Chunking
        .contentDefinedChunks(docs, "doc_id", "text", 16).count())
    }

    // --- PPJoin (q107 shape): candidate count must track true near-dup
    // groups, never n²; the positional filter's prune is measured
    // directly (same candidate generator with the filter off/on).
    time(s"ppjoin_${mult}x") {
      val sets = docs.select(col("doc_id"),
          graft.functions.TextFunctions.shingles(col("text"), 3).as("sh"))
        .withColumn("sz", size(col("sh")))
        .filter(col("sz") > 0)
        .persist()
      try {
        val noPos = Dedup.ppjoinCandidates(sets, 4, 5,
                                           positional = false).count()
        val withPos = Dedup.ppjoinCandidates(sets, 4, 5,
                                             positional = true).count()
        val pairs = Dedup.ppjoinPairs(docs, "doc_id", "text", 3, 4, 5).count()
        println(s"  candidates full=$noPos positional=$withPos " +
          s"true_pairs=$pairs")
      } finally sets.unpersist()
    }

    // --- funnel depths (q110 shape): users remapped per copy so keys
    // grow linearly with per-key event counts constant — the per-key
    // window sort means time must track total events.
    time(s"funnel_${mult}x") {
      val ev = events.crossJoin(copies)
        .select((col("user_id") * mult + col("copy")).as("user_id"),
                unix_micros(col("ts")).as("us"),
                (col("event_id") * mult + col("copy")).as("event_id"),
                col("event_type"))
        .repartition(64)
      val d = graft.operators.Funnel.depths(ev, "user_id", "us",
          "event_type", "event_id", Seq("view", "click", "purchase"),
          windowUs = 86400000000L)
        .groupBy(col("depth")).agg(count(lit(1)).as("n"))
      println("  depths: " + d.orderBy("depth").collect().mkString(" "))
    }

    // --- rolling WAU (q122 shape): users grow per copy on a CONSTANT
    // day spine — the 7-day explode is per (day,user) row, so time must
    // track distinct (day,user) pairs linearly.
    time(s"rolling_wau_${mult}x") {
      val a = events.filter(pmod(col("event_id"), lit(11L)) === 0)
        .crossJoin(copies)
        .select(
          datediff(col("ts").cast("date"), lit("2024-01-01").cast("date"))
            .cast("long").as("day"),
          (col("user_id") * mult + col("copy")).as("user_id"))
        .distinct()
      val spine = a.select(col("day")).distinct()
      val wau = a
        .select(explode(sequence(col("day"), col("day") + 6)).as("rday"),
                col("user_id"))
        .join(spine.select(col("day").as("rday")), Seq("rday"), "left_semi")
        .groupBy(col("rday"))
        .agg(countDistinct(col("user_id")).as("wau"))
      println("  days=" + wau.count() + " max_wau=" +
        wau.agg(max(col("wau"))).collect()(0).getLong(0))
    }

    // --- z-order layout (q97 shape): one range exchange (the same any
    // total sort pays) + the PrefixSum totals pass — time must grow like
    // a sort of the corpus; file count grows linearly with rows.
    lazy val zev = Tables.events(spark, dir)
      .select(col("event_id"), col("user_id"))
      .crossJoin(copies)
      .select((col("event_id") * mult + col("copy")).as("id"),
              col("user_id"),
              pmod(col("event_id") * 37 + col("copy"), lit(1000000L))
                .as("dim_b"))
      .repartition(64)
    time(s"zorder_${mult}x") {
      val laid = graft.operators.ZOrder.layout(
        zev, "user_id", "dim_b", col("id"), rowsPerFile = 100000L)
      println("  files: " +
        (laid.agg(max(col("file_id"))).collect()(0).getLong(0) + 1))
    }

    lazy val emb = {
      val e = Tables.embeddings(spark, dir).crossJoin(copies)
        .select((col("vec_id") * mult + col("copy")).as("vec_id"),
                col("embedding"))
        .repartition(64).persist()
      println(s"SCALE vectors ${e.count()}")
      e
    }
    time(s"ann_lsh_${mult}x") {
      Similarity.annTopK(emb, col("vec_id") < 20, k = 3).count()
    }
    // --- mutual top-k pairs (q215 shape): EVERY vector is a query, so
    // candidate volume is Σ bucket² — under a FIXED plane count that is
    // n²/2^planes (the 30× run of the fixed-16×4 form OOMed an 8 GiB
    // heap at 60k vectors: 16 buckets/table × 3.7k occupancy → ~3.6e9
    // candidate rows). The probe therefore runs the SCALE CONFIG
    // (targetBucketDocs — autoPlanes bounds expected occupancy), whose
    // candidates grow ≈ n·target·tables: time must now track n, and
    // copy families still land intact in shared buckets (sign bits
    // agree on identical vectors), so family pairs remain exact.
    time(s"mutual_knn_${mult}x") {
      println("  mutual pairs: " + Similarity
        .mutualTopK(emb, k = 3, targetBucketDocs = 64L).count())
    }
    // --- LSH ANN recall/cost frontier (q25/q93 shape): sweep tables ×
    // planes at k=3 over the 20-query panel — recall vs candidate count
    // is the knob's tradeoff; the shipped default must sit at a
    // high-recall point (run at mult=1 for the real-corpus frontier).
    time("ann_sweep") {
      val queries = emb.filter(col("vec_id") < 20)
        .select(col("vec_id").as("qid"), col("embedding").as("qv"))
      val exact3 = Similarity.bruteForceTopK(emb, queries, k = 3)
        .select(col("qid"), col("neighbor_id")).persist()
      val nExact = exact3.count()
      for (t <- Seq(4, 8, 16); p <- Seq(4, 8)) {
        val t0 = System.nanoTime()
        val lsh = Similarity.annTopK(emb, col("vec_id") < 20, k = 3,
                                     tables = t, planesPerTable = p)
          .select(col("qid"), col("neighbor_id"))
        val hits = exact3.join(lsh, Seq("qid", "neighbor_id"), "left_semi")
          .count()
        val secs = (System.nanoTime() - t0) / 1e9
        val b = Similarity.lshBuckets(emb, t, p)
        val cands = b.filter(col("vec_id") < 20)
          .select(col("t"), col("bucket"), col("vec_id").as("qid"))
          .join(b.select(col("t"), col("bucket"),
                         col("vec_id").as("cand")), Seq("t", "bucket"))
          .filter(col("cand") =!= col("qid"))
          .select(col("qid"), col("cand")).distinct().count()
        println(f"  tables=$t planes=$p recall=${hits.toDouble / nExact}%.3f" +
          f" cands=$cands time=$secs%.2f s")
      }
      exact3.unpersist()
    }

    // --- quantized k-means: per-iteration cost must be one scan + a
    // k·dims-partial shuffle — linear in the corpus, constant in rounds.
    time(s"kmeans_${mult}x") {
      println("  assigned: " + Clustering.kmeansAssign(
        emb, "vec_id", "embedding", k = 8, dims = 64, iters = 3).count())
    }
    // --- PQ ANN (q70 shape): CONSTANT query set vs an inflating corpus —
    // train (joint, one job/round) + encode + ADC are all linear scans,
    // and the scoring shuffle is m rows per vector, so time must grow
    // linearly in the corpus, never n·n or n·codebook-retrains.
    time(s"pq_ann_${mult}x") {
      println("  pq top-k rows: " + Similarity.pqTopK(
        emb, col("vec_id") < 10, k = 5).count())
    }
    // --- SemDeDup (q73 shape): k scales WITH the corpus (8·mult) so
    // clusters keep a constant expected size — the production regime
    // (tens of thousands of clusters at web scale; a fixed tiny k over
    // a growing corpus would deliberately degenerate the within-cluster
    // quadratic term). Assignment stays one linear pass (the argmin
    // kernel loops k centroids per row); pair work tracks true
    // duplicate sets (identical copies of each base), kept stays ~flat.
    time(s"semdedup_${mult}x") {
      println("  kept: " + Similarity.semDedup(
          emb, minSimE6 = 950000L, k = 8 * mult, dims = 64, iters = 3)
        .filter(col("kept")).count())
    }
    // --- PageRank (q134 shape): the trade graph replicated into `mult`
    // DISJOINT namespaces (same structure, more of it) — per-iteration
    // cost is one edge join + one aggregate, so time must grow linearly
    // in edges at a fixed iteration count; superlinear growth would mean
    // the rank join stopped scaling with the graph.
    time(s"pagerank_${mult}x") {
      val rel = Tables.lineitem(spark, dir)
        .select(col("l_suppkey"), col("l_orderkey"))
        .join(Tables.orders(spark, dir)
                .select(col("o_orderkey"), col("o_custkey")),
              col("l_orderkey") === col("o_orderkey"))
        .select(concat(lit("s"), col("l_suppkey")).as("sup"),
                concat(lit("c"), col("o_custkey")).as("cust"))
        .distinct()
      val relC = rel.crossJoin(copies)
        .select(concat(col("sup"), lit("_"), col("copy")).as("sup"),
                concat(col("cust"), lit("_"), col("copy")).as("cust"))
        .repartition(64)
      val edges = relC.select(col("sup").as("src"), col("cust").as("dst"))
        .union(relC.select(col("cust").as("src"), col("sup").as("dst")))
      println("  ranked nodes: " +
        GraphOps.pageRank(edges, "src", "dst", iterations = 5).count())
    }
    // --- HITS (q141 shape): same disjoint-namespace trade-graph
    // inflation as the pagerank probe. Per half-step work is one keyed
    // join + one map-combined sum + a 1-row max broadcast back
    // (control-plane), so at a fixed iteration count time must grow
    // linearly in edges; the barrier count stays constant.
    def tradeEdges() = {
      val rel = Tables.lineitem(spark, dir)
        .select(col("l_suppkey"), col("l_orderkey"))
        .join(Tables.orders(spark, dir)
                .select(col("o_orderkey"), col("o_custkey")),
              col("l_orderkey") === col("o_orderkey"))
        .select(concat(lit("s"), col("l_suppkey")).as("sup"),
                concat(lit("c"), col("o_custkey")).as("cust"))
        .distinct()
      rel.crossJoin(copies)
        .select(concat(col("sup"), lit("_"), col("copy")).as("sup"),
                concat(col("cust"), lit("_"), col("copy")).as("cust"))
        .repartition(64)
    }
    time(s"hits_${mult}x") {
      val relC = tradeEdges()
      println("  hits nodes: " +
        GraphOps.hits(relC, "sup", "cust", iterations = 3).count())
    }
    // --- clustering coefficients (q143 shape): triangles + degree agg
    // over the same inflated namespaces. The degree-ordered triangle
    // listing is the dominant term — wedge work is Σ min-degree per
    // edge, which inflates linearly under disjoint copies.
    time(s"clustering_coef_${mult}x") {
      val relC = tradeEdges()
      val cc = GraphOps.clusteringCoefficients(relC, "sup", "cust")
      println("  coef nodes: " + cc.count())
    }
    // --- label propagation (q152 shape): same inflated trade graph;
    // per round one keyed join + two hash aggs, so fixed-iteration
    // time must grow linearly in edges.
    time(s"lpa_${mult}x") {
      // numeric ids (LPA's tie-break requires them): supplier and
      // customer ranges kept disjoint, copies namespaced by multiplier
      val rel = Tables.lineitem(spark, dir)
        .select(col("l_suppkey"), col("l_orderkey"))
        .join(Tables.orders(spark, dir)
                .select(col("o_orderkey"), col("o_custkey")),
              col("l_orderkey") === col("o_orderkey"))
        .select(col("l_suppkey").cast("long").as("sup"),
                col("o_custkey").cast("long").as("cust"))
        .distinct()
      val relC = rel.crossJoin(copies)
        .select((col("sup") * mult + col("copy")).as("u"),
                (lit(100000000L) + col("cust") * mult + col("copy"))
                  .as("v"))
        .repartition(64)
      println("  lpa nodes: " +
        GraphOps.labelPropagation(relC, "u", "v", iterations = 3).count())
    }
    // --- k-core (q156 shape): part↔supplier sourcing graph inflated
    // as disjoint namespaced copies, so core structure and round count
    // are invariant while edges grow linearly. Per peel round: one
    // degree agg + two semi-joins — time must grow linearly in edges
    // at the (constant) round count.
    time(s"kcore_${mult}x") {
      val rel = Tables.lineitem(spark, dir)
        .select(concat(lit("p"), col("l_partkey")).as("u"),
                concat(lit("s"), col("l_suppkey")).as("v"))
        .distinct()
      val relC = rel.crossJoin(copies)
        .select(concat(col("u"), lit("_"), col("copy")).as("u"),
                concat(col("v"), lit("_"), col("copy")).as("v"))
        .repartition(64)
      val (core, rounds) =
        GraphOps.kCoreWithStats(relC, "u", "v", k = 25)
      println(s"  kcore nodes: ${core.count()} rounds: $rounds")
    }
    // --- containment pairs (q160 shape): same perturbed-copy corpus as
    // the Jaccard probes — copies of a base contain each other almost
    // fully, so TRUE directional pairs grow ~mult² per family (that's
    // the data, not the algorithm). The probe's question is whether
    // candidate generation stays prefix-bound: time should track the
    // emitted-pair curve, never all-pairs n².
    time(s"containment_${mult}x") {
      println("  containment pairs: " + Dedup
        .containmentPairs(docs, "doc_id", "text", 3, 9, 10).count())
    }
    // --- depth-3 Apriori (q166 shape): RELATIVE support (n/5) scales
    // with the corpus, so the frequent vocabulary and itemset counts
    // are inflation-invariant; time must track the id-keyed expansion
    // (linear in docs), never the candidate cube.
    time(s"triples_${mult}x") {
      val minSup = docs.count() / 5
      println("  frequent triples: " + graft.operators.ItemsetMining
        .frequentTriples(
          docs.select(col("doc_id"),
            org.apache.spark.sql.functions.filter(
              graft.functions.TextFunctions.words(col("text")),
              w => length(w) > 0).as("toks")),
          "doc_id", "toks", minSup).count())
    }
    // --- audio near-dup (q149 shape): decode cost linear in payloads;
    // candidates bucket on (n_samples, energy hash) — the dup family's
    // per-base envelope keeps buckets selective, so candidate growth
    // tracks true duplicate structure (blocks of 8 + base pairs), not
    // n²/buckets.
    time(s"audio_neardup_${mult}x") {
      val ids = spark.range(5000L * mult).toDF("doc_id")
      println("  audio near-dup pairs: " + graft.operators.Audio
        .audioNearDupPairs(
          spark, graft.operators.Audio.withDupPayload(spark, ids),
          eadE6Max = 150000L).count())
    }
    // --- video near-dup (q151 shape): sampled-frame decode linear in
    // payloads; candidates bucket on (n_frames, aHash64 fingerprint) —
    // per-base contrast patterns keep fingerprints distinct across
    // bases (64 patterns cycle mod 64), so candidates stay bucket-bound.
    time(s"video_neardup_${mult}x") {
      val ids = spark.range(5000L * mult).toDF("doc_id")
      println("  video near-dup pairs: " + graft.operators.Video
        .videoNearDupPairs(
          spark, graft.operators.Video.withDupPayload(spark, ids),
          stride = 4, vadE6Max = 8000000L).count())
    }
    // --- image near-dup (q135 shape): decode cost is linear in images;
    // candidate pairs are bucket-bound by (w, h, hash4) — with the
    // fixture's 4-bit oracle-mirrorable hash the bucket count is FIXED,
    // so candidates grow ~n²/buckets as the corpus inflates. That is the
    // knob's honest price: production grids hash 64 bits (8×8 blocks)
    // precisely so bucket count scales with corpus. The probe measures
    // the fixture config as shipped.
    time(s"image_neardup_${mult}x") {
      val ids = spark.range(5000L * mult).toDF("doc_id")
      println("  image near-dup pairs: " + graft.operators.Multimodal
        .imageNearDupPairs(
          spark,
          graft.operators.Multimodal.withPayload(spark, ids),
          madE6Max = 15000000L, hashBits = 4).count())
    }
    // --- image near-dup, SAME-DIMENSION corpus, 4-bit vs 64-bit hash
    // (q144 shape): every card is 32×32, so (w, h) carries zero
    // selectivity and the hash is the only bucketing. The 4-bit hash
    // has 16 possible buckets — candidates grow ~n²/16 no matter how
    // visually diverse the corpus; the 64-bit block grid buckets by
    // visual structure, so candidate growth tracks true duplicate
    // structure. madE6Max = int64-safe huge keeps every candidate, so
    // the printed counts ARE the candidate counts.
    time(s"image_hash_selectivity_${mult}x") {
      import spark.implicits._
      val n = 200L * mult
      val cards = spark.range(n).as[Long].map { id =>
        graft.operators.Multimodal.MediaRow(
          id,
          graft.operators.Multimodal.encodeCard(32, 32, (x, y) =>
            (((id % 251) + (1 + id % 15) * x + (1 + id % 13) * y)
              % 251).toInt))
      }.graftCheckpoint()
      val c4 = graft.operators.Multimodal
        .imageNearDupPairs(spark, cards, madE6Max = 1000000000L,
                           hashBits = 4).count()
      val c64 = graft.operators.Multimodal
        .imageNearDupPairs(spark, cards, madE6Max = 1000000000L,
                           hashBits = 64).count()
      println(s"  candidates: hash4=$c4 hash64=$c64 (n=$n)")
    }
    // --- audio near-dup, FIXED-LENGTH corpus, 1-band vs 4-band energy
    // hash (the q183 move): every clip is 1600 samples (4 frames), so
    // n_samples carries zero selectivity and the hash is the only
    // bucketing. The 1-band envelope has 4 bits → ≤16 buckets no matter
    // how acoustically diverse the corpus — candidates grow ~n²/16; the
    // 4-band key carries 16 bits of per-slot loudness structure, so
    // candidate growth tracks true duplicate structure. eadE6Max huge
    // keeps every candidate: the printed counts ARE candidate counts.
    // (The audio edition of image_hash_selectivity — hash4 vs hash64.)
    time(s"audio_hash_selectivity_${mult}x") {
      import spark.implicits._
      val n = 200L * mult
      val clips = spark.range(n).as[Long].map { id =>
        val s = new Array[Short](1600)
        var t = 0
        while (t < 1600) {
          val slot = t / 100
          // xor-mixed slot loudness (1..5): a plain linear pattern mod 5
          // collapses to id mod 5 — the degenerate-family trap the LSH
          // hyperplane audit already caught once
          val v0 = id * 1000003L + slot * 7919L
          val m = 1 + (((v0 ^ (v0 >>> 13)) % 5 + 5) % 5)
          s(t) = (m * ((id % 499 + 37L * t) % 2001 - 1000)).toShort
          t += 1
        }
        graft.operators.Audio.AudioRow(
          id, graft.operators.Audio.encodeWav(s))
      }.graftCheckpoint()
      val c1 = graft.operators.Audio.audioNearDupPairs(
        spark, clips, eadE6Max = Long.MaxValue, bands = 1).count()
      val c4 = graft.operators.Audio.audioNearDupPairs(
        spark, clips, eadE6Max = Long.MaxValue, bands = 4).count()
      println(s"  candidates: bands1=$c1 bands4=$c4 (n=$n)")
    }
    // --- SemDeDup auto-k (q73 shape, k = 0): the cluster count derives
    // from the corpus (⌈n / targetClusterSize⌉), so the per-cluster
    // quadratic term stays bounded WITHOUT the caller hand-scaling k per
    // corpus size — the knob the fixed-k degenerate regime (above) is
    // missing. targetClusterSize constant across mults ⇒ derived k grows
    // with the corpus exactly like the hand-tuned 8·mult row.
    time(s"semdedup_autok_${mult}x") {
      // targetClusterSize 250 reproduces the hand-tuned 8·mult row's
      // cluster count (20k/250 = 80, 60k/250 = 240); the knob is the
      // DIRECT cost dial — a 2500 target (k = 8/24) measured 51 s/358 s
      // at 10×/30×, the within-cluster quadratic at work
      println("  kept: " + Similarity.semDedup(
          emb, minSimE6 = 950000L, k = 0, dims = 64, iters = 3,
          targetClusterSize = 250L)
        .filter(col("kept")).count())
    }
    // --- pair-family cap (q22 shape + maxBucketDocs): the inflated
    // corpus's duplicate families grow with mult, so uncapped TRUE pairs
    // grow ~mult² per family (the §9 52–61× shuffle story on
    // q21/q37/q54/q145/q165). The cap bounds the per-bucket candidate
    // sample: capped pair counts must grow ~linearly (cap² per family ×
    // linearly-growing family count), while cap-off tracks the true
    // quadratic output. Both verify against FULL sets — precision is
    // never traded, only tail recall within over-cap families.
    time(s"dedup_family_cap_${mult}x") {
      val off = Dedup.minhashDedupPairs(docs, "doc_id", "text", 3, 4, 5)
        .count()
      val on = Dedup.minhashDedupPairs(docs, "doc_id", "text", 3, 4, 5,
          maxBucketDocs = 8).count()
      println(s"  pairs: cap_off=$off cap_on(8)=$on")
    }
    // --- CAP-LEVER on the four pair-consuming gated queries (r12
    // verdict #2): §9 asserted the pair families' 74–97× shuffle growth
    // at ×10 "is bounded in production by the cap knobs" — this probe
    // asserts it WITH DATA. Each leg replicates its query's pair stage
    // plus downstream consumer — q205 provenance (jaccard 1/2 + CC +
    // keeper join), q209 incremental CC (jaccard 1/2 + merge), q225
    // threshold sensitivity (jaccard 4/5 + strict filter + applyDedup),
    // q145's text leg (minhash 4/5 + applyDedup; the image leg rides
    // the linear FeatureStore pass and carries no pair-family knob) —
    // cap OFF (exact, the gated default) then ON, reporting wall,
    // task-level shuffle bytes, the pair count, and the downstream
    // output row count. The out-delta IS the exactness trade: recall
    // inside over-cap families only (q188's family-size audit names
    // the tail), precision untouched (capped candidates still verify
    // against FULL sets).
    time(s"cap_lever_${mult}x") {
      val ids = docs.select(col("doc_id"))
      def leg(name: String)(f: => (Long, Long)): Unit = {
        val base = settledShuffle()
        val t0 = System.nanoTime()
        val (pairs, out) = f
        val dt = (System.nanoTime() - t0) / 1e9
        val sh = settledShuffle() - base
        println(f"  $name pairs=$pairs out=$out " +
          f"shuffle_mb=${sh / 1e6}%.1f wall=$dt%.2f s")
      }
      def withPairs(p: org.apache.spark.sql.DataFrame)
                   (out: org.apache.spark.sql.DataFrame => Long)
          : (Long, Long) = {
        val ck = p.graftCheckpoint()
        try (ck.count(), out(ck))
        finally org.apache.spark.sql.GraftColumns.unpersistCheckpoint(ck)
      }
      for (cap <- Seq(0, 8)) {
        val tag = if (cap == 0) "cap_off" else s"cap_on_$cap"
        leg(s"q205_provenance_$tag") {
          withPairs(Dedup.jaccardPairs(docs, "doc_id", "text", 3, 1, 2,
                                       maxBucketDocs = cap)) { pairs =>
            val cc = GraphOps.connectedComponents(
                pairs.select(col("doc_a"), col("doc_b")),
                "doc_a", "doc_b")
              .toDF("doc_id", "component")
            ids.join(cc, Seq("doc_id"), "left")
              .filter(col("component").isNull ||
                      col("doc_id") === col("component"))
              .count()
          }
        }
        leg(s"q209_incr_cc_$tag") {
          withPairs(Dedup.jaccardPairs(docs, "doc_id", "text", 3, 1, 2,
                                       maxBucketDocs = cap)
                      .select(col("doc_a"), col("doc_b"))
                      .withColumn("__new",
                        pmod(xxhash64(col("doc_a"), col("doc_b")),
                             lit(5L)) === 0L)) { pairs =>
            val oldLabels = GraphOps.connectedComponents(
                pairs.filter(!col("__new")), "doc_a", "doc_b")
              .toDF("id", "comp")
            GraphOps.mergeComponents(
                oldLabels, pairs.filter(col("__new")), "doc_a", "doc_b")
              .select(col("comp")).distinct().count()
          }
        }
        leg(s"q225_threshold_$tag") {
          withPairs(Dedup.jaccardPairs(docs, "doc_id", "text", 3, 4, 5,
                                       maxBucketDocs = cap)) { pairs =>
            val strict = pairs
              .filter(col("inter_cnt") * 10 >= col("union_cnt") * 9)
            Dedup.applyDedup(ids, "doc_id",
                             strict.select("doc_a", "doc_b"))
              .filter(col("kept")).count()
          }
        }
        leg(s"q145_text_leg_$tag") {
          withPairs(Dedup.minhashDedupPairs(docs, "doc_id", "text",
                                            3, 4, 5,
                                            maxBucketDocs = cap)
                      .select("doc_a", "doc_b")) { pairs =>
            Dedup.applyDedup(ids, "doc_id", pairs)
              .filter(col("kept")).count()
          }
        }
      }
    }
    // --- bigram LM scoring (q133 shape): model size is bounded by the
    // corpus vocabulary (the perturbed copies add ~one new type each),
    // so train stays two map-combined aggs and scoring one hash join —
    // time tracks corpus tokens, never corpus × vocabulary.
    time(s"bigram_lm_${mult}x") {
      println("  scored docs: " + graft.operators.LanguageModel
        .scoreDocuments(docs, "doc_id", "text").count())
    }
    // --- DSIR importance weights (q219 shape): the feature table is
    // docs × B bounded, the ratio model a fixed B = 64 rows
    // re-aggregated from it and broadcast back — time must track corpus
    // tokens linearly (the q133 law), with no term that grows in
    // vocabulary or in target size.
    time(s"dsir_weights_${mult}x") {
      println("  weighted docs: " + graft.operators.Dsir
        .weights(docs, "doc_id", "text",
                 pmod(col("doc_id"), lit(3L)) === 0L).count())
    }
    // --- winnowing fingerprints (q223 shape): selection is per-row
    // array arithmetic (linear in tokens, ~2/(w+1) density); the pair
    // stage is Σ df² over fingerprint hashes. The perturbed copies keep
    // their original text PLUS a copy-suffix word, so each original's
    // fingerprint runs survive in every copy — TRUE shared-run pairs
    // grow ~mult² per family while selection stays linear; time must
    // track pairs (the q21/q37 family-quadratic story), never corpus².
    time(s"winnowing_${mult}x") {
      println("  shared-fp pairs: " + graft.operators.Winnowing
        .sharedFingerprintPairs(docs, "doc_id", "text").count())
    }
    // --- vocabulary novelty curve (q222 shape): one explode + two
    // map-combined aggs; the by-shingle min-agg key set is the corpus
    // vocabulary, which the perturbed copies grow only at the margin
    // (one new suffix word each) — time must track tokens, the
    // 10-row shard frame is free.
    time(s"novelty_curve_${mult}x") {
      val shardOf = pmod(graft.functions.PortableHash
        .h32(col("doc_id").cast("string")), lit(10L))
      val sh = docs.select(shardOf.as("shard"),
        explode(graft.functions.TextFunctions.shingles(col("text"), 3))
          .as("shingle"))
      println("  novel total: " + sh.groupBy(col("shingle"))
        .agg(min(col("shard")).as("shard"))
        .groupBy(col("shard")).count().agg(sum(col("count")))
        .collect()(0).getLong(0))
    }
    // --- entity resolution (q197 shape): part records inflated as
    // namespaced copies — the NOUN carries the copy suffix, so blocks
    // stay their original size and family structure is invariant while
    // record count grows linearly. The candidate stage is Σ|block|²;
    // with bounded blocks its cost must grow linearly in copies, as
    // must entities. A superlinear curve here means the blocking key
    // leaked across copies (global quadratic — the failure mode
    // blocking exists to prevent).
    time(s"entity_resolution_${mult}x") {
      val p0 = Tables.part(spark, dir)
        .select(col("p_partkey"), col("p_name"), col("p_brand"),
                col("p_retailprice"))
      val p = p0.crossJoin(copies)
        .select((col("p_partkey") * mult + col("copy")).as("pk"),
                col("p_name").as("nm"), col("p_brand").as("br"),
                concat(element_at(split(col("p_name"), " "), 2),
                       lit("_"), col("copy")).as("noun"),
                floor(col("p_retailprice") * 100).cast("long")
                  .as("price_c"))
        .repartition(64)
      val a = p.select(col("pk").as("pk_a"), col("nm").as("nm_a"),
                       col("noun"), col("br"))
      val b = p.select(col("pk").as("pk_b"), col("nm").as("nm_b"),
                       col("noun"), col("br"))
      val matches = a.join(b, Seq("noun", "br"))
        .filter(col("pk_a") < col("pk_b") &&
                levenshtein(col("nm_a"), col("nm_b")) <= 1)
        .select(col("pk_a"), col("pk_b"))
      val cc = GraphOps.connectedComponents(matches, "pk_a", "pk_b")
        .toDF("pk", "entity_id")
      println("  entities: " +
        cc.groupBy("entity_id").count().count())
    }
    // --- shortest-path counts (q202 shape): the inflated trade graph
    // (disjoint namespaced copies), seed in copy 0. Reach and sigma are
    // copy-0-invariant by construction; what grows is the edge table
    // every round's frontier join scans — per-round cost is one keyed
    // join + one sum agg + one anti-join over E edges, so time must
    // grow linearly in edges at the fixed round count (the pagerank
    // discipline). Sigma magnitudes are asserted stable.
    time(s"path_counts_${mult}x") {
      val relC = tradeEdges()
      val sym = relC.select(col("sup").as("src"), col("cust").as("dst"))
        .unionByName(relC.select(col("cust").as("src"),
                                 col("sup").as("dst")))
      val out = GraphOps.pathCounts(sym, "src", "dst",
                                    seed = "s1_0", maxHops = 4)
      println("  reached: " + out.count())
    }
    // --- scene-change detection (q200 shape): decode cost ∝ sampled
    // frames ∝ videos — the probe inflates the video count and the
    // curve must be linear (one narrow map, no shuffle; nothing to
    // degenerate except the codec itself). Boundary totals scale
    // linearly with the copies too (fixture family is id-deterministic).
    time(s"scene_cuts_${mult}x") {
      val ids = docs0.select(col("doc_id")).crossJoin(copies)
        .select((col("doc_id") * mult + col("copy")).as("doc_id"))
        .repartition(64)
      val out = Video.sceneChanges(
          spark, Video.withScenePayload(spark, ids),
          stride = 2, hammingMin = 16)
      val agg = out.agg(count(lit(1)), sum(col("n_boundaries"))).collect()(0)
      println(s"  videos: ${agg.getLong(0)} boundaries: ${agg.getLong(1)}")
    }
    // --- sparse top-k retrieval (q201 shape): postings grow linearly
    // with the corpus; every copy token ('perturbcopyN', df = 500 per
    // copy) survives the 4/5 pruning, and the common-vocabulary
    // candidates grow linearly per query. Time must track postings —
    // a quadratic curve means the df pruning stopped bounding the hot
    // lists it exists to bound.
    time(s"sparse_topk_${mult}x") {
      val out = graft.operators.Search.sparseTopK(
        docs, "doc_id", "text",
        docs.select(col("doc_id")).filter(col("doc_id") < 5), k = 3,
        dfNum = 4L, dfDen = 5L)
      println("  result rows: " + out.count())
    }
    // --- curve-layout cost (q97 vs q203 shape): same input, same
    // PrefixSum file assignment — the delta is the d-value arithmetic
    // (5 shift/mask rounds vs 16 CASE rounds) and whether it evaluates
    // once (checkpointed before the range sampler) or twice.
    // --- blocked edit-distance hot block (q193 shape): ONE noun's part
    // records inflated ×mult with the noun KEPT (the viral-key regime —
    // the opposite of the namespaced entity_resolution probe), so the
    // bare blocking key degenerates to a single Σ|block|² pocket. The
    // probe measures the bare-key candidate volume vs the length-banded
    // volume (computed exactly from the cell histogram — the bare join
    // itself is only run to time it) and runs the banded join for wall
    // time. The drop factor equals the block's length diversity
    // (#occupied bands); the maxCellRows cap is the lever once banding
    // saturates (reported as the capped candidate count).
    time(s"blocked_editdist_hot_${mult}x") {
      val part = Tables.part(spark, dir)
        .select(col("p_partkey"), col("p_name"),
                coalesce(element_at(split(col("p_name"), " "), 2),
                         lit("")).as("noun"))
      val hotNoun = part.groupBy("noun").count()
        .orderBy(col("count").desc, col("noun")).limit(1)
        .collect()(0).getString(0)
      // length-DIVERSE inflation: a copy-dependent pad (0–31 chars)
      // models real catalog titles' length spread — the testdata's own
      // names span only 3 length values per noun, where exact banding
      // cannot drop candidates (|Δlen| ≤ maxDist already admits almost
      // every pair); the knob's value is exactly the occupied-band
      // count, so the fixture must have bands to occupy.
      val p = part.filter(col("noun") === hotNoun).crossJoin(copies)
        .select((col("p_partkey") * mult + col("copy")).as("pk"),
                concat(col("p_name"), lit(" c"), col("copy"),
                       expr("repeat('x', CAST(copy % 32 AS INT))"))
                  .as("nm"),
                col("noun"))
        .repartition(64)
        .persist()
      val n = p.count()
      // exact candidate volumes from the cell histogram (tiny agg)
      val cells = p.withColumn("band",
          expr("CAST(length(nm) AS BIGINT) div 3"))
        .groupBy("noun", "band").agg(count(lit(1)).as("c"))
        .persist()
      val sameCand = cells.agg(sum(expr("c * (c - 1) div 2"))).collect()(0)
        .getLong(0)
      val adjCand = cells.join(
          cells.select(col("noun"), (col("band") - 1L).as("band"),
                       col("c").as("c1")), Seq("noun", "band"))
        .agg(coalesce(sum(expr("c * c1")), lit(0L))).collect()(0).getLong(0)
      val bareCand = n * (n - 1) / 2
      val t0 = System.nanoTime()
      val bare = p.select(col("pk").as("pk_a"), col("nm").as("nm_a"),
                          col("noun"))
        .join(p.select(col("pk").as("pk_b"), col("nm").as("nm_b"),
                       col("noun")), Seq("noun"))
        .filter(col("pk_a") < col("pk_b") &&
                levenshtein(col("nm_a"), col("nm_b"), 2) >= 0)
        .count()
      val t1 = System.nanoTime()
      // autoCellRows = 0: this probe measures the RAW banded curve —
      // the default auto-fallback would reroute the hot fixture and
      // measure PassJoin instead (see the auto_default probe below).
      val banded = Dedup.blockedSelfJoin(p, "pk", "nm", Seq("noun"),
                                         maxDist = 2, bandWidth = 3,
                                         autoCellRows = 0).count()
      val t2 = System.nanoTime()
      val capped = Dedup.blockedSelfJoin(p, "pk", "nm", Seq("noun"),
                                         maxDist = 2, bandWidth = 3,
                                         maxCellRows = 64).count()
      println(f"  hot block n=$n bare_cand=$bareCand " +
        f"banded_cand=${sameCand + adjCand} " +
        f"bare ${(t1 - t0) / 1e9}%.2f s ($bare pairs) " +
        f"banded ${(t2 - t1) / 1e9}%.2f s ($banded pairs) " +
        f"cap64 pairs=$capped")
      cells.unpersist(); p.unpersist()
    }
    // --- PassJoin segment signatures on the SAME hot-block fixture:
    // candidate volume is bounded by pairs agreeing on one aligned
    // ~len/3-char substring, not by cell occupancy — the economics
    // that survive a viral blocking key banding cannot split
    // (all-same-length hot cells). Reported: distinct candidate
    // pairs, true pairs, and wall time vs the banded join on the
    // identical fixture.
    time(s"passjoin_hot_${mult}x") {
      val part = Tables.part(spark, dir)
        .select(col("p_partkey"), col("p_name"),
                coalesce(element_at(split(col("p_name"), " "), 2),
                         lit("")).as("noun"))
      val hotNoun = part.groupBy("noun").count()
        .orderBy(col("count").desc, col("noun")).limit(1)
        .collect()(0).getString(0)
      val p = part.filter(col("noun") === hotNoun).crossJoin(copies)
        .select((col("p_partkey") * mult + col("copy")).as("pk"),
                concat(col("p_name"), lit(" c"), col("copy"),
                       expr("repeat('x', CAST(copy % 32 AS INT))"))
                  .as("nm"),
                col("noun"))
        .repartition(64)
        .persist()
      val n = p.count()
      val t0 = System.nanoTime()
      val cand = Dedup.passJoinCandidates(p, "pk", "nm", Seq("noun"), 2)
        .count()
      val t1 = System.nanoTime()
      val pass = Dedup.passJoinPairs(p, "pk", "nm", Seq("noun"), 2).count()
      val t2 = System.nanoTime()
      val banded = Dedup.blockedSelfJoin(p, "pk", "nm", Seq("noun"),
                                         maxDist = 2, bandWidth = 3,
                                         autoCellRows = 0).count()
      val t3 = System.nanoTime()
      // DEFAULT path on the same fixture: the auto-fallback measures
      // the cell histogram and (above the bound) reroutes hot blocks
      // to the signature path — the r12 verdict's "q193 completes the
      // sweep inside its documented complexity" witness, with the
      // decision printed by the operator itself.
      val auto = Dedup.blockedSelfJoin(p, "pk", "nm", Seq("noun"),
                                       maxDist = 2, bandWidth = 3).count()
      val t4 = System.nanoTime()
      assert(auto == banded,
             s"auto-fallback changed the pair count: $auto != $banded")
      println(f"  n=$n passjoin_cand=$cand (${(t1 - t0) / 1e9}%.2f s) " +
        f"passjoin ${(t2 - t1) / 1e9}%.2f s ($pass pairs) " +
        f"banded ${(t3 - t2) / 1e9}%.2f s ($banded pairs) " +
        f"auto_default ${(t4 - t3) / 1e9}%.2f s")
      p.unpersist()
    }
    // --- PassJoin's WINNING regime: long uniform-length fields (the
    // all-same-length template family blockedSelfJoin's Scaladoc names
    // as banding's residual risk — every row lands in ONE (lang, band)
    // cell, so the banded join's candidates grow with the SQUARE of
    // the corpus and each one pays a ~256-char threshold kernel, while
    // the signature join's candidates stay bounded by pairs actually
    // sharing an aligned ~85-char substring). Fixture: 256-char doc
    // prefixes, copies in GROUPS of 3 — a 6-char group block overlaid
    // into EACH of the three segment thirds (so different groups share
    // no segment and contribute no signature candidates) plus one
    // group-internal char (within-group distance 1) — TRUE pairs grow
    // LINEARLY with mult (3 per group) while the single hot cell grows
    // quadratically; blocked on lang.
    time(s"passjoin_longfield_${mult}x") {
      val f = Tables.documents(spark, dir)
        .filter(length(col("text")) >= 256 && col("doc_id") % 2 === 0)
        .select(col("doc_id"), col("lang"),
                expr("substring(text, 1, 256)").as("field"))
        .crossJoin(copies)
        .select((col("doc_id") * mult + col("copy")).as("id"),
                col("lang"),
                expr("""overlay(overlay(overlay(overlay(field,
                       |  concat('g', lpad(CAST(copy div 3 AS STRING),
                       |                   5, '0')), 40),
                       |  concat('g', lpad(CAST(copy div 3 AS STRING),
                       |                   5, '0')), 128),
                       |  concat('g', lpad(CAST(copy div 3 AS STRING),
                       |                   5, '0')), 215),
                       |  chr(65 + CAST(copy % 3 AS INT)), 80)"""
                  .stripMargin.replace("\n", " ")).as("field"))
        .repartition(64).persist()
      val n = f.count()
      val cells = f
        .withColumn("band", expr("CAST(length(field) AS BIGINT) div 3"))
        .groupBy("lang", "band").agg(count(lit(1)).as("c"))
      val sameC = cells.agg(sum(expr("c * (c - 1) div 2"))).collect()(0)
        .getLong(0)
      val t0 = System.nanoTime()
      val pj = Dedup.passJoinPairs(f, "id", "field", Seq("lang"), 2)
        .count()
      val t1 = System.nanoTime()
      val bandedLine = if (mult <= 30) {
        val bd = Dedup.blockedSelfJoin(f, "id", "field", Seq("lang"),
                                       maxDist = 2, bandWidth = 3,
                                       autoCellRows = 0).count()
        f"banded ${(System.nanoTime() - t1) / 1e9}%.2f s ($bd pairs)"
      } else "banded skipped (volume above is the curve)"
      println(f"  n=$n banded_cand=$sameC " +
        f"passjoin ${(t1 - t0) / 1e9}%.2f s ($pj pairs) " + bandedLine)
      f.unpersist()
    }
    // --- dedup provenance (q205 shape): the gated q37 pair+CC shapes
    // plus two LEFT joins (docs→labels, member→direct-pair evidence).
    // Pairs grow with true near-dup output (families ~mult² per family
    // — the q37 curve); the provenance joins add strictly linear work
    // on top, so the curve must track the pair stage, never exceed it.
    time(s"dedup_provenance_${mult}x") {
      val ids = docs.select(col("doc_id"))
      val pairs = Dedup.jaccardPairs(docs, "doc_id", "text", 3, 1, 2)
      val cc = GraphOps.connectedComponents(
          pairs.select(col("doc_a"), col("doc_b")), "doc_a", "doc_b")
        .toDF("doc_id", "component")
      val direct = pairs.select(
          col("doc_a").as("component"), col("doc_b").as("doc_id"),
          expr("(1000000 * inter_cnt) div union_cnt").as("keeper_jac_e6"))
      val out = ids.join(cc, Seq("doc_id"), "left")
        .withColumn("kept",
          col("component").isNull || col("doc_id") === col("component"))
        .join(direct, Seq("component", "doc_id"), "left")
      println("  provenance rows: " + out.count())
    }
    // --- incremental CC maintenance (q209 shape): corpus HISTORY grows
    // ×mult (labels from the full inflated pair set) while the NEW batch
    // stays constant-size (one chain edge per base doc id < 500). The
    // merge rebuilds from star edges — one edge per labeled non-root
    // node — so merge cost must track LABELED NODES (linear in mult),
    // not historical pair count (family-quadratic); that separation is
    // the maintenance theorem q209 gates. Batch recompute over all
    // pairs is timed next to it as the cost being avoided.
    time(s"incremental_cc_${mult}x") {
      val allPairs = Dedup.jaccardPairs(docs, "doc_id", "text", 3, 1, 2)
        .select(col("doc_a"), col("doc_b"))
        .graftCheckpoint()
      val nPairs = allPairs.count()
      val t0 = System.nanoTime()
      val oldLabels = GraphOps.connectedComponents(
        allPairs, "doc_a", "doc_b").toDF("id", "comp")
      val t1 = System.nanoTime()
      val newEdges = docs0.select(col("doc_id")).filter(col("doc_id") < 500)
        .select((col("doc_id") * mult).as("doc_a"),
                ((col("doc_id") + 1) * mult).as("doc_b"))
      val merged = GraphOps.mergeComponents(
        oldLabels, newEdges, "doc_a", "doc_b")
      val nMerged = merged.count()
      val t2 = System.nanoTime()
      println(f"  history pairs=$nPairs labeled=$nMerged " +
        f"batch_cc ${(t1 - t0) / 1e9}%.2f s " +
        f"merge ${(t2 - t1) / 1e9}%.2f s")
      org.apache.spark.sql.GraftColumns.unpersistCheckpoint(allPairs)
    }
    // --- community modularity (q212 shape): CDC chunk graph over the
    // inflated corpus (copies share most chunks with their original, so
    // edges grow with true family pairs — the q37 mass), then 3 LPA
    // rounds + the degree/within-community aggs. Every stage is keyed
    // joins/aggs over edges; time must track the edge count, with the
    // 1-row Q reduction free.
    time(s"modularity_${mult}x") {
      val ch = graft.operators.Chunking.contentDefinedChunks(
          docs, "doc_id", "text", modulus = 16)
        .select(col("chunk_md5").as("h"), col("doc_id"))
        .graftCheckpoint()
      val edges = ch.select(col("h"), col("doc_id").as("u"))
        .join(ch.select(col("h"), col("doc_id").as("v")), Seq("h"))
        .filter(col("u") < col("v"))
        .select(col("u"), col("v")).distinct()
        .graftCheckpoint()
      val nEdges = edges.count()
      val labels = GraphOps.labelPropagation(edges, "u", "v",
                                             iterations = 3)
      val deg = edges.select(col("u").as("node"))
        .unionByName(edges.select(col("v").as("node")))
        .groupBy(col("node")).agg(count(lit(1)).as("deg"))
      val dC = deg.join(labels, Seq("node"))
        .groupBy(col("community")).agg(sum(col("deg")).as("d_c"))
      val mC = edges
        .join(labels.select(col("node").as("u"),
                            col("community").as("cu")), Seq("u"))
        .join(labels.select(col("node").as("v"),
                            col("community").as("cv")), Seq("v"))
        .filter(col("cu") === col("cv"))
        .groupBy(col("cu")).agg(count(lit(1)).as("m_c"))
      val nComm = dC.join(mC, col("community") === col("cu"), "left")
        .count()
      println(s"  edges=$nEdges communities=$nComm")
      org.apache.spark.sql.GraftColumns.unpersistCheckpoint(edges)
      org.apache.spark.sql.GraftColumns.unpersistCheckpoint(ch)
    }
    // --- degree profile (q213 shape): two hash aggs over the inflated
    // trade graph (node degrees, then the 63-band histogram). Strictly
    // linear in edges — the audit must stay cheaper than any iterative
    // consumer of the same graph, or nobody runs it first.
    time(s"degree_profile_${mult}x") {
      val rel = tradeEdges()
      val deg = rel.select(col("sup").as("node"))
        .unionByName(rel.select(col("cust").as("node")))
        .groupBy(col("node")).agg(count(lit(1)).as("deg"))
      val bandSql = (62 to 0 by -1)
        .map(k => s"WHEN deg >= ${1L << k} THEN $k")
        .mkString("CASE ", " ", " ELSE -1 END")
      val out = deg.withColumn("band", expr(bandSql).cast("long"))
        .groupBy(col("band"))
        .agg(count(lit(1)).as("n_nodes"), sum(col("deg")).as("mass"))
      println("  bands: " + out.count())
    }
    // --- prefix-doubling suffix array (q258 shape): corpus ×mult with
    // perturbed copies (exact-duplicate TEXT BODIES with distinct
    // suffixes — heavy rank ties deep into the rounds, the adversarial
    // regime). The claim under test: ROUND COUNT is bounded by the
    // 64-char cap, never by corpus size, so time grows ~linearly with
    // total characters (each round = one pair self-join + denseRank's
    // single range exchange over n position rows).
    time(s"suffix_ranks_${mult}x") {
      val sa = graft.operators.SuffixRank.ranks(docs, "doc_id", "text",
                                                capChars = 64)
      println("  suffix rows: " + sa.count())
      org.apache.spark.sql.GraftColumns.unpersistCheckpoint(sa)
    }
    // --- distributed PAV isotonic fit (q254 shape): (margin, label)
    // pairs ×mult (ids remapped; margins jittered per copy so the
    // score axis EXTENDS). The claim: only BLOCK SUMMARIES reach the
    // driver, and binary-label pooling collapses them far below the
    // row count — the probe prints blocks vs rows so the driver-side
    // exposure is a measured number, not an assumption.
    time(s"isotonic_${mult}x") {
      val base = Tables.documents(spark, dir)
        .select(col("doc_id"),
                (col("n_chars") % 1000).as("score0"),
                (col("doc_id") % 2).as("y"))
      val pts = base.crossJoin(copies)
        .select((col("doc_id") * mult + col("copy")).as("id"),
                (col("score0") * mult + col("copy")).as("score"),
                col("y"))
        .repartition(64)
      val blocks = graft.operators.Isotonic.isotonicBlocks(
        pts, "score", "id", "y")
      val n = pts.count()
      println(s"  rows=$n isotonic blocks: " + blocks.count())
    }
    // --- Aho-Corasick dictionary scale (q256/q257 shape): the SAME
    // corpus scanned under 10³ / 10⁴ / 10⁵-pattern dictionaries
    // (deterministic synthetic entries, ~13 chars each, plus a seeded
    // slice of real corpus words so matches occur). The automaton
    // claim: scan time is O(chars + matches), INDEPENDENT of
    // dictionary size — the three timings should be flat, with only
    // the driver-side compile + closure ship growing (linearly, under
    // the MaxPatternChars loud cap).
    for (dictSize <- Seq(1000, 10000, 100000)) {
      time(s"aho_corasick_${dictSize}p") {
        val real = Tables.documents(spark, dir)
          .select(explode(split(col("text"), " ")).as("w"))
          .filter(length(col("w")) >= 6)
          .limit(dictSize / 10).collect().map(_.getString(0)).distinct
        val synth = (0 until dictSize - real.length)
          .map(i => f"zqxpattern$i%08d")
        val t0 = System.nanoTime()
        val dict = (real ++ synth).distinct
        val matches = graft.operators.AhoCorasick.matchSpans(
          Tables.documents(spark, dir), "doc_id", "text", dict)
        println(f"  dict=${dict.length} matches=${matches.count()} " +
          f"(compile+scan ${(System.nanoTime() - t0) / 1e9}%.2f s)")
      }
    }
    // --- unigram-LM tokenizer (q266/q267 shape): corpus ×mult. The
    // trainer claim: every stage heavier than a 1-row total rides the
    // DISTINCT-WORD vocab (the Zipf lever) — inflated copies add one
    // suffix word each, so vocab grows ~linearly in copies while the
    // corpus grows ×mult, and trainer time must track VOCAB, not
    // corpus. Encode adds one hash join of doc words against the
    // segmented vocab — the only corpus-sized stage.
    time(s"unigram_train_${mult}x") {
      val p = graft.operators.UnigramLm.trainPieces(
        docs, "text", maxPieceLen = 4, minCount = 4, vocabSize = 1024)
      println("  final pieces: " + p.count())
    }
    time(s"unigram_encode_${mult}x") {
      println("  encoded docs: " + graft.operators.UnigramLm.encode(
        docs, "text", Seq("doc_id"),
        maxPieceLen = 4, minCount = 4, vocabSize = 1024).count())
    }
    // --- keep-first substring rewrite (q265 shape): corpus ×mult with
    // exact-duplicate bodies — every copy family shares all ≥25-char
    // windows, so the keeper election runs at full pressure. The claim:
    // election is one extra min-struct field in the detection agg —
    // growth must match the cut-everywhere q252 path, never all-pairs.
    time(s"substring_keepfirst_${mult}x") {
      val cut = Dedup.removeDuplicatedSubstringsKeepFirst(
        docs, "doc_id", "text", minLen = 25)
      println("  docs losing text: " +
        cut.filter(col("removed_chars") > 0).count())
    }
    time("curve_layout_cost") {
      val li = Tables.lineitem(spark, dir)
        .select(col("l_orderkey"), col("l_linenumber"),
                col("l_partkey"), col("l_suppkey"))
      val t0 = System.nanoTime()
      graft.operators.ZOrder.layout(li, "l_partkey", "l_suppkey",
        col("l_orderkey") * 10 + col("l_linenumber"), 1000L).count()
      val t1 = System.nanoTime()
      graft.operators.Hilbert.layout(li, "l_partkey", "l_suppkey",
        col("l_orderkey") * 10 + col("l_linenumber"), 1000L).count()
      val t2 = System.nanoTime()
      println(f"  zorder ${(t1 - t0) / 1e9}%.2f s  hilbert ${(t2 - t1) / 1e9}%.2f s")
    }
    spark.stop()
  }
}
