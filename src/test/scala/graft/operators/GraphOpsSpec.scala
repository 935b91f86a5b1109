package graft.operators

import org.apache.spark.sql.functions.col

import graft.SparkSpec

class GraphOpsSpec extends SparkSpec {
  import spark.implicits._

  test("connectedComponents labels every vertex with its component min") {
    // components: {1,2,3,4} (chain + triangle), {10,11}, {20,21,22} (star)
    val edges = Seq(
      (1L, 2L), (2L, 3L), (3L, 1L), (3L, 4L),
      (10L, 11L),
      (20L, 21L), (20L, 22L)
    ).toDF("a", "b")
    val out = GraphOps.connectedComponents(edges, "a", "b")
      .as[(Long, Long)].collect().toMap
    assert(out === Map(
      1L -> 1L, 2L -> 1L, 3L -> 1L, 4L -> 1L,
      10L -> 10L, 11L -> 10L,
      20L -> 20L, 21L -> 20L, 22L -> 20L))
  }

  test("connectedComponents converges on a long path (diameter > 1 round)") {
    val edges = (1L until 12L).map(i => (i, i + 1)).toDF("a", "b")
    val out = GraphOps.connectedComponents(edges, "a", "b")
      .as[(Long, Long)].collect().toMap
    assert(out.size === 12)
    assert(out.values.toSet === Set(1L))
  }

  test("star contraction makes deep chains logarithmic, not linear") {
    // a 4096-hop path: plain min-propagation needs ~4096 rounds; the
    // alternating large-star/small-star rewiring contracts the path
    // geometrically (Kiveris et al. 2014)
    val n = 4096L
    val edges = spark.range(1, n).selectExpr("id AS a", "id + 1 AS b")
    val (out, rounds) =
      GraphOps.connectedComponentsWithStats(edges, "a", "b", maxIter = 30)
    assert(out.count() === n)
    assert(out.select("comp").distinct().count() === 1L)
    assert(rounds <= 16, s"expected O(log diameter) rounds, ran $rounds")
  }

  test("connectedComponents on an empty edge set returns empty, no NPE") {
    val edges = Seq.empty[(Long, Long)].toDF("a", "b")
    assert(GraphOps.connectedComponents(edges, "a", "b").count() === 0)
  }

  test("connectedComponents is idempotent for already-labeled components") {
    val edges = Seq((5L, 6L)).toDF("a", "b")
    val once = GraphOps.connectedComponents(edges, "a", "b")
      .as[(Long, Long)].collect().toSet
    assert(once === Set((5L, 5L), (6L, 5L)))
  }

  test("connectedComponents THROWS at maxIter instead of returning split labels") {
    // a 12-hop path cannot settle in 2 rounds; silent exit would hand
    // back wrong components — the contract is fail-loud
    val edges = (1L until 12L).map(i => (i, i + 1)).toDF("a", "b")
    val e = intercept[IllegalStateException] {
      GraphOps.connectedComponents(edges, "a", "b", maxIter = 2)
    }
    assert(e.getMessage.contains("did not converge"))
  }

  test("applyDedup keeps the min id per component and all unpaired docs") {
    val docs = (1L to 8L).toDF("doc_id")
    // components {1,2,3} and {5,6}; 4,7,8 unpaired
    val pairs = Seq((1L, 2L), (2L, 3L), (5L, 6L)).toDF("doc_a", "doc_b")
    val kept = Dedup.applyDedup(docs, "doc_id", pairs)
      .select("doc_id", "kept").as[(Long, Boolean)].collect().toMap
    assert(kept === Map(1L -> true, 2L -> false, 3L -> false, 4L -> true,
                        5L -> true, 6L -> false, 7L -> true, 8L -> true))
  }

  test("triangles: each triangle once (a<b<c); raw edges canonicalized") {
    // square 1-2-3-4 with diagonal 1-3 → triangles (1,2,3) and (1,3,4);
    // input deliberately messy: reversed dup edge, self-loop
    val edges = Seq((1L, 2L), (2L, 3L), (3L, 4L), (1L, 4L), (1L, 3L),
                    (3L, 1L), (2L, 2L)).toDF("u", "v")
    val got = GraphOps.triangles(edges, "u", "v")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
      .sortBy(identity)
    assert(got.toSeq === Seq((1L, 2L, 3L), (1L, 3L, 4L)))
  }

  test("triangles: K4 has C(4,3)=4; trees and stars have none") {
    val k4 = (for { a <- 1L to 4L; b <- 1L to 4L if a < b } yield (a, b))
      .toDF("u", "v")
    assert(GraphOps.triangles(k4, "u", "v").count() === 4L)
    val star = Seq((1L, 2L), (1L, 3L), (1L, 4L), (1L, 5L)).toDF("u", "v")
    assert(GraphOps.triangles(star, "u", "v").count() === 0L)
  }

  test("pageRank: symmetric 2-cycle sits at its exact integer fixed point") {
    // N=2: r0 = 5e11 each; contrib = (5e11*85)//100 = 4.25e11;
    // base = (1e12*15)//200 = 7.5e10; r1 = 5e11 = r0 — a fixed point,
    // so ANY iteration count must return exactly 5e11 for both nodes.
    val edges = Seq(("a", "b"), ("b", "a")).toDF("src", "dst")
    for (iters <- Seq(1, 5)) {
      val got = GraphOps.pageRank(edges, "src", "dst", iters)
        .collect().map(r => (r.getString(0), r.getLong(1))).sortBy(_._1)
      assert(got.toSeq === Seq(("a", 500000000000L), ("b", 500000000000L)),
             s"iterations=$iters")
    }
  }

  test("pageRank: hub of an in-star outranks leaves; mass never grows") {
    // leaves all point at the hub; hub dangles (mass drains, documented)
    val edges = (1L to 9L).map(i => (s"leaf$i", "hub")).toDF("src", "dst")
    val ranks = GraphOps.pageRank(edges, "src", "dst", iterations = 3)
      .collect().map(r => (r.getString(0), r.getLong(1))).toMap
    assert(ranks.size === 10)
    val hub = ranks("hub")
    assert((1L to 9L).forall(i => ranks(s"leaf$i") < hub))
    assert(ranks.values.map(BigInt(_)).sum <= BigInt(1000000000000L))
  }

  test("pageRank weighted: mass splits by exact weight ratios") {
    // a -> b (w=3), a -> c (w=1); one iteration, hand-derived:
    // r0 = 1e12/3 = 333333333333; base = 1.5e13/300 = 50000000000
    // b_in = (r0*85*3)//400 = 212499999999; c_in = (r0*85)//400
    //      = 70833333333
    val edges = Seq(("a", "b", 3L), ("a", "c", 1L))
      .toDF("src", "dst", "w")
    val got = GraphOps.pageRank(edges, "src", "dst", iterations = 1,
                                weightCol = Some("w"))
      .collect().map(r => (r.getString(0), r.getLong(1))).sortBy(_._1)
    assert(got.toSeq === Seq(
      ("a", 50000000000L),
      ("b", 262499999999L),
      ("c", 120833333333L)))
  }

  test("pageRank: all-ones weights reproduce the unweighted ranks exactly") {
    val raw = (0L until 120L).map(i => (s"n${i % 30}", s"n${(i * 11 + 5) % 30}"))
    val unweighted = GraphOps.pageRank(
        raw.toDF("src", "dst"), "src", "dst", iterations = 3)
      .collect().map(r => (r.getString(0), r.getLong(1))).sortBy(_._1)
    val weighted = GraphOps.pageRank(
        raw.map { case (s, d) => (s, d, 1L) }.toDF("src", "dst", "w"),
        "src", "dst", iterations = 3, weightCol = Some("w"))
      .collect().map(r => (r.getString(0), r.getLong(1))).sortBy(_._1)
    assert(weighted.toSeq === unweighted.toSeq)
  }

  test("clusteringCoefficients: clique 1e6, star 0, triangle+tail exact") {
    // K4: every node deg 3, in 3 triangles -> 2*3/(3*2) = 1 -> 1e6
    val k4 = (for { a <- 1L to 4L; b <- 1L to 4L if a < b } yield (a, b))
      .toDF("u", "v")
    val gotK4 = GraphOps.clusteringCoefficients(k4, "u", "v")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2),
                           r.getLong(3))).sortBy(_._1)
    assert(gotK4.forall { case (_, d, t, c) =>
      d == 3L && t == 3L && c == 1000000L })
    // triangle 1-2-3 with tail 3-4: node 3 deg 3, 1 triangle ->
    // 2/(3*2) = 333333; nodes 1,2 -> 1e6; leaf 4 deg 1 -> 0
    val tri = Seq((1L, 2L), (2L, 3L), (1L, 3L), (3L, 4L)).toDF("u", "v")
    val got = GraphOps.clusteringCoefficients(tri, "u", "v")
      .collect().map(r => (r.getLong(0), r.getLong(3))).toMap
    assert(got === Map(1L -> 1000000L, 2L -> 1000000L,
                       3L -> 333333L, 4L -> 0L))
  }

  test("hits: hand-derived scores on a 2-hub bipartite graph") {
    // h1 -> {a1, a2}; h2 -> {a2}. One iteration:
    // auth raw: a1 = 1e6, a2 = 2e6 -> normalized a1 = 500000, a2 = 1e6
    // hub raw: h1 = 1500000, h2 = 1000000 -> h1 = 1e6, h2 = 666666
    // Iteration 2 (fixed point): auth raw a1 = 1e6, a2 = 1666666 ->
    // a1 = 600000, a2 = 1e6; hub raw h1 = 1600000, h2 = 1e6 ->
    // h1 = 1e6, h2 = 625000
    val edges = Seq(("h1", "a1"), ("h1", "a2"), ("h2", "a2"))
      .toDF("src", "dst")
    val got = GraphOps.hits(edges, "src", "dst", iterations = 1)
      .collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2)))
      .sortBy(_._1)
    assert(got.toSeq === Seq(
      ("a1", 0L, 500000L), ("a2", 0L, 1000000L),
      ("h1", 1000000L, 0L), ("h2", 666666L, 0L)))
    val got2 = GraphOps.hits(edges, "src", "dst", iterations = 2)
      .collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2)))
      .sortBy(_._1)
    assert(got2.toSeq === Seq(
      ("a1", 0L, 600000L), ("a2", 0L, 1000000L),
      ("h1", 1000000L, 0L), ("h2", 625000L, 0L)))
  }

  test("hits: scores stay in [0, 1e6] and the max is exactly 1e6") {
    val edges = (0L until 80L)
      .map(i => (s"u${i % 16}", s"v${(i * 5 + 2) % 16}")).toDF("s", "d")
    val rows = GraphOps.hits(edges, "s", "d", iterations = 3).collect()
      .map(r => (r.getLong(1), r.getLong(2)))
    assert(rows.forall { case (h, a) =>
      h >= 0 && h <= 1000000 && a >= 0 && a <= 1000000 })
    assert(rows.map(_._1).max === 1000000L, "hub max normalizes to scale")
    assert(rows.map(_._2).max === 1000000L, "auth max normalizes to scale")
  }

  test("pageRank weighted: THROWS on zero/negative/null weights") {
    // a silent NULL-div would drop mass with no error — fail-loud instead
    val zero = Seq(("a", "b", 1L), ("b", "a", 0L)).toDF("src", "dst", "w")
    val e1 = intercept[IllegalArgumentException] {
      GraphOps.pageRank(zero, "src", "dst", 1, weightCol = Some("w"))
    }
    assert(e1.getMessage.contains("non-positive"))
    val neg = Seq(("a", "b", -3L)).toDF("src", "dst", "w")
    intercept[IllegalArgumentException] {
      GraphOps.pageRank(neg, "src", "dst", 1, weightCol = Some("w"))
    }
    val withNull = Seq(("a", "b", java.lang.Long.valueOf(2L)),
                       ("b", "a", null.asInstanceOf[java.lang.Long]))
      .toDF("src", "dst", "w")
    intercept[IllegalArgumentException] {
      GraphOps.pageRank(withNull, "src", "dst", 1, weightCol = Some("w"))
    }
  }

  test("pageRank weighted: THROWS with rescale hint when max_w would wrap int64") {
    // bound: totalUnits*dampNum*max_w <= int64max -> max_w <= ~1.08e5 at
    // the 1e12/85 defaults; 2e5 must throw, not silently wrap
    val edges = Seq(("a", "b", 200000L), ("b", "a", 1L))
      .toDF("src", "dst", "w")
    val e = intercept[IllegalArgumentException] {
      GraphOps.pageRank(edges, "src", "dst", 1, weightCol = Some("w"))
    }
    assert(e.getMessage.contains("Rescale"))
    // same weights under a rescaled totalUnits pass the gate
    assert(GraphOps.pageRank(edges, "src", "dst", 1,
             totalUnits = 1000000L, weightCol = Some("w")).count() === 2)
  }

  test("hits: THROWS when degree*scale*scale would wrap int64") {
    // scale=2e9 -> allowed max degree = int64max/4e18 = 2; in-degree 3
    // must fail loud before the recurrence wraps
    val edges = (1L to 3L).map(i => (s"h$i", "a")).toDF("s", "d")
    val e = intercept[IllegalArgumentException] {
      GraphOps.hits(edges, "s", "d", iterations = 1, scale = 2000000000L)
    }
    assert(e.getMessage.contains("Lower `scale`"))
    // the same graph at the default scale is fine
    assert(GraphOps.hits(edges, "s", "d", iterations = 1).count() === 4)
  }

  test("personalizedPageRank: hand-derived 2-cycle from a single seed") {
    // a <-> b, seed {a}, 1 iteration:
    // base = 1e12*15/100 = 1.5e11 (only a); r0: a = 1e12, b = 0
    // contrib: b gets (1e12*85)//100 = 8.5e11; a gets (0*85)//100 = 0
    // r1: a = 1.5e11, b = 8.5e11
    val edges = Seq(("a", "b"), ("b", "a")).toDF("src", "dst")
    val seeds = Seq("a").toDF("node")
    val got = GraphOps.personalizedPageRank(
        edges, "src", "dst", seeds, "node", iterations = 1)
      .collect().map(r => (r.getString(0), r.getLong(1))).sortBy(_._1)
    assert(got.toSeq === Seq(("a", 150000000000L), ("b", 850000000000L)))
  }

  test("personalizedPageRank: mass stays near the seed side of a barbell") {
    // two triangles bridged by one edge; seeding one triangle must rank
    // its members above every node of the far triangle
    val edges = (Seq(("a1", "a2"), ("a2", "a3"), ("a3", "a1"),
                     ("b1", "b2"), ("b2", "b3"), ("b3", "b1"),
                     ("a1", "b1"))
      ++ Seq(("a2", "a1"), ("a3", "a2"), ("a1", "a3"),
             ("b2", "b1"), ("b3", "b2"), ("b1", "b3"),
             ("b1", "a1"))).toDF("src", "dst")
    val ranks = GraphOps.personalizedPageRank(
        edges, "src", "dst", Seq("a1", "a2", "a3").toDF("node"), "node",
        iterations = 4)
      .collect().map(r => (r.getString(0), r.getLong(1))).toMap
    val aMin = Seq("a1", "a2", "a3").map(ranks).min
    val bMax = Seq("b1", "b2", "b3").map(ranks).max
    assert(aMin > bMax, s"seed side must outrank far side: $ranks")
    // unreachable-from-seeds is not possible here; total mass never grows
    assert(ranks.values.map(BigInt(_)).sum <= BigInt(1000000000000L))
  }

  test("personalizedPageRank: THROWS on absent or empty seed sets") {
    val edges = Seq(("a", "b")).toDF("src", "dst")
    val absent = intercept[IllegalArgumentException] {
      GraphOps.personalizedPageRank(edges, "src", "dst",
        Seq("zz").toDF("node"), "node", iterations = 1)
    }
    assert(absent.getMessage.contains("do not"))
    intercept[IllegalArgumentException] {
      GraphOps.personalizedPageRank(edges, "src", "dst",
        Seq.empty[String].toDF("node"), "node", iterations = 1)
    }
  }

  test("pageRank: result is partition-invariant") {
    val edges = (0L until 200L)
      .map(i => (s"n${i % 40}", s"n${(i * 7 + 3) % 40}"))
      .toDF("src", "dst")
    def run(df: org.apache.spark.sql.DataFrame) =
      GraphOps.pageRank(df, "src", "dst", iterations = 4)
        .collect().map(r => (r.getString(0), r.getLong(1))).sortBy(_._1)
    assert(run(edges).toSeq === run(edges.repartition(13)).toSeq)
  }

  private def lpa(edges: Seq[(Long, Long)], iters: Int): Map[Long, Long] =
    GraphOps.labelPropagation(edges.toDF("u", "v"), "u", "v", iters)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap

  test("labelPropagation: triangle plus pendant converges to min label") {
    // hand-derived: l1 = (1->2, 2->1, 3->1, 4->3); l2 = all 1
    val edges = Seq((1L, 2L), (1L, 3L), (2L, 3L), (3L, 4L))
    assert(lpa(edges, 1) === Map(1L -> 2L, 2L -> 1L, 3L -> 1L, 4L -> 3L))
    assert(lpa(edges, 2) === Map(1L -> 1L, 2L -> 1L, 3L -> 1L, 4L -> 1L))
    assert(lpa(edges, 3) === Map(1L -> 1L, 2L -> 1L, 3L -> 1L, 4L -> 1L))
  }

  test("labelPropagation: bridged cliques split into two communities") {
    // hand-derived 3-round trace: clique A keeps label 1, clique B
    // settles on label 3 (the bridge dragged A's round-1 label across)
    val edges = Seq((1L, 2L), (1L, 3L), (2L, 3L),
                    (10L, 11L), (10L, 12L), (11L, 12L), (3L, 10L))
    val got = lpa(edges, 3)
    assert(got === Map(1L -> 1L, 2L -> 1L, 3L -> 1L,
                       10L -> 3L, 11L -> 3L, 12L -> 3L))
  }

  test("labelPropagation: deterministic min-label tie-break, " +
       "partition-invariant") {
    // path 1-2-3: node 2 sees labels {1, 3} tied -> adopts 1
    assert(lpa(Seq((1L, 2L), (2L, 3L)), 1) ===
           Map(1L -> 2L, 2L -> 1L, 3L -> 2L))
    val edges = (0L until 300L).map(i => (i % 60, (i * 13 + 7) % 60))
    val df = edges.toDF("u", "v")
    def run(d: org.apache.spark.sql.DataFrame) =
      GraphOps.labelPropagation(d, "u", "v", 3)
        .collect().map(r => (r.getLong(0), r.getLong(1))).sortBy(_._1)
    assert(run(df).toSeq === run(df.repartition(13)).toSeq)
  }

  test("labelPropagation: fails loud on negative ids or zero iterations") {
    intercept[IllegalArgumentException] {
      lpa(Seq((-1L, 2L)), 1)
    }
    intercept[IllegalArgumentException] {
      lpa(Seq((1L, 2L)), 0)
    }
  }

  test("kCore peels the fringe and keeps the dense core with degrees") {
    // K4 on {1,2,3,4} plus a pendant path 4-5-6: 2-core = the K4
    // (peeling 6 drops 5's degree to 1, cascading 5 out, then 4 keeps
    // degree 3 inside the clique)
    val edges = Seq(
      (1L, 2L), (1L, 3L), (1L, 4L), (2L, 3L), (2L, 4L), (3L, 4L),
      (4L, 5L), (5L, 6L)
    ).toDF("a", "b")
    val (out, rounds) = GraphOps.kCoreWithStats(edges, "a", "b", k = 2)
    val m = out.as[(Long, Long)].collect().toMap
    assert(m === Map(1L -> 3L, 2L -> 3L, 3L -> 3L, 4L -> 3L))
    assert(rounds >= 2, s"pendant path must cascade over 2+ rounds: $rounds")
  }

  test("kCore: whole graph below k peels to empty; at k it survives") {
    val tri = Seq((1L, 2L), (2L, 3L), (3L, 1L)).toDF("a", "b")
    assert(GraphOps.kCore(tri, "a", "b", k = 3).isEmpty)
    assert(GraphOps.kCore(tri, "a", "b", k = 2).count() === 3L)
  }

  test("kCore is partitioning-invariant and ignores self-loops/dups") {
    val edges = (Seq((7L, 7L), (1L, 2L), (2L, 1L)) ++
      (0L until 200L).map(i => (i % 20, (i * 7 + 3) % 20))).toDF("a", "b")
    def run(d: org.apache.spark.sql.DataFrame) =
      GraphOps.kCore(d, "a", "b", k = 4)
        .collect().map(r => (r.getLong(0), r.getLong(1))).sortBy(_._1)
    val base = GraphOps.kCore(edges, "a", "b", k = 4)
    assert(base.filter("node = 7").isEmpty) // self-loop contributes nothing
    assert(run(edges).toSeq === run(edges.repartition(13)).toSeq)
  }

  test("bfsHops: min hop distance from the seed set, capped at maxHops") {
    // directed path 1->2->3->4->5 plus shortcut 1->4
    val edges = Seq((1L, 2L), (2L, 3L), (3L, 4L), (4L, 5L), (1L, 4L))
      .toDF("s", "d")
    val seeds = Seq(1L).toDF("node")
    val out = GraphOps.bfsHops(edges, "s", "d", seeds, "node", maxHops = 2)
      .as[(Long, Long)].collect().toMap
    // dist(4) = 1 via the shortcut, dist(5) = 2; 3 is at hop 2 as well
    assert(out === Map(1L -> 0L, 2L -> 1L, 4L -> 1L, 3L -> 2L, 5L -> 2L))
    // hop cap 1 excludes the 2-hop frontier entirely
    val capped = GraphOps.bfsHops(edges, "s", "d", seeds, "node", maxHops = 1)
      .as[(Long, Long)].collect().toMap
    assert(capped === Map(1L -> 0L, 2L -> 1L, 4L -> 1L))
  }

  test("bfsHops: multi-source takes the nearest seed; isolated seed kept") {
    val edges = Seq((1L, 2L), (2L, 3L), (10L, 3L)).toDF("s", "d")
    val seeds = Seq(1L, 10L, 99L).toDF("node")
    val out = GraphOps.bfsHops(edges, "s", "d", seeds, "node", maxHops = 3)
      .as[(Long, Long)].collect().toMap
    assert(out === Map(1L -> 0L, 10L -> 0L, 99L -> 0L,
                       2L -> 1L, 3L -> 1L))
  }

  test("weightedDistances: a longer-edge-count cheaper path wins once " +
       "rounds admit it; parallel edges take the min") {
    // 1->3 direct costs 10; 1->2->3 costs 2+3=5 but needs 2 rounds;
    // parallel 1->2 edges (2 and 7) resolve to 2
    val edges = Seq((1L, 3L, 10L), (1L, 2L, 7L), (1L, 2L, 2L),
                    (2L, 3L, 3L)).toDF("s", "d", "w")
    val seeds = Seq(1L).toDF("node")
    def run(r: Int) = GraphOps
      .weightedDistances(edges, "s", "d", "w", seeds, "node", r)
      .as[(Long, Long)].collect().toMap
    assert(run(1) === Map(1L -> 0L, 2L -> 2L, 3L -> 10L))
    assert(run(2) === Map(1L -> 0L, 2L -> 2L, 3L -> 5L))
    assert(run(3) === run(2)) // extra rounds are exact no-ops
  }

  test("perSeedHops keeps per-seed frontiers independent; min over " +
       "seeds reproduces bfsHops") {
    // 1->2->3->4 and 10->3: seed 1 reaches 3 in 2, seed 10 in 1 — the
    // merged bfsHops frontier would collapse that distinction
    val edges = Seq((1L, 2L), (2L, 3L), (3L, 4L), (10L, 3L))
      .toDF("s", "d")
    val seeds = Seq(1L, 10L).toDF("n")
    val per = GraphOps.perSeedHops(edges, "s", "d", seeds, "n", maxHops = 3)
      .as[(Long, Long, Long)].collect()
      .map { case (seed, node, h) => (seed, node) -> h }.toMap
    assert(per === Map(
      (1L, 1L) -> 0L, (1L, 2L) -> 1L, (1L, 3L) -> 2L, (1L, 4L) -> 3L,
      (10L, 10L) -> 0L, (10L, 3L) -> 1L, (10L, 4L) -> 2L))
    // collapsing per-seed labels with min == the merged-frontier bfs
    val merged = GraphOps
      .bfsHops(edges, "s", "d", seeds.toDF("node"), "node", maxHops = 3)
      .as[(Long, Long)].collect().toMap
    val collapsed = per.groupBy(_._1._2).map { case (n, m) =>
      n -> m.values.min }
    assert(collapsed === merged)
  }

  test("perSeedHops: hop cap truncates each seed's frontier separately; " +
       "eccentricity falls out as the per-seed max") {
    val edges = Seq((1L, 2L), (2L, 3L), (10L, 11L)).toDF("s", "d")
    val seeds = Seq(1L, 10L).toDF("n")
    val out = GraphOps.perSeedHops(edges, "s", "d", seeds, "n", maxHops = 1)
      .as[(Long, Long, Long)].collect()
    assert(out.toSet === Set((1L, 1L, 0L), (1L, 2L, 1L),
                             (10L, 10L, 0L), (10L, 11L, 1L)))
    val ecc = out.groupBy(_._1).map { case (s0, rows) =>
      s0 -> rows.map(_._3).max }
    assert(ecc === Map(1L -> 1L, 10L -> 1L))
  }

  test("perSeedHops: maxHops = 0 returns just the seeds at distance 0") {
    val edges = Seq((1L, 2L)).toDF("s", "d")
    val seeds = Seq(1L, 1L, 7L).toDF("n") // dup seed rows collapse
    val out = GraphOps.perSeedHops(edges, "s", "d", seeds, "n", maxHops = 0)
      .as[(Long, Long, Long)].collect().toSet
    assert(out === Set((1L, 1L, 0L), (7L, 7L, 0L)))
  }

  private def sigmaMap(edges: org.apache.spark.sql.DataFrame,
                       maxHops: Int): Map[String, (Long, Long)] =
    GraphOps.pathCounts(edges, "s", "d", seed = "a", maxHops = maxHops)
      .select(col("node"), col("dist"), col("sigma").cast("long"))
      .as[(String, Long, Long)].collect()
      .map { case (n, di, sg) => n -> (di, sg) }.toMap

  test("pathCounts: the BFS-DAG sigma recurrence — a diamond doubles, " +
       "the doubled count propagates, the hop cap truncates") {
    // diamond a->b->z, a->c->z, then tail z->t
    val edges = Seq(("a", "b"), ("a", "c"), ("b", "z"), ("c", "z"),
                    ("z", "t")).toDF("s", "d")
    val out = sigmaMap(edges, maxHops = 3)
    assert(out === Map("a" -> (0L, 1L), "b" -> (1L, 1L), "c" -> (1L, 1L),
                       "z" -> (2L, 2L), "t" -> (3L, 2L)))
    assert(!sigmaMap(edges, maxHops = 2).contains("t"))
  }

  test("pathCounts: settled nodes are excluded — a longer route to an " +
       "already-reached node never adds paths") {
    // triangle a->b, b->c, a->c: c settles at dist 1 / sigma 1; the
    // 2-edge route a->b->c is not shortest and must not contribute
    val edges = Seq(("a", "b"), ("b", "c"), ("a", "c")).toDF("s", "d")
    assert(sigmaMap(edges, maxHops = 3) ===
      Map("a" -> (0L, 1L), "b" -> (1L, 1L), "c" -> (1L, 1L)))
  }

  test("pathCounts: sigma multiplies with level width") {
    // a fans to 3 middles which all reach z: sigma(z) = 3
    val edges = Seq(("a", "m1"), ("a", "m2"), ("a", "m3"),
                    ("m1", "z"), ("m2", "z"), ("m3", "z")).toDF("s", "d")
    val out = sigmaMap(edges, maxHops = 2)
    assert(out("z") === ((2L, 3L)))
  }

  test("mergeComponents: new edges merge old components, labels match " +
       "the batch recompute exactly (incl. min-ids and new nodes)") {
    // old graph: {1,2,3} and {10,11} and {20,21}; new edges bridge
    // 3-10 (merging two old components), add 30-31 (brand-new nodes),
    // and touch nothing in {20,21} (must keep its old label)
    val oldE = Seq((1L, 2L), (2L, 3L), (10L, 11L), (20L, 21L))
      .toDF("a", "b")
    val newE = Seq((3L, 10L), (30L, 31L)).toDF("a", "b")
    val labels = GraphOps.connectedComponents(oldE, "a", "b")
      .toDF("id", "comp")
    val inc = GraphOps.mergeComponents(labels, newE, "a", "b")
      .as[(Long, Long)].collect().toMap
    val batch = GraphOps.connectedComponents(
        oldE.unionByName(newE), "a", "b")
      .as[(Long, Long)].collect().toMap
    assert(inc === batch)
    assert(inc(11L) === 1L, "merged component takes the global min id")
    assert(inc(21L) === 20L, "untouched component keeps its label")
    assert(inc(31L) === 30L, "new-node-only edges are labeled")
  }

  test("mergeComponents with no new edges is the identity") {
    val oldE = Seq((1L, 2L), (5L, 6L)).toDF("a", "b")
    val labels = GraphOps.connectedComponents(oldE, "a", "b")
      .toDF("id", "comp")
    val none = Seq.empty[(Long, Long)].toDF("a", "b")
    val inc = GraphOps.mergeComponents(labels, none, "a", "b")
      .as[(Long, Long)].collect().toMap
    assert(inc === Map(1L -> 1L, 2L -> 1L, 5L -> 5L, 6L -> 5L))
  }

  test("weightedDistances refuses negative or null weights") {
    val seeds = Seq(1L).toDF("node")
    intercept[IllegalArgumentException] {
      GraphOps.weightedDistances(
        Seq((1L, 2L, -1L)).toDF("s", "d", "w"), "s", "d", "w",
        seeds, "node", 2)
    }
    intercept[IllegalArgumentException] {
      GraphOps.weightedDistances(
        Seq((1L, 2L, Option.empty[Long])).toDF("s", "d", "w"),
        "s", "d", "w", seeds, "node", 2)
    }
  }
}
