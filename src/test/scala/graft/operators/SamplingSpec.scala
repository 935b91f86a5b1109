package graft.operators

import org.apache.spark.sql.functions._

import graft.SparkSpec

class SamplingSpec extends SparkSpec {
  import spark.implicits._

  private val rows = (1L to 1000L).map(i =>
    (i, if (i % 2 == 0) "a" else "b")).toDF("id", "k")

  test("rate 100 keeps every row of its stratum, rate 0 / absent drops all") {
    val out = Sampling.stratified(rows, "k", "id", Map("a" -> 100))
    assert(out.count() === 500)
    assert(out.filter(col("k") === "b").count() === 0)
  }

  test("membership is deterministic and repartition-invariant") {
    val once = Sampling.stratified(rows, "k", "id", Map("a" -> 30, "b" -> 70))
      .select("id").as[Long].collect().toSet
    val again = Sampling
      .stratified(rows.repartition(13), "k", "id", Map("a" -> 30, "b" -> 70))
      .select("id").as[Long].collect().toSet
    assert(once === again, "sample membership must be a pure function of id")
    // rates are approximate per-stratum but md5 buckets are near-uniform:
    // 30% of 500 ± a loose band
    val nA = once.count(_ % 2 == 0)
    assert(nA > 100 && nA < 200, s"~30% of stratum a expected, got $nA")
  }

  test("a higher rate's sample is a superset of a lower rate's (nested holdouts)") {
    val lo = Sampling.stratified(rows, "k", "id", Map("a" -> 10, "b" -> 10))
      .select("id").as[Long].collect().toSet
    val hi = Sampling.stratified(rows, "k", "id", Map("a" -> 40, "b" -> 40))
      .select("id").as[Long].collect().toSet
    assert(lo.subsetOf(hi),
      "bucket-threshold sampling must nest: raising a rate only adds rows")
  }

  test("epochRepeat: integer factors repeat exactly; fractional part " +
       "adds one deterministic extra epoch; sub-1 factors downsample") {
    val df = rows.withColumn("f_e2",
      when(col("k") === "a", lit(300L)).otherwise(lit(40L)))
    val out = Sampling.epochRepeat(df, "id", "f_e2")
      .select("id", "k", "n_rep", "epoch").cache()
    // stratum a (factor 3.0): every row exactly 3 epochs, 0..2
    assert(out.filter(col("k") === "a").count() === 1500)
    assert(out.filter(col("k") === "a" && col("n_rep") =!= 3).count() === 0)
    assert(out.filter(col("k") === "a").agg(max("epoch")).head.getLong(0)
      === 2L)
    // stratum b (factor 0.4): kept rows have exactly one epoch, and the
    // kept set IS the stratified 40% sample (same md5 bucket rule)
    val bIds = out.filter(col("k") === "b")
      .select("id").as[Long].collect().toSet
    val strat = Sampling.stratified(
        rows.filter(col("k") === "b"), "k", "id", Map("b" -> 40))
      .select("id").as[Long].collect().toSet
    assert(bIds === strat,
      "fractional-epoch membership must equal the stratified sample")
    // determinism under repartition
    val again = Sampling
      .epochRepeat(df.repartition(11), "id", "f_e2")
      .select("id", "epoch").collect().map(r => (r.getLong(0), r.getLong(1)))
      .toSet
    assert(again === out.select("id", "epoch").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet)
    out.unpersist()
  }

  test("weightedSample: equals the brute-force priority order, is " +
       "repartition-invariant, and weights shift inclusion odds") {
    val df = rows.withColumn("w",
      when(col("k") === "a", lit(5L)).otherwise(lit(1L)))
    val got = Sampling.weightedSample(df, "id", "w", lcm = 10L, k = 100)
      .select("id", "priority").collect()
      .map(r => (r.getLong(0), r.getLong(1)))
    // brute-force replica of the priority rule
    def h32(s: String): Long = {
      val d = java.security.MessageDigest.getInstance("MD5")
        .digest(s.getBytes("UTF-8"))
      java.lang.Long.parseLong(d.take(4).map("%02x".format(_)).mkString, 16)
    }
    val want = (1L to 1000L)
      .map(i => (i, h32(i.toString) * (if (i % 2 == 0) 2L else 10L)))
      .sortBy(t => (t._2, t._1)).take(100)
    assert(got.sortBy(t => (t._2, t._1)).toSeq === want.toSeq)
    // 5x-weighted stratum a dominates the sample (expected ~5:1 mix)
    val nA = got.count(_._1 % 2 == 0)
    assert(nA > 65, s"expected weight-5 stratum to dominate, got $nA/100")
    val again = Sampling
      .weightedSample(df.repartition(17), "id", "w", lcm = 10L, k = 100)
      .select("id").as[Long].collect().toSet
    assert(again === got.map(_._1).toSet)
  }

  test("weightedSample: a weight that does not divide lcm fails loudly") {
    val df = rows.withColumn("w", lit(3L))
    val e = intercept[Exception] {
      Sampling.weightedSample(df, "id", "w", lcm = 10L, k = 5).collect()
    }
    assert(e.getMessage != null)
  }

  test("quantileTrim: keeps exactly the [lo,hi] percent-rank band per " +
       "group; singletons kept; band edges inclusive") {
    // group a: scores 1..11 (n=11, pr = (rank-1)/10) — [10,90] keeps
    // ranks 2..10; group b: one row, kept.
    val df = ((1 to 11).map(i => (i.toLong, "a", i.toLong)) :+
      ((99L, "b", 7L))).toDF("id", "g", "score")
    val out = Sampling.quantileTrim(df, "g", "score", "id", 10, 90)
      .select("id", "rank", "kept").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getBoolean(2)))
      .sortBy(_._1)
    val keptA = out.filter(t => t._1 <= 11 && t._3).map(_._2).sorted
    assert(keptA.toSeq === (2L to 10L).toSeq, s"got ${keptA.toSeq}")
    assert(out.find(_._1 == 99L).exists(_._3), "singleton group kept")
    // ties break on id: equal scores order deterministically
    val tied = Seq((1L, "t", 5L), (2L, "t", 5L), (3L, "t", 5L))
      .toDF("id", "g", "score")
    val ranks = Sampling.quantileTrim(tied, "g", "score", "id", 0, 100)
      .select("id", "rank").collect()
      .map(r => (r.getLong(0), r.getLong(1))).sortBy(_._1)
    assert(ranks.toSeq === Seq((1L, 1L), (2L, 2L), (3L, 3L)))
  }

  test("rebalanceToTarget: scarcest group bounds the scale; quotas " +
       "realize the mix; absent-from-target groups drop") {
    // a: 2 rows, b: 20 rows, c excluded. Target 50/50 → T = min(4, 40)
    // = 4 → quota 2 + 2.
    val df = ((1L to 2L).map(i => (i, "a")) ++
      (11L to 30L).map(i => (i, "b")) ++ Seq((99L, "c")))
      .toDF("id", "g")
    val out = Sampling.rebalanceToTarget(df, "g", "id",
        Map("a" -> 50, "b" -> 50))
      .collect()
      .map(r => (r.getLong(0), r.getString(1), r.getLong(2), r.getLong(3),
                 r.getBoolean(5)))
    val byG = out.groupBy(_._2)
    assert(byG("a").count(_._5) === 2)
    assert(byG("b").count(_._5) === 2)
    assert(byG("a").forall(_._4 == 2L) && byG("b").forall(_._4 == 2L))
    assert(byG("c").forall(t => !t._5 && t._4 == 0L))
    // kept set is deterministic under repartition
    val again = Sampling.rebalanceToTarget(df.repartition(7), "g", "id",
        Map("a" -> 50, "b" -> 50))
      .filter(col("kept")).select("id").as[Long].collect().toSet
    assert(again === out.filter(_._5).map(_._1).toSet)
  }

  test("rebalanceToTarget: rejects non-100 sums and non-positive shares") {
    val df = Seq((1L, "a")).toDF("id", "g")
    intercept[IllegalArgumentException] {
      Sampling.rebalanceToTarget(df, "g", "id", Map("a" -> 60, "b" -> 60))
    }
    intercept[IllegalArgumentException] {
      Sampling.rebalanceToTarget(df, "g", "id", Map("a" -> 100, "b" -> 0))
    }
  }

  test("out-of-range rates are rejected") {
    intercept[IllegalArgumentException] {
      Sampling.stratified(rows, "k", "id", Map("a" -> 101))
    }
    intercept[IllegalArgumentException] {
      Sampling.stratified(rows, "k", "id", Map("a" -> -1))
    }
  }

  test("isqrtExpr: exact on perfect squares, off-by-one traps, and the " +
       "2^51+ zone where the bare double floor goes wrong") {
    // k² − 1 cases with k² ≳ 2^51 are exactly where floor(sqrt(m))
    // alone returns k (the true root is within half an ulp of k);
    // the fixup must pull it back to k − 1.
    // 94906265² ≈ 9.0072e15 is the largest square under 2^53
    val ks = Seq(1L, 2L, 3L, 1000001L, 94906265L)
    val ms = ks.flatMap(k => Seq(k * k - 1, k * k, k * k + 1))
      .filter(_ >= 0) ++ Seq(0L, 1L, 2L, 3L, 5L, 99L)
    val df = ms.toDF("m")
      .withColumn("r", Sampling.isqrtExpr(col("m")))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    // reference via BigInt bisection to be unimpeachable
    def isqrtBig(m: Long): Long = {
      var lo = 0L; var hi = math.min(m, 3037000499L)
      while (lo < hi) {
        val mid = (lo + hi + 1) >>> 1
        if (BigInt(mid) * BigInt(mid) <= BigInt(m)) lo = mid else hi = mid - 1
      }
      lo
    }
    ms.foreach { m =>
      assert(df(m) === isqrtBig(m), s"isqrt($m)")
    }
  }

  test("smoothedQuotas: sums to budget exactly and upsamples the " +
       "low-resource source relative to raw proportion") {
    val df = ((1L to 9000L).map(i => (i, "big")) ++
              (9001L to 9100L).map(i => (i, "small")))
      .toDF("id", "src")
    val out = Sampling.smoothedQuotas(df, "src", budget = 1000000L)
      .collect().map(r => r.getAs[String]("source") ->
        r.get(r.fieldIndex("quota")).toString.toLong).toMap
    assert(out.values.sum === 1000000L)
    // raw shares: big 9000/9100 ≈ 98.9%; √-smoothed small share =
    // isqrt(1e8)/(isqrt(9e9)+isqrt(1e8)) = 10000/104868 ≈ 9.5% —
    // far above its 1.1% raw share
    val smallShare = out("small")
    assert(smallShare > 80000L && smallShare < 120000L,
      s"√-smoothing should give small ≈ 9.5%, got $smallShare")
  }

  test("smoothedQuotas: quota ratio matches the isqrt weights exactly " +
       "(largest-remainder on w = isqrt(n·1e6))") {
    val df = ((1L to 400L).map(i => (i, "a")) ++
              (401L to 500L).map(i => (i, "b")) ++
              (501L to 525L).map(i => (i, "c")))
      .toDF("id", "src")
    val out = Sampling.smoothedQuotas(df, "src", budget = 1000L)
      .collect().map(r => r.getAs[String]("source") ->
        r.get(r.fieldIndex("quota")).toString.toLong).toMap
    // weights: isqrt(400e6)=20000, isqrt(100e6)=10000, isqrt(25e6)=5000
    // → shares 1000·(4/7, 2/7, 1/7) = 571.43, 285.71, 142.86
    // floors 571, 285, 142 (sum 998), remainders .43, .71, .86 →
    // the two leftover seats go to c then b
    assert(out === Map("a" -> 571L, "b" -> 286L, "c" -> 143L))
    assert(out.values.sum === 1000L)
  }
}
