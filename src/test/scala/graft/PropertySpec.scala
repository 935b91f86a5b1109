package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import org.scalacheck.Gen
import org.scalacheck.rng.Seed

import graft.functions.{PortableHash, TextFunctions}
import graft.operators.{Dedup, GraphOps, TemporalOps}

/** Property-based checks (SURVEY.md §5): algebraic laws the operators
  * must satisfy on arbitrary inputs, not just fixtures. Raw ScalaCheck
  * generators driven from fixed seeds (no scalatest bridge in the offline
  * dependency set) — deterministic, so failures reproduce.
  */
class PropertySpec extends AnyFunSuite {

  private lazy val spark = SparkSpec.session
  import spark.implicits._

  /** Evaluate `f` over `n` deterministic samples of `gen`. */
  private def forSamples[A](gen: Gen[A], n: Int = 20)(f: A => Unit): Unit =
    (1 to n).foreach { i =>
      f(gen.pureApply(Gen.Parameters.default, Seed(i.toLong)))
    }

  private val word: Gen[String] = Gen.oneOf(
    "the", "cat", "sat", "on", "a", "mat", "und", "der", "el", "x1")
  private val wordLists: Gen[List[String]] =
    Gen.choose(0, 30).flatMap(k => Gen.listOfN(k, word))

  test("shingles: distinct ordered windows — matches a reference fold") {
    forSamples(wordLists.flatMap(w => Gen.choose(1, 4).map(w -> _))) {
      case (words, n) =>
        val viaSpark = Seq(words.mkString(" "))
          .toDF("text")
          .select(TextFunctions.shingles(col("text"), n))
          .as[Seq[String]].head()
        // reference model: sliding windows joined by spaces, first-seen
        // order. NB split(" ") of "" yields [""] (Spark/DuckDB semantics).
        val tokens = if (words.isEmpty) List("") else words
        val expected =
          if (tokens.length < n) Seq.empty
          else tokens.sliding(n).map(_.mkString(" ")).toSeq.distinct
        assert(viaSpark === expected, s"words=$words n=$n")
    }
  }

  test("minhash signature is order/multiplicity-invariant on the word set") {
    forSamples(wordLists.suchThat(_.nonEmpty)) { words =>
      val doubled = scala.util.Random.shuffle(words ++ words)
      val rows = Seq(words.mkString(" "), doubled.mkString(" "))
        .toDF("text")
        .select(Dedup.minhashSignature(
          TextFunctions.shingles(col("text"), 1), 16).as("sig"))
        .as[Seq[Long]].collect()
      assert(rows(0) === rows(1), s"words=$words")
      assert(rows(0).forall(v => v >= 0 && v < PortableHash.MinHashPrime))
    }
  }

  test("minhash: adding a shingle never raises any signature slot") {
    def sig(ws: Seq[String]): Seq[Long] =
      Seq(ws.mkString(" ")).toDF("text")
        .select(Dedup.minhashSignature(
          TextFunctions.shingles(col("text"), 1), 8))
        .as[Seq[Long]].head()
    forSamples(wordLists.suchThat(_.nonEmpty).flatMap(w => word.map(w -> _))) {
      case (words, extra) =>
        val base = sig(words)
        val more = sig(words :+ extra)
        assert(base.zip(more).forall { case (b, m) => m <= b },
          s"words=$words extra=$extra")
    }
  }

  test("exact dedup is idempotent: dedup(keepers) = identity") {
    forSamples(Gen.choose(1, 40).flatMap(k =>
        Gen.listOfN(k, Gen.oneOf("a", "b", "c", "d e f", ""))), n = 10) {
      texts =>
        val docs = texts.zipWithIndex
          .map { case (t, i) => (i.toLong, t) }.toDF("doc_id", "text")
        val once = Dedup.exactByContent(docs, "doc_id", "text")
        val keepers = docs.join(
          once.select(col("keep_id").as("doc_id")), Seq("doc_id"), "left_semi")
        val twice = Dedup.exactByContent(keepers, "doc_id", "text")
        // every group collapses to one keeper; re-deduping keeps them all
        assert(twice.count() === once.count())
        assert(twice.agg(sum(col("n_copies"))).as[Long].head() === once.count())
    }
  }

  test("asofJoin equals the brute-force max-below-threshold on random data") {
    val gen = for {
      nl <- Gen.choose(1, 15)
      nr <- Gen.choose(0, 15)
      lefts <- Gen.listOfN(nl, Gen.zip(Gen.choose(1L, 4L), Gen.choose(0L, 100L)))
      rights <- Gen.listOfN(nr, Gen.zip(Gen.choose(1L, 4L), Gen.choose(0L, 100L)))
    } yield (lefts, rights)
    forSamples(gen, n = 12) { case (lefts, rights) =>
      def ts(m: Long) = new java.sql.Timestamp(m * 60000)
      val left = lefts.zipWithIndex
        .map { case ((k, t), i) => (i.toLong, k, ts(t)) }
        .toDF("event_id", "k", "t")
      val right = rights.map { case (k, t) => (k, ts(t)) }.toDF("k", "rt")
      val got = graft.operators.TemporalOps
        .asofJoin(left, right, "k", "t", "rt")
        .select(col("event_id"), col("rt"))
        .as[(Long, Option[java.sql.Timestamp])].collect().toMap
      lefts.zipWithIndex.foreach { case ((k, t), i) =>
        val expected = rights.filter(r => r._1 == k && r._2 <= t)
          .map(_._2).maxOption.map(ts)
        assert(got(i.toLong) === expected,
          s"lefts=$lefts rights=$rights event=$i")
      }
    }
  }

  test("connectedComponents equals brute-force transitive closure") {
    val edgeGen = Gen.choose(0, 12).flatMap(k =>
      Gen.listOfN(k, Gen.zip(Gen.choose(1L, 10L), Gen.choose(1L, 10L))
        .suchThat(_ => true)))
    forSamples(edgeGen, n = 10) { rawEdges =>
      val edges = rawEdges.filter(e => e._1 != e._2)
      if (edges.nonEmpty) {
        val got = GraphOps
          .connectedComponents(edges.toDF("a", "b"), "a", "b")
          .as[(Long, Long)].collect().toMap
        // brute-force union-find
        val parent = scala.collection.mutable.Map[Long, Long]()
        def find(x: Long): Long = {
          val p = parent.getOrElseUpdate(x, x)
          if (p == x) x else { val r = find(p); parent(x) = r; r }
        }
        edges.foreach { case (a, b) =>
          val (ra, rb) = (find(a), find(b))
          if (ra != rb) parent(math.max(ra, rb)) = math.min(ra, rb)
        }
        val expected = parent.keys.map(v => v -> find(v)).toMap
        assert(got === expected, s"edges=$edges")
      }
    }
  }

  test("sessionize: session count = 1 + number of gaps over threshold") {
    val gaps: Gen[List[Long]] = Gen.choose(1, 25).flatMap(k =>
      Gen.listOfN(k, Gen.oneOf(1L, 10L, 100L, 5000L, 100000L)))
    forSamples(gaps, n = 15) { gs =>
      val times = gs.scanLeft(0L)(_ + _)
      val threshold = 999L // µs
      val rows = times.zipWithIndex.map { case (us, i) =>
        val ts = new java.sql.Timestamp(us / 1000)
        ts.setNanos(((us % 1000000) * 1000).toInt)
        (1L, i.toLong, ts)
      }
      val out = TemporalOps
        .sessionize(rows.toDF("k", "i", "t"), "k", "t", Seq("i"), threshold)
        .agg(max(col("session_id"))).as[Long].head()
      val expected = 1 + times.sliding(2)
        .count(p => p.length == 2 && p(1) - p(0) > threshold)
      assert(out === expected, s"gaps=$gs")
    }
  }

  test("scd2: intervals tile the key's span — from == previous to, one " +
       "open current row, interval count == run count") {
    val logs: Gen[List[(Long, String)]] = Gen.choose(1, 25).flatMap(k =>
      Gen.listOfN(k, Gen.zip(Gen.choose(0L, 20L),
                             Gen.oneOf("a", "b", "c"))))
    forSamples(logs, n = 15) { obs =>
      // distinct micro-times so the tie column is irrelevant here
      val rows = obs.zipWithIndex.map { case ((dt, v), i) =>
        val us = dt * 86400000000L + i * 1000L
        val ts = new java.sql.Timestamp(us / 1000)
        (1L, v, ts, i.toLong)
      }
      val out = TemporalOps.scd2(rows.toDF("k", "attr", "t", "i"),
                                 "k", "attr", "t", "i")
        .orderBy("valid_from_us")
        .collect()
        .map(r => (r.getString(1), r.getLong(2),
                   if (r.isNullAt(3)) None else Some(r.getLong(3))))
      // reference: collapse the (time, tie)-ordered stream into runs
      val ordered = rows.sortBy(r => (r._3.getTime, r._4)).map(_._2)
      val runs = ordered.foldLeft(List.empty[String]) {
        case (acc, v) if acc.headOption.contains(v) => acc
        case (acc, v) => v :: acc
      }.reverse
      assert(out.length === runs.length, s"obs=$obs")
      assert(out.map(_._1).toSeq === runs, s"obs=$obs")
      // tiling: each interval closes exactly where the next opens;
      // only the last is open-ended
      out.sliding(2).foreach {
        case Array((_, _, Some(to)), (_, from, _)) =>
          assert(to === from, s"gap/overlap in $obs")
        case _ =>
      }
      assert(out.last._3.isEmpty && out.init.forall(_._3.nonEmpty))
    }
  }

  test("containmentPairs equals the naive all-pairs join on random " +
       "corpora at random thresholds") {
    val corpora: Gen[(List[List[String]], (Int, Int))] = for {
      k <- Gen.choose(2, 12)
      docs <- Gen.listOfN(k, wordLists.suchThat(_.size >= 3))
      den <- Gen.choose(2, 10)
      num <- Gen.choose(1, den)
    } yield (docs, (num, den))
    forSamples(corpora, n = 10) { case (docs, (num, den)) =>
      val df = docs.zipWithIndex
        .map { case (ws, i) => (i.toLong, ws.mkString(" ")) }
        .toDF("doc_id", "text")
      def norm(d: org.apache.spark.sql.DataFrame) = d.collect()
        .map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
        .sortBy(t => (t._1, t._2)).toSeq
      val fast = norm(Dedup.containmentPairs(df, "doc_id", "text",
                                             2, num, den)
        .select("doc_a", "doc_b", "inter_cnt"))
      val sh = df.select(col("doc_id"),
          TextFunctions.shingles(col("text"), 2).as("sh"))
        .withColumn("sz", size(col("sh"))).filter(col("sz") > 0)
      val slow = norm(sh.select(col("doc_id").as("doc_a"),
                                col("sh").as("sa"), col("sz").as("za"))
        .crossJoin(sh.select(col("doc_id").as("doc_b"),
                             col("sh").as("sb")))
        .filter(col("doc_a") =!= col("doc_b"))
        .withColumn("inter_cnt",
          size(array_intersect(col("sa"), col("sb"))).cast("long"))
        .filter(col("inter_cnt") * den >= col("za") * num)
        .select("doc_a", "doc_b", "inter_cnt"))
      assert(fast === slow, s"docs=$docs t=$num/$den")
    }
  }
}
