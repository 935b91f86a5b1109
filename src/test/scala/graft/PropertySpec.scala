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
}
