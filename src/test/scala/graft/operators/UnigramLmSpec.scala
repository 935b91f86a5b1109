package graft.operators

import graft.SparkSpec

/** Contracts of [[UnigramLm]] — seed admission (chars always, minCount
  * + top-V multis, deterministic tie-break), Viterbi parity with a
  * sequential reference DP under the same packed (cost, n, i) order,
  * the hard-EM prune/refit, and document encode reassembly.
  */
class UnigramLmSpec extends SparkSpec {
  import spark.implicits._

  private val P = 4

  private def bits(x: Long): Long = 64L - java.lang.Long.numberOfLeadingZeros(x)

  /** Sequential reference Viterbi under the exact packed order. */
  private def refSegment(word: String, costs: Map[String, Long])
      : (Long, String) = {
    val n = word.length
    val bc = Array.fill(n + 1)(0L)
    val bn = Array.fill(n + 1)(0L)
    val bs = Array.fill(n + 1)("")
    for (j <- 1 to n) {
      var best = Long.MaxValue
      for (i <- math.max(0, j - P) until j) {
        val piece = word.substring(i, j)
        costs.get(piece).foreach { c =>
          val packed = (bc(i) + c) * 4294967296L + (bn(i) + 1) * 65536L + i
          if (packed < best) best = packed
        }
      }
      assert(best != Long.MaxValue, s"unreachable position $j in $word")
      val i = (best % 65536L).toInt
      bc(j) = best / 4294967296L
      bn(j) = (best / 65536L) % 65536L
      bs(j) = if (i == 0) word.substring(0, j)
              else bs(i) + "|" + word.substring(i, j)
    }
    (bn(n), bs(n))
  }

  private def docsOf(texts: Seq[String]) =
    texts.zipWithIndex.map { case (t, i) => (i + 1L, t) }
      .toDF("doc_id", "text")

  test("wordFreqs: whitespace split, empty and '|' words excluded, " +
       "multiplicity counted") {
    val wf = UnigramLm.wordFreqs(
        docsOf(Seq("ab ab  cd", "ab x|y", "")), "text")
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(wf == Map("ab" -> 3L, "cd" -> 1L))
  }

  test("seedVocab: all chars admitted, multis gated by minCount and " +
       "top-V with (count desc, piece asc) tie-break") {
    val seeds = Seq(("a", 10L), ("b", 1L), ("ab", 5L), ("ba", 5L),
                    ("abc", 5L), ("bc", 2L), ("zz", 1L))
      .toDF("piece", "c0")
    val v = UnigramLm.seedVocab(seeds, minCount = 3, vocabSize = 2)
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    // chars a, b always; multis >= 3: ab, ba, abc — top-2 by
    // (count desc, piece asc) = ab, abc ("ab" < "abc" < "ba")
    assert(v == Map("a" -> 10L, "b" -> 1L, "ab" -> 5L, "abc" -> 5L))
  }

  test("segmentWords matches the sequential reference DP on every " +
       "vocab word (random-ish corpus, both cost tables)") {
    val texts = Seq("banana bandana cabana", "ana ana nab",
                    "abracadabra banana", "cab cab cab nada")
    val docs = docsOf(texts)
    val wf = UnigramLm.wordFreqs(docs, "text")
    val v0 = UnigramLm.costs(UnigramLm.seedVocab(
      UnigramLm.seedCounts(wf, P), minCount = 2, vocabSize = 50))
    val costs = v0.collect()
      .map(r => r.getString(0) -> r.getLong(2)).toMap
    // the cost formula itself: bits(total) - bits(cnt) + 1
    val cnts = v0.collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    val total = cnts.values.sum
    cnts.foreach { case (p, c) =>
      assert(costs(p) == bits(total) - bits(c) + 1, s"cost of $p")
    }
    val got = UnigramLm.segmentWords(wf, v0, P)
      .collect().map(r => (r.getString(0), r.getLong(2), r.getString(3)))
    assert(got.nonEmpty)
    got.foreach { case (w, n, seg) =>
      val (rn, rseg) = refSegment(w, costs)
      assert((n, seg) == (rn, rseg), s"word $w")
      assert(seg.split("\\|").mkString == w) // segmentation covers word
    }
  }

  test("segmentWords fails loud on a foreign piece table: a word with " +
       "an uncovered char raises; a covered corpus is unchanged") {
    val docs = docsOf(Seq("abc abq"))
    val wf = UnigramLm.wordFreqs(docs, "text")
    // foreign piece table covering a, b, c — but not q
    val foreign = Seq(("a", 4L), ("b", 4L), ("c", 4L), ("ab", 3L))
      .toDF("piece", "cnt")
    val costs = UnigramLm.costs(foreign)
    val e = intercept[Exception] {
      UnigramLm.segmentWords(wf, costs, P).collect()
    }
    assert(e.getMessage != null &&
           e.getMessage.contains("no full piece cover"),
           s"wanted the loud cover error, got: ${e.getMessage}")
    // a word NONE of whose substrings match any piece (the old inner
    // join dropped it silently) also raises
    val wfQ = UnigramLm.wordFreqs(docsOf(Seq("qq")), "text")
    val e2 = intercept[Exception] {
      UnigramLm.segmentWords(wfQ, costs, P).collect()
    }
    assert(e2.getMessage.contains("no full piece cover"))
    // covered words still segment — restricting to the covered word
    // keeps the same output as before the guard
    val wfAbc = UnigramLm.wordFreqs(docsOf(Seq("abc")), "text")
    val got = UnigramLm.segmentWords(wfAbc, costs, P)
      .collect().map(r => (r.getString(0), r.getLong(2), r.getString(3)))
    assert(got.toSeq == Seq(("abc", 2L, "ab|c")))
  }

  test("hard-EM prune: an admitted multi the Viterbi never uses is " +
       "dropped; chars survive with add-one smoothing") {
    // 'xy' and 'yz' both seed from "xyz"; the DP picks one of the two
    // bigram splits deterministically, the loser must be pruned
    val docs = docsOf(Seq(("xyz " * 8).trim))
    val seeds = UnigramLm.seedCounts(UnigramLm.wordFreqs(docs, "text"), P)
      .collect().map(r => r.getString(0)).toSet
    assert(seeds.contains("xy") && seeds.contains("yz") &&
           seeds.contains("xyz"))
    val fin = UnigramLm.trainPieces(docs, "text", maxPieceLen = P,
                                    minCount = 2, vocabSize = 100)
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2)))
    val pieces = fin.map(_._1).toSet
    // "xyz" itself is in vocab and is the cheapest single segmentation
    // -> it is used; the partial bigrams are not -> pruned; chars kept
    // with smoothed count 1
    assert(pieces.contains("xyz"))
    assert(!pieces.contains("xy") && !pieces.contains("yz"))
    assert(Set("x", "y", "z").subsetOf(pieces))
    fin.filter(f => Set("x", "y", "z")(f._1))
      .foreach(f => assert(f._2 == 1L, s"char ${f._1} smoothing"))
  }

  test("encode: per-doc reassembly in word order, token counts summed, " +
       "wordless docs encode as '' with 0 tokens") {
    val docs = docsOf(Seq("banana cab banana", "", "cab"))
    val enc = UnigramLm.encode(docs, "text", Seq("doc_id"),
                               maxPieceLen = P, minCount = 2,
                               vocabSize = 50)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getString(2)))
      .sortBy(_._1)
    assert(enc.length == 3)
    val d1 = enc(0); val d2 = enc(1); val d3 = enc(2)
    assert(d2 == (2L, 0L, ""))
    val words1 = d1._3.split(" ")
    assert(words1.length == 3 && words1(0) == words1(2))
    assert(d1._3.endsWith(" " + words1(2)) &&
           words1(1).split("\\|").mkString == "cab")
    assert(d1._2 == words1.map(_.split("\\|").length.toLong).sum)
    assert(d3._3 == words1(1) && d3._2 == words1(1).split("\\|").length)
  }
}
