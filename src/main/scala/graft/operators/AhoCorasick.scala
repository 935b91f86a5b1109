package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Multi-pattern dictionary scan — Aho-Corasick (1975), the automaton
  * every blocklist / PII-scrub / keyword-audit pass runs at corpus
  * scale: ALL matches of ALL patterns (overlaps included) in ONE pass
  * over each document, O(chars + matches), independent of dictionary
  * size. The naive alternatives both fail at scale: a regex
  * alternation recompiles the dictionary into a backtracking pattern
  * (and Spark's `rlike` can't emit per-pattern positions), and the
  * relational strategy — explode every |p|-gram and join the
  * dictionary — pays one explode PER DISTINCT PATTERN LENGTH and
  * shuffles position rows; the automaton scans once and shuffles only
  * match rows. (The relational form survives as the ORACLE strategy:
  * positional substring compares in SQL, engine-independent.)
  *
  * Construction is driver-side (the dictionary is curation metadata,
  * thousands of entries at most) and ships to executors via the
  * closure: goto/fail links as per-node hash maps, and each node's
  * EMIT list precomputed through the failure chain (out(n) = patterns
  * ending at n ∪ out(fail(n))), so the scan never walks fail links to
  * report — amortized O(1) per char plus O(1) per reported match.
  *
  * Determinism: match set is a pure function of (text, dictionary);
  * row order is not guaranteed (callers sort or aggregate).
  */
object AhoCorasick {

  /** Compiled automaton. `emit(n)` lists (patternIndex, length) for
    * every dictionary entry ending at node n, failure chain included.
    */
  final class Automaton private[AhoCorasick] (
      val next: Array[Map[Char, Int]],
      val fail: Array[Int],
      val emit: Array[List[(Int, Int)]]) extends Serializable {

    /** All matches in `text`: (patternIndex, endExclusive). */
    def matches(text: String): Iterator[(Int, Int)] = {
      var state = 0
      val out = List.newBuilder[(Int, Int)]
      var i = 0
      while (i < text.length) {
        val c = text.charAt(i)
        var s = state
        while (s != 0 && !next(s).contains(c)) s = fail(s)
        state = next(s).getOrElse(c, 0)
        emit(state).foreach { case (p, _) => out += ((p, i + 1)) }
        i += 1
      }
      out.result().iterator
    }
  }

  /** Default bound on total dictionary characters (= worst-case trie
    * nodes − 1). The automaton is built on the DRIVER and shipped in
    * the task closure, so its size is a per-executor memory and
    * broadcast cost: ~nodes × (per-node map + fail + emit) ≈ 100 B/char
    * upper bound → the default caps the shipped automaton near 400 MB
    * worst-case and far less on real dictionaries (shared prefixes
    * collapse nodes). The cap is LOUD, not silent ([[Isotonic]]'s
    * maxBlocks discipline): a 10⁷-entry dictionary should be sharded
    * into several passes deliberately, not OOM an executor.
    */
  val MaxPatternChars: Long = 1L << 22

  def compile(patterns: Seq[String],
              maxPatternChars: Long = MaxPatternChars): Automaton = {
    require(patterns.nonEmpty && patterns.forall(_.nonEmpty),
            "patterns must be non-empty strings")
    require(patterns.distinct.size == patterns.size,
            "duplicate patterns in dictionary")
    val totalChars = patterns.iterator.map(_.length.toLong).sum
    require(totalChars <= maxPatternChars,
      s"AhoCorasick: dictionary holds $totalChars pattern chars > cap " +
        s"$maxPatternChars — the driver-built automaton scales with " +
        "total pattern chars; raise maxPatternChars deliberately or " +
        "shard the dictionary into multiple passes")
    val next = scala.collection.mutable.ArrayBuffer(
      scala.collection.mutable.Map.empty[Char, Int])
    val ends = scala.collection.mutable.Map.empty[Int, List[Int]]
    patterns.zipWithIndex.foreach { case (p, pi) =>
      var n = 0
      p.foreach { c =>
        n = next(n).getOrElseUpdate(c, {
          next += scala.collection.mutable.Map.empty[Char, Int]
          next.length - 1
        })
      }
      ends(n) = pi :: ends.getOrElse(n, Nil)
    }
    val fail = Array.fill(next.length)(0)
    val emit = Array.fill(next.length)(List.empty[(Int, Int)])
    ends.foreach { case (n, ps) =>
      emit(n) = ps.map(pi => (pi, patterns(pi).length))
    }
    // BFS over the trie: child's fail = deepest proper suffix node;
    // emit lists accumulate through the fail chain once, here.
    val queue = scala.collection.mutable.Queue.empty[Int]
    next(0).values.foreach(queue.enqueue(_))
    while (queue.nonEmpty) {
      val n = queue.dequeue()
      next(n).foreach { case (c, child) =>
        var f = fail(n)
        while (f != 0 && !next(f).contains(c)) f = fail(f)
        fail(child) = if (next(f).getOrElse(c, 0) != child)
          next(f).getOrElse(c, 0) else 0
        queue.enqueue(child)
      }
      emit(n) = emit(n) ++ emit(fail(n))
    }
    new Automaton(next.map(_.toMap).toArray, fail, emit)
  }

  /** All dictionary matches per document, overlaps included:
    * (doc_id, pattern, start, len) with 1-based `start`. One narrow
    * mapPartitions pass; only match rows (never text) leave it.
    */
  def matchSpans(docs: DataFrame, idCol: String, textCol: String,
                 patterns: Seq[String],
                 maxPatternChars: Long = MaxPatternChars): DataFrame = {
    val spark = docs.sparkSession
    import spark.implicits._
    val auto = compile(patterns, maxPatternChars)
    val pats = patterns.toArray
    docs.select(col(idCol).cast("long"), col(textCol))
      .as[(Long, String)]
      .mapPartitions(_.flatMap { case (id, text) =>
        auto.matches(if (text == null) "" else text).map { case (pi, end) =>
          (id, pats(pi), (end - pats(pi).length + 1).toLong,
           pats(pi).length.toLong)
        }
      })
      .toDF("doc_id", "pattern", "start", "len")
  }

  /** Per-(doc, pattern) match counts — the blocklist-audit view. Docs
    * or patterns with zero matches are absent (no evidence ⇒ no row).
    */
  def matchCounts(docs: DataFrame, idCol: String, textCol: String,
                  patterns: Seq[String],
                  maxPatternChars: Long = MaxPatternChars): DataFrame =
    matchSpans(docs, idCol, textCol, patterns, maxPatternChars)
      .groupBy(col("doc_id"), col("pattern"))
      .agg(count(lit(1)).as("n_matches"))
}
