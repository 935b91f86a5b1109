package graft.operators

import graft.SparkSpec

/** Contracts of [[Isotonic]] — distributed PAV: hand-verified blocks,
  * bit-identical results at any partitioning (the hierarchical-merge
  * soundness claim), the per-row calibrated view, equal-mean pooling,
  * and the 0/1 label guard.
  */
class IsotonicSpec extends SparkSpec {
  import spark.implicits._

  private def blocksOf(rows: Seq[(Long, Long, Long)]) =
    Isotonic.isotonicBlocks(rows.toDF("score", "id", "y"),
                            "score", "id", "y")
      .collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
      .toSeq

  /** Sequential reference PAV with exact cross-multiplied compares. */
  private def seqPav(ys: Seq[Long]): Seq[(Long, Long, Long, Long)] = {
    var stack = List.empty[(Long, Long)] // (n, pos), head = rightmost
    ys.foreach { y =>
      var cur = (1L, y)
      while (stack.nonEmpty &&
             BigInt(stack.head._2) * cur._1 >= BigInt(cur._2) * stack.head._1) {
        val p = stack.head; stack = stack.tail
        cur = (p._1 + cur._1, p._2 + cur._2)
      }
      stack = cur :: stack
    }
    var rank = 1L
    stack.reverse.map { case (n, pos) =>
      val r = (rank, n, pos, 1000000L * pos / n); rank += n; r
    }
  }

  test("hand example pools exactly the PAV blocks") {
    val ys = Seq(1L, 0L, 0L, 1L, 0L, 1L, 1L)
    val rows = ys.zipWithIndex.map { case (y, i) => (i + 1L, i + 1L, y) }
    assert(blocksOf(rows) == Seq((1L, 3L, 1L, 333333L),
                                 (4L, 2L, 1L, 500000L),
                                 (6L, 2L, 2L, 1000000L)))
    assert(blocksOf(rows) == seqPav(ys))
  }

  test("equal adjacent means pool (maximal level sets), monotone " +
       "labels stay separate") {
    assert(blocksOf(Seq((1L, 1L, 0L), (2L, 2L, 1L), (3L, 3L, 0L),
                        (4L, 4L, 1L))) ==
      Seq((1L, 1L, 0L, 0L), (2L, 2L, 1L, 500000L), (4L, 1L, 1L, 1000000L)))
    // y = [1, 1, 0, 0, 1, 1]: the middle zeros drag everything left of
    // them into one mean-1/2 block; trailing ones stay above.
    assert(blocksOf((1 to 6).map(i =>
      (i.toLong, i.toLong, if (i == 3 || i == 4) 0L else 1L))) ==
      seqPav(Seq(1L, 1L, 0L, 0L, 1L, 1L)))
  }

  test("result is bit-identical at any partitioning and matches the " +
       "sequential reference on a 300-row fixture") {
    // deterministic pseudo-labels with long same-label runs and ties
    // in nothing (ids unique); scores NON-unique to exercise the id
    // tie-break in the total order
    val rows = (1 to 300).map { i =>
      val y = if ((i * i) % 7 < 3) 0L else 1L
      ((i % 50).toLong, i.toLong, y)
    }
    val sortedYs = rows.sortBy(t => (t._1, t._2)).map(_._3)
    val expected = seqPav(sortedYs)
    val before = spark.conf.get("spark.sql.shuffle.partitions")
    try {
      spark.conf.set("spark.sql.shuffle.partitions", "3")
      val at3 = blocksOf(rows)
      spark.conf.set("spark.sql.shuffle.partitions", "17")
      val at17 = blocksOf(scala.util.Random.shuffle(rows))
      assert(at3 == expected)
      assert(at17 == expected)
    } finally spark.conf.set("spark.sql.shuffle.partitions", before)
  }

  test("calibrated view assigns every row its block's fitted value") {
    val ys = Seq(1L, 0L, 0L, 1L, 0L, 1L, 1L)
    val rows = ys.zipWithIndex.map { case (y, i) => (i + 1L, i + 1L, y) }
    val got = Isotonic.calibrated(rows.toDF("score", "id", "y"),
                                  "score", "id", "y")
      .select("id", "p_e6").collect()
      .map(r => (r.getLong(0), r.getLong(1))).sortBy(_._1).toSeq
    assert(got == Seq(1L -> 333333L, 2L -> 333333L, 3L -> 333333L,
                      4L -> 500000L, 5L -> 500000L,
                      6L -> 1000000L, 7L -> 1000000L))
  }

  test("calibrated keeps the exact (Long.MaxValue, Long.MaxValue) key " +
       "and coerces non-long keys like the fit does") {
    // the last block's old exclusive-MaxValue sentinel silently dropped
    // a row keyed exactly at the sentinel (ADVICE r10)
    val rows = Seq((1L, 1L, 0L), (2L, 2L, 1L),
                   (Long.MaxValue, Long.MaxValue, 1L))
    val got = Isotonic.calibrated(rows.toDF("score", "id", "y"),
                                  "score", "id", "y")
      .select("id", "p_e6").collect()
      .map(r => (r.getLong(0), r.getLong(1))).sortBy(_._1).toSeq
    assert(got.map(_._1) == Seq(1L, 2L, Long.MaxValue)) // nothing dropped
    assert(got == Seq(1L -> 0L, 2L -> 1000000L,
                      Long.MaxValue -> 1000000L))
    // int-typed keys: the containment join must coerce with the same
    // cast('long') the fit ranks on — every row lands in a block
    val intRows = Seq((1, 1, 0L), (2, 2, 1L), (3, 3, 1L))
      .toDF("score", "id", "y")
    val n = Isotonic.calibrated(intRows, "score", "id", "y").count()
    assert(n == 3L)
  }

  test("non-binary labels fail loudly") {
    val ex = intercept[org.apache.spark.SparkException] {
      blocksOf(Seq((1L, 1L, 2L)))
    }
    assert(ex.getMessage.contains("label") ||
           ex.getCause != null)
  }
}
