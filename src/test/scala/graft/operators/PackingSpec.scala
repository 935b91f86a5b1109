package graft.operators

import org.apache.spark.sql.functions._

import graft.SparkSpec

/** Contracts of [[Packing]]: chop-layout window arithmetic, next-fit
  * fill invariants (no split docs, no overfull multi-doc sequence,
  * contiguous offsets), per-shard state isolation, and determinism
  * across partition counts.
  */
class PackingSpec extends SparkSpec {
  import spark.implicits._

  test("chopPack: straddling docs report every window they touch") {
    // stream: 100 + 50 + 200 + 6 tokens, ctx 128
    val df = Seq((0L, 100L), (1L, 50L), (2L, 200L), (3L, 6L))
      .toDF("doc_id", "toks")
    val got = Packing.chopPack(df, "toks", Seq("doc_id"), ctxLen = 128L)
      .select("doc_id", "start_tok", "first_seq", "last_seq", "n_seqs",
              "off_in_seq")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2),
                           r.getLong(3), r.getLong(4), r.getLong(5)))
      .sortBy(_._1)
    assert(got.toSeq == Seq(
      (0L, 0L, 0L, 0L, 1L, 0L),     // [0,100) inside window 0
      (1L, 100L, 0L, 1L, 2L, 100L), // [100,150) straddles 0→1
      (2L, 150L, 1L, 2L, 2L, 22L),  // [150,350) straddles 1→2
      (3L, 350L, 2L, 2L, 1L, 94L)), // [350,356) inside window 2
      s"got ${got.toSeq}")
  }

  test("packNextFit: overflow closes the sequence; oversize doc gets " +
       "its own overfull sequence; shards are independent") {
    val df = Seq(
      // shard 0: 100 fits, 50 overflows → seq 1, 200 (oversize) → seq 2,
      // 6 overflows the overfull seq → seq 3
      (0L, 0L, 100L), (0L, 2L, 50L), (0L, 4L, 200L), (0L, 6L, 6L),
      // shard 1 restarts at seq 0 regardless of shard 0's state
      (1L, 1L, 128L), (1L, 3L, 1L))
      .toDF("shard", "doc_id", "toks")
    val got = Packing
      .packNextFit(df, "doc_id", "toks", "shard", ctxLen = 128L)
      .collect().map(r => (r.getLong(0), r.getLong(1),
                           r.getLong(3), r.getLong(4)))
      .sortBy(t => (t._1, t._2))
    assert(got.toSeq == Seq(
      (0L, 0L, 0L, 0L), (0L, 2L, 1L, 0L), (0L, 4L, 2L, 0L),
      (0L, 6L, 3L, 0L),
      (1L, 1L, 0L, 0L), (1L, 3L, 1L, 0L)), s"got ${got.toSeq}")
  }

  test("packNextFit invariants hold on arbitrary data and any " +
       "partitioning") {
    val rows = Seq.tabulate(300) { i =>
      (i.toLong % 5L, i.toLong, 1L + (i * 37 % 90).toLong)
    }
    val ctx = 100L
    def run(parts: Int) = Packing
      .packNextFit(rows.toDF("shard", "doc_id", "toks").repartition(parts),
                   "doc_id", "toks", "shard", ctx)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2),
                           r.getLong(3), r.getLong(4)))
    val got = run(7)
    // determinism across input partitioning
    assert(got.toSet == run(2).toSet)
    // per-(shard, seq): offsets contiguous from 0, fill ≤ ctx unless the
    // sequence holds a single oversize doc
    got.groupBy(t => (t._1, t._4)).foreach { case ((sh, seq), ds) =>
      val sorted = ds.sortBy(_._2)
      var fill = 0L
      sorted.foreach { case (_, id, toks, _, off) =>
        assert(off == fill, s"gap in shard $sh seq $seq at id $id")
        fill += toks
      }
      assert(fill <= ctx || ds.length == 1,
        s"overfull multi-doc sequence $sh/$seq: $fill")
    }
    // no doc lost or duplicated
    assert(got.map(_._2).sorted.toSeq == rows.map(_._2).sorted)
  }
}
