package graft.operators

import org.apache.spark.sql.{DataFrame, Row}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Distributed ISOTONIC REGRESSION (pool-adjacent-violators) over a
  * binary outcome — the published calibration method for turning a
  * classifier's raw scores into probabilities (Zadrozny & Elkan 2002;
  * the non-parametric alternative to Platt scaling, and the one that is
  * EXACT-ARITHMETIC friendly: every fitted value is the rational
  * mean pos/n of a block, so the output is gateable integers, no
  * sigmoid to floor).
  *
  * Algorithm (the Spark MLlib shape, re-derived): range-exchange the
  * (score, id) keys so partitions hold contiguous rank ranges, run the
  * classic PAV stack per partition (linear, partition-local), then
  * merge the per-partition BLOCK lists on the driver with one more PAV
  * pass. Hierarchical PAV is exact: the L2-isotonic fit is the unique
  * minimizer, per-partition pooling only pools rows the global fit
  * must also pool, and the driver pass restores every cross-boundary
  * pool — so the result is bit-identical to sequential PAV at any
  * partitioning (spec-proven). Blocks merge on >= (equal adjacent
  * means pool), so the block list is the fit's maximal level sets —
  * canonical, and exactly what an oracle recovers by grouping the
  * fitted function by value.
  *
  * Scale shape: the corpus crosses ONE range exchange (the same
  * any-total-sort cost q97/q203 pay); the per-partition pass is
  * streaming with O(blocks) memory; only BLOCK SUMMARIES (first key,
  * n, pos) reach the driver, capped loudly by `maxBlocks` — for binary
  * labels block counts are bounded by the distinct fitted values and
  * collapse fast under pooling, but the cap turns the adversarial
  * O(n)-blocks corpus into an error instead of a driver OOM. Driver
  * merge compares block means in BigInt (pos·n products overflow long
  * exactly at the 100 TB row counts this targets).
  *
  * Total order: ties in score break by id, so the fit is a
  * deterministic function of the data, not the partitioning.
  */
object Isotonic {

  /** One fitted block: `start_rank` (1-based global rank of its first
    * row), `n` rows, `n_pos` positive labels, and the floor-scaled
    * fitted probability `p_e6 = (1e6 * n_pos) div n`. Blocks are
    * emitted in rank order with strictly increasing means.
    */
  def isotonicBlocks(df: DataFrame, scoreCol: String, idCol: String,
                     labelCol: String,
                     maxBlocks: Int = 1 << 20): DataFrame = {
    val blocks = mergedBlocks(df, scoreCol, idCol, labelCol, maxBlocks)
    val spark = df.sparkSession
    var rank = 1L
    val rows = blocks.map { b =>
      val r = Row(rank, b.n, b.pos, 1000000L * b.pos / b.n)
      rank += b.n
      r
    }
    spark.createDataFrame(
      spark.sparkContext.parallelize(rows, 1),
      StructType(Seq(
        StructField("start_rank", LongType, nullable = false),
        StructField("n", LongType, nullable = false),
        StructField("n_pos", LongType, nullable = false),
        StructField("p_e6", LongType, nullable = false))))
  }

  /** Per-row calibrated view: every input row joined to its block's
    * fitted probability. The join is block-interval containment on the
    * (score, id) total order against the BROADCAST block list — blocks
    * are driver-merged summaries (≤ maxBlocks), so the corpus side
    * streams unshuffled; no global rank materialization is needed.
    */
  def calibrated(df: DataFrame, scoreCol: String, idCol: String,
                 labelCol: String,
                 maxBlocks: Int = 1 << 20): DataFrame = {
    val blocks = mergedBlocks(df, scoreCol, idCol, labelCol, maxBlocks)
    val spark = df.sparkSession
    // interval bounds: block i owns keys in [firstKey_i, firstKey_i+1);
    // the LAST block's upper bound is an explicit is-last flag, not a
    // MaxValue sentinel — a row keyed exactly (MaxValue, MaxValue) must
    // land in the last block, not vanish (ADVICE r10)
    val bounds = blocks.zipWithIndex.map { case (b, i) =>
      val next = if (i + 1 < blocks.length) Some(blocks(i + 1)) else None
      Row(b.score, b.id,
          next.map(_.score).getOrElse(0L),
          next.map(_.id).getOrElse(0L),
          next.isEmpty,
          1000000L * b.pos / b.n)
    }
    val bdf = spark.createDataFrame(
      spark.sparkContext.parallelize(bounds, 1),
      StructType(Seq(
        StructField("__s0", LongType, nullable = false),
        StructField("__i0", LongType, nullable = false),
        StructField("__s1", LongType, nullable = false),
        StructField("__i1", LongType, nullable = false),
        StructField("__last", BooleanType, nullable = false),
        StructField("p_e6", LongType, nullable = false))))
    // join on the SAME cast('long') keys mergedBlocks ranked — an
    // uncast non-long score/id would otherwise coerce differently here
    // than in the fit (ADVICE r10)
    val s = col(scoreCol).cast("long"); val i = col(idCol).cast("long")
    df.join(broadcast(bdf),
            (s > col("__s0") || (s === col("__s0") && i >= col("__i0"))) &&
            (col("__last") ||
             s < col("__s1") || (s === col("__s1") && i < col("__i1"))))
      .drop("__s0", "__i0", "__s1", "__i1", "__last")
  }

  private case class Block(score: Long, id: Long, n: Long, pos: Long)

  /** prev block pools with next iff mean(prev) >= mean(next); BigInt
    * cross-multiply keeps the compare exact at any block mass.
    */
  private def pools(prev: Block, next: Block): Boolean =
    BigInt(prev.pos) * next.n >= BigInt(next.pos) * prev.n

  private def pav(input: Iterator[Block]): List[Block] = {
    var stack = List.empty[Block] // head = rightmost block
    input.foreach { b =>
      var cur = b
      while (stack.nonEmpty && pools(stack.head, cur)) {
        val p = stack.head
        stack = stack.tail
        cur = Block(p.score, p.id, p.n + cur.n, p.pos + cur.pos)
      }
      stack = cur :: stack
    }
    stack.reverse
  }

  private def mergedBlocks(df: DataFrame, scoreCol: String, idCol: String,
                           labelCol: String, maxBlocks: Int): Seq[Block] = {
    val spark = df.sparkSession
    val p = spark.sessionState.conf.numShufflePartitions
    val keyed = df.select(col(scoreCol).cast("long").as("__s"),
                          col(idCol).cast("long").as("__i"),
                          col(labelCol).cast("long").as("__y"))
      .repartitionByRange(p, col("__s"), col("__i"))
      .sortWithinPartitions(col("__s"), col("__i"))
    // partition-local PAV; only (partitionIdx, blockIdx, summary) rows
    // leave the executors. RangePartitioner assigns increasing key
    // ranges to increasing partition ids, so (pidx, bidx) restores the
    // global block order on the driver.
    val partial = keyed.queryExecution.toRdd.mapPartitionsWithIndex {
      (pidx, rows) =>
        val it = rows.map { r =>
          val y = r.getLong(2)
          require(y == 0L || y == 1L, s"label must be 0/1, got $y")
          Block(r.getLong(0), r.getLong(1), 1L, y)
        }
        pav(it).iterator.zipWithIndex.map { case (b, j) => (pidx, j, b) }
    }.collect()
    require(partial.length <= maxBlocks,
      s"isotonic: ${partial.length} partial blocks exceed maxBlocks=" +
        s"$maxBlocks — raise the cap or pre-aggregate equal scores")
    pav(partial.sortBy(t => (t._1, t._2)).iterator.map(_._3))
  }
}
