package graft.operators

import org.apache.spark.sql.{DataFrame, Encoders, Row}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.LongType
import graft.GraftOps._

/** Distributed global prefix sum — a running total over a GLOBAL order
  * without ever putting the data through a single-partition window (the
  * classic scale-killer: `Window.orderBy(...)` with no partitionBy pulls
  * the whole table through one task).
  *
  * Shape (the textbook two-phase scan, expressed Spark-first):
  *  1. `repartitionByRange(orderCols)` — ONE full-data shuffle, the same
  *     exchange a global sort pays; partition i holds a contiguous key
  *     range below partition i+1's. The ranged data is PERSISTED before
  *     anything reads it: the totals pass and the output pass must see
  *     the SAME partitioning, and deriving both from one lazy plan would
  *     hinge on the optimizer's exchange-reuse (RangePartitioner samples
  *     per execution — two independent executions may split boundary
  *     rows differently, silently corrupting the offsets). A cache makes
  *     the agreement structural, not an optimizer outcome.
  *  2. Per-partition totals: one hash aggregate on
  *     `spark_partition_id()` (numParts result rows), COLLECTED, and
  *     prefix-summed on the driver into exclusive offsets — k rows of
  *     control-plane arithmetic, broadcast-joined back.
  *  3. `sortWithinPartitions` + one `mapPartitions` pass accumulating
  *     value + offset. This is the deliberate `mapPartitions` exception:
  *     a running accumulator per physical partition is genuinely
  *     imperative per-partition logic — a window on partition id would
  *     re-shuffle the full data a second time just to group what is
  *     already co-located.
  *
  * The operator is EAGER: the result is materialized (localCheckpoint)
  * so the ranged cache can be released deterministically instead of
  * leaking until driver GC. The materialized result is sized like the
  * input — the same order of storage the range shuffle itself already
  * wrote.
  *
  * Determinism contract: `orderCols` must be a TOTAL order (add a unique
  * tie-break column); `valueCol` must be integral (cast upstream), nulls
  * count as 0.
  */
object PrefixSum {

  /** Appends `cumCol` (long): the inclusive running sum of `valueCol`
    * over the global `orderCols` order. Output rows keep `df`'s columns
    * (in order) and arrive range-partitioned and sorted by `orderCols`.
    */
  def runningTotal(df: DataFrame, valueCol: String, orderCols: Seq[String],
                   cumCol: String = "cum", numParts: Int = 0): DataFrame = {
    require(orderCols.nonEmpty, "orderCols must be non-empty")
    val reserved = Set("__pid", "__off")
    val clash = df.columns.toSet.intersect(reserved + cumCol)
    require(clash.isEmpty,
      s"input columns collide with reserved/output names: $clash")
    val parts =
      if (numParts > 0) numParts
      else df.sparkSession.sessionState.conf.numShufflePartitions
    val order = orderCols.map(col)
    val ranged = df
      .repartitionByRange(parts, order: _*)
      .withColumn("__pid", spark_partition_id())
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    try {
      // per-pid totals → driver-side exclusive prefix (numParts rows of
      // control-plane arithmetic; the collect also materializes the
      // cache, pinning partition ids for the output pass)
      val totals = ranged
        .groupBy(col("__pid"))
        .agg(sum(coalesce(col(valueCol).cast(LongType), lit(0L))).as("__t"))
        .collect().map(r => r.getInt(0) -> r.getLong(1))
        .sortBy(_._1)
      val offsets = totals
        .scanLeft((0, 0L, 0L)) { case ((_, _, cum), (pid, t)) =>
          (pid, cum, cum + t)
        }
        .drop(1).map { case (pid, off, _) => (pid, off) }
      val spark = df.sparkSession
      import spark.implicits._
      val offsetsDf = offsets.toSeq.toDF("__pid2", "__off")

      val joined = ranged
        .join(broadcast(offsetsDf), col("__pid") === col("__pid2"), "left")
        .drop("__pid2")
        .sortWithinPartitions(order: _*)

      val keepIdx = df.columns.map(joined.schema.fieldIndex)
      val vIdx = joined.schema.fieldIndex(valueCol)
      val offIdx = joined.schema.fieldIndex("__off")
      val outSchema = org.apache.spark.sql.types.StructType(
        df.schema.fields :+
          org.apache.spark.sql.types.StructField(cumCol, LongType, false))
      joined.mapPartitions { it =>
        var acc = 0L
        var off = 0L
        var first = true
        it.map { r =>
          if (first) { // same __off for every row of the partition
            off = if (r.isNullAt(offIdx)) 0L else r.getLong(offIdx)
            first = false
          }
          acc += (if (r.isNullAt(vIdx)) 0L
                  else r.get(vIdx).asInstanceOf[Number].longValue)
          Row.fromSeq(keepIdx.map(r.get).toIndexedSeq :+ (acc + off))
        }
      }(Encoders.row(outSchema))
        .graftCheckpoint() // materialize before releasing the cache
    } finally ranged.unpersist()
  }

  /** DENSE RANK over the global `orderCols` order in ONE range
    * exchange — no distinct + rank + join-back round trip, and never a
    * single-partition window. Same two-phase scan as [[runningTotal]]:
    *
    *  1. range-partition + persist (the agreement-is-structural cache);
    *  2. one sorted per-partition pass emits a single boundary row
    *     (distinct-key count, first key, last key) per partition —
    *     control-plane sized; the driver prefix-sums the counts into
    *     exclusive offsets, subtracting 1 whenever a partition's first
    *     key EQUALS the last key of the nearest non-empty partition
    *     before it (a key run crossing the boundary must not be
    *     double-counted);
    *  3. one sorted output pass assigns local dense indexes + offset.
    *
    * The rank of a key is therefore exactly `dense_rank() OVER (ORDER
    * BY orderCols)` — 1-based, gap-free — at any partitioning.
    */
  def denseRank(df: DataFrame, orderCols: Seq[String],
                rankCol: String = "rank", numParts: Int = 0): DataFrame = {
    require(orderCols.nonEmpty, "orderCols must be non-empty")
    val reserved = Set("__pid", "__off")
    val clash = df.columns.toSet.intersect(reserved + rankCol)
    require(clash.isEmpty,
      s"input columns collide with reserved/output names: $clash")
    val parts =
      if (numParts > 0) numParts
      else df.sparkSession.sessionState.conf.numShufflePartitions
    val order = orderCols.map(col)
    val ranged = df
      .repartitionByRange(parts, order: _*)
      .withColumn("__pid", spark_partition_id())
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    try {
      // boundary keys cross the wire as STRING renderings — exact for
      // the integral/string keys this primitive serves (rank keys,
      // hashes); reject anything float-ish loudly.
      df.schema.fields.filter(f => orderCols.contains(f.name)).foreach {
        f => require(
          f.dataType == LongType ||
            f.dataType == org.apache.spark.sql.types.IntegerType ||
            f.dataType == org.apache.spark.sql.types.StringType,
          s"denseRank order column ${f.name} must be integral or " +
            s"string, got ${f.dataType.sql}")
      }
      val keyIdxForBoundary = orderCols.map(ranged.schema.fieldIndex)
      val pidIdxB = ranged.schema.fieldIndex("__pid")
      // one boundary row per non-empty partition:
      // (pid, nDistinct, firstKey, lastKey)
      val boundaries = ranged
        .sortWithinPartitions(order: _*)
        .mapPartitions { it =>
          if (!it.hasNext) Iterator.empty
          else {
            val first = it.next()
            // null encodes DISTINCTLY from the string "null": a prefix
            // byte ('N' for SQL null, 'V' + rendering for a value)
            // keeps a nullable string column's null and literal "null"
            // as two keys at the boundary (ADVICE r10)
            def key(r: Row): Seq[String] =
              keyIdxForBoundary.map(i =>
                if (r.isNullAt(i)) "N" else "V" + String.valueOf(r.get(i)))
            val firstKey = key(first)
            var lastKey = firstKey
            val pid = first.getInt(pidIdxB)
            var n = 1L
            it.foreach { r =>
              val k = key(r)
              if (k != lastKey) { n += 1; lastKey = k }
            }
            Iterator(Row(pid, n, firstKey, lastKey))
          }
        }(Encoders.row(org.apache.spark.sql.types.StructType(Seq(
          org.apache.spark.sql.types.StructField("pid",
            org.apache.spark.sql.types.IntegerType, false),
          org.apache.spark.sql.types.StructField("n", LongType, false),
          org.apache.spark.sql.types.StructField("fk",
            org.apache.spark.sql.types.ArrayType(
              org.apache.spark.sql.types.StringType), true),
          org.apache.spark.sql.types.StructField("lk",
            org.apache.spark.sql.types.ArrayType(
              org.apache.spark.sql.types.StringType), true)))))
        .collect()
      val sorted = boundaries.sortBy(_.getInt(0))
      var cum = 0L
      var prevLast: AnyRef = null
      val offsets = sorted.map { r =>
        val pid = r.getInt(0)
        val fk = r.get(2)
        val shared = prevLast != null && prevLast == fk
        val off = cum - (if (shared) 1L else 0L)
        cum = off + r.getLong(1)
        prevLast = r.get(3).asInstanceOf[AnyRef]
        (pid, off)
      }
      val spark = df.sparkSession
      import spark.implicits._
      val offsetsDf = offsets.toSeq.toDF("__pid2", "__off")
      val joined = ranged
        .join(broadcast(offsetsDf), col("__pid") === col("__pid2"), "left")
        .drop("__pid2")
        .sortWithinPartitions(order: _*)
      val keepIdx = df.columns.map(joined.schema.fieldIndex)
      val keyIdx = orderCols.map(joined.schema.fieldIndex)
      val offIdx = joined.schema.fieldIndex("__off")
      val outSchema = org.apache.spark.sql.types.StructType(
        df.schema.fields :+
          org.apache.spark.sql.types.StructField(rankCol, LongType, false))
      joined.mapPartitions { it =>
        var local = 0L
        var off = 0L
        var lastKey: Seq[Any] = null
        var first = true
        it.map { r =>
          if (first) {
            off = if (r.isNullAt(offIdx)) 0L else r.getLong(offIdx)
            first = false
          }
          val k = keyIdx.map(r.get)
          if (lastKey == null || k != lastKey) { local += 1; lastKey = k }
          Row.fromSeq(keepIdx.map(r.get).toIndexedSeq :+ (local + off))
        }
      }(Encoders.row(outSchema))
        .graftCheckpoint()
    } finally ranged.unpersist()
  }

  /** Running MAX over a global order — same two-phase scan as
    * [[runningTotal]] (max is associative; the driver folds per-
    * partition maxima into exclusive prefix maxima), plus `flagCol`:
    * TRUE exactly when the row STRICTLY raises the running max. That
    * flag is the 2-D skyline test: order by one dimension, flag the
    * strict-new-max rows of the other (a point is Pareto-optimal iff no
    * earlier point in the order already reached its value).
    *
    * `valueCol` must be non-null integral; `orderCols` must be a total
    * order (tie-break column) for a deterministic flag.
    */
  def runningMaxFlag(df: DataFrame, valueCol: String,
                     orderCols: Seq[String], maxCol: String = "cum_max",
                     flagCol: String = "is_new_max",
                     numParts: Int = 0): DataFrame = {
    require(orderCols.nonEmpty, "orderCols must be non-empty")
    val reserved = Set("__pid", "__off")
    val clash = df.columns.toSet.intersect(reserved + maxCol + flagCol)
    require(clash.isEmpty,
      s"input columns collide with reserved/output names: $clash")
    val parts =
      if (numParts > 0) numParts
      else df.sparkSession.sessionState.conf.numShufflePartitions
    val order = orderCols.map(col)
    val ranged = df
      .repartitionByRange(parts, order: _*)
      .withColumn("__pid", spark_partition_id())
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    try {
      val maxima = ranged
        .groupBy(col("__pid"))
        .agg(max(col(valueCol).cast(LongType)).as("__m"))
        .collect().map(r => r.getInt(0) -> r.getLong(1))
        .sortBy(_._1)
      val offsets = maxima
        .scanLeft((0, Long.MinValue, Long.MinValue)) {
          case ((_, _, run), (pid, m)) => (pid, run, math.max(run, m))
        }
        .drop(1).map { case (pid, off, _) => (pid, off) }
      val spark = df.sparkSession
      import spark.implicits._
      val offsetsDf = offsets.toSeq.toDF("__pid2", "__off")

      val joined = ranged
        .join(broadcast(offsetsDf), col("__pid") === col("__pid2"), "left")
        .drop("__pid2")
        .sortWithinPartitions(order: _*)

      val keepIdx = df.columns.map(joined.schema.fieldIndex)
      val vIdx = joined.schema.fieldIndex(valueCol)
      val offIdx = joined.schema.fieldIndex("__off")
      val outSchema = org.apache.spark.sql.types.StructType(
        df.schema.fields :+
          org.apache.spark.sql.types.StructField(maxCol, LongType, false) :+
          org.apache.spark.sql.types.StructField(flagCol,
            org.apache.spark.sql.types.BooleanType, false))
      joined.mapPartitions { it =>
        var run = Long.MinValue
        var first = true
        it.map { r =>
          if (first) {
            run = if (r.isNullAt(offIdx)) Long.MinValue else r.getLong(offIdx)
            first = false
          }
          val v = r.get(vIdx).asInstanceOf[Number].longValue
          val isNew = v > run
          run = math.max(run, v)
          Row.fromSeq(keepIdx.map(r.get).toIndexedSeq :+ run :+ isNew)
        }
      }(Encoders.row(outSchema))
        .graftCheckpoint()
    } finally ranged.unpersist()
  }
}
