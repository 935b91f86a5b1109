package graft.operators

import org.apache.spark.sql.{DataFrame, Encoders, Row}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.LongType

/** Distributed global prefix sum — a running total over a GLOBAL order
  * without ever putting the data through a single-partition window (the
  * classic scale-killer: `Window.orderBy(...)` with no partitionBy pulls
  * the whole table through one task).
  *
  * Shape (the textbook two-phase scan, expressed Spark-first):
  *  1. `repartitionByRange(orderCols)` — ONE full-data shuffle, the same
  *     exchange a global sort pays; partition i holds a contiguous key
  *     range below partition i+1's.
  *  2. Per-partition totals: a hash aggregate on `spark_partition_id()`
  *     (tiny — numParts rows), prefix-summed by a window over those
  *     numParts rows (bounded, NOT data-sized) into exclusive offsets,
  *     broadcast back and joined on partition id. The range exchange
  *     feeds both branches and is reused, not recomputed.
  *  3. `sortWithinPartitions` + one `mapPartitions` pass accumulating
  *     value + offset. This is the deliberate `mapPartitions` exception:
  *     a running accumulator per physical partition is genuinely
  *     imperative per-partition logic — a window on partition id would
  *     re-shuffle the full data a second time just to group what is
  *     already co-located.
  *
  * Determinism contract: `orderCols` must be a TOTAL order (add a unique
  * tie-break column); `valueCol` must be integral (cast upstream), nulls
  * count as 0. Partition ids are whatever the range exchange produced —
  * both consumers read the same materialized shuffle output, so the ids
  * agree between the totals branch and the data branch.
  */
object PrefixSum {

  /** Appends `cumCol` (long): the inclusive running sum of `valueCol`
    * over the global `orderCols` order. Output rows keep `df`'s columns
    * (in order) and arrive range-partitioned and sorted by `orderCols`.
    */
  def runningTotal(df: DataFrame, valueCol: String, orderCols: Seq[String],
                   cumCol: String = "cum", numParts: Int = 0): DataFrame = {
    require(orderCols.nonEmpty, "orderCols must be non-empty")
    val parts =
      if (numParts > 0) numParts
      else df.sparkSession.sessionState.conf.numShufflePartitions
    val order = orderCols.map(col)
    val ranged = df
      .repartitionByRange(parts, order: _*)
      .withColumn("__pid", spark_partition_id())

    // exclusive prefix offsets per partition id — numParts rows, so the
    // unpartitioned window is bounded by configuration, not data
    val offW = Window.orderBy(col("__pid"))
      .rowsBetween(Window.unboundedPreceding, -1)
    // key re-aliased to __pid2: offsets shares lineage with `ranged`, so
    // joining back on a same-exprId __pid would be a self-join ambiguity
    val offsets = ranged
      .groupBy(col("__pid"))
      .agg(sum(coalesce(col(valueCol).cast(LongType), lit(0L))).as("__t"))
      .select(col("__pid").as("__pid2"),
              coalesce(sum(col("__t")).over(offW), lit(0L)).as("__off"))

    val joined = ranged
      .join(broadcast(offsets), col("__pid") === col("__pid2"), "left")
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
  }
}
