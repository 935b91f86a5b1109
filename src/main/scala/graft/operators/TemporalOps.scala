package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Event-time operators: sessionization and as-of joins.
  *
  * Scale design: both operators are single-shuffle window plans keyed on
  * the entity key — no per-row subqueries, no driver loops, no cross
  * products. Per-key data volumes (one user's events / one customer's
  * orders) bound the window buffers, so skew is the only risk; AQE's
  * skew handling applies because the shuffle is a plain hash exchange.
  */
object TemporalOps {

  /** Assign session ids per key: a new session starts when the gap from
    * the previous event exceeds `gapUs` microseconds. Adds `session_id`
    * (1-based, per key, in `tiebreak`-stable event-time order).
    *
    * Gap arithmetic is integer microseconds (`unix_micros`), so an
    * external oracle (`epoch_us`) reproduces the split decisions exactly —
    * no float time math.
    */
  def sessionize(events: DataFrame, keyCol: String, tsCol: String,
                 tiebreak: Seq[String], gapUs: Long): DataFrame = {
    val orderCols: Seq[Column] = col("__us") +: tiebreak.map(col)
    val w = Window.partitionBy(col(keyCol)).orderBy(orderCols: _*)
    events
      .withColumn("__us", unix_micros(col(tsCol)))
      .withColumn("__new_sess",
        when(col("__us") - lag(col("__us"), 1).over(w) > gapUs ||
               lag(col("__us"), 1).over(w).isNull, 1L)
          .otherwise(0L))
      .withColumn("session_id", sum(col("__new_sess")).over(w))
      .drop("__us", "__new_sess")
  }

  /** Range (interval-containment) join WITHOUT an equi-key: pair each
    * left row whose `leftPoint` falls inside a right row's
    * [`rightStart`, `rightEnd`] interval (inclusive ends). All columns are
    * integer points on the same axis (epoch-days, epoch-micros, ids…).
    *
    * Scale design — the bucket decomposition: Spark plans a pure range
    * predicate as BroadcastNestedLoopJoin (every left row probes every
    * interval — O(n·m), and a hard failure when neither side broadcasts).
    * Quantizing the axis into `bucketWidth`-sized cells turns it into an
    * EQUI-join: points key by their cell, intervals explode into the
    * cells they overlap, the join matches on cell, and the exact BETWEEN
    * predicate filters the cell's false positives. Work becomes
    * O(n + m·(span/bucketWidth) + true_matches) with an ordinary hash
    * shuffle — AQE-skewable, broadcastable, never a cross product.
    * Choose `bucketWidth` near the typical interval span: too small
    * explodes the interval side, too large inflates per-cell candidate
    * lists. An interval spanning more than `maxCellsPerInterval` cells
    * fails FAST with a clear message (the alternative is a silent
    * multi-GB array alloc per row and Spark's 2.1B sequence limit).
    */
  def rangeJoin(left: DataFrame, leftPoint: String,
                right: DataFrame, rightStart: String, rightEnd: String,
                bucketWidth: Long,
                maxCellsPerInterval: Long = 1L << 20): DataFrame = {
    require(bucketWidth >= 1, s"bucketWidth must be >= 1, got $bucketWidth")
    require(maxCellsPerInterval >= 1, "maxCellsPerInterval must be >= 1")
    // The output carries BOTH sides' columns and the exact-BETWEEN filter
    // must bind unambiguously — overlapping names (or a caller column
    // shadowing an internal cell column) would make the join output
    // ambiguous or silently bind the wrong side. Fail fast instead.
    val overlap = left.columns.toSet intersect right.columns.toSet
    require(overlap.isEmpty,
      s"rangeJoin: left/right column names must be disjoint; shared: " +
        overlap.mkString(", "))
    val internal = Set("__cell", "__c0", "__c1")
    val clash = (left.columns ++ right.columns).toSet intersect internal
    require(clash.isEmpty,
      s"rangeJoin: inputs may not use reserved internal names: " +
        clash.mkString(", "))
    def cellOf(c: Column): Column = floorCell(c, bucketWidth)
    val l = left.withColumn("__cell", cellOf(col(leftPoint)))
    val r = right
      .filter(col(rightStart) <= col(rightEnd))
      .withColumn("__c0", cellOf(col(rightStart)))
      .withColumn("__c1", cellOf(col(rightEnd)))
      .withColumn("__cell", explode(sequence(
        col("__c0"),
        when(col("__c1") - col("__c0") < maxCellsPerInterval, col("__c1"))
          .otherwise(raise_error(concat(
            lit("rangeJoin: interval spans "),
            (col("__c1") - col("__c0") + 1).cast("string"),
            lit(s" cells > limit $maxCellsPerInterval — raise bucketWidth " +
              "or maxCellsPerInterval")))))))
      .drop("__c0", "__c1")
    l.join(r, Seq("__cell"))
      .filter(col(leftPoint).between(col(rightStart), col(rightEnd)))
      .drop("__cell")
  }

  /** Exact FLOOR division over the FULL long domain: truncating integral
    * `div` minus one when a negative value has a remainder. `div`/`%`
    * never overflow for a positive divisor (unlike the subtract-pmod
    * trick, which wraps within bucketWidth of Long.MinValue), and no
    * double arithmetic appears anywhere, so cells are exact past 2^53.
    */
  private def floorCell(c: Column, bucketWidth: Long): Column = {
    import org.apache.spark.sql.GraftColumns.{column, expression}
    val cl = c.cast("long")
    val trunc = column(org.apache.spark.sql.catalyst.expressions
      .IntegralDivide(expression(cl), expression(lit(bucketWidth))))
    trunc - when(cl < 0 && cl % lit(bucketWidth) =!= 0, lit(1L))
      .otherwise(lit(0L))
  }

  /** Interval-OVERLAP join (both sides are intervals): pair every left
    * [ls, le] with every right [rs, re] where `ls <= re AND rs <= le`
    * (inclusive ends — touching intervals overlap). The interval-algebra
    * sibling of [[rangeJoin]], same scale design: both sides explode
    * into `bucketWidth` cells so the range predicate becomes an ordinary
    * hash EQUI-join on the cell — never a nested-loop product.
    *
    * Dedup without a distinct: a pair sharing k cells would match k
    * times, so the pair is emitted ONLY in its first common cell —
    * `cell == max(cell(ls), cell(rs))` (both intervals exist there, and
    * no earlier cell holds both). Pure arithmetic, no extra shuffle.
    *
    * Degenerate/empty intervals (start > end) are dropped on both sides,
    * mirroring [[rangeJoin]]'s right-side contract.
    */
  def intervalOverlapJoin(left: DataFrame, leftStart: String, leftEnd: String,
                          right: DataFrame, rightStart: String,
                          rightEnd: String, bucketWidth: Long,
                          maxCellsPerInterval: Long = 1L << 20): DataFrame = {
    require(bucketWidth >= 1, s"bucketWidth must be >= 1, got $bucketWidth")
    require(maxCellsPerInterval >= 1, "maxCellsPerInterval must be >= 1")
    val overlap = left.columns.toSet intersect right.columns.toSet
    require(overlap.isEmpty,
      s"intervalOverlapJoin: left/right column names must be disjoint; " +
        s"shared: ${overlap.mkString(", ")}")
    val internal = Set("__cell", "__c0", "__c1")
    val clash = (left.columns ++ right.columns).toSet intersect internal
    require(clash.isEmpty,
      s"intervalOverlapJoin: inputs may not use reserved internal names: " +
        clash.mkString(", "))
    def cells(df: DataFrame, s: String, e: String, side: String) = df
      .filter(col(s) <= col(e))
      .withColumn("__c0", floorCell(col(s), bucketWidth))
      .withColumn("__c1", floorCell(col(e), bucketWidth))
      .withColumn("__cell", explode(sequence(
        col("__c0"),
        when(col("__c1") - col("__c0") < maxCellsPerInterval, col("__c1"))
          .otherwise(raise_error(concat(
            lit(s"intervalOverlapJoin: $side interval spans "),
            (col("__c1") - col("__c0") + 1).cast("string"),
            lit(s" cells > limit $maxCellsPerInterval — raise " +
              "bucketWidth or maxCellsPerInterval")))))))
      .drop("__c0", "__c1")
    cells(left, leftStart, leftEnd, "left")
      .join(cells(right, rightStart, rightEnd, "right"), Seq("__cell"))
      .filter(col(leftStart) <= col(rightEnd) &&
              col(rightStart) <= col(leftEnd))
      .filter(col("__cell") === greatest(
        floorCell(col(leftStart), bucketWidth),
        floorCell(col(rightStart), bucketWidth)))
      .drop("__cell")
  }

  /** As-of join: for each left row, attach the right row's time column
    * value with the greatest `rightTime` ≤ `eventTime` for the same key
    * (LEFT semantics: no prior right row → null).
    *
    * Plan shape: union both inputs into one keyed stream, sort per key by
    * (time, right-before-left on ties), and carry the last non-null right
    * time forward with a running `last(..., ignoreNulls)` window — the
    * merge-join formulation of as-of. ONE shuffle on the key; contrast
    * with the naive `JOIN ... WHERE rt <= et` + re-aggregate, which
    * explodes to all matching pairs before collapsing.
    */
  def asofJoin(left: DataFrame, right: DataFrame,
               key: String, eventTime: String, rightTime: String): DataFrame = {
    val leftCols = left.columns
    // NULL keys never satisfy an equi-condition: drop null-key right rows
    // up front (otherwise the window's NULL partition would carry their
    // values onto null-key left rows — equi-join semantics say those left
    // rows match nothing and surface with a null asof value).
    val r = right.filter(col(key).isNotNull).select(
      col(key),
      col(rightTime).cast("timestamp").as("__t"),
      lit(1).as("__is_right"),
      col(rightTime).as("__rt"))
    val l = left.select(
      (leftCols.map(col) :+
        col(eventTime).cast("timestamp").as("__t") :+
        lit(0).as("__is_right") :+
        lit(null).cast(right.schema(rightTime).dataType).as("__rt")): _*)
    // Right rows sort BEFORE left rows at equal time (ties are inclusive:
    // eventTime >= rightTime), and ties among right rows carry the same
    // __rt value, so the running last() is deterministic.
    val w = Window.partitionBy(col(key))
      .orderBy(col("__t").asc, col("__is_right").desc)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    l.unionByName(r, allowMissingColumns = true)
      .withColumn(rightTime, last(col("__rt"), ignoreNulls = true).over(w))
      .filter(col("__is_right") === 0)
      .select((leftCols.map(col) :+ col(rightTime)): _*)
  }

  /** NEAREST join (as-of, either direction): for each left row, the
    * right row's time value CLOSEST to `eventTime` in absolute distance
    * — backward or forward — for the same key; ties (equidistant
    * before/after) take the EARLIER right time, so the result is a
    * deterministic total choice. LEFT semantics: keys with no right
    * rows surface with null. The sensor-alignment / label-attachment
    * join: "match each reading to the closest calibration event",
    * where plain as-of silently ignores a nearer future row.
    *
    * Plan shape: [[asofJoin]]'s union-carry formulation run BOTH ways
    * over ONE key exchange — an ascending carry (last right time ≤ t)
    * and a descending carry (first right time ≥ t) are two windows on
    * the same partitioning, so Catalyst plans a single Exchange and
    * two in-partition sorts; never the naive join-all-pairs-then-argmin
    * explosion.
    */
  def nearestJoin(left: DataFrame, right: DataFrame,
                  key: String, eventTime: String, rightTime: String)
      : DataFrame = {
    val leftCols = left.columns
    val r = right.filter(col(key).isNotNull).select(
      col(key),
      col(rightTime).cast("timestamp").as("__t"),
      lit(1).as("__is_right"),
      col(rightTime).as("__rt"))
    val l = left.select(
      (leftCols.map(col) :+
        col(eventTime).cast("timestamp").as("__t") :+
        lit(0).as("__is_right") :+
        lit(null).cast(right.schema(rightTime).dataType).as("__rt")): _*)
    // right rows sort before left rows at equal time in BOTH directions,
    // so an exactly-coincident right row is eligible for both carries
    val wB = Window.partitionBy(col(key))
      .orderBy(col("__t").asc, col("__is_right").desc)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val wF = Window.partitionBy(col(key))
      .orderBy(col("__t").desc, col("__is_right").desc)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val dist = (a: Column, b: Column) =>
      abs(unix_micros(a.cast("timestamp")) - unix_micros(b.cast("timestamp")))
    l.unionByName(r, allowMissingColumns = true)
      .withColumn("__back", last(col("__rt"), ignoreNulls = true).over(wB))
      .withColumn("__fwd", last(col("__rt"), ignoreNulls = true).over(wF))
      .filter(col("__is_right") === 0)
      .withColumn(rightTime,
        when(col("__back").isNull, col("__fwd"))
          .when(col("__fwd").isNull, col("__back"))
          // tie -> the earlier (backward) value: __back <= t <= __fwd
          .when(dist(col("__t"), col("__back")) <=
                  dist(col("__t"), col("__fwd")), col("__back"))
          .otherwise(col("__fwd")))
      .select((leftCols.map(col) :+ col(rightTime)): _*)
  }

  /** SCD TYPE-2 dimension build from a change log: collapse each key's
    * observation stream to its attribute CHANGE POINTS and emit one
    * validity interval per run — (key, attr, valid_from_us, valid_to_us,
    * is_current), half-open [from, to), current rows open-ended (null
    * `valid_to_us`, is_current 1). The warehouse history table every
    * BI layer joins dimensions against, built as a query instead of a
    * mutation log.
    *
    * Order within a key is (ts, tieCol) — the tie column makes runs
    * deterministic when several observations share a timestamp. Times
    * are compared and emitted as exact integer microseconds,
    * engine-portable. Attribute comparison is null-safe (a null attr
    * is a value, and a run of nulls is one interval).
    *
    * Cost: ONE shuffle on the key — both windows (lag to find change
    * points, lead to close intervals) share the same partitioning, so
    * Catalyst plans a single Exchange; nothing touches the driver.
    * At 100 TB the change log shuffles once by key, which is the
    * floor for any per-key history computation.
    */
  def scd2(log: DataFrame, keyCol: String, attrCol: String,
           tsCol: String, tieCol: String): DataFrame = {
    val w = Window.partitionBy(col(keyCol))
      .orderBy(col("__us"), col(tieCol))
    val marked = log
      .select(col(keyCol), col(attrCol),
              unix_micros(col(tsCol).cast("timestamp")).as("__us"),
              col(tieCol))
      .withColumn("__prev", lag(col(attrCol), 1).over(w))
      .withColumn("__rn", row_number().over(w))
      // a run BOUNDARY: first observation, or attribute differs from
      // the previous one — null-safely, so lag's "no previous row" null
      // can't be confused with a genuinely-null previous attribute
      .filter(col("__rn") === 1 || !(col("__prev") <=> col(attrCol)))
    val w2 = Window.partitionBy(col(keyCol))
      .orderBy(col("__us"), col(tieCol))
    marked
      .withColumn("valid_to_us", lead(col("__us"), 1).over(w2))
      .select(col(keyCol), col(attrCol),
              col("__us").as("valid_from_us"),
              col("valid_to_us"),
              when(col("valid_to_us").isNull, lit(1))
                .otherwise(lit(0)).as("is_current"))
  }

  /** DAILY RESAMPLE with last-observation-carried-forward: turn an
    * irregular per-key observation log into a dense per-key daily
    * series over each key's OWN [first, last] observation span —
    * missing days inherit the most recent observed value (`observed`
    * flags the real points). The gap-filling every balance/inventory/
    * metrics table needs before day-grain joins or rolling windows
    * make sense.
    *
    * Pipeline: last-observation-per-day is a map-combined
    * max(struct(us, tie, value)) aggregate (~1 shuffled row per
    * key-day); spans are a per-key min/max agg; the day axis comes
    * from a distributed `sequence` explode (never a driver loop); the
    * carry-forward is one `last(ignoreNulls)` running window per key.
    * Day 1 of every span is observed by construction, so the LOCF
    * value is never null. All keyed shuffles — at 100 TB the output
    * size is Σ span-days per key, the result's own size.
    */
  def locfResampleDaily(log: DataFrame, keyCol: String, tsCol: String,
                        tieCol: String, valueCol: String): DataFrame = {
    val obs = log.select(
      col(keyCol), to_date(col(tsCol).cast("timestamp")).as("day"),
      unix_micros(col(tsCol).cast("timestamp")).as("__us"),
      col(tieCol), col(valueCol))
    val lastPerDay = obs
      .groupBy(col(keyCol), col("day"))
      .agg(max(struct(col("__us"), col(tieCol), col(valueCol)))
             .as("__t"))
      .select(col(keyCol), col("day"),
              col(s"__t.$valueCol").as("__day_val"))
    val days = lastPerDay
      .groupBy(col(keyCol))
      .agg(min(col("day")).as("__mn"), max(col("day")).as("__mx"))
      .select(col(keyCol),
              explode(sequence(col("__mn"), col("__mx"))).as("day"))
    val w = Window.partitionBy(col(keyCol)).orderBy(col("day"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    days.join(lastPerDay, Seq(keyCol, "day"), "left")
      .select(col(keyCol), col("day"),
              last(col("__day_val"), ignoreNulls = true).over(w)
                .as(valueCol),
              when(col("__day_val").isNotNull, lit(1)).otherwise(lit(0))
                .as("observed"))
  }
}
