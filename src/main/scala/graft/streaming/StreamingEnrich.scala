package graft.streaming

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Stream-static SCD2 enrichment — the versioned-dimension lookup every
  * warehouse stream needs: each event joins the dimension VERSION valid
  * at its event time (half-open [valid_from_us, valid_to_us), current
  * rows open-ended), not whatever the dimension happens to say at
  * processing time. Late-arriving events therefore enrich against the
  * attribute that was true WHEN THEY HAPPENED — replaying yesterday's
  * backlog after a dimension change yields the same result it would
  * have yesterday, which is the property processing-time lookups
  * silently lose.
  *
  * Execution shape: a stream-static equi-join on the key with the
  * validity range as a join filter — stateless (no watermark, no state
  * store; the static side is not an unbounded input), planned per
  * micro-batch as a broadcast hash join for any dimension that fits the
  * threshold. At 100 TB the dimension history is still dimension-sized;
  * the fact stream never shuffles for this join. A dimension read from
  * a table/path is re-planned each micro-batch, so an SCD2 rebuild
  * lands on the stream without restarting the query.
  */
object StreamingEnrich {

  /** Enrich `events` (streaming) with `dim`'s attribute valid at the
    * event's `eventTsUs` (microseconds). `dim` must carry
    * (dimKey, attrCol, valid_from_us, valid_to_us) — the
    * [[graft.operators.TemporalOps.scd2]] output shape. LEFT semantics:
    * events before the key's first version (or with an unknown key)
    * pass through with a null attribute.
    */
  def enrichScd2(events: DataFrame, eventTsUs: String, eventKey: String,
                 dim: DataFrame, dimKey: String, attrCol: String)
      : DataFrame = {
    val eventCols = events.columns
    // Collision guard (the Hilbert.withHilbert convention): the join
    // introduces these names on the dim side; a same-named event column
    // would make the join condition/select ambiguous or silently wrong.
    val reserved = Set(attrCol, "__dk", "valid_from_us", "valid_to_us")
    val clash = eventCols.filter(reserved)
    require(clash.isEmpty,
      s"enrichScd2: events must not carry column(s) ${clash.mkString(", ")}" +
        " — they collide with the dimension-side names the join introduces")
    val d = dim.select(col(dimKey).as("__dk"), col(attrCol),
                       col("valid_from_us"), col("valid_to_us"))
    events.join(d,
        col(eventKey) === col("__dk") &&
          col(eventTsUs) >= col("valid_from_us") &&
          (col("valid_to_us").isNull ||
            col(eventTsUs) < col("valid_to_us")),
        "left")
      .select((eventCols.map(col) :+ col(attrCol)): _*)
  }
}
