package graft.queries

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType

import graft.Tables

/** Relational operator pack over the TPC-H-ish testdata.
  *
  * Each query exercises one operator family from SURVEY.md §2 and has a
  * DuckDB-equivalent oracle in [[oracleSql]]. Numeric outputs are computed
  * with decimal-exact aggregation then cast to double so the Spark result
  * and the DuckDB oracle are bit-identical regardless of the order in which
  * partial aggregates combine (double summation is order-dependent; decimal
  * summation is not). Ratio outputs divide exact integers in double — a
  * single IEEE op, identical in both engines.
  *
  * Scale notes (100 TB design intent):
  *  - aggregations are plain groupBy → partial + final HashAggregate with
  *    map-side combine; no driver-side collection anywhere.
  *  - joins against `nation`/`supplier`/Top-N-sized sides are explicit
  *    `broadcast()`; the fact side never shuffles for those joins.
  *  - Top-N is agg → orderBy → limit (planned as TakeOrderedAndProject,
  *    O(N) heap per partition), then joined back left-semi — the same
  *    shape the reference's BI layer encodes (SURVEY.md §2.4 F7/F8).
  *  - filters/projections sit directly over the scan so Catalyst pushes
  *    them into parquet (`PushedFilters`/`ReadSchema`).
  */
object RelationalQueries {

  /** Decimal-exact sum emitted as double (order-independent). */
  private def dsum(c: Column, scale: Int = 2): Column =
    sum(c.cast(DecimalType(18, scale))).cast("double")

  // ------------------------------------------------------------- queries

  /** SURVEY §2.6 A1–A8 shape: multi-measure groupBy + O3 ordering. */
  def q1Agg(s: SparkSession, dir: String): DataFrame =
    Tables.lineitem(s, dir)
      .groupBy(col("l_returnflag"), col("l_linestatus"))
      .agg(
        dsum(col("l_quantity")).as("sum_qty"),
        dsum(col("l_extendedprice")).as("sum_base_price"),
        dsum(col("l_extendedprice") * (lit(1) - col("l_discount")), 6)
          .as("sum_disc_price"),
        count(lit(1)).as("count_order"))
      .orderBy("l_returnflag", "l_linestatus")

  /** q90 — TPC-H Q5-shaped multi-join aggregation: 1996 revenue per
    * nation for orders whose customer and supplier share a nation inside
    * one region — the six-table star join every warehouse engine is
    * judged on. Plan: the two FACT tables (lineitem ⋈ orders) take the
    * only real shuffle; region/nation/supplier/customer are explicit
    * broadcasts, the date predicate pushes into the orders scan, and
    * revenue is decimal-exact (q1's dsum idiom). At 100 TB the fact join
    * is the sort-merge AQE plans for; everything else stays map-side.
    */
  def q90RegionRevenue(s: SparkSession, dir: String): DataFrame =
    Tables.lineitem(s, dir)
      .join(Tables.orders(s, dir)
              .filter(col("o_orderdate") >= to_timestamp(lit("1996-01-01")) &&
                      col("o_orderdate") < to_timestamp(lit("1997-01-01"))),
            col("l_orderkey") === col("o_orderkey"))
      .join(broadcast(Tables.customer(s, dir)),
            col("o_custkey") === col("c_custkey"))
      .join(broadcast(Tables.supplier(s, dir)),
            col("l_suppkey") === col("s_suppkey") &&
              col("c_nationkey") === col("s_nationkey"))
      .join(broadcast(Tables.nation(s, dir)),
            col("s_nationkey") === col("n_nationkey"))
      .join(broadcast(Tables.region(s, dir)
              .filter(col("r_name") === "ASIA")),
            col("n_regionkey") === col("r_regionkey"))
      .groupBy(col("n_name"))
      .agg(dsum(col("l_extendedprice") * (lit(1) - col("l_discount")), 6)
        .as("revenue"))
      .orderBy(col("revenue").desc, col("n_name"))

  /** TPC-H Q17 shape — "revenue from small-quantity orders": line items
    * below 20% of their part's average quantity. The textbook correlated
    * scalar-aggregate subquery, written directly in the decorrelated
    * form Catalyst would rewrite it to anyway: one per-part aggregate
    * joined back to the fact — because at 100 TB you want that join
    * shape EXPLICIT (partial agg map-side, one shuffle on partkey shared
    * by agg and join, part dim broadcast). The 20% threshold is
    * cross-multiplied to integers (5·qty·n < Σqty, quantities are
    * integral) so the gate never compares engine-rounded doubles.
    */
  def q101SmallQty(s: SparkSession, dir: String): DataFrame = {
    val li = Tables.lineitem(s, dir)
      .select(col("l_partkey"), col("l_quantity").cast("long").as("qty"),
              col("l_extendedprice"))
    val stats = li.groupBy(col("l_partkey"))
      .agg(count(lit(1)).as("n"), sum(col("qty")).as("s"))
    li.join(stats, Seq("l_partkey"))
      .filter(lit(5L) * col("qty") * col("n") < col("s"))
      .join(broadcast(Tables.part(s, dir).select("p_partkey", "p_brand")),
            col("p_partkey") === col("l_partkey"))
      .groupBy(col("p_brand"))
      .agg(count(lit(1)).as("n_small"),
           dsum(col("l_extendedprice")).as("small_revenue"))
      .orderBy(col("p_brand"))
  }

  /** §2.4 F5 + §2.1 S4: range predicate + projection, both pushed to the
    * parquet scan (predicate pushdown + column pruning).
    */
  def q2FilterPushdown(s: SparkSession, dir: String): DataFrame =
    Tables.lineitem(s, dir)
      .filter(col("l_shipdate") >= to_timestamp(lit("1995-01-01")) &&
              col("l_shipdate") <  to_timestamp(lit("1995-03-01")) &&
              col("l_quantity") < 10)
      .select("l_orderkey", "l_linenumber", "l_quantity",
              "l_extendedprice", "l_shipdate")
      .orderBy("l_orderkey", "l_linenumber")

  /** §2.5 J3 dimension join: fact ⋈ broadcast dims, grouped rollup. */
  def q3DimJoin(s: SparkSession, dir: String): DataFrame = {
    val orders   = Tables.orders(s, dir)
    val customer = Tables.customer(s, dir)
    val nation   = Tables.nation(s, dir)
    orders
      .join(broadcast(customer), orders("o_custkey") === customer("c_custkey"))
      .join(broadcast(nation), customer("c_nationkey") === nation("n_nationkey"))
      .groupBy(col("n_name"), col("c_mktsegment"))
      .agg(count(lit(1)).as("n_orders"),
           dsum(col("o_totalprice")).as("revenue"))
      .orderBy("n_name", "c_mktsegment")
  }

  /** §2.5 J2 semi-join: customers having ≥1 finished order. */
  def q4SemiJoin(s: SparkSession, dir: String): DataFrame = {
    val fOrders = Tables.orders(s, dir)
      .filter(col("o_orderstatus") === "F").select("o_custkey")
    Tables.customer(s, dir)
      .join(fOrders, col("c_custkey") === col("o_custkey"), "left_semi")
      .groupBy(col("c_mktsegment"))
      .agg(count(lit(1)).as("n_customers"))
      .orderBy("c_mktsegment")
  }

  /** §2.5 J1 anti-join (the dedup/skip shape): customers with no
    * pending ('P') order. The filter sits under the join so the anti side
    * stays small and broadcastable.
    */
  def q5AntiJoin(s: SparkSession, dir: String): DataFrame = {
    val pOrders = Tables.orders(s, dir)
      .filter(col("o_orderstatus") === "P").select("o_custkey")
    Tables.customer(s, dir)
      .join(pOrders, col("c_custkey") === col("o_custkey"), "left_anti")
      .groupBy(col("c_nationkey"))
      .agg(count(lit(1)).as("n_customers"))
      .orderBy("c_nationkey")
  }

  /** §2.4 F7 + §2.7 O4: Top-10-by-count subquery filter (the BI opponents
    * pivot). Ties broken by key so the cut is deterministic. The Top-N side
    * is broadcast back — never a shuffle of the fact table.
    */
  def q6TopNSemiJoin(s: SparkSession, dir: String): DataFrame = {
    val orders = Tables.orders(s, dir)
    val top10 = orders.groupBy(col("o_custkey"))
      .agg(count(lit(1)).as("cnt"))
      .orderBy(col("cnt").desc, col("o_custkey").asc)
      .limit(10)
      .select("o_custkey")
    orders.join(broadcast(top10), Seq("o_custkey"), "left_semi")
      .groupBy(col("o_custkey"))
      .agg(count(lit(1)).as("n_orders"),
           dsum(col("o_totalprice")).as("total_spent"))
      .orderBy("o_custkey")
  }

  /** §2.6 A11: trailing 12-day window over daily partial aggregates (the
    * rolling win-rate). Aggregate to day grain FIRST (shrinks the window
    * input from rows to days), then a range frame over epoch-days.
    */
  def q7RollingWindow(s: SparkSession, dir: String): DataFrame = {
    val daily = Tables.orders(s, dir)
      .groupBy(to_date(col("o_orderdate")).as("d"))
      .agg(count(lit(1)).as("n"),
           sum(when(col("o_orderstatus") === "F", 1L).otherwise(0L)).as("f"))
    val w = Window
      .orderBy(datediff(col("d"), lit("1970-01-01")))
      .rangeBetween(-11, 0)
    daily
      .withColumn("rolling_n", sum(col("n")).over(w))
      .withColumn("rolling_f", sum(col("f")).over(w))
      .withColumn("rolling_f_rate",
        col("rolling_f").cast("double") / col("rolling_n"))
      .select("d", "n", "f", "rolling_n", "rolling_f", "rolling_f_rate")
      .orderBy("d")
  }

  /** §2.3 P12/P13 bucketing: CASE ladder over a numeric column (the
    * time-control / rating-band shape), grouped.
    */
  def q8CaseWhenBucket(s: SparkSession, dir: String): DataFrame =
    Tables.orders(s, dir)
      .withColumn("price_bucket",
        when(col("o_totalprice") < 100000, "low")
          .when(col("o_totalprice") < 250000, "mid")
          .when(col("o_totalprice") < 400000, "high")
          .otherwise("premium"))
      .groupBy(col("price_bucket"))
      .agg(count(lit(1)).as("n_orders"),
           dsum(col("o_totalprice")).as("revenue"))
      .orderBy("price_bucket")

  /** §2.3 P5/P9 regex extract + cast-with-default over the events props
    * payload (the PGN-header-extraction shape).
    */
  def q9RegexExtract(s: SparkSession, dir: String): DataFrame =
    Tables.events(s, dir)
      .withColumn("k",
        regexp_extract(col("props"), "\"k\":\\s*(\\d+)", 1).cast("long"))
      .groupBy(col("event_type"))
      .agg(count(lit(1)).as("n"),
           sum(coalesce(col("k"), lit(0L))).as("sum_k"),
           max(col("k")).as("max_k"))
      .orderBy("event_type")

  /** §2.9 explode/flatten: split + explode + re-aggregate. */
  def q10Explode(s: SparkSession, dir: String): DataFrame =
    Tables.part(s, dir)
      .select(explode(split(col("p_type"), " ")).as("word"))
      .groupBy(col("word"))
      .agg(count(lit(1)).as("n"))
      .orderBy("word")

  /** §2.7 O1/O4 global sort + limit (TakeOrderedAndProject, no full sort). */
  def q11SortLimit(s: SparkSession, dir: String): DataFrame =
    Tables.orders(s, dir)
      .select("o_orderkey", "o_custkey", "o_totalprice", "o_orderdate")
      .orderBy(col("o_totalprice").desc, col("o_orderkey").asc)
      .limit(100)

  /** §2.8 set ops: UNION-distinct across two sources. */
  def q12SetOps(s: SparkSession, dir: String): DataFrame = {
    val c = Tables.customer(s, dir)
      .filter(col("c_mktsegment") === "BUILDING")
      .select(col("c_nationkey").as("nationkey"))
    val sup = Tables.supplier(s, dir).select(col("s_nationkey").as("nationkey"))
    c.union(sup).distinct().orderBy("nationkey")
  }

  /** §2.4 F1 exact dedup: DISTINCT projection (hash-aggregate dedup). */
  def q13DedupExact(s: SparkSession, dir: String): DataFrame =
    Tables.events(s, dir)
      .select("user_id", "event_type")
      .distinct()
      .orderBy("user_id", "event_type")

  /** §2.7 O5 watermark: per-key max event time (second grain so Spark's
    * micros and DuckDB's nanos agree).
    */
  def q14Watermark(s: SparkSession, dir: String): DataFrame =
    Tables.events(s, dir)
      .groupBy(col("user_id"))
      .agg(date_trunc("second", max(col("ts"))).as("last_ts"),
           count(lit(1)).as("n_events"))
      .orderBy("user_id")

  /** §2.6 A6 matrix: 2-dim group + within-partition share (the
    * win-rate-by-bucket×color shape) via a window over the aggregate.
    */
  def q15TwoDimRatio(s: SparkSession, dir: String): DataFrame = {
    val agg = Tables.orders(s, dir)
      .groupBy(col("o_orderpriority"), col("o_orderstatus"))
      .agg(count(lit(1)).as("n"))
    agg
      .withColumn("share",
        col("n").cast("double") /
          sum(col("n")).over(Window.partitionBy(col("o_orderpriority"))))
      .orderBy("o_orderpriority", "o_orderstatus")
  }

  /** §2.3 P15 date parts: year/month hierarchy aggregation. */
  def q16DateParts(s: SparkSession, dir: String): DataFrame =
    Tables.orders(s, dir)
      .groupBy(year(col("o_orderdate")).cast("long").as("y"),
               month(col("o_orderdate")).cast("long").as("m"))
      .agg(count(lit(1)).as("n_orders"),
           dsum(col("o_totalprice")).as("revenue"))
      .orderBy("y", "m")

  // -------------------------------------------------------------- wiring

  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q1_agg"             -> (q1Agg _),
    "q2_filter_pushdown" -> (q2FilterPushdown _),
    "q3_dim_join"        -> (q3DimJoin _),
    "q4_semi_join"       -> (q4SemiJoin _),
    "q5_anti_join"       -> (q5AntiJoin _),
    "q6_topn_semijoin"   -> (q6TopNSemiJoin _),
    "q7_rolling_window"  -> (q7RollingWindow _),
    "q8_casewhen_bucket" -> (q8CaseWhenBucket _),
    "q9_regex_extract"   -> (q9RegexExtract _),
    "q10_explode"        -> (q10Explode _),
    "q11_sort_limit"     -> (q11SortLimit _),
    "q12_setops"         -> (q12SetOps _),
    "q13_dedup_exact"    -> (q13DedupExact _),
    "q14_watermark"      -> (q14Watermark _),
    "q15_twodim_ratio"   -> (q15TwoDimRatio _),
    "q16_date_parts"     -> (q16DateParts _),
    "q90_region_revenue" -> (q90RegionRevenue _),
    "q101_small_qty"     -> (q101SmallQty _)
  )

  def oracleSql: Map[String, String] = Map(
    "q1_agg" ->
      """SELECT l_returnflag, l_linestatus,
        |  CAST(SUM(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS sum_qty,
        |  CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE) AS sum_base_price,
        |  CAST(SUM(CAST(l_extendedprice * (1 - l_discount) AS DECIMAL(18,6))) AS DOUBLE) AS sum_disc_price,
        |  COUNT(*) AS count_order
        |FROM lineitem GROUP BY l_returnflag, l_linestatus
        |ORDER BY l_returnflag, l_linestatus""".stripMargin,
    "q2_filter_pushdown" ->
      """SELECT l_orderkey, l_linenumber, l_quantity, l_extendedprice, l_shipdate
        |FROM lineitem
        |WHERE l_shipdate >= TIMESTAMP '1995-01-01'
        |  AND l_shipdate <  TIMESTAMP '1995-03-01'
        |  AND l_quantity < 10
        |ORDER BY l_orderkey, l_linenumber""".stripMargin,
    "q3_dim_join" ->
      """SELECT n_name, c_mktsegment,
        |  COUNT(*) AS n_orders,
        |  CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS revenue
        |FROM orders
        |JOIN customer ON o_custkey = c_custkey
        |JOIN nation ON c_nationkey = n_nationkey
        |GROUP BY n_name, c_mktsegment
        |ORDER BY n_name, c_mktsegment""".stripMargin,
    "q4_semi_join" ->
      """SELECT c_mktsegment, COUNT(*) AS n_customers
        |FROM customer
        |WHERE EXISTS (SELECT 1 FROM orders
        |              WHERE o_custkey = c_custkey AND o_orderstatus = 'F')
        |GROUP BY c_mktsegment ORDER BY c_mktsegment""".stripMargin,
    "q5_anti_join" ->
      """SELECT c_nationkey, COUNT(*) AS n_customers
        |FROM customer
        |WHERE NOT EXISTS (SELECT 1 FROM orders
        |                  WHERE o_custkey = c_custkey AND o_orderstatus = 'P')
        |GROUP BY c_nationkey ORDER BY c_nationkey""".stripMargin,
    "q6_topn_semijoin" ->
      """WITH top10 AS (
        |  SELECT o_custkey FROM orders GROUP BY o_custkey
        |  ORDER BY COUNT(*) DESC, o_custkey ASC LIMIT 10)
        |SELECT o_custkey, COUNT(*) AS n_orders,
        |  CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS total_spent
        |FROM orders
        |WHERE o_custkey IN (SELECT o_custkey FROM top10)
        |GROUP BY o_custkey ORDER BY o_custkey""".stripMargin,
    "q7_rolling_window" ->
      """WITH daily AS (
        |  SELECT CAST(o_orderdate AS DATE) AS d, COUNT(*) AS n,
        |         CAST(SUM(CASE WHEN o_orderstatus = 'F' THEN 1 ELSE 0 END) AS BIGINT) AS f
        |  FROM orders GROUP BY 1)
        |SELECT d, n, f,
        |  CAST(SUM(n) OVER w AS BIGINT) AS rolling_n,
        |  CAST(SUM(f) OVER w AS BIGINT) AS rolling_f,
        |  CAST(SUM(f) OVER w AS DOUBLE) / (SUM(n) OVER w) AS rolling_f_rate
        |FROM daily
        |WINDOW w AS (ORDER BY d RANGE BETWEEN INTERVAL 11 DAYS PRECEDING AND CURRENT ROW)
        |ORDER BY d""".stripMargin,
    "q8_casewhen_bucket" ->
      """SELECT CASE WHEN o_totalprice < 100000 THEN 'low'
        |            WHEN o_totalprice < 250000 THEN 'mid'
        |            WHEN o_totalprice < 400000 THEN 'high'
        |            ELSE 'premium' END AS price_bucket,
        |  COUNT(*) AS n_orders,
        |  CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS revenue
        |FROM orders GROUP BY 1 ORDER BY 1""".stripMargin,
    "q9_regex_extract" ->
      """SELECT event_type, COUNT(*) AS n,
        |  CAST(SUM(COALESCE(CAST(regexp_extract(props, '"k":\s*(\d+)', 1) AS BIGINT), 0)) AS BIGINT) AS sum_k,
        |  MAX(CAST(regexp_extract(props, '"k":\s*(\d+)', 1) AS BIGINT)) AS max_k
        |FROM events GROUP BY event_type ORDER BY event_type""".stripMargin,
    "q10_explode" ->
      """SELECT word, COUNT(*) AS n FROM (
        |  SELECT unnest(string_split(p_type, ' ')) AS word FROM part)
        |GROUP BY word ORDER BY word""".stripMargin,
    "q11_sort_limit" ->
      """SELECT o_orderkey, o_custkey, o_totalprice, o_orderdate
        |FROM orders ORDER BY o_totalprice DESC, o_orderkey ASC LIMIT 100""".stripMargin,
    "q12_setops" ->
      """SELECT c_nationkey AS nationkey FROM customer WHERE c_mktsegment = 'BUILDING'
        |UNION
        |SELECT s_nationkey AS nationkey FROM supplier
        |ORDER BY nationkey""".stripMargin,
    "q13_dedup_exact" ->
      """SELECT DISTINCT user_id, event_type FROM events
        |ORDER BY user_id, event_type""".stripMargin,
    "q14_watermark" ->
      """SELECT user_id, date_trunc('second', MAX(ts)) AS last_ts,
        |  COUNT(*) AS n_events
        |FROM events GROUP BY user_id ORDER BY user_id""".stripMargin,
    "q15_twodim_ratio" ->
      """SELECT o_orderpriority, o_orderstatus, COUNT(*) AS n,
        |  CAST(COUNT(*) AS DOUBLE) /
        |    SUM(COUNT(*)) OVER (PARTITION BY o_orderpriority) AS share
        |FROM orders GROUP BY o_orderpriority, o_orderstatus
        |ORDER BY o_orderpriority, o_orderstatus""".stripMargin,
    "q16_date_parts" ->
      """SELECT CAST(year(o_orderdate) AS BIGINT) AS y,
        |  CAST(month(o_orderdate) AS BIGINT) AS m,
        |  COUNT(*) AS n_orders,
        |  CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS revenue
        |FROM orders GROUP BY y, m ORDER BY y, m""".stripMargin,
    "q90_region_revenue" ->
      """SELECT n_name,
        |  CAST(SUM(CAST(l_extendedprice * (1 - l_discount)
        |    AS DECIMAL(18,6))) AS DOUBLE) AS revenue
        |FROM lineitem
        |JOIN orders ON l_orderkey = o_orderkey
        |JOIN customer ON o_custkey = c_custkey
        |JOIN supplier ON l_suppkey = s_suppkey
        |             AND c_nationkey = s_nationkey
        |JOIN nation ON s_nationkey = n_nationkey
        |JOIN region ON n_regionkey = r_regionkey
        |WHERE r_name = 'ASIA'
        |  AND o_orderdate >= TIMESTAMP '1996-01-01'
        |  AND o_orderdate < TIMESTAMP '1997-01-01'
        |GROUP BY n_name ORDER BY revenue DESC, n_name""".stripMargin,
    "q101_small_qty" ->
      """WITH st AS (
        |  SELECT l_partkey, CAST(COUNT(*) AS BIGINT) AS n,
        |         CAST(SUM(CAST(l_quantity AS BIGINT)) AS BIGINT) AS s
        |  FROM lineitem GROUP BY 1)
        |SELECT p.p_brand,
        |  CAST(COUNT(*) AS BIGINT) AS n_small,
        |  CAST(SUM(CAST(l.l_extendedprice AS DECIMAL(18,2))) AS DOUBLE)
        |    AS small_revenue
        |FROM lineitem l
        |JOIN st ON st.l_partkey = l.l_partkey
        |JOIN part p ON p.p_partkey = l.l_partkey
        |WHERE 5 * CAST(l.l_quantity AS BIGINT) * st.n < st.s
        |GROUP BY 1 ORDER BY 1""".stripMargin
  )
}
