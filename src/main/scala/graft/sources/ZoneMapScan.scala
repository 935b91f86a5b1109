package graft.sources

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.StructType

/** Zone-map-PRUNED reader path — the consumer q263's audit was missing
  * (r10 verdict #5): q97/q203/q263 show that a clustered layout makes
  * file-level min/max sketches selective; this operator actually SKIPS
  * the files.
  *
  * Three steps, each its own primitive so layouts and predicates
  * compose:
  *
  *  1. [[writeClustered]] — lay the table out as range-clustered
  *     parquet (one file per range partition, rows sorted within), the
  *     layout that gives zone maps their selectivity (a hash-scattered
  *     layout's zones all span the full domain — q263's null case).
  *  2. [[buildZoneMap]] — per-file (zone_min, zone_max, n_rows) from a
  *     single column-pruned scan of the zone column (at warehouse scale
  *     this is the parquet-footer statistics pass; the explicit scan
  *     keeps the map an auditable DataFrame). One row PER FILE —
  *     control-plane sized at any corpus size (~10⁵ rows for a 100 TB
  *     table at 1 GB files).
  *  3. [[pruneFiles]] + [[prunedRead]] — survivors are the files whose
  *     [zone_min, zone_max] interval INTERSECTS the predicate range;
  *     everything else is never opened. The collect is the pruning
  *     plan itself (same order of driver work as Spark's own
  *     PartitioningAwareFileIndex listing), not data. The caller still
  *     applies the residual predicate — zone maps prune FILES; rows
  *     inside surviving files still need the filter.
  *
  * Correctness is layout-independent by construction: pruning only
  * removes files the predicate can never match, so
  * `prunedRead(...).filter(pred)` ≡ `fullRead.filter(pred)` row-for-row
  * under ANY clustering — the spec gates that identity AND that the
  * pruned scan reads strictly fewer bytes on a clustered layout.
  */
object ZoneMapScan {

  /** Write `df` as `numFiles` range-clustered parquet files under
    * `path` (overwrite), clustered and sorted by `clusterCols` — the
    * q97 discipline (cluster what you filter on) producing the layout
    * zone maps can exploit.
    */
  def writeClustered(df: DataFrame, path: String,
                     clusterCols: Seq[String], numFiles: Int): Unit =
    df.repartitionByRange(numFiles, clusterCols.map(col): _*)
      .sortWithinPartitions(clusterCols.map(col): _*)
      .write.mode("overwrite").parquet(path)

  /** Per-file zone sketch for `zoneCol`:
    * (file, zone_min, zone_max, n_rows). One column-pruned scan.
    */
  def buildZoneMap(spark: SparkSession, path: String,
                   zoneCol: String): DataFrame =
    spark.read.parquet(path)
      .select(input_file_name().as("file"), col(zoneCol))
      .groupBy(col("file"))
      .agg(min(col(zoneCol)).as("zone_min"),
           max(col(zoneCol)).as("zone_max"),
           count(lit(1)).as("n_rows"))

  /** Files whose zone interval intersects [lo, hi] — sorted for a
    * deterministic read plan. Null zones (all-null files) survive:
    * pruning may only drop files the predicate provably cannot match.
    */
  def pruneFiles(zones: DataFrame, lo: Column, hi: Column): Seq[String] =
    zones
      .filter(not(coalesce(col("zone_max") < lo, lit(false)) ||
                  coalesce(col("zone_min") > hi, lit(false))))
      .select(col("file")).collect().map(_.getString(0)).sorted.toSeq

  /** Read ONLY `files` with the given schema (schema passed explicitly
    * so an empty survivor list still yields a typed empty frame).
    */
  def prunedRead(spark: SparkSession, files: Seq[String],
                 schema: StructType): DataFrame =
    if (files.isEmpty)
      spark.createDataFrame(spark.sparkContext
                              .emptyRDD[org.apache.spark.sql.Row], schema)
    else spark.read.schema(schema).parquet(files: _*)

  /** The composed scan: prune against [lo, hi], read survivors, apply
    * the residual predicate `zoneCol BETWEEN lo AND hi`. Returns the
    * filtered frame plus (files read, files total) for the caller's
    * skip accounting.
    */
  def scan(spark: SparkSession, path: String, zoneCol: String,
           lo: Column, hi: Column): (DataFrame, Int, Int) = {
    val zones = buildZoneMap(spark, path, zoneCol)
    val total = zones.count().toInt
    val files = pruneFiles(zones, lo, hi)
    val schema = spark.read.parquet(path).schema
    val out = prunedRead(spark, files, schema)
      .filter(col(zoneCol) >= lo && col(zoneCol) <= hi)
    (out, files.size, total)
  }
}
