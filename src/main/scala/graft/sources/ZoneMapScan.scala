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
  *  2. [[buildZoneMapFromFooters]] — per-file (zone_min, zone_max,
  *     n_rows) from PARQUET FOOTER STATISTICS: one ~KB metadata read
  *     per file, zero row reads (the production build;
  *     [[buildZoneMap]], the column-pruned data scan, remains as its
  *     audit/oracle twin — `ZoneMapScanSpec` gates the two identical
  *     row-for-row). One row PER FILE — control-plane sized at any
  *     corpus size (~10⁵ rows for a 100 TB table at 1 GB files).
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

  /** One row group's contribution to its file's zone envelope. */
  private[sources] sealed trait GroupContribution
  /** Usable min/max — fold them into the envelope. */
  private[sources] case object GroupBounded extends GroupContribution
  /** Provably no matchable rows (zero rows, or all-null PROVEN) —
    * contributes nothing; nulls cannot match a range predicate. */
  private[sources] case object GroupNothing extends GroupContribution
  /** Rows whose values the stats cannot see — poisons the WHOLE file
    * to the null zone (never pruned). */
  private[sources] case object GroupUnknown extends GroupContribution

  /** Decide how a row group contributes to the file envelope. A group
    * carrying rows but NO usable statistics (foreign writer, stats
    * dropped) holds values the envelope cannot see — folding only the
    * statted groups would yield a too-narrow envelope and pruneFiles
    * could drop a file containing matches (ADVICE r12). "All-null" must
    * be PROVEN, not inferred from min/max absence: parquet permits a
    * chunk to carry only null_count while min/max were dropped
    * (oversized values, foreign writers), so absence of a non-null
    * value bound only proves all-null when the null count is set AND
    * equals the group's row count (ADVICE r13). Factored out of the
    * footer fold for direct spec coverage — no writer in this container
    * produces the null-count-only stats shape.
    */
  private[sources] def groupContribution(
      rowCount: Long,
      st: org.apache.parquet.column.statistics.Statistics[_])
      : GroupContribution =
    if (rowCount <= 0) GroupNothing
    else if (st == null || st.isEmpty) GroupUnknown
    else if (st.hasNonNullValue) GroupBounded
    else if (st.isNumNullsSet && st.getNumNulls == rowCount) GroupNothing
    else GroupUnknown

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

  /** `file://`-URI normalization shared by the two zone-map builders:
    * `input_file_name()` renders local files as `file:///p`, Hadoop
    * `Path.toUri` as `file:/p` — same file, different spelling, and the
    * map consumers (the footer≡scan spec gate, [[pruneFiles]] set
    * logic) need ONE spelling. Both forms stay readable by
    * `spark.read.parquet`.
    */
  private def normFile(c: Column): Column =
    regexp_replace(c, "^file:/+", "file:///")

  /** Per-file zone sketch for `zoneCol`:
    * (file, zone_min, zone_max, n_rows). One column-pruned scan of the
    * zone column — the AUDIT/ORACLE twin of
    * [[buildZoneMapFromFooters]]: same output row-for-row, built by
    * reading the data instead of trusting writer statistics, so the
    * spec can gate the footer path against it.
    */
  def buildZoneMap(spark: SparkSession, path: String,
                   zoneCol: String): DataFrame =
    spark.read.parquet(path)
      .select(normFile(input_file_name()).as("file"), col(zoneCol))
      .groupBy(col("file"))
      .agg(min(col(zoneCol)).as("zone_min"),
           max(col(zoneCol)).as("zone_max"),
           count(lit(1)).as("n_rows"))

  /** Parquet physical/logical types the footer reader knows how to
    * order and render canonically. Timestamps/decimals/nested zones are
    * out of scope — use the scan-built map there (fail-loud below).
    */
  private def statToString(
      tpe: org.apache.parquet.schema.PrimitiveType,
      v: AnyRef): String = {
    import org.apache.parquet.schema.PrimitiveType.PrimitiveTypeName._
    import org.apache.parquet.schema.LogicalTypeAnnotation
    val logical = tpe.getLogicalTypeAnnotation
    (tpe.getPrimitiveTypeName, logical) match {
      case (INT32, _: LogicalTypeAnnotation.DateLogicalTypeAnnotation) =>
        java.time.LocalDate.ofEpochDay(
          v.asInstanceOf[java.lang.Integer].longValue()).toString
      case (INT64, ts: LogicalTypeAnnotation.TimestampLogicalTypeAnnotation) =>
        // epoch count at the annotation's unit → ISO local-datetime
        // string, castable to TIMESTAMP/TIMESTAMP_NTZ under the UTC
        // session the library pins
        val raw = v.asInstanceOf[java.lang.Long].longValue()
        val micros = ts.getUnit match {
          case LogicalTypeAnnotation.TimeUnit.MILLIS => raw * 1000L
          case LogicalTypeAnnotation.TimeUnit.MICROS => raw
          case LogicalTypeAnnotation.TimeUnit.NANOS  => raw / 1000L
        }
        java.time.LocalDateTime.ofEpochSecond(
          Math.floorDiv(micros, 1000000L),
          (Math.floorMod(micros, 1000000L) * 1000L).toInt,
          java.time.ZoneOffset.UTC).toString
      // plain ints only: a decimal annotation stores UNSCALED values,
      // whose toString would cast to the wrong number — fail loud below
      case (INT32, null) | (INT64, null) | (FLOAT, null) | (DOUBLE, null) |
           (BOOLEAN, null) => v.toString
      case (INT32, _: LogicalTypeAnnotation.IntLogicalTypeAnnotation) |
           (INT64, _: LogicalTypeAnnotation.IntLogicalTypeAnnotation) =>
        v.toString
      case (BINARY, _: LogicalTypeAnnotation.StringLogicalTypeAnnotation) =>
        new String(v.asInstanceOf[org.apache.parquet.io.api.Binary]
                     .getBytes, java.nio.charset.StandardCharsets.UTF_8)
      case (p, l) =>
        throw new IllegalArgumentException(
          s"zone map from footers: unsupported parquet type $p / $l — " +
          "use the scan-built map for this column")
    }
  }

  /** [[buildZoneMap]] from PARQUET FOOTER STATISTICS — zero row reads
    * (r11 verdict #4: the scan-built map's setup cost is a full
    * column read, which at 100 TB undercuts the operator's own
    * economics; the footer pass reads one ~KB metadata block per
    * file). The file list is a driver-side listing (the same
    * control-plane order of work as Spark's own file-index listing);
    * footer reads are DISTRIBUTED — one task per file partition, each
    * opening only its footers, so build cost is O(files/parallelism)
    * with no data-sized work anywhere.
    *
    * Per file: n_rows = Σ row-group counts; zone_min/max = min/max over
    * row-group statistics, rendered canonically and cast back to the
    * table's column type, so the output is row-for-row the scan-built
    * map (`ZoneMapScanSpec` gates the identity). The statistic-absence
    * contract is per ROW GROUP, not per file (ADVICE r12): if ANY row
    * group holding rows lacks usable statistics for the column (foreign
    * writers; parquet-mr omits stats whose rendered min+max exceed 4 KB)
    * the WHOLE file gets null min/max — folding only the statted groups
    * would produce a too-narrow envelope and [[pruneFiles]] could drop a
    * file containing matches. [[pruneFiles]] keeps null-zone files by
    * contract, so an absent statistic degrades to "never pruned", not
    * "wrongly pruned"; a row group whose stats prove it all-null
    * contributes nothing (nulls cannot match a range predicate).
    * Unsupported zone types fail loud.
    */
  def buildZoneMapFromFooters(spark: SparkSession, path: String,
                              zoneCol: String): DataFrame = {
    import org.apache.hadoop.fs.Path
    import spark.implicits._
    val hadoopPath = new Path(path)
    val fs = hadoopPath.getFileSystem(spark.sparkContext.hadoopConfiguration)
    val files = fs.listStatus(hadoopPath).toSeq
      .map(_.getPath)
      .filter(p => p.getName.endsWith(".parquet"))
      .map(_.toUri.toString)
      .sorted
    val confB = spark.sparkContext.broadcast(
      new org.apache.spark.util.SerializableConfiguration(
        spark.sparkContext.hadoopConfiguration))
    val zoneType = spark.read.parquet(path).schema(zoneCol).dataType
    val rows = spark.createDataset(files)
      .repartition(math.max(1, math.min(files.size,
        spark.sparkContext.defaultParallelism)))
      .mapPartitions { it =>
        import scala.jdk.CollectionConverters._
        val conf = confB.value.value
        it.map { f =>
          val footer = org.apache.parquet.hadoop.ParquetFileReader
            .readFooter(conf, new Path(f),
              org.apache.parquet.format.converter.ParquetMetadataConverter
                .NO_FILTER)
          val schema = footer.getFileMetaData.getSchema
          val colIdx = schema.getFieldIndex(zoneCol)
          val primType = schema.getType(colIdx).asPrimitiveType()
          var nRows = 0L
          var minS: String = null
          var maxS: String = null
          // String order is NOT parquet's value order (e.g. "9" > "10"),
          // so min/max across row groups reduce on the DECODED values via
          // the stats comparator, then render once.
          var minV: AnyRef = null
          var maxV: AnyRef = null
          // A row group carrying rows but NO usable statistics (foreign
          // writer, stats dropped for oversized values) holds values the
          // envelope cannot see — folding only the statted groups would
          // yield a too-narrow envelope and pruneFiles could drop a file
          // containing matches (ADVICE r12). One such group poisons the
          // WHOLE file to the null zone = never pruned. A group whose
          // stats say all-null (`!hasNonNullValue`) is different: nulls
          // cannot match a range predicate, so it safely contributes
          // nothing.
          var unknown = false
          val cmp = primType.comparator()
            .asInstanceOf[java.util.Comparator[AnyRef]]
          footer.getBlocks.asScala.foreach { block =>
            nRows += block.getRowCount
            val cc = block.getColumns.get(colIdx)
            val st = cc.getStatistics
            groupContribution(block.getRowCount, st) match {
              case GroupBounded =>
                val lo = st.genericGetMin.asInstanceOf[AnyRef]
                val hi = st.genericGetMax.asInstanceOf[AnyRef]
                if (minV == null || cmp.compare(lo, minV) < 0) minV = lo
                if (maxV == null || cmp.compare(hi, maxV) > 0) maxV = hi
              case GroupUnknown => unknown = true
              case GroupNothing => ()
            }
          }
          if (minV != null && !unknown) {
            minS = statToString(primType, minV)
            maxS = statToString(primType, maxV)
          }
          (f, minS, maxS, nRows)
        }
      }
      .toDF("file", "__min_s", "__max_s", "n_rows")
    rows.select(
      normFile(col("file")).as("file"),
      col("__min_s").cast(zoneType).as("zone_min"),
      col("__max_s").cast(zoneType).as("zone_max"),
      col("n_rows"))
  }

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
    val zones = buildZoneMapFromFooters(spark, path, zoneCol)
    val total = zones.count().toInt
    val files = pruneFiles(zones, lo, hi)
    val schema = spark.read.parquet(path).schema
    val out = prunedRead(spark, files, schema)
      .filter(col(zoneCol) >= lo && col(zoneCol) <= hi)
    (out, files.size, total)
  }
}
