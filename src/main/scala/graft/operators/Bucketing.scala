package graft.operators

import org.apache.spark.sql.DataFrame

/** Bucketed-table helpers: the co-located join path.
  *
  * A fact⋈fact join on a shared key shuffles BOTH sides every query. When
  * the same join key recurs (orders⋈lineitem on orderkey, games⋈games on
  * player), bucketing pays the shuffle once at write time: both tables are
  * hash-partitioned into the same number of buckets on the key, and every
  * subsequent equi-join on that key is planned WITHOUT an Exchange on
  * either side (sort-merge over matching bucket files). At 100 TB that
  * converts the recurring dominant cost of the workload into a one-time
  * layout decision.
  *
  * Spark requires `saveAsTable` for bucket metadata (a plain parquet path
  * has nowhere to record the bucket spec); pass `path` to keep data
  * outside the default warehouse.
  */
object Bucketing {

  def writeBucketed(df: DataFrame, table: String, key: String, buckets: Int,
                    path: Option[String] = None): Unit = {
    val w = df.write
      .format("parquet")
      .mode("overwrite")
      .bucketBy(buckets, key)
      .sortBy(key)
    path.fold(w)(p => w.option("path", p)).saveAsTable(table)
  }
}
