package graft.sources

import org.apache.spark.sql.functions._

import graft.SparkSpec

/** Schema-evolution read contract: a table whose parquet files were
  * written under different schema versions (columns ADDED over time —
  * the only evolution a long-lived ingest actually performs) reads as
  * the union schema with nulls for pre-addition rows, and the scan
  * still prunes columns and pushes filters per file.
  */
class SchemaEvolutionSpec extends SparkSpec {
  import spark.implicits._

  test("added columns surface as nulls for old files; filters still work") {
    val dir = java.nio.file.Files
      .createTempDirectory("graft-schema-evo").toString
    // v1 files: (id, name); v2 adds score
    Seq((1L, "a"), (2L, "b")).toDF("id", "name")
      .write.mode("append").parquet(dir)
    Seq((3L, "c", 30L), (4L, "d", 40L)).toDF("id", "name", "score")
      .write.mode("append").parquet(dir)

    val df = spark.read.option("mergeSchema", "true").parquet(dir)
    assert(df.columns.sorted.toSeq === Seq("id", "name", "score"))

    val rows = df.select("id", "score").collect()
      .map(r => r.getLong(0) -> (if (r.isNullAt(1)) None
                                 else Some(r.getLong(1))))
      .toMap
    assert(rows === Map(1L -> None, 2L -> None,
                        3L -> Some(30L), 4L -> Some(40L)))

    // predicates on the ADDED column must not resurrect old rows
    assert(df.filter(col("score") >= 40).collect().map(_.getLong(0))
      .toSeq === Seq(4L))
    // null-aware read of the evolved column
    assert(df.filter(col("score").isNull).count() === 2L)
  }
}
