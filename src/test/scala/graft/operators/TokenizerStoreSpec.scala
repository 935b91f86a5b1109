package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Contracts of [[TokenizerStore]] — the versioned parquet persistence
  * for tokenizer artifacts: lossless round-trip, and LOUD failure on
  * every mismatch a shipped-file workflow can produce (wrong kind,
  * wrong format version, a path that isn't an artifact, a corrupt mix).
  */
class TokenizerStoreSpec extends SparkSpec {
  import spark.implicits._

  private def tmp(name: String): String =
    System.getProperty("java.io.tmpdir") + s"/graft_tokstore_spec_$name"

  private val pieces = Seq(("a", 5L, 3L), ("ab", 2L, 4L), ("b", 4L, 3L))
    .toDF("piece", "uses", "cost_bits")

  test("round-trip is lossless: load(save(a)) == a row-for-row, meta " +
       "columns stripped") {
    val p = tmp("rt")
    TokenizerStore.save(pieces, p, TokenizerStore.KindUnigramPieces)
    val back = TokenizerStore.load(spark, p,
                                   TokenizerStore.KindUnigramPieces)
    assert(back.columns.toSeq == Seq("piece", "uses", "cost_bits"))
    assert(back.collect().map(_.toSeq).toSet ==
           pieces.collect().map(_.toSeq).toSet)
  }

  test("kind mismatch fails loud (loading a piece table as a merge " +
       "list)") {
    val p = tmp("kind")
    TokenizerStore.save(pieces, p, TokenizerStore.KindUnigramPieces)
    val e = intercept[IllegalArgumentException] {
      TokenizerStore.load(spark, p, TokenizerStore.KindBpeMerges)
    }
    assert(e.getMessage.contains("kind mismatch"))
  }

  test("format-version mismatch fails loud") {
    val p = tmp("ver")
    // forge a future-version artifact: same layout, version + 1
    pieces
      .withColumn("__kind", lit(TokenizerStore.KindUnigramPieces))
      .withColumn("__format_version",
                  lit(TokenizerStore.FormatVersion + 1))
      .write.mode("overwrite").parquet(p)
    val e = intercept[IllegalArgumentException] {
      TokenizerStore.load(spark, p, TokenizerStore.KindUnigramPieces)
    }
    assert(e.getMessage.contains("format version mismatch"))
  }

  test("a plain parquet table (no meta columns) and a mixed-meta file " +
       "both fail loud; unknown kind refused at save") {
    val p = tmp("plain")
    pieces.write.mode("overwrite").parquet(p)
    val e = intercept[IllegalArgumentException] {
      TokenizerStore.load(spark, p, TokenizerStore.KindUnigramPieces)
    }
    assert(e.getMessage.contains("not a tokenizer artifact"))
    val pm = tmp("mixed")
    pieces
      .withColumn("__kind",
        when(col("piece") === "a", TokenizerStore.KindBpeMerges)
          .otherwise(TokenizerStore.KindUnigramPieces))
      .withColumn("__format_version", lit(TokenizerStore.FormatVersion))
      .write.mode("overwrite").parquet(pm)
    val e2 = intercept[IllegalArgumentException] {
      TokenizerStore.load(spark, pm, TokenizerStore.KindUnigramPieces)
    }
    assert(e2.getMessage.contains("distinct (kind, version)"))
    val e3 = intercept[IllegalArgumentException] {
      TokenizerStore.save(pieces, tmp("bad"), "word2vec")
    }
    assert(e3.getMessage.contains("unknown tokenizer artifact kind"))
  }

  test("artifact columns may not collide with the __ metadata namespace") {
    val bad = pieces.withColumn("__weird", lit(1))
    val e = intercept[IllegalArgumentException] {
      TokenizerStore.save(bad, tmp("collide"),
                          TokenizerStore.KindUnigramPieces)
    }
    assert(e.getMessage.contains("metadata"))
  }
}
