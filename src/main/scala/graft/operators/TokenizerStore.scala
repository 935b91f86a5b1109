package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Versioned PERSISTENCE for tokenizer artifacts (r11 verdict #7): both
  * trainers emit their artifact as an in-plan DataFrame — the BPE merge
  * list ([[Bpe.trainMerges]]: round, left_sym, right_sym, weight) and
  * the unigram piece table ([[UnigramLm.trainPieces]]: piece, uses,
  * cost_bits) — but a pipeline ships tokenizers as FILES: train once,
  * encode for months, across jobs and engine upgrades. This store
  * writes the artifact as plain parquet with two embedded metadata
  * columns and fail-louds on mismatch at load:
  *
  *  - `__kind` — which artifact family the table is ("bpe_merges",
  *    "unigram_pieces"): loading a piece table where a merge list is
  *    expected is a schema accident that would otherwise surface as a
  *    confusing downstream column error (or worse, not at all).
  *  - `__format_version` — the writer's format revision: a reader
  *    built for a newer/older layout must refuse loudly, not
  *    misinterpret columns.
  *
  * Parquet (not JSON) so the artifact rides the same reader stack,
  * schema evolution, and column pruning as every other table, and so a
  * 100 TB-corpus tokenizer's vocab (≤ a few million rows) stays a
  * normal distributed write — no driver collect on the save path.
  * Metadata rides IN the rows (constant columns, dictionary-encoded to
  * ~nothing) rather than a sidecar file so the artifact is one
  * self-describing path that survives copy/rename.
  *
  * Round-trip contract: `load(save(a)) ≡ a` row-for-row, and encoding
  * through a loaded artifact is byte-identical to encoding through the
  * trained one — q241 (BPE) and q242 (unigram) gate exactly that by
  * sharing the q98/q267 encode oracles.
  */
object TokenizerStore {

  /** Current artifact layout revision. Bump when an artifact's column
    * semantics change; old files then fail loudly at [[load]].
    */
  val FormatVersion = 1

  /** Artifact kinds this store knows. Free-form strings would let a
    * typo'd kind at save time slip through the load check.
    */
  val KindBpeMerges = "bpe_merges"
  val KindUnigramPieces = "unigram_pieces"
  private val Kinds = Set(KindBpeMerges, KindUnigramPieces)

  def save(artifact: DataFrame, path: String, kind: String): Unit = {
    require(Kinds(kind), s"unknown tokenizer artifact kind '$kind' " +
      s"(known: ${Kinds.toSeq.sorted.mkString(", ")})")
    require(!artifact.columns.exists(_.startsWith("__")),
      "artifact columns must not collide with the store's __ metadata")
    artifact
      .withColumn("__kind", lit(kind))
      .withColumn("__format_version", lit(FormatVersion))
      .write.mode("overwrite").parquet(path)
  }

  /** Load an artifact saved by [[save]], verifying kind and version.
    * The metadata check is one control-plane aggregate (distinct over
    * two constant dictionary-encoded columns), not a data read.
    */
  def load(spark: SparkSession, path: String, kind: String): DataFrame = {
    val df = spark.read.parquet(path)
    require(df.columns.contains("__kind") &&
            df.columns.contains("__format_version"),
      s"$path is not a tokenizer artifact (missing __kind/" +
      "__format_version — was it written by TokenizerStore.save?)")
    val meta = df.select(col("__kind"), col("__format_version"))
      .distinct().collect()
    require(meta.length == 1,
      s"$path carries ${meta.length} distinct (kind, version) pairs — " +
      "corrupt or mixed artifact")
    val (gotKind, gotVer) = (meta(0).getString(0), meta(0).getInt(1))
    require(gotKind == kind,
      s"tokenizer artifact kind mismatch at $path: wanted '$kind', " +
      s"found '$gotKind'")
    require(gotVer == FormatVersion,
      s"tokenizer artifact format version mismatch at $path: this " +
      s"reader is v$FormatVersion, the file is v$gotVer — re-train or " +
      "upgrade the reader")
    df.drop("__kind", "__format_version")
  }
}
