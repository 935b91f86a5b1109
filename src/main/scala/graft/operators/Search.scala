package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.functions.TextFunctions

/** Corpus search — exact phrase lookup via token postings: the
  * candidate-then-verify shape of an inverted-index engine. Candidates
  * are documents containing ALL of a phrase's distinct tokens (posting
  * intersection — a hash aggregate on (doc, phrase), never a scan-wide
  * substring sweep); only candidates pay the exact word-boundary
  * verification.
  *
  * Scale note: here postings are derived inline (one explode over the
  * scan, pre-filtered to query tokens so the shuffle carries only
  * matching-token rows); a production deployment materializes the same
  * posting table once (bucketed by token — see [[Bucketing]]) and each
  * query then touches only its tokens' buckets. The verify stage and
  * everything downstream are identical in both deployments.
  */
object Search {

  /** Exact phrase hits: one row per (phrase, containing doc), with the
    * 1-based position of the first word-boundary occurrence.
    */
  def phraseSearch(docs: DataFrame, idCol: String, textCol: String,
                   phrases: Seq[String]): DataFrame = {
    require(phrases.nonEmpty && phrases.forall(_.trim.nonEmpty),
      "phrases must be non-empty")
    val spark = docs.sparkSession
    import spark.implicits._
    val phraseDf = phrases.map { p =>
      val toks = p.split(" ").filter(_.nonEmpty).distinct
      (p, toks, toks.length.toLong)
    }.toDF("phrase", "toks", "n_toks")
    val tokens = phraseDf
      .select(col("phrase"), col("n_toks"), explode(col("toks")).as("w"))
    val allToks = phrases.flatMap(_.split(" ")).filter(_.nonEmpty).distinct
    val postings = Partitioning.spread(docs)
      .select(col(idCol).as("doc_id"),
              explode(TextFunctions.words(col(textCol))).as("w"))
      .filter(col("w").isin(allToks: _*))
      .distinct()
    val candidates = postings
      .join(broadcast(tokens), Seq("w"))
      .groupBy(col("doc_id"), col("phrase"), col("n_toks"))
      .agg(count(lit(1)).as("n_found"))
      .filter(col("n_found") === col("n_toks"))
      .select("doc_id", "phrase")
    candidates
      .join(docs.select(col(idCol).as("doc_id"), col(textCol).as("__t")),
            Seq("doc_id"))
      .withColumn("pos",
        locate_padded(col("__t"), col("phrase")))
      .filter(col("pos") > 0)
      .select(col("phrase"), col("doc_id"), col("pos"))
  }

  /** 1-based position of the first word-boundary occurrence of `phrase`
    * in `text` (0 when absent): both sides space-padded so boundaries
    * are plain characters — `instr` stays a codegen'd scan.
    */
  private def locate_padded(text: org.apache.spark.sql.Column,
                            phrase: org.apache.spark.sql.Column) =
    instr(concat(lit(" "), text, lit(" ")),
          concat(lit(" "), phrase, lit(" "))).cast("long")
}
