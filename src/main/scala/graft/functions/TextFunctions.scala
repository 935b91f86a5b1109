package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Text-analysis building blocks for large-scale training-data pipelines:
  * tokenization, shingling, language-ID scoring, quality metrics, and a
  * rolling document fingerprint.
  *
  * Everything here is a pure per-row `Column` expression built from
  * codegen'd built-ins (no UDFs, no shuffles): at 100 TB these run inside
  * whole-stage codegen directly over the parquet scan and scale linearly.
  * Fractional outputs are emitted as floor-scaled integers (`*_e6`) so
  * results hash identically across engines (no float rounding ambiguity).
  */
object TextFunctions {

  /** Whitespace tokens. Mirrors `string_split(text, ' ')`: consecutive
    * delimiters yield empty tokens in both Spark and DuckDB.
    */
  def words(text: Column): Column = split(text, " ")

  /** Unicode-normalize a string column (see [[UnicodeNormalize]]).
    * `form` ∈ NFC | NFD | NFKC | NFKD.
    */
  def unicodeNormalize(text: Column, form: String = "NFC"): Column = {
    import org.apache.spark.sql.GraftColumns
    GraftColumns.column(
      UnicodeNormalize(GraftColumns.expression(text), form))
  }

  /** BPE-ish regex tokens: letter runs, digit runs, then any single
    * non-space symbol. The pattern is dialect-portable (Java regex ≡ RE2).
    */
  def regexTokens(text: Column): Column =
    regexp_extract_all(text, lit("[A-Za-z]+|[0-9]+|[^A-Za-z0-9\\s]"), lit(0))

  /** Distinct word n-gram shingles (the unit set for Jaccard dedup).
    * Empty for docs shorter than n words. Computed by the codegen'd
    * [[WordShingles]] kernel — value-identical to the HOF form
    * `array_distinct(transform(sequence(0, size(w)-n),
    * i => concat_ws(" ", slice(w, i+1, n))))` it replaced, but a single
    * compiled call per row instead of interpreted per-shingle lambdas.
    *
    * Null contract: null text → null (the kernel is null-preserving, like
    * every Spark unary expression). This differs from the pre-kernel
    * when/otherwise form, which mapped null to an empty array — callers
    * that want the old contract wrap with `coalesce(shingles(...),
    * array())`; in-repo call sites all filter/explode, where the two are
    * equivalent.
    */
  def shingles(text: Column, n: Int): Column = {
    import org.apache.spark.sql.GraftColumns
    GraftColumns.column(
      WordShingles(GraftColumns.expression(words(text)), n))
  }

  /** Small per-language stopword lists for the n-gram language-ID
    * heuristic. Alphabetical language order is the documented tie-break.
    */
  val LangStopwords: Seq[(String, Seq[String])] = Seq(
    "de" -> Seq("der", "die", "das", "und", "ist", "von", "mit", "zu"),
    "en" -> Seq("the", "a", "and", "of", "to", "in", "is", "it"),
    "es" -> Seq("el", "la", "de", "que", "y", "en", "un", "es"),
    "fr" -> Seq("le", "les", "de", "et", "un", "est", "dans", "que"))

  /** Count of words that hit a language's stopword list (with
    * multiplicity — a frequency signal, not set membership). Codegen'd
    * [[WordSetCount]] kernel, value-identical to
    * `size(filter(w, _.isInCollection(list)))`.
    */
  def langScore(w: Column, lang: String): Column = {
    import org.apache.spark.sql.GraftColumns
    GraftColumns.column(
      WordSetCount(GraftColumns.expression(w), LangStopwords.toMap.apply(lang)))
  }

  /** Argmax language by [[langScore]], ties → alphabetically first. */
  def langPredict(scores: Map[String, Column]): Column = {
    val langs = LangStopwords.map(_._1) // alphabetical
    langs.init.foldRight(lit(langs.last)) { (l, rest) =>
      val ge = langs.filter(_ > l)
        .map(o => scores(l) >= scores(o)).reduce(_ && _)
      when(ge, lit(l)).otherwise(rest)
    }
  }

  // ------------------------------------------------------- PII redaction

  /** PII patterns, ordered by redaction precedence. Dialect-portable
    * (Java regex ≡ RE2: character classes, bounded repeats, `\b` word
    * boundaries only — no lookaround), so an external engine reproduces
    * match sets exactly. Deliberately high-precision/literal shapes: a
    * production scrubber extends the table, the operator shape (count +
    * sequential replace inside codegen) is what matters at 100 TB.
    */
  val PiiPatterns: Seq[(String, String, String)] = Seq(
    ("email", "[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{2,}", "<EMAIL>"),
    ("phone", "\\+[0-9]{1,2}-[0-9]{3}-[0-9]{4}", "<PHONE>"),
    ("ip", "\\b[0-9]{1,3}\\.[0-9]{1,3}\\.[0-9]{1,3}\\.[0-9]{1,3}\\b", "<IP>"))

  /** Count of matches of one PII category in `text` (on the ORIGINAL
    * text — counts are stable regardless of replacement order).
    */
  def piiCount(text: Column, category: String): Column = {
    val pat = PiiPatterns.find(_._1 == category).get._2
    size(regexp_extract_all(text, lit(pat), lit(0)))
  }

  /** Redact every PII category, applying patterns in [[PiiPatterns]]
    * order. Pure per-row expression chain — no shuffle, whole-stage
    * codegen'd, linear at any scale.
    */
  def redactPii(text: Column): Column =
    PiiPatterns.foldLeft(text) { case (acc, (_, pat, repl)) =>
      regexp_replace(acc, pat, repl)
    }

  /** Rolling polynomial fingerprint over words:
    * h ← (h*31 + h24(word)) mod 1e9+7. Order-sensitive (unlike a plain
    * sum), overflow-free (acc < 2^30, *31 + 2^24 < 2^35).
    */
  def fingerprint(text: Column): Column =
    aggregate(
      words(text),
      lit(0L),
      (acc, w) => pmod(acc * 31 + PortableHash.h24(w), lit(1000000007L)))

  /** Deterministic token masking — denoising-objective prep (BERT/T5
    * style): token at 0-based position i of document `id` is masked iff
    * `h32(id:i) mod 100 < pct`. Position-keyed hashing (not token-keyed)
    * masks repeated words independently, and NO RNG means the corruption
    * is byte-reproducible across runs, engines, and partitionings — the
    * [[graft.operators.Sampling]] discipline applied inside the row.
    * Pure per-row expression, zero shuffle.
    */
  def maskTokens(id: Column, text: Column, pct: Int,
                 mask: String = "<MASK>"): Column = {
    require(pct >= 0 && pct <= 100, s"pct must be in [0,100], got $pct")
    transform(words(text), (w, i) =>
      when(pmod(PortableHash.h32(
          concat(id.cast("string"), lit(":"), i.cast("string"))),
          lit(100L)) < pct, lit(mask))
        .otherwise(w))
  }
}
