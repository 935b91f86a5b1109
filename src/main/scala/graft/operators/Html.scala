package graft.operators

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** HTML → text extraction — the TOP of every real pretraining funnel:
  * CommonCrawl-style pipelines start from markup, and the quality of
  * tag stripping / entity decoding / boilerplate removal decides what
  * the whole downstream dedup + curation stack ever sees.
  *
  * Two layers:
  *  - [[stripTags]]: deterministic, engine-portable text extraction
  *    (script/style/comment elision, block tags → line breaks, inline
  *    tag removal, entity decode, per-line whitespace normalization).
  *    Every regex is RE2-compatible (no backreferences, no lookaround)
  *    SO THE SAME pattern chain runs verbatim in DuckDB — the q248
  *    oracle gate.
  *  - [[mainText]]: stripTags plus the classic LINK-DENSITY boilerplate
  *    heuristic (Kohlschütter et al.'s boilerplate signal, simplified):
  *    a line whose visible characters are mostly anchor text is
  *    navigation/chrome, not content, and is dropped. Heuristic layer —
  *    spec-verified, not oracle-gated.
  *
  * Scale shape: both are pure per-row projection chains — regex +
  * array ops inside whole-stage codegen, zero shuffle, linear in input
  * bytes. At 100 TB this is the classic narrow "extraction" stage in
  * front of the corpus store; nothing here ever joins or aggregates.
  */
object Html {

  private val BlockTags =
    "p|div|br|h[1-6]|li|ul|ol|tr|table|nav|header|footer|section|article|blockquote|pre|td|th"

  /** space, tab, NBSP — the intra-line whitespace to collapse. */
  private val LineWs = "[ \t\u00a0]+"

  /** Strip `html` to visible text: one line per block element, entities
    * decoded, whitespace collapsed, empty lines dropped. Lines join
    * with '\n'.
    */
  def stripTags(html: Column): Column = {
    // script/style contents are invisible, not text — elide bodies.
    // (Two passes, not one with a backreference: RE2 — and therefore
    // the DuckDB oracle — has no backreferences.)
    val noScript = regexp_replace(html,
      "(?is)<script[^>]*>.*?</script>", " ")
    val noStyle = regexp_replace(noScript,
      "(?is)<style[^>]*>.*?</style>", " ")
    val noComment = regexp_replace(noStyle, "(?s)<!--.*?-->", " ")
    val blocks = regexp_replace(noComment,
      s"(?i)</?($BlockTags)[^>]*>", "\n")
    val noTags = regexp_replace(blocks, "<[^>]*>", " ")
    joinVisibleLines(decodeEntities(noTags))
  }

  /** Decode the common named/numeric entities — AFTER tag removal, so
    * encoded angle brackets can never be parsed as tags. `&amp;` is
    * decoded LAST or `&amp;lt;` would double-decode.
    */
  private def decodeEntities(c: Column): Column = {
    val e = Seq(
      "&lt;" -> "<", "&gt;" -> ">", "&quot;" -> "\"",
      "&#39;" -> "'", "&nbsp;" -> " ", "&copy;" -> "©")
    val decoded = e.foldLeft(c) { case (acc, (k, v)) =>
      regexp_replace(acc, java.util.regex.Pattern.quote(k), v)
    }
    regexp_replace(decoded, java.util.regex.Pattern.quote("&amp;"), "&")
  }

  /** Collapse spaces/tabs/NBSP per line, trim, drop empty lines,
    * rejoin with '\n'.
    */
  private def joinVisibleLines(c: Column): Column =
    array_join(
      filter(
        transform(split(c, "\n"),
          x => trim(regexp_replace(x, LineWs, " "))),
        x => x =!= ""),
      "\n")

  /** [[stripTags]] plus link-density boilerplate removal: a block line
    * whose anchor-text characters exceed `maxLinkDensityE6`/10⁶ of its
    * visible characters is chrome (nav bars, footers of links) and is
    * dropped. Density is computed per BLOCK LINE of the original
    * markup — anchors must be measured before their tags disappear.
    */
  def mainText(html: Column, maxLinkDensityE6: Long = 500000L): Column = {
    require(maxLinkDensityE6 >= 0, s"bad density cap: $maxLinkDensityE6")
    val noScript = regexp_replace(html,
      "(?is)<script[^>]*>.*?</script>", " ")
    val noStyle = regexp_replace(noScript,
      "(?is)<style[^>]*>.*?</style>", " ")
    val noComment = regexp_replace(noStyle, "(?s)<!--.*?-->", " ")
    val blocks = regexp_replace(noComment,
      s"(?i)</?($BlockTags)[^>]*>", "\n")
    val lines = split(blocks, "\n")
    val visible = (line: Column) =>
      trim(regexp_replace(
        decodeEntities(regexp_replace(line, "<[^>]*>", " ")),
        LineWs, " "))
    // anchor chars per line: total length of <a>...</a> inner texts
    val anchorChars = (line: Column) =>
      aggregate(
        regexp_extract_all(line, lit("(?is)<a[^>]*>([^<]*)</a>"), lit(1)),
        lit(0L), (acc, x) => acc + length(x))
    val keptLines = filter(lines, line =>
      length(visible(line)) > 0 &&
        anchorChars(line) * lit(1000000L) <=
          lit(maxLinkDensityE6) * length(visible(line)).cast("long"))
    array_join(transform(keptLines, visible), "\n")
  }
}
