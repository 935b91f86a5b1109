package graft.operators

import org.apache.spark.sql.functions._

import graft.SparkSpec

/** Contracts of [[Html.stripTags]] / [[Html.mainText]] beyond the q248
  * fixture: script bodies containing tags, double-encoded entities,
  * case-insensitive tags, the link-density boundary, and empty output.
  */
class HtmlSpec extends SparkSpec {
  import spark.implicits._

  private def strip(h: String): String =
    Seq(Tuple1(h)).toDF("h").select(Html.stripTags(col("h")))
      .collect()(0).getString(0)

  private def main(h: String, cap: Long = 500000L): String =
    Seq(Tuple1(h)).toDF("h").select(Html.mainText(col("h"), cap))
      .collect()(0).getString(0)

  test("script/style bodies are elided even when they contain tags " +
       "and comparison operators") {
    val h = "<p>keep</p><script>if (a<b) { document.write('<p>no</p>') }" +
      "</script><style>p>a{color:red}</style><p>also</p>"
    assert(strip(h) == "keep\nalso")
  }

  test("&amp;lt; decodes to the LITERAL string '&lt;' (no double decode)") {
    assert(strip("<p>a &amp;lt; b</p>") == "a &lt; b")
    assert(strip("<p>a &lt; b &amp; c</p>") == "a < b & c")
  }

  test("tags are case-insensitive; unknown inline tags become spaces") {
    assert(strip("<P>x</P><DIV>y</DIV><em>z</em>w") == "x\ny\nz w")
  }

  test("mainText drops a majority-anchor line, keeps a 50/50 line " +
       "(boundary is <=), and respects a custom cap") {
    // anchor 10 chars vs visible 20 chars -> exactly 0.5, kept at the
    // default cap
    val half = "<p><a href=\"x\">aaaaaaaaaa</a> bbbbbbbbb</p><p>body</p>"
    assert(main(half) == "aaaaaaaaaa bbbbbbbbb\nbody")
    // same line dropped once the cap is below 0.5
    assert(main(half, cap = 499999L) == "body")
    // majority-anchor nav dropped at default cap
    val nav = "<p><a href=\"x\">click here now</a> |</p><p>body</p>"
    assert(main(nav) == "body")
  }

  test("all-chrome input strips to the empty string") {
    assert(strip("<script>x</script><style>y</style><!-- z -->") == "")
    assert(main("<p><a href=\"q\">only links</a></p>") == "")
  }
}
