package graft.functions

import org.apache.spark.sql.functions._

import graft.SparkSpec

/** Contracts of [[UrlFunctions.canonicalizeUrl]]: variant URLs of one
  * page collapse, distinct pages stay distinct, and the domain extractor
  * handles path-less and query-only forms.
  */
class UrlFunctionsSpec extends SparkSpec {
  import spark.implicits._

  private def canon(urls: String*): Seq[String] =
    urls.toDF("url")
      .select(UrlFunctions.canonicalizeUrl(col("url")).as("c"))
      .collect().map(_.getString(0)).toSeq

  test("scheme, www, trailing utm, trailing slash, and fragment " +
       "variants collapse to one canonical form") {
    val got = canon(
      "http://www.Site7.com/p/17",
      "HTTPS://site7.com/p/17/",
      "https://WWW.site7.com/p/17#sec",
      "http://site7.com/p/17?utm_source=s2",
      "https://www.site7.com/p/17?utm_campaign=c#frag")
    assert(got.distinct == Seq("site7.com/p/17"), s"got $got")
  }

  test("identity-bearing query params survive; only trailing utm_* dies") {
    val got = canon("http://a.com/x?id=3&utm_source=s1",
                    "http://a.com/x?id=4")
    assert(got == Seq("a.com/x?id=3", "a.com/x?id=4"), s"got $got")
  }

  test("distinct pages do not collapse") {
    val got = canon("http://a.com/x", "http://a.com/y", "http://b.com/x")
    assert(got.distinct.size == 3, s"got $got")
  }

  test("urlDomain extracts the host from path-less and query-only forms") {
    val got = Seq("a.com/x/y", "b.com", "c.com?id=1")
      .toDF("c").select(UrlFunctions.urlDomain(col("c")))
      .collect().map(_.getString(0)).toSeq
    assert(got == Seq("a.com", "b.com", "c.com"), s"got $got")
  }
}
