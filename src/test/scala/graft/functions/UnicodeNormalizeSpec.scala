package graft.functions

import org.apache.spark.sql.functions._

import graft.SparkSpec

/** Contracts of [[UnicodeNormalize]]: canonical composition (NFC),
  * decomposition (NFD), the compatibility folds only NFKC/NFKD perform
  * (ligatures, superscripts, full-width forms), null/ASCII behavior, and
  * published-vector checks — the forms DuckDB cannot oracle.
  */
class UnicodeNormalizeSpec extends SparkSpec {
  import spark.implicits._

  private def norm(s: String, form: String): String =
    Seq(Tuple1(s)).toDF("t")
      .select(TextFunctions.unicodeNormalize(col("t"), form))
      .collect()(0).getString(0)

  test("NFC composes combining sequences; NFD decomposes them back") {
    val deco = "cafe\u0301"
    val comp = "caf\u00e9"
    assert(norm(deco, "NFC") == comp)
    assert(norm(comp, "NFD") == deco)
    // idempotent
    assert(norm(norm(deco, "NFC"), "NFC") == comp)
  }

  test("NFKC applies compatibility folds NFC must not touch") {
    // U+FB01 LATIN SMALL LIGATURE FI, U+00B2 SUPERSCRIPT TWO,
    // U+FF21 FULLWIDTH LATIN CAPITAL LETTER A
    assert(norm("\ufb01le", "NFKC") == "file")
    assert(norm("x\u00b2", "NFKC") == "x2")
    assert(norm("\uff21BC", "NFKC") == "ABC")
    assert(norm("\ufb01le", "NFC") == "\ufb01le")
    assert(norm("x\u00b2", "NFC") == "x\u00b2")
  }

  test("ASCII is a fixed point of every form; nulls propagate") {
    val ascii = "plain ascii text 123"
    Seq("NFC", "NFD", "NFKC", "NFKD").foreach { f =>
      assert(norm(ascii, f) == ascii)
    }
    val r = Seq((1L, null: String)).toDF("id", "t")
      .select(TextFunctions.unicodeNormalize(col("t"), "NFC"))
      .collect()(0)
    assert(r.isNullAt(0))
  }

  test("an unknown form fails loudly at construction") {
    intercept[IllegalArgumentException] {
      TextFunctions.unicodeNormalize(lit("x"), "NFX")
    }
  }
}
