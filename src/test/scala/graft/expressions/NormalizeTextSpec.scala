package graft.expressions

import graft.SparkSpec
import org.apache.spark.sql.functions._
import org.apache.spark.unsafe.types.UTF8String

/** Unicode normalization expressions: hand-known NFC/NFKC/strip-accent
  * cases, null handling, the ASCII zero-copy fast path, and SQL
  * registration. Unicode is written as \u escapes so composed vs
  * decomposed literals are unambiguous in source. Values run through a
  * DataFrame (exercising codegen) AND the kernel directly.
  */
class NormalizeTextSpec extends SparkSpec {

  // composed: é = U+00E9, û = U+00FB; decomposed: e/u + combining mark
  private val composed = "Cr\u00e8me br\u00fbl\u00e9e"
  private val decomposed = "Cre\u0300me bru\u0302le\u0301e"

  private def one(text: String, form: String): String = {
    val s = spark; import s.implicits._
    Seq(text).toDF("t")
      .select(NormalizeText.unicodeNormalize(col("t"), form).as("n"))
      .head().getString(0)
  }

  private def strip(text: String): String = {
    val s = spark; import s.implicits._
    Seq(text).toDF("t")
      .select(NormalizeText.stripAccents(col("t")).as("n"))
      .head().getString(0)
  }

  test("NFC composes combining sequences; NFD decomposes them") {
    assert(composed != decomposed)
    assert(one(decomposed, "NFC") == composed)
    assert(one(composed, "NFD") == decomposed)
    // idempotence on both fixed points
    assert(one(composed, "NFC") == composed)
    assert(one(decomposed, "NFD") == decomposed)
  }

  test("NFKC folds compatibility forms (ligature, fullwidth)") {
    assert(one("eﬃcient", "NFKC") == "efficient") // ffi ligature
    assert(one("Ｈｅｌｌｏ", "NFKC") == "Hello") // fullwidth
    // NFC must NOT touch compatibility forms
    assert(one("eﬃcient", "NFC") == "eﬃcient")
  }

  test("stripAccents removes marks from composed AND decomposed input") {
    assert(strip(composed) == "Creme brulee")
    assert(strip(decomposed) == "Creme brulee")
    assert(strip("áéíöü") == "aeiou")
    // non-accent non-ASCII survives (CJK has no marks to strip)
    assert(strip("中文 café") == "中文 cafe")
  }

  test("null in, null out; empty is identity") {
    val s = spark; import s.implicits._
    val r = Seq(Some("á"), None, Some("")).toDF("t")
      .select(NormalizeText.unicodeNormalize(col("t"), "NFC").as("n"),
        NormalizeText.stripAccents(col("t")).as("st"))
      .collect()
    assert(r(0).getString(0) == "á" && r(0).getString(1) == "a")
    assert(r(1).isNullAt(0) && r(1).isNullAt(1))
    assert(r(2).getString(0) == "" && r(2).getString(1) == "")
  }

  test("ASCII fast path returns the SAME UTF8String (no copy)") {
    val ascii = UTF8String.fromString("plain ascii text 123")
    assert(NormalizeTextKernel.normalize(ascii,
      java.text.Normalizer.Form.NFC) eq ascii)
    assert(NormalizeTextKernel.stripAccents(ascii) eq ascii)
  }

  test("invalid form / non-string input fail analysis loudly") {
    val s = spark; import s.implicits._
    val df = Seq("x").toDF("t")
    intercept[Exception] {
      df.select(NormalizeText.unicodeNormalize(col("t"), "NFX")).head()
    }
    intercept[Exception] {
      Seq(1L).toDF("v")
        .select(NormalizeText.stripAccents(col("v"))).head()
    }
  }

  test("SQL registration: unicode_normalize and strip_accents callable") {
    NormalizeText.register(spark)
    val r = spark.sql(
      "SELECT unicode_normalize('á', 'NFC') AS n, " +
        "strip_accents('été') AS st").head()
    assert(r.getString(0) == "á" && r.getString(1) == "ete")
  }
}
