package graft.llm

import graft.TestSpark
import org.apache.spark.sql.functions.col
import org.scalatest.funsuite.AnyFunSuite

/** htmlExtract: hand-built pages with known main content, asserting the
  * extractor's line classification (script/style drop, link-density
  * drop, short-line drop, stopword keep rule) and entity decoding
  * byte-for-byte.
  */
class HtmlExtractSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  private def extract(html: String): String =
    TextAnalysis.htmlExtract(Seq(html).toDF("html"))
      .select("extracted_text").head().getString(0)

  test("script and style blocks vanish wholesale") {
    val got = extract(
      "<html><style>p{color:red}</style><script>var the=1; of('and to');" +
        "</script><p>the quick brown fox jumps of and to the lazy dog</p>" +
        "</html>")
    assert(got == "the quick brown fox jumps of and to the lazy dog")
  }

  test("link-dense nav and pager lines are boilerplate") {
    val got = extract(
      "<div><a href=\"/\">Home page here</a> <a href=\"/x\">More link text</a></div>" +
        "<p>the actual article body of the page goes here and on</p>" +
        "<div><a href=\"/p\">Previous page</a> | <a href=\"/n\">Next page</a></div>")
    assert(got == "the actual article body of the page goes here and on")
  }

  test("short lines and stopword-free short chrome drop; long stopword-free text kept") {
    val longNoStop = "x".repeat(80) // >= 80 chars: kept without stopwords
    val got = extract(
      s"<h1>Crumbs</h1><p>$longNoStop</p>" +
        "<div>Copyright operator co - rights reserved</div>")
    assert(got == longNoStop)
  }

  test("entities decode on kept lines only, &amp; last") {
    val got = extract(
      "<p>the value is 1 &lt; 2 &amp;&amp; 3 &gt; 2 &quot;true&quot; &#39;y&#39;&nbsp;ok</p>")
    assert(got == "the value is 1 < 2 && 3 > 2 \"true\" 'y' ok")
  }

  test("hashedNgramScore matches a plain-JVM replay of the weight formula") {
    val text = "the quick brown fox jumps over the lazy dog"
    def w(g: String): Long = {
      val d = java.security.MessageDigest.getInstance("MD5")
        .digest(g.getBytes("UTF-8"))
      val hex = d.take(3).map("%02x".format(_)).mkString // 6 hex chars
      java.lang.Long.parseLong(hex, 16) % 1000 - 500
    }
    val toks = text.split(" ").toSeq
    val grams = toks ++ toks.sliding(2).map(_.mkString(" "))
    val expUnits = grams.map(w).sum
    val row = TextAnalysis.hashedNgramScore(Seq(text).toDF("text"))
      .select("n_grams", "score_units", "ngram_keep").head()
    assert(row.getLong(0) == grams.size.toLong)
    assert(row.getLong(1) == expUnits)
    assert(row.getBoolean(2) == (expUnits > 0))
  }

  test("audit metrics count lines and anchor chars") {
    val df = TextAnalysis.htmlExtract(Seq(
      "<div><a href=\"/\">Home</a></div><p>the main body of this page is right here</p>"
    ).toDF("html"))
    val row = df.select(
      org.apache.spark.sql.functions.size(col("__kept")).as("k"),
      org.apache.spark.sql.functions.aggregate(col("__lines"),
        org.apache.spark.sql.functions.lit(0L),
        (a, p) => a + p.getField("alen").cast("long")).as("anchor"))
      .head()
    assert(row.getAs[Int]("k") == 1)
    assert(row.getAs[Long]("anchor") == 4L) // "Home"
  }
}
