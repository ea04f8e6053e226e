package graft.llm

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Behavior of the round-4 curation operators: benchmark
  * decontamination, PII redaction, repetition metrics, deterministic
  * mixing, and the kernel id-type guard.
  */
class CurationOpsSpec extends SparkSpec {

  private def docsDF(rows: (Long, String)*) = {
    val s = spark; import s.implicits._
    rows.toDF("doc_id", "text")
  }

  test("decontaminate drops exactly the gram-overlap set") {
    val bench = docsDF(
      (100L, "alpha beta gamma delta epsilon"),
      (101L, "tiny")) // < n tokens: whole-text gram
    val corpus = docsDF(
      (1L, "prefix words alpha beta gamma delta more tail"), // shares a 4-gram
      (2L, "completely unrelated content with other words here"),
      (3L, "alpha beta gamma zeta eta"), // 3-token overlap only — clean at n=4
      (4L, "tiny")) // exact short-doc match
    val cont = Contamination
      .contaminatedIds(corpus, bench, "doc_id", "text", n = 4)
      .collect().map(_.getLong(0)).toSet
    assert(cont == Set(1L, 4L))
    val clean = Contamination
      .decontaminate(corpus, bench, "doc_id", "text", n = 4)
      .collect().map(_.getLong(0)).toSet
    assert(clean == Set(2L, 3L))
  }

  test("PII redaction finds and replaces emails, phones, IPs") {
    val df = docsDF(
      (1L, "reach me at first.last+tag@sub.example.org thanks"),
      (2L, "call 555-0199 or visit 192.168.1.254 today"),
      (3L, "no sensitive content at all"))
      .withColumn("red", TextAnalysis.redactPii(col("text")))
    val red = df.orderBy("doc_id").collect().map(_.getString(2))
    assert(red(0) == "reach me at <EMAIL> thanks")
    assert(red(1) == "call <PHONE> or visit <IP> today")
    assert(red(2) == "no sensitive content at all")
  }

  test("repetition metrics: degenerate text scores above diverse text") {
    val df = docsDF(
      (1L, "spam spam spam spam spam spam"),
      (2L, "one two three four five six"))
    val m = TextAnalysis.repetitionMetrics(df, "doc_id", "text")
      .orderBy("doc_id").collect()
    val (dupSpam, topSpam) = (m(0).getDouble(1), m(0).getDouble(2))
    val (dupDiv, topDiv) = (m(1).getDouble(1), m(1).getDouble(2))
    // "spam spam" occurs 5 times out of 5 grams: fully repetitive
    assert(dupSpam == 0.8 && topSpam == 1.0)
    assert(dupDiv == 0.0 && topDiv == 0.2)
    assert(dupSpam > dupDiv && topSpam > topDiv)
  }

  test("deterministic hash mixing: same input, same kept set, twice") {
    val df = docsDF((0L to 199L).map(i => (i, s"doc number $i")): _*)
    def keptIds() = df.filter(Curation.hashPct(col("doc_id")) < 40)
      .collect().map(_.getLong(0)).toSet
    val a = keptIds(); val b = keptIds()
    assert(a == b)
    assert(a.nonEmpty && a.size < 200) // a real subsample, not all/none
  }

  test("byte-slice kernels reject non-integral id columns loudly") {
    val s = spark; import s.implicits._
    val bad = Seq(("uuid-1", "some text here")).toDF("doc_id", "text")
    val e = intercept[IllegalArgumentException] {
      Dedup.shingleHashes(bad, "doc_id", "text")
    }
    assert(e.getMessage.contains("integral id column"))
  }
}
