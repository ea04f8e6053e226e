package graft.llm

import graft.SparkSpec
import graft.llm.Tokenizer._
import org.apache.spark.sql.functions._

class TokenizerSpec extends SparkSpec {

  test("trainBpe learns merges in frequency order with deterministic ties") {
    // (a,b) occurs 15x, (b,c) 5x -> merge1 = (a,b); then (ab,c) 5x
    val hist = Array(("ab", 10L), ("abc", 5L))
    val model = trainBpe(hist, numMerges = 10)
    assert(model.merges == Seq(("a", "b"), ("ab", "c")))
  }

  test("overlapping pairs count per position; merge applies left-to-right") {
    // "aaab": pairs (a,a)x2 + (a,b)x1 -> merge (a,a) wins
    // apply left-to-right non-overlapping: aaab -> [aa, a, b]
    val model = trainBpe(Array(("aaab", 1L)), numMerges = 1)
    assert(model.merges == Seq(("a", "a")))
    assert(encodeWord("aaab", model.ranks).toSeq == Seq("aa", "a", "b"))
  }

  test("tie on count breaks lexicographically") {
    // (x,y) and (a,b) both occur once -> (a,b) merges first
    val model = trainBpe(Array(("xy", 1L), ("ab", 1L)), numMerges = 2,
      minPairCount = 1L)
    assert(model.merges == Seq(("a", "b"), ("x", "y")))
  }

  test("minPairCount stops training before singleton pairs") {
    val model = trainBpe(Array(("ab", 1L), ("ab", 1L)), numMerges = 10,
      minPairCount = 3L)
    assert(model.merges.isEmpty)
  }

  test("encodeWord on unseen words follows learned merge ranks") {
    val hist = Array(("low", 5L), ("lower", 2L), ("newest", 6L), ("widest", 3L))
    val model = trainBpe(hist, numMerges = 4)
    // every encode must be lossless regardless of segmentation
    for (w <- Seq("low", "lower", "newest", "widest", "lowest", "west", "")) {
      assert(encodeWord(w, model.ranks).mkString == w, s"lossy encode of '$w'")
    }
    // trained words with count >= minPairCount collapse fully or nearly:
    // "newest" (6x) must end with far fewer symbols than letters
    assert(encodeWord("newest", model.ranks).length < 6)
  }

  test("save/load round-trips the model with rank order intact") {
    val hist = Array(("low", 5L), ("lower", 2L), ("newest", 6L), ("widest", 3L))
    val model = trainBpe(hist, numMerges = 6)
    assert(model.merges.nonEmpty)
    val path = graft.util.Fixtures.dir + "/bpe_model"
    save(model, spark, path)
    val back = load(spark, path)
    assert(back.merges == model.merges)
    // identical segmentation behavior after reload
    for (w <- Seq("newest", "lowest", "wide"))
      assert(encodeWord(w, back.ranks).toSeq ==
        encodeWord(w, model.ranks).toSeq)
  }

  test("encodeDocs is lossless and compressive on a toy corpus") {
    val s = spark
    import s.implicits._
    val docs = Seq(
      (1L, "the cat sat on the mat"),
      (2L, "the cat, the cat!"),
      (3L, "surrogate 😀 pair 😀"),
      (4L, null.asInstanceOf[String]),
      (5L, "")).toDF("doc_id", "text")
    val hist = wordHistogram(docs, "text", maxWords = 100)
    assert(hist.head._1 == "the" && hist.head._2 == 4L) // top word by count
    val model = trainBpe(hist, numMerges = 20, minPairCount = 2L)
    val enc = encodeDocs(docs, "doc_id", "text", model)
    val rows = enc.select(col("doc_id"), concat_ws("", col("tokens")).as("j"),
      size(col("tokens")).as("n")).collect()
      .map(r => r.getLong(0) -> (r.getString(1), r.getInt(2))).toMap
    // null text dropped, empty text -> zero tokens
    assert(!rows.contains(4L) && rows(5L) == ("", 0))
    // lossless vs the pre-tokenized (whitespace-stripped) text
    assert(rows(1L)._1 == "thecatsatonthemat")
    assert(rows(2L)._1 == "thecat,thecat!")
    assert(rows(3L)._1 == "surrogate😀pair😀")
    // "the" occurs 4x (>= minPairCount) -> must have merged below 3 chars/occurrence
    assert(rows(2L)._2 < "thecatthecat".length + 2)
  }
}
