package graft.llm

import graft.SparkSpec
import org.apache.spark.sql.functions._

class HybridRetrievalSpec extends SparkSpec {

  test("bm25 ranks rare-term overlap above common-term overlap") {
    import spark.implicits._
    // query doc 0 contains rare term "zebra" and common term "the".
    // doc 1 shares the rare term, doc 2 only the common one; both have
    // equal length. idf(zebra) >> idf(the) so doc 1 must outrank doc 2.
    val docs = Seq(
      (0L, "zebra the alpha"),
      (1L, "zebra beta gamma"),
      (2L, "the beta gamma"),
      (3L, "the delta epsilon"),
      (4L, "the eta theta")).toDF("doc_id", "text")
    val panel = Seq(0L).toDF("qid")
    val got = HybridRetrieval.bm25TopN(docs, panel, topN = 3)
      .orderBy("rank").collect()
    assert(got.head.getAs[Long]("doc") == 1L,
      s"rank-1 should be the rare-term doc, got ${got.head}")
    // self is excluded
    assert(!got.map(_.getAs[Long]("doc")).contains(0L))
  }

  test("rrfFuse: a doc on both lists beats single-list docs at equal rank") {
    import spark.implicits._
    val a = Seq((1L, 1, 10L), (1L, 2, 11L)).toDF("qid", "rank", "doc")
    val b = Seq((1L, 1, 10L), (1L, 2, 12L)).toDF("qid", "rank", "doc")
    val got = HybridRetrieval.rrfFuse(a, b, k = 3)
      .orderBy("rank").collect()
      .map(r => (r.getAs[Long]("doc"), r.getAs[Double]("rrf")))
    assert(got.head._1 == 10L)
    // hand-computed: doc 10 = 2/(60+1); docs 11,12 = 1/(60+2)
    assert(math.abs(got.head._2 - math.floor(2.0 / 61 * 1e6 + 0.5) / 1e6) < 1e-9)
    assert(got(1)._1 == 11L && got(2)._1 == 12L) // tie broken by doc id
    assert(got(1)._2 == got(2)._2)
  }

  test("v21 end-to-end emits 5 fused rows per panel query at sf0.001") {
    val out = HybridRetrieval.hybrid.fn(spark, "/root/testdata/sf0.001")
    val counts = out.groupBy("qid").count().collect()
    assert(counts.length == 40 && counts.forall(_.getLong(1) == 5))
  }
}
