package graft.ops

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Bloom semi-join must equal the exact semi-join (false positives
  * removed by the follow-up join; no false negatives by construction),
  * including null fact keys, and reject an empty dim side loudly.
  */
class BloomJoinSpec extends SparkSpec {

  test("bloomSemiJoin == exact left_semi, null keys dropped") {
    import spark.implicits._
    val fact = (1L to 1000L).map(k => (k: java.lang.Long, s"r$k"))
      .:+((null: java.lang.Long, "rnull"))
      .toDF("fk", "payload")
    val dim = (1L to 1000L by 17).toDF("dk")
    val got = BloomJoin.bloomSemiJoin(fact, dim, "fk", "dk")
      .select("fk").collect().map(_.getLong(0)).toSet
    val want = (1L to 1000L by 17).toSet
    assert(got == want)
  }

  test("expectedItems hint skips the sizing scan, same result") {
    import spark.implicits._
    val fact = (1L to 1000L).map(k => (k, s"r$k")).toDF("fk", "payload")
    val dim = (1L to 1000L by 17).toDF("dk")
    val got = BloomJoin.bloomSemiJoin(fact, dim, "fk", "dk",
      fpp = 0.01, expectedItems = Some(59L))
      .select("fk").collect().map(_.getLong(0)).toSet
    assert(got == (1L to 1000L by 17).toSet)
    val e = intercept[IllegalArgumentException] {
      BloomJoin.bloomProbe(dim, "dk", 0.01, expectedItems = Some(0L))
    }
    assert(e.getMessage.contains("positive"))
  }

  test("empty dim side fails loudly") {
    import spark.implicits._
    val fact = Seq((1L, "a")).toDF("fk", "p")
    val dim = Seq.empty[Long].toDF("dk")
    val e = intercept[IllegalArgumentException] {
      BloomJoin.bloomSemiJoin(fact, dim, "fk", "dk")
    }
    assert(e.getMessage.contains("empty dim"))
  }
}
