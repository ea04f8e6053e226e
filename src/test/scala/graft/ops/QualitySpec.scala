package graft.ops

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Hand-verified profile/constraint arithmetic, including the null
  * paths the shipped (clean) driver tables never exercise.
  */
class QualitySpec extends SparkSpec {

  test("profile: counts, nulls, exact distinct, min/max/mean on hand data") {
    import spark.implicits._
    val df = Seq[(java.lang.Double, String)](
      (1.0, "a"), (2.0, "b"), (2.0, null), (null, "a"))
      .toDF("x", "s")
    val got = Quality.profile(df, "t", Seq("x"), Seq("s"))
      .collect().map(r => r.getString(0) -> r).toMap
    val x = got("t.x")
    assert(x.getLong(1) == 4L && x.getLong(2) == 1L && x.getLong(3) == 2L)
    assert(x.getDouble(4) == 1.0 && x.getDouble(5) == 2.0)
    assert(x.getDouble(6) == math.floor((1.0 + 2.0 + 2.0) / 3 * 1e4 + 0.5) / 1e4)
    assert(x.isNullAt(7) && x.isNullAt(8))
    val sCol = got("t.s")
    assert(sCol.getLong(1) == 4L && sCol.getLong(2) == 1L && sCol.getLong(3) == 2L)
    assert(sCol.isNullAt(4) && sCol.isNullAt(6))
    assert(sCol.getString(7) == "a" && sCol.getString(8) == "b")
  }

  test("uniqueViolations counts duplicate key occurrences beyond the first") {
    import spark.implicits._
    val df = Seq(1L, 1L, 1L, 2L, 3L).toDF("k")
    val r = Quality.uniqueViolations("u", df, "k").head()
    assert(r.getString(0) == "u" && r.getLong(1) == 2L)
  }

  test("fkViolations counts orphans only; clean FK yields zero") {
    import spark.implicits._
    val fact = Seq(1L, 2L, 9L, 9L).toDF("k")
    val dim = Seq(1L, 2L, 3L).toDF("id")
    assert(Quality.fkViolations("fk", fact, "k", dim, "id")
      .head().getLong(1) == 2L)
    assert(Quality.fkViolations("fk", dim.select(col("id").as("k")),
      "k", dim, "id").head().getLong(1) == 0L)
  }

  test("psi: zero on identical distributions, grows with shift, symmetric-ish") {
    import spark.implicits._
    val a = (Seq.fill(80)(0) ++ Seq.fill(20)(1)).toDF("bucket")
    val same = Quality.psi(a, a, "bucket").head().getDouble(0)
    assert(same == 0.0)
    val b = (Seq.fill(20)(0) ++ Seq.fill(80)(1)).toDF("bucket")
    val shifted = Quality.psi(a, b, "bucket").head().getDouble(0)
    assert(shifted > 0.2, s"major shift must exceed the 0.2 alert bar: $shifted")
    // PSI is symmetric by construction ((pB-pA)·ln(pB/pA))
    val rev = Quality.psi(b, a, "bucket").head().getDouble(0)
    assert(rev == shifted)
    // a bucket present on one side only stays finite (add-1 smoothing)
    val c = (Seq.fill(100)(2)).toDF("bucket")
    val disjoint = Quality.psi(a, c, "bucket").head().getDouble(0)
    assert(!disjoint.isNaN && !disjoint.isInfinite && disjoint > 1.0)
  }

  test("quarantineSplit: clean/bad partition exactly; reasons sorted and complete") {
    import spark.implicits._
    val df = Seq((1L, 5.0), (2L, -1.0), (3L, 200.0), (4L, -300.0))
      .toDF("id", "v")
    val (clean, bad) = Quality.quarantineSplit(df, Seq(
      ("neg", col("v") < 0), ("big", abs(col("v")) > 100)))
    assert(clean.select("id").collect().map(_.getLong(0)).toSet == Set(1L))
    val reasons = bad.select("id", "reasons")
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    // sorted combination: id 4 violates both -> "big,neg"
    assert(reasons == Map(2L -> "neg", 3L -> "big", 4L -> "big,neg"))
    // partition property: clean + bad == input, disjoint
    assert(clean.count() + bad.count() == 4)
  }

  test("predicateViolations: one row per check, zero on empty predicate hit") {
    import spark.implicits._
    implicit val s = spark
    val df = Seq(-1.0, 0.5, 2.0).toDF("v")
    val got = Quality.predicateViolations(Seq(
      ("neg", df, col("v") < 0),
      ("big", df, col("v") > 1),
      ("none", df, col("v") > 100)))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(got == Map("neg" -> 1L, "big" -> 1L, "none" -> 0L))
  }
}
