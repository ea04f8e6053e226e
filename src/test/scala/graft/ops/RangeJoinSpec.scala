package graft.ops

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Bucketized range join vs hand-computed containment: inclusive
  * boundaries, intervals spanning bucket borders, per-key isolation,
  * and no duplicate emission for multi-bucket intervals.
  */
class RangeJoinSpec extends SparkSpec {

  test("rangeJoin: containment, boundaries, bucket spans, key isolation") {
    import spark.implicits._
    val left = Seq(
      (1L, 100L, "p1"),   // inside r1 [50,150]
      (1L, 150L, "p2"),   // ON the hi boundary of r1 → inclusive
      (1L, 151L, "p3"),   // just outside r1
      (1L, 999L, "p4"),   // inside r2 [900,1100] which spans buckets
      (2L, 100L, "p5"))   // key 2: no intervals
      .toDF("k", "pt", "tag")
    val right = Seq(
      (1L, 50L, 150L, "r1"),
      (1L, 900L, 1100L, "r2")) // width 100 → covers buckets 9..11
      .toDF("k", "lo", "hi", "rtag")
    val got = RangeJoin.rangeJoin(left, right, Seq("k"), "pt", "lo", "hi",
        bucketWidth = 100L)
      .select(col("tag"), col("rtag")).collect()
      .map(r => (r.getString(0), r.getString(1))).toSet
    assert(got == Set(("p1", "r1"), ("p2", "r1"), ("p4", "r2")))
    // multi-bucket interval must not emit the same match twice
    val n = RangeJoin.rangeJoin(left, right, Seq("k"), "pt", "lo", "hi", 100L)
      .count()
    assert(n == 3)
  }
}
