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

  test("overlapJoin: touch, containment, disjoint, multi-bucket dedup") {
    import spark.implicits._
    val l = Seq(
      (1L, 100L, 200L, "a1"),  // overlaps r1 (150-250), touches r2 at 200
      (1L, 500L, 2000L, "a2"), // spans many buckets; contains r3
      (1L, 3000L, 3010L, "a3"),// disjoint from everything
      (2L, 150L, 250L, "a4"))  // key 2: no right intervals
      .toDF("k", "lo_l", "hi_l", "ltag")
    val r = Seq(
      (1L, 150L, 250L, "b1"),
      (1L, 200L, 300L, "b2"),  // touches a1 exactly at 200 → inclusive
      (1L, 900L, 1000L, "b3")) // strictly inside a2 (shares buckets 9-10)
      .toDF("k", "lo_r", "hi_r", "rtag")
    val got = RangeJoin.overlapJoin(l, r, Seq("k"),
        "lo_l", "hi_l", "lo_r", "hi_r", bucketWidth = 100L)
      .select(col("ltag"), col("rtag")).collect()
      .map(x => (x.getString(0), x.getString(1)))
    // exactly-once per overlapping pair, even when many buckets shared
    assert(got.length == got.toSet.size, s"duplicate emissions: ${got.toList}")
    assert(got.toSet == Set(("a1", "b1"), ("a1", "b2"), ("a2", "b3")))
  }

  test("coalesceIntervals merges overlapping AND touching; keeps gaps apart") {
    import spark.implicits._
    val iv = Seq(
      (1L, 0L, 10L, 1L),     // chain: [0,10] + [5,20] + [20,30] -> [0,30]
      (1L, 5L, 20L, 2L),
      (1L, 20L, 30L, 3L),    // touching endpoint merges (bedtools merge)
      (1L, 40L, 50L, 4L),    // gap -> separate
      (2L, 0L, 5L, 5L))      // other key unaffected
      .toDF("k", "s", "e", "id")
    val got = RangeJoin.coalesceIntervals(iv, "k", "s", "e", "id")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2),
        r.getLong(3))).toSet
    assert(got == Set((1L, 0L, 30L, 3L), (1L, 40L, 50L, 1L),
      (2L, 0L, 5L, 1L)))
    // containment: an interval fully inside another disappears into it
    val iv2 = Seq((1L, 0L, 100L, 1L), (1L, 10L, 20L, 2L)).toDF("k", "s", "e", "id")
    val got2 = RangeJoin.coalesceIntervals(iv2, "k", "s", "e", "id")
      .collect().map(r => (r.getLong(1), r.getLong(2), r.getLong(3))).toSet
    assert(got2 == Set((0L, 100L, 2L)))
  }
}
