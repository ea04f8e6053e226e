package graft.ops

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Changelog merge + SCD2 intervals vs hand-computed outcomes:
  * upsert-over-snapshot, delete, delete-then-reinsert ordering,
  * insert of a new key, untouched keys, and interval tiling.
  */
class CdcSpec extends SparkSpec {

  test("applyChangelog: upsert, delete, reinsert order, insert, untouched") {
    import spark.implicits._
    val snap = Seq((1L, "a"), (2L, "b"), (3L, "c"), (4L, "d"))
      .toDF("k", "v")
    val changes = Seq(
      (1L, 1L, "U", "a2"),  // plain update
      (2L, 1L, "D", null),  // delete
      (3L, 1L, "D", null),  // delete then…
      (3L, 2L, "U", "c2"),  // …reinsert (later seq wins)
      (5L, 1L, "U", "e"),   // brand-new key
      (6L, 1L, "U", "f1"),  // two updates: latest wins
      (6L, 2L, "U", "f2"))
      .toDF("k", "seq", "op", "v")
    val got = Cdc.applyChangelog(snap, changes, "k", "seq", "op")
      .collect().map(r => (r.getLong(0), r.getString(1))).toSet
    assert(got == Set((1L, "a2"), (3L, "c2"), (4L, "d"), (5L, "e"), (6L, "f2")))
  }

  test("applyChangelog: change at seq == Long.MinValue still beats the snapshot") {
    import spark.implicits._
    // the snapshot's implicit sentinel is Long.MinValue; the
    // (seq, is_change) ordering tuple must break that tie toward the
    // change row deterministically
    val snap = Seq((1L, "old"), (2L, "keep")).toDF("k", "v")
    val changes = Seq(
      (1L, Long.MinValue, "U", "new"))
      .toDF("k", "seq", "op", "v")
    val got = Cdc.applyChangelog(snap, changes, "k", "seq", "op")
      .collect().map(r => (r.getLong(0), r.getString(1))).toSet
    assert(got == Set((1L, "new"), (2L, "keep")))
  }

  test("applyChangelog: rejects metadata column collisions") {
    import spark.implicits._
    val snap = Seq((1L, 9L)).toDF("k", "seq")
    val changes = Seq((1L, 1L, "U", 2L)).toDF("k", "seq", "op", "v")
    val e = intercept[IllegalArgumentException] {
      Cdc.applyChangelog(snap, changes, "k", "seq", "op")
    }
    assert(e.getMessage.contains("changelog metadata"))
  }

  test("scd2Intervals: tiles each key's history, one open version") {
    import spark.implicits._
    val h = Seq(
      (1L, 10L, "x"), (1L, 20L, "y"), (1L, 30L, "z"),
      (2L, 5L, "only"))
      .toDF("k", "seq", "attr")
    val got = Cdc.scd2Intervals(h, "k", "seq")
      .collect()
      .map(r => (r.getLong(0), r.getString(1), r.getLong(2),
        if (r.isNullAt(3)) -1L else r.getLong(3))).toSet
    assert(got == Set(
      (1L, "x", 10L, 20L), (1L, "y", 20L, 30L), (1L, "z", 30L, -1L),
      (2L, "only", 5L, -1L)))
  }
}
