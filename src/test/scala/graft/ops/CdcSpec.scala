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

  test("snapshotDiff: classifies I/U/D, skips identical rows, " +
      "null-safe on content") {
    import spark.implicits._
    val v1 = Seq((1L, Some("a"), 1.0), (2L, Some("b"), 2.0),
      (3L, None: Option[String], 3.0), (4L, Some("d"), 4.0))
      .toDF("k", "v", "x")
    val v2 = Seq((1L, Some("a"), 1.0),            // unchanged → omitted
      (2L, Some("B"), 2.0),                       // changed string
      (3L, Some("c"), 3.0),                       // null → value = changed
      (5L, Some("e"), 5.0))                       // inserted; 4 deleted
      .toDF("k", "v", "x")
    val got = Cdc.snapshotDiff(v1, v2, "k").collect()
      .map(r => (r.getLong(0), r.getString(1),
        r.getStruct(2).getString(0))).toSet
    assert(got == Set((2L, "U", "B"), (3L, "U", "c"),
      (5L, "I", "e"), (4L, "D", "d")))
  }

  test("snapshotDiff: replaying the derived changelog through " +
      "applyChangelog reproduces v2 exactly") {
    import spark.implicits._
    val v1 = (1L to 50L).map(k => (k, s"v$k", k * 1.5)).toDF("k", "v", "x")
    val v2 = (1L to 60L).filter(_ % 7 != 0)
      .map(k => (k, if (k % 5 == 0) s"V$k" else s"v$k", k * 1.5))
      .toDF("k", "v", "x")
    val diff = Cdc.snapshotDiff(v1, v2, "k")
      .select(col("k"), lit(1L).as("seq"),
        when(col("op") === "D", "D").otherwise("U").as("op"),
        col("row.v").as("v"), col("row.x").as("x"))
    val replayed = Cdc.applyChangelog(v1, diff, "k", "seq", "op")
    assert(replayed.select("k", "v", "x").collect().toSet ==
      v2.collect().toSet)
  }

  test("maintainSumAgg: insert/delete/update incl. a GROUP MOVE " +
      "maintain both groups; emptied groups drop") {
    import spark.implicits._
    val v1 = Seq((1L, "a", 10L), (2L, "a", 20L), (3L, "b", 30L),
      (4L, "c", 40L)).toDF("k", "g", "v")
    val v2 = Seq((1L, "a", 11L),  // in-place update
      (2L, "b", 20L),             // group move a→b
      (3L, "b", 30L),             // unchanged
      (5L, "d", 50L))             // insert; 4 deleted → group c empties
      .toDF("k", "g", "v")
    val base = v1.groupBy("g").agg(count(lit(1)).as("n"), sum("v").as("v"))
    val log = Cdc.snapshotDiff(v1, v2, "k", keepOld = true)
    val got = Cdc.maintainSumAgg(base, log, "g", "v").collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2))).toSet
    val want = v2.groupBy("g").agg(count(lit(1)).as("n"), sum("v").as("v"))
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2))).toSet
    assert(got == want)
    assert(!got.exists(_._1 == "c")) // emptied group dropped
  }

  test("maintainSumAgg: double-applying a delta CORRUPTS the view " +
      "(st16's exactly-once guard is load-bearing, not decorative)") {
    import spark.implicits._
    val v1 = Seq((1L, "a", 10L), (2L, "b", 20L)).toDF("k", "g", "v")
    val v2 = Seq((1L, "a", 15L), (2L, "b", 20L), (3L, "a", 5L))
      .toDF("k", "g", "v")
    val base = v1.groupBy("g").agg(count(lit(1)).as("n"), sum("v").as("v"))
    val log = Cdc.snapshotDiff(v1, v2, "k", keepOld = true)
    val once = Cdc.maintainSumAgg(base, log, "g", "v")
    val twice = Cdc.maintainSumAgg(once, log, "g", "v").collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2))).toSet
    val want = v2.groupBy("g").agg(count(lit(1)).as("n"), sum("v").as("v"))
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2))).toSet
    assert(twice != want) // the redelivered delta really does corrupt
  }

  test("MaintainedSumView: the batchId guard survives a restart — a " +
      "FRESH instance reconstructs it from disk and skips redelivery") {
    import spark.implicits._
    val base = java.nio.file.Files.createTempDirectory("mv").toFile
    try {
      val aggDir = new java.io.File(base, "agg").getAbsolutePath
      val metaDir = new java.io.File(base, "meta").getAbsolutePath
      val v1 = Seq((1L, "a", 10L), (2L, "b", 20L)).toDF("k", "g", "v")
      val v2 = Seq((1L, "a", 15L), (2L, "b", 20L), (3L, "a", 5L))
        .toDF("k", "g", "v")
      val log = Cdc.snapshotDiff(v1, v2, "k", keepOld = true)
        .localCheckpoint(true)
      val viewA = new Cdc.MaintainedSumView(aggDir, metaDir, "g", "v")
      viewA.init(v1.groupBy("g").agg(count(lit(1)).as("n"),
        sum("v").as("v")))
      viewA.applyBatch(log, 0L)
      val want = v2.groupBy("g").agg(count(lit(1)).as("n"), sum("v").as("v"))
        .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2)))
        .toSet
      def got(view: Cdc.MaintainedSumView) = view.rows(spark).collect()
        .map(r => (r.getString(0), r.getLong(1), r.getLong(2))).toSet
      assert(got(viewA) == want)
      // "restart": a brand-new instance — nothing carried over except
      // the directories, exactly what a new JVM would see
      val viewB = new Cdc.MaintainedSumView(aggDir, metaDir, "g", "v")
      assert(viewB.lastApplied(spark) == 0L,
        "guard must be reconstructed from disk")
      viewB.applyBatch(log, 0L) // redelivery after the restart
      assert(got(viewB) == want,
        "redelivered batch must be a no-op on the fresh instance")
      // and a genuinely new batch still applies
      val v3 = Seq((1L, "a", 15L), (3L, "a", 5L)).toDF("k", "g", "v")
      val log2 = Cdc.snapshotDiff(v2, v3, "k", keepOld = true)
        .localCheckpoint(true)
      viewB.applyBatch(log2, 1L)
      val want3 = v3.groupBy("g").agg(count(lit(1)).as("n"), sum("v").as("v"))
        .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2)))
        .toSet
      assert(got(viewB) == want3)
      assert(viewB.lastApplied(spark) == 1L)
    } finally graft.util.Fs.rmRecursive(base)
  }

  test("maintainSumAgg: a non-integral changelog value fails LOUD " +
      "instead of silently truncating the maintained view") {
    import spark.implicits._
    val v1 = Seq((1L, "a", 10.0), (2L, "b", 20.0)).toDF("k", "g", "v")
    val v2 = Seq((1L, "a", 15.5), (2L, "b", 20.0)).toDF("k", "g", "v")
    val base = v1.groupBy("g").agg(count(lit(1)).as("n"),
      sum("v").cast("long").as("v"))
    val log = Cdc.snapshotDiff(v1, v2, "k", keepOld = true)
    val e = intercept[Exception] {
      Cdc.maintainSumAgg(base, log, "g", "v").collect()
    }
    def messages(t: Throwable): Seq[String] =
      Option(t).toSeq.flatMap(x =>
        Option(x.getMessage).toSeq ++ messages(x.getCause))
    assert(messages(e).exists(_.contains("non-integral")),
      s"expected the loud integral-contract error, got: $e")
    // integral values still flow
    val v3 = Seq((1L, "a", 15.0), (2L, "b", 20.0)).toDF("k", "g", "v")
    val log3 = Cdc.snapshotDiff(v1, v3, "k", keepOld = true)
    val got = Cdc.maintainSumAgg(base, log3, "g", "v").collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2))).toSet
    assert(got == Set(("a", 1L, 15L), ("b", 1L, 20L)))
  }
}
