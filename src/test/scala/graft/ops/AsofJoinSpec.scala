package graft.ops

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** As-of semantics against hand-computed expectations: latest-at-or-
  * before wins, equal timestamps match (ties inclusive), keys with no
  * eligible right row get nulls, and right rows never leak across keys.
  */
class AsofJoinSpec extends SparkSpec {

  test("asofJoin: latest-at-or-before, inclusive ties, per-key isolation") {
    import spark.implicits._
    val left = Seq(
      (1L, 100L, "l1"), (1L, 205L, "l2"), (1L, 300L, "l3"),
      (2L, 150L, "l4"),  // key 2 has a right row only at ts 200 (after)
      (3L, 500L, "l5"))  // key 3 has no right rows at all
      .toDF("k", "ts", "tag")
    val right = Seq(
      (1L, 100L, 10.0),  // equal ts to l1 → must match l1
      (1L, 200L, 20.0),
      (1L, 290L, 29.0),
      (2L, 200L, 99.0))
      .toDF("k", "rts", "v")
    val got = AsofJoin.asofJoin(left, right, Seq("k"), "ts", "rts")
      .select(col("tag"), col("asof_rts"), col("asof_v"))
      .collect()
      .map(r => r.getString(0) ->
        (Option(r.get(1)).map(_.asInstanceOf[Long]),
          Option(r.get(2)).map(_.asInstanceOf[Double])))
      .toMap
    assert(got("l1") == (Some(100L), Some(10.0)))  // tie at 100 matches
    assert(got("l2") == (Some(200L), Some(20.0)))  // 290 is in the future
    assert(got("l3") == (Some(290L), Some(29.0)))  // latest of 3 eligible
    assert(got("l4") == (None, None))              // right row is later
    assert(got("l5") == (None, None))              // no right rows for key
  }

  test("asofJoin: atomic row fill when a right value column is null") {
    import spark.implicits._
    val left = Seq((1L, 300L)).toDF("k", "ts")
    val right = Seq(
      (1L, 100L, Option(7.0)),
      (1L, 200L, Option.empty[Double])) // latest row carries a NULL value
      .toDF("k", "rts", "v")
    val row = AsofJoin.asofJoin(left, right, Seq("k"), "ts", "rts")
      .select(col("asof_rts"), col("asof_v")).head()
    // the latest right ROW wins wholesale — its null value must NOT be
    // back-filled from the older row
    assert(row.getLong(0) == 200L)
    assert(row.isNullAt(1))
  }

  test("tolerance gate: int ts columns compare in 64-bit (no 32-bit wrap)") {
    val s = spark; import s.implicits._
    // IntegerType ts on both sides, age = 4,147,483,648 us — far past
    // tol. In 32-bit arithmetic the difference wraps to -147,483,648
    // (<= tol) and would resurrect the match the gate must reject.
    val left = Seq((1L, 1L, 2000000000)).toDF("k", "lid", "lts")
    val right = Seq((1L, -2147483648, 7L)).toDF("k", "rts", "payload")
    val gated = AsofJoin.asofJoin(left, right, Seq("k"), "lts", "rts",
      toleranceUs = Some(1000L))
    assert(gated.filter(col("asof_payload").isNotNull).count() == 0,
      "wrapped 32-bit difference resurrected an out-of-tolerance match")
    // the fill itself is legitimate — only the age gate rejects it
    val ungated = AsofJoin.asofJoin(left, right, Seq("k"), "lts", "rts")
    assert(ungated.filter(col("asof_payload") === 7L).count() == 1)
  }
}
