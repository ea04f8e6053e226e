package graft.plans

import graft.SparkSpec
import graft.ops.AsofJoin
import org.apache.spark.sql.functions._

/** The native merge-join as-of operator must agree exactly with the
  * composed union+window formulation, and must actually plan through
  * AsofJoinExec with catalyst-inserted exchanges/sorts.
  */
class AsofJoinNativeSpec extends SparkSpec {

  private def randomCase(seed: Long) = {
    val s = spark; import s.implicits._
    val rnd = new scala.util.Random(seed)
    val left = (1 to 400).map { i =>
      (rnd.nextInt(8).toLong, i.toLong, rnd.nextInt(1000).toLong)
    }.toDF("k", "lid", "lts")
    // unique (k, ts) right side — the as-of determinism precondition
    val right = rnd.shuffle((1 to 200).toList).zipWithIndex.map {
      case (v, i) => (i % 10L, (v * 7 % 997).toLong, v.toLong)
    }.distinct.groupBy(r => (r._1, r._2)).map(_._2.head).toSeq
      .toDF("k", "rts", "payload")
    (left, right)
  }

  test("native == composed on random keys, ties, and missing matches") {
    for (seed <- Seq(1L, 2L, 3L)) {
      val (left, right) = randomCase(seed)
      val native = AsofJoinNative
        .asofJoinNative(left, right, Seq("k"), "lts", "rts")
        .select("k", "lid", "lts", "asof_rts", "asof_payload")
        .collect().map(_.toSeq).toSet
      val composed = AsofJoin
        .asofJoin(left, right, Seq("k"), "lts", "rts")
        .select("k", "lid", "lts", "asof_rts", "asof_payload")
        .collect().map(_.toSeq).toSet
      assert(native == composed, s"seed $seed diverged")
    }
  }

  test("tolerance: native == composed, and bounds actually bite") {
    for (seed <- Seq(4L, 5L)) {
      val (left, right) = randomCase(seed)
      for (tol <- Seq(0L, 50L, 10000L)) {
        val native = AsofJoinNative
          .asofJoinNative(left, right, Seq("k"), "lts", "rts",
            toleranceUs = Some(tol))
          .select("k", "lid", "lts", "asof_rts", "asof_payload")
          .collect().map(_.toSeq).toSet
        val composed = AsofJoin
          .asofJoin(left, right, Seq("k"), "lts", "rts",
            toleranceUs = Some(tol))
          .select("k", "lid", "lts", "asof_rts", "asof_payload")
          .collect().map(_.toSeq).toSet
        assert(native == composed, s"seed $seed tol $tol diverged")
      }
      // the bound must strictly reduce matches somewhere in this data
      def matches(tol: Option[Long]) = AsofJoinNative
        .asofJoinNative(left, right, Seq("k"), "lts", "rts", toleranceUs = tol)
        .filter(col("asof_payload").isNotNull).count()
      assert(matches(Some(50L)) < matches(None),
        s"seed $seed: tolerance 50 did not reject any match")
      // tol=0 keeps ONLY exact-timestamp ties (inclusive semantics)
      val zeroTol = AsofJoinNative
        .asofJoinNative(left, right, Seq("k"), "lts", "rts",
          toleranceUs = Some(0L))
        .filter(col("asof_rts").isNotNull)
      assert(zeroTol.filter(col("asof_rts") =!= col("lts")).count() == 0)
    }
  }

  test("hand case: inclusive ties, per-key isolation, null right ts dropped") {
    val s = spark; import s.implicits._
    val left = Seq((1L, 1L, 10L), (1L, 2L, 20L), (2L, 3L, 10L), (3L, 4L, 99L))
      .toDF("k", "lid", "lts")
    val right = Seq((1L, Some(10L), 100L), (1L, Some(15L), 150L),
      (2L, Some(9L), 200L), (3L, None, 999L))
      .toDF("k", "rts", "payload")
    val out = AsofJoinNative
      .asofJoinNative(left, right, Seq("k"), "lts", "rts")
      .orderBy("lid")
      .select("lid", "asof_rts", "asof_payload")
      .collect().map(r => (r.getLong(0),
        if (r.isNullAt(1)) -1L else r.getLong(1),
        if (r.isNullAt(2)) -1L else r.getLong(2)))
    // lid 1: tie at ts=10 matches (inclusive); lid 2: latest ≤ 20 is 15;
    // lid 3: key 2's own 9 ≤ 10 row (no cross-key leak); lid 4: the only
    // key-3 right row has a null ts — dropped, no match.
    assert(out.toSeq == Seq((1L, 10L, 100L), (2L, 15L, 150L),
      (3L, 9L, 200L), (4L, -1L, -1L)))
  }

  test("null KEYS never match in either form (SQL/pandas equi-key " +
      "semantics); null-key left rows pass through unfilled") {
    val s = spark; import s.implicits._
    // the null-key right row is the latest at-or-before for the
    // null-key left row — under ordering-equal null grouping it would
    // fill; under equi-key semantics it must not
    val left = Seq((Some(1L), 1L, 20L), (None, 2L, 20L))
      .toDF("k", "lid", "lts")
    val right = Seq((Some(1L), Some(10L), 100L), (None, Some(10L), 999L))
      .toDF("k", "rts", "payload")
    def res(df: org.apache.spark.sql.DataFrame) = df
      .orderBy("lid").select("lid", "asof_payload").collect()
      .map(r => (r.getLong(0), if (r.isNullAt(1)) -1L else r.getLong(1)))
      .toSeq
    val native = res(AsofJoinNative
      .asofJoinNative(left, right, Seq("k"), "lts", "rts"))
    val composed = res(graft.ops.AsofJoin
      .asofJoin(left, right, Seq("k"), "lts", "rts"))
    assert(native == Seq((1L, 100L), (2L, -1L)), s"native: $native")
    assert(composed == native)
  }

  test("null left ts matches nothing, and negative-micros rows after a " +
      "null-ts row still honor at-or-before (the fillTs <= lt invariant)") {
    val s = spark; import s.implicits._
    // nulls sort FIRST: the null-ts row is processed before the
    // negative-ts row. Read as 0 it would consume the rts=-50 right
    // row and hand it to lts=-100 — a FUTURE match
    val left = Seq((1L, 1L, None), (1L, 2L, Some(-100L)),
      (1L, 3L, Some(-40L)))
      .toDF("k", "lid", "lts")
    val right = Seq((1L, -50L, 500L)).toDF("k", "rts", "payload")
    def res(df: org.apache.spark.sql.DataFrame) = df
      .orderBy("lid").select("lid", "asof_payload").collect()
      .map(r => (r.getLong(0), if (r.isNullAt(1)) -1L else r.getLong(1)))
      .toSeq
    val native = res(AsofJoinNative
      .asofJoinNative(left, right, Seq("k"), "lts", "rts"))
    // lid 1 (null ts): no match; lid 2 (-100): rts -50 is in its
    // FUTURE — no match; lid 3 (-40): -50 <= -40 matches
    assert(native == Seq((1L, -1L), (2L, -1L), (3L, 500L)),
      s"native: $native")
    val composed = res(graft.ops.AsofJoin
      .asofJoin(left, right, Seq("k"), "lts", "rts"))
    assert(composed == native)
  }

  test("plans through AsofJoinExec with clustered exchanges") {
    val (left, right) = randomCase(7L)
    val df = AsofJoinNative.asofJoinNative(left, right, Seq("k"), "lts", "rts")
    val plan = df.queryExecution.executedPlan.toString
    assert(plan.contains("AsofJoin"), s"native exec missing from plan:\n$plan")
    // EnsureRequirements must have inserted hash exchanges + sorts
    assert(plan.contains("Exchange hashpartitioning"), plan)
    assert(plan.contains("Sort"), plan)
  }

  test("pre-partitioned inputs join with NO new exchange (bucketed-store path)") {
    val (left, right) = randomCase(11L)
    // repartition on the key: outputPartitioning = HashPartitioning(k)
    // already satisfies ClusteredDistribution(k), so EnsureRequirements
    // must insert only the (key, ts) sorts — the zero-shuffle join a
    // bucketed 100 TB store gets for free.
    val lp = left.repartition(col("k"))
    val rp = right.repartition(col("k"))
    val df = AsofJoinNative.asofJoinNative(lp, rp, Seq("k"), "lts", "rts")
    val plan = df.queryExecution.executedPlan.toString
    val nExchanges = "Exchange hashpartitioning".r.findAllIn(plan).length
    // the two repartition() calls themselves are exchanges; the JOIN
    // must not add more
    assert(nExchanges == 2, s"expected only the input repartitions:\n$plan")
    assert(plan.contains("AsofJoin"), plan)
    // and the result still matches the composed operator
    val native = df.select("k", "lid", "lts", "asof_payload")
      .collect().map(_.toSeq).toSet
    val composed = AsofJoin.asofJoin(left, right, Seq("k"), "lts", "rts")
      .select("k", "lid", "lts", "asof_payload")
      .collect().map(_.toSeq).toSet
    assert(native == composed)
  }

  test("rejects non-long timestamps and missing columns loudly") {
    val s = spark; import s.implicits._
    val l = Seq((1L, 1.5)).toDF("k", "lts")
    val r = Seq((1L, 2L)).toDF("k", "rts")
    val e1 = intercept[IllegalArgumentException] {
      AsofJoinNative.asofJoinNative(l, r, Seq("k"), "lts", "rts")
    }
    assert(e1.getMessage.contains("must be long"))
    val e2 = intercept[IllegalArgumentException] {
      AsofJoinNative.asofJoinNative(r, r, Seq("k"), "nope", "rts")
    }
    assert(e2.getMessage.contains("no column"))
  }
}
