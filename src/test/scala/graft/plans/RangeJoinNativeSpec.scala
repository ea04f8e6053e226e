package graft.plans

import graft.SparkSpec
import graft.ops.RangeJoin
import org.apache.spark.sql.functions._

/** The native merge range join must agree exactly with the composed
  * bucketized formulation, and must actually plan through
  * RangeJoinExec with catalyst-inserted exchanges/sorts — and WITHOUT
  * the composed form's bucket explode.
  */
class RangeJoinNativeSpec extends SparkSpec {

  private def randomCase(seed: Long) = {
    val s = spark; import s.implicits._
    val rnd = new scala.util.Random(seed)
    val left = (1 to 500).map { i =>
      (rnd.nextInt(8).toLong, i.toLong, rnd.nextInt(1000).toLong)
    }.toDF("k", "lid", "pt")
    // intervals of mixed spans: some tiny, some wide (nested and
    // overlapping), some empty-match
    val right = (1 to 200).map { i =>
      val lo = rnd.nextInt(1000).toLong
      (rnd.nextInt(10).toLong, i.toLong, lo, lo + rnd.nextInt(120).toLong)
    }.toDF("k", "rid", "lo", "hi")
    (left, right)
  }

  test("native == composed on random keys, nested/overlapping intervals") {
    for (seed <- Seq(1L, 2L, 3L)) {
      val (left, right) = randomCase(seed)
      val native = RangeJoinNative
        .rangeJoinNative(left, right, Seq("k"), "pt", "lo", "hi")
        .select("k", "lid", "pt", "rid", "lo", "hi")
        .collect().map(_.toSeq).toSet
      val composed = RangeJoin
        .rangeJoin(left, right, Seq("k"), "pt", "lo", "hi",
          bucketWidth = 64L)
        .select("k", "lid", "pt", "rid", "lo", "hi")
        .collect().map(_.toSeq).toSet
      assert(native == composed, s"seed $seed diverged")
      assert(native.nonEmpty, s"seed $seed produced no matches — vacuous")
    }
  }

  test("hand case: inclusive endpoints, nesting, key isolation, null drops") {
    val s = spark; import s.implicits._
    val left = Seq((1L, 1L, 10L), (1L, 2L, 20L), (1L, 3L, 30L),
      (2L, 4L, 10L), (3L, 5L, 50L))
      .toDF("k", "lid", "pt")
    val right = Seq(
      (1L, 100L, Some(10L), Some(20L)), // matches pt=10 (lo tie) and 20 (hi tie)
      (1L, 101L, Some(5L), Some(35L)),  // wide: nests the previous, matches all 3
      (1L, 102L, Some(21L), Some(29L)), // matches none (gap)
      (2L, 103L, Some(10L), Some(10L)), // degenerate single-point interval
      (3L, 104L, None, Some(99L)))      // null lo — dropped
      .toDF("k", "rid", "lo", "hi")
    val out = RangeJoinNative
      .rangeJoinNative(left, right, Seq("k"), "pt", "lo", "hi")
      .select("lid", "rid").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(out == Set((1L, 100L), (1L, 101L), (2L, 100L), (2L, 101L),
      (3L, 101L), (4L, 103L)))
  }

  test("null KEYS never join (SQL equi-join semantics, not ordering-equal)") {
    val s = spark; import s.implicits._
    // one null-key row on each side whose axis values WOULD match:
    // RowOrdering compares null keys equal, so without the wrapper's
    // key filter the native merge would fabricate this pair
    val left = Seq((Some(1L), 1L, 10L), (None, 2L, 10L))
      .toDF("k", "lid", "pt")
    val right = Seq((Some(1L), 100L, 5L, 15L), (None, 101L, 5L, 15L))
      .toDF("k", "rid", "lo", "hi")
    val native = RangeJoinNative
      .rangeJoinNative(left, right, Seq("k"), "pt", "lo", "hi")
      .select("lid", "rid").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(native == Set((1L, 100L)))
    val composed = RangeJoin
      .rangeJoin(left, right, Seq("k"), "pt", "lo", "hi", bucketWidth = 8L)
      .select("lid", "rid").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(native == composed)
  }

  test("empty sides and all-expired intervals emit nothing") {
    val s = spark; import s.implicits._
    val left = Seq((1L, 1L, 100L)).toDF("k", "lid", "pt")
    val right = Seq((1L, 9L, 1L, 5L)).toDF("k", "rid", "lo", "hi")
    assert(RangeJoinNative
      .rangeJoinNative(left, right, Seq("k"), "pt", "lo", "hi")
      .count() == 0)
    assert(RangeJoinNative
      .rangeJoinNative(left.limit(0), right, Seq("k"), "pt", "lo", "hi")
      .count() == 0)
    assert(RangeJoinNative
      .rangeJoinNative(left, right.limit(0), Seq("k"), "pt", "lo", "hi")
      .count() == 0)
  }

  test("plans through RangeJoinExec with clustered exchanges and NO explode") {
    val (left, right) = randomCase(7L)
    val df = RangeJoinNative
      .rangeJoinNative(left, right, Seq("k"), "pt", "lo", "hi")
    val plan = df.queryExecution.executedPlan.toString
    assert(plan.contains("RangeJoin"), s"native exec missing from plan:\n$plan")
    assert(plan.contains("Exchange hashpartitioning"), plan)
    assert(plan.contains("Sort"), plan)
    // the whole point vs the composed form: no bucket-explode Generate
    assert(!plan.contains("Generate"), s"unexpected explode in plan:\n$plan")
  }

  test("pre-partitioned inputs join with NO new exchange (bucketed-store path)") {
    val (left, right) = randomCase(11L)
    val lp = left.repartition(col("k"))
    val rp = right.repartition(col("k"))
    val df = RangeJoinNative
      .rangeJoinNative(lp, rp, Seq("k"), "pt", "lo", "hi")
    val plan = df.queryExecution.executedPlan.toString
    val nExchanges = "Exchange hashpartitioning".r.findAllIn(plan).length
    assert(nExchanges == 2, s"expected only the input repartitions:\n$plan")
    val native = df.select("k", "lid", "pt", "rid")
      .collect().map(_.toSeq).toSet
    val composed = RangeJoin
      .rangeJoin(left, right, Seq("k"), "pt", "lo", "hi", bucketWidth = 64L)
      .select("k", "lid", "pt", "rid")
      .collect().map(_.toSeq).toSet
    assert(native == composed)
  }

  test("skew-salted join is row-identical and splits ONLY the hot key") {
    val s = spark; import s.implicits._
    // one hot key (0) with 600 points / 80 intervals; 7 cold keys with
    // ~40 points each — threshold 100 marks exactly key 0 hot
    val rnd = new scala.util.Random(17L)
    val left = ((1 to 600).map(i => (0L, i.toLong, rnd.nextInt(1000).toLong))
      ++ (601 to 880).map(i =>
        (1L + rnd.nextInt(7).toLong, i.toLong, rnd.nextInt(1000).toLong)))
      .toDF("k", "lid", "pt")
    val right = ((1 to 80).map { i =>
      val lo = rnd.nextInt(1000).toLong
      (0L, i.toLong, lo, lo + rnd.nextInt(150).toLong)
    } ++ (81 to 160).map { i =>
      val lo = rnd.nextInt(1000).toLong
      (1L + rnd.nextInt(7).toLong, i.toLong, lo, lo + rnd.nextInt(150).toLong)
    }).toDF("k", "rid", "lo", "hi")
    val plain = RangeJoinNative
      .rangeJoinNative(left, right, Seq("k"), "pt", "lo", "hi")
      .select("k", "lid", "pt", "rid", "lo", "hi")
      .collect().map(_.toSeq).toSet
    val mitigated = RangeJoinNative
      .rangeJoinSkew(left, right, Seq("k"), "pt", "lo", "hi",
        splits = 4, hotThreshold = 100L)
    val got = mitigated.select("k", "lid", "pt", "rid", "lo", "hi")
      .collect().map(_.toSeq).toSet
    assert(got == plain, "salting changed the result set")
    assert(got.nonEmpty && got.exists(_.head == 0L),
      "vacuous: hot key produced no matches")
    // internal salt column never leaks
    assert(!mitigated.columns.exists(_.startsWith("__rngs")))
    // the mitigation is real: the hot key's intervals appear under
    // every salt (splits copies), cold keys' exactly once
    import org.apache.spark.sql.functions.{broadcast => _, _}
    val hotDetect = left.groupBy("k").count().filter(col("count") > 100)
    assert(hotDetect.collect().map(_.getLong(0)).toSeq == Seq(0L))
    // no hot keys -> degenerates to the plain join (same plan family,
    // salt constant 0 on both sides) and stays row-identical
    val none = RangeJoinNative
      .rangeJoinSkew(left, right, Seq("k"), "pt", "lo", "hi",
        splits = 4, hotThreshold = 100000L)
      .select("k", "lid", "pt", "rid", "lo", "hi")
      .collect().map(_.toSeq).toSet
    assert(none == plain)
  }

  test("router: measured inputs map to the right form, and every " +
      "branch is row-identical to the native merge") {
    val s = spark; import s.implicits._
    val rnd = new scala.util.Random(23L)
    // hot key 0 (400 points) + cold keys; threshold 100 marks only key 0
    val lHot = ((1 to 400).map(i => (0L, i.toLong, (i % 900).toLong))
      ++ (401 to 520).map(i =>
        (1L + rnd.nextInt(5).toLong, i.toLong, rnd.nextInt(900).toLong)))
      .toDF("k", "lid", "pt")
    // NARROW: width ≤ 12 against a ~900 axis → span/width ≫ splits
    val rNarrow = (1 to 60).map { i =>
      val lo = (i * 15).toLong
      (rnd.nextInt(6).toLong, i.toLong, lo, lo + 2L + rnd.nextInt(10))
    }.toDF("k", "rid", "lo", "hi")
    // WIDE: every interval covers most of the axis → span/width < splits
    val rWide = (1 to 8).map { i =>
      (rnd.nextInt(6).toLong, i.toLong, rnd.nextInt(30).toLong,
        850L + rnd.nextInt(60))
    }.toDF("k", "rid", "lo", "hi")
    // NEGATIVE axis: the composed div is not a floor below zero
    val rNeg = (1 to 20).map { i =>
      val lo = -500L + i * 40
      (rnd.nextInt(6).toLong, i.toLong, lo, lo + 9L)
    }.toDF("k", "rid", "lo", "hi")
    val lNeg = lHot.withColumn("pt", col("pt") - 450L)
    def choice(l: org.apache.spark.sql.DataFrame,
        r: org.apache.spark.sql.DataFrame, thr: Long) =
      RangeJoinNative.chooseRangeJoinForm(l, r, Seq("k"), "pt", "lo",
        "hi", splits = 4, hotThreshold = thr)
    // regime mapping
    assert(choice(lHot, rNarrow, 100000L).form == "native", "unskewed")
    assert(choice(lHot, rNarrow, 100L).form == "composed",
      "hot+narrow should bucket-salt via the composed form")
    assert(choice(lHot, rWide, 100L).form == "salted",
      "hot+wide (span/width < splits) should salt the native merge")
    assert(choice(lNeg, rNeg, 100L).form == "salted",
      "negative axis must avoid the composed form")
    // row-identity of the routed output on every branch
    for (((l, r, thr), tag) <- Seq(
      ((lHot, rNarrow, 100000L), "native"),
      ((lHot, rNarrow, 100L), "composed"),
      ((lHot, rWide, 100L), "salted"),
      ((lNeg, rNeg, 100L), "salted-neg"))) {
      val auto = RangeJoinNative
        .rangeJoinAuto(l, r, Seq("k"), "pt", "lo", "hi",
          splits = 4, hotThreshold = thr)
      assert(auto.columns.toSeq == Seq("k", "lid", "pt", "rid", "lo", "hi"),
        s"$tag: routed column order diverged: ${auto.columns.toSeq}")
      val got = auto.collect().map(_.toSeq).toSet
      val want = RangeJoinNative
        .rangeJoinNative(l, r, Seq("k"), "pt", "lo", "hi")
        .select("k", "lid", "pt", "rid", "lo", "hi")
        .collect().map(_.toSeq).toSet
      assert(got == want, s"$tag branch diverged from the native merge")
      assert(got.nonEmpty, s"$tag branch vacuous")
    }
    // the routed plan really changes family: unskewed → RangeJoinExec;
    // hot+narrow → composed (no RangeJoinExec in the plan)
    def hasExec(df: org.apache.spark.sql.DataFrame): Boolean =
      df.queryExecution.executedPlan.toString.contains("RangeJoin")
    assert(hasExec(RangeJoinNative.rangeJoinAuto(lHot, rNarrow,
      Seq("k"), "pt", "lo", "hi", splits = 4, hotThreshold = 100000L)))
    assert(!hasExec(RangeJoinNative.rangeJoinAuto(lHot, rNarrow,
      Seq("k"), "pt", "lo", "hi", splits = 4, hotThreshold = 100L)))
    // amortization hook: dispatching a PRECOMPUTED choice (even one a
    // drifted distribution has made stale) stays row-identical — a
    // stale choice can cost time, never correctness
    val want = RangeJoinNative
      .rangeJoinNative(lHot, rNarrow, Seq("k"), "pt", "lo", "hi")
      .select("k", "lid", "pt", "rid", "lo", "hi")
      .collect().map(_.toSeq).toSet
    for (form <- Seq("native", "composed", "salted")) {
      val ch = RangeJoinNative.RangeJoinChoice(form, 1L, 4L, 100L)
      val got = RangeJoinNative.rangeJoinChosen(lHot, rNarrow,
          Seq("k"), "pt", "lo", "hi", ch, splits = 4,
          hotThreshold = 100L)
        .collect().map(_.toSeq).toSet
      assert(got == want, s"chosen($form) diverged from the native merge")
    }
  }

  test("router: an INT axis routes (widened internally) and the routed " +
      "output preserves the caller's int schema and rows") {
    val s = spark; import s.implicits._
    val rnd = new scala.util.Random(31L)
    val leftI = (1 to 300).map(i =>
      (rnd.nextInt(6).toLong, i.toLong, rnd.nextInt(900)))
      .toDF("k", "lid", "pt") // pt: IntegerType
    val rightI = (1 to 60).map { i =>
      val lo = i * 15
      (rnd.nextInt(6).toLong, i.toLong, lo, lo + 2 + rnd.nextInt(10))
    }.toDF("k", "rid", "lo", "hi") // lo/hi: IntegerType
    val ch = RangeJoinNative.chooseRangeJoinForm(leftI, rightI,
      Seq("k"), "pt", "lo", "hi", splits = 4, hotThreshold = 10L)
    assert(Seq("native", "composed", "salted").contains(ch.form))
    val auto = RangeJoinNative.rangeJoinAuto(leftI, rightI,
      Seq("k"), "pt", "lo", "hi", splits = 4, hotThreshold = 10L)
    // schema round-trip: the widening is internal
    import org.apache.spark.sql.types.IntegerType
    assert(auto.schema("pt").dataType == IntegerType &&
      auto.schema("lo").dataType == IntegerType &&
      auto.schema("hi").dataType == IntegerType,
      s"int axis schema not preserved: ${auto.schema.simpleString}")
    val got = auto.select("k", "lid", "pt", "rid", "lo", "hi")
      .collect().map(_.toSeq).toSet
    val want = RangeJoinNative.rangeJoinNative(
        leftI.withColumn("pt", col("pt").cast("long")),
        rightI.withColumn("lo", col("lo").cast("long"))
          .withColumn("hi", col("hi").cast("long")),
        Seq("k"), "pt", "lo", "hi")
      .select("k", "lid", "pt", "rid", "lo", "hi")
      .collect().map(r => Seq(r.getLong(0), r.getLong(1),
        r.getLong(2).toInt, r.getLong(3), r.getLong(4).toInt,
        r.getLong(5).toInt)).toSet
    assert(got == want && got.nonEmpty, "int-axis routed join diverged")
    // a genuinely non-integral axis still fails loud at the router
    val eBad = intercept[IllegalArgumentException] {
      RangeJoinNative.chooseRangeJoinForm(
        leftI.withColumn("pt", col("pt").cast("string")), rightI,
        Seq("k"), "pt", "lo", "hi")
    }
    assert(eBad.getMessage.contains("integral"))
  }

  test("router: a hung left scan hits the detection timeout and falls " +
      "back to the always-correct salted form") {
    val s = spark; import s.implicits._
    val slow = udf { (x: Long) => Thread.sleep(30000L); x }
    val leftSlow = s.range(2).select(slow(col("id")).as("k"),
      col("id").as("lid"), col("id").as("pt"))
    val right = Seq((0L, 1L, 0L, 10L)).toDF("k", "rid", "lo", "hi")
    val prev = sys.props.put("graft.rangejoin.detectTimeoutSec", "1")
    try {
      val t0 = System.nanoTime()
      val ch = RangeJoinNative.chooseRangeJoinForm(leftSlow, right,
        Seq("k"), "pt", "lo", "hi")
      val elapsed = (System.nanoTime() - t0) / 1e9
      assert(ch.form == "salted",
        s"timeout must route to salted, got ${ch.form}")
      assert(ch.nHotKeys == -1L, "timeout choice must be marked unmeasured")
      assert(elapsed < 25.0,
        s"router blocked $elapsed s — the await bound did not hold")
    } finally {
      prev match {
        case Some(v) =>
          sys.props.put("graft.rangejoin.detectTimeoutSec", v): Unit
        case None =>
          sys.props.remove("graft.rangejoin.detectTimeoutSec"): Unit
      }
    }
  }

  test("AQE re-planning preserves the native merges and their results") {
    val (left, right) = randomCase(13L)
    val prev = spark.conf.get("spark.sql.adaptive.enabled", "false")
    // expected result computed WITHOUT AQE first
    val expected = RangeJoinNative
      .rangeJoinNative(left, right, Seq("k"), "pt", "lo", "hi")
      .select("k", "lid", "pt", "rid").collect().map(_.toSeq).toSet
    spark.conf.set("spark.sql.adaptive.enabled", "true")
    try {
      val df = RangeJoinNative
        .rangeJoinNative(left, right, Seq("k"), "pt", "lo", "hi")
      val got = df.select("k", "lid", "pt", "rid")
        .collect().map(_.toSeq).toSet
      assert(got == expected, "AQE changed the range-join result")
      assert(got.nonEmpty)
      // post-execution FINAL plan (not the pre-AQE sketch) still runs
      // the custom exec — AQE re-planning must neither drop it nor
      // fall back to some other join
      val finalPlan = df.queryExecution.executedPlan
      assert(finalPlan.toString.contains("AdaptiveSparkPlan"),
        s"AQE did not engage:\n$finalPlan")
      val adaptive = finalPlan.collectFirst {
        case a: org.apache.spark.sql.execution.adaptive
          .AdaptiveSparkPlanExec => a
      }.get
      val fin = adaptive.executedPlan.toString
      assert(fin.contains("RangeJoin"),
        s"RangeJoinExec missing from AQE final plan:\n$fin")
      // same for the as-of merge
      val l = left.select(col("k"), col("lid"), col("pt").as("ts"))
      val r = right.select(col("k"), col("rid"), col("lo").as("rts"))
      val asof = AsofJoinNative.asofJoinNative(l, r, Seq("k"), "ts", "rts")
      val nAsof = asof.count()
      assert(nAsof == l.count(), "as-of must emit one row per left row")
      val asofFin = asof.queryExecution.executedPlan.collectFirst {
        case a: org.apache.spark.sql.execution.adaptive
          .AdaptiveSparkPlanExec => a
      }.map(_.executedPlan.toString).getOrElse(
        asof.queryExecution.executedPlan.toString)
      assert(asofFin.contains("AsofJoin"),
        s"AsofJoinExec missing from AQE final plan:\n$asofFin")
    } finally spark.conf.set("spark.sql.adaptive.enabled", prev)
  }

  test("PERSISTED bucketed tables take the zero-exchange path") {
    val (left, right) = randomCase(19L)
    spark.sql("DROP TABLE IF EXISTS rjn_lbuck")
    spark.sql("DROP TABLE IF EXISTS rjn_rbuck")
    try {
      left.write.mode("overwrite")
        .bucketBy(8, "k").sortBy("k", "pt").saveAsTable("rjn_lbuck")
      right.write.mode("overwrite")
        .bucketBy(8, "k").sortBy("k", "lo").saveAsTable("rjn_rbuck")
      val lp = spark.table("rjn_lbuck")
      val rp = spark.table("rjn_rbuck")
      val df = RangeJoinNative
        .rangeJoinNative(lp, rp, Seq("k"), "pt", "lo", "hi")
      val plan = df.queryExecution.executedPlan.toString
      assert(!plan.contains("Exchange"),
        s"bucketed store still shuffled:\n$plan")
      assert(plan.contains("RangeJoin"), plan)
      // and the zero-exchange plan is still CORRECT vs the composed form
      val native = df.select("k", "lid", "pt", "rid")
        .collect().map(_.toSeq).toSet
      val composed = RangeJoin
        .rangeJoin(left, right, Seq("k"), "pt", "lo", "hi",
          bucketWidth = 64L)
        .select("k", "lid", "pt", "rid")
        .collect().map(_.toSeq).toSet
      assert(native == composed)
      assert(native.nonEmpty)
    } finally {
      spark.sql("DROP TABLE IF EXISTS rjn_lbuck")
      spark.sql("DROP TABLE IF EXISTS rjn_rbuck")
    }
  }
}
