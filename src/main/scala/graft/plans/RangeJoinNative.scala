package graft.plans

import org.apache.spark.rdd.RDD
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Ascending, Attribute,
  RowOrdering, SortOrder, UnsafeProjection, UnsafeRow}
import org.apache.spark.sql.catalyst.plans.logical.{BinaryNode, LogicalPlan}
import org.apache.spark.sql.catalyst.plans.physical.{ClusteredDistribution,
  Distribution, Partitioning}
import org.apache.spark.sql.execution.{BinaryExecNode, SparkPlan, SparkStrategy}
import org.apache.spark.sql.types.LongType
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions.col

/** The point-in-interval range join as a FIRST-CLASS Catalyst operator
  * — the second (c)-tier operator after [[AsofJoinNative]], built from
  * the same recipe (LogicalPlan + Strategy + Exec with DECLARED
  * distribution/ordering), because the composed bucketized form
  * ([[graft.ops.RangeJoin.rangeJoin]], which stays as the portable
  * fallback and behavioral reference) pays two taxes the planner can't
  * remove:
  *
  *  - the right side explodes to `span/width + 1` bucket copies BEFORE
  *    the exchange — amplified shuffle bytes;
  *  - every bucket-collision pair is materialized through the join and
  *    then re-filtered by the exact containment predicate.
  *
  * Physical semantics (INNER join): emit (left, right-carry) for every
  * right interval of the same key with `lo ≤ pt ≤ hi`. Both children
  * are hash-clustered on the keys and sorted — left by (keys, pt),
  * right by (keys, lo) — so each partition is one forward merge with a
  * sliding ACTIVE-INTERVAL buffer: a right row enters the buffer when
  * the merge frontier passes its `lo`, leaves when its `hi` falls
  * behind the current point, and every buffered interval matches by
  * construction (no post-filter). Per-partition cost
  * O(|L| + |R| + matches), buffer bounded by the max number of
  * intervals CONCURRENTLY open per key — the same quantity that bounds
  * any interval-join's output row fan-out, never the corpus.
  * EnsureRequirements plans the exchanges/sorts exactly as for a
  * SortMergeJoin; a bucketed store joins with no shuffle at all.
  *
  * Preconditions (enforced by [[RangeJoinNative.rangeJoinNative]]):
  * long (micros) axis columns, nulls filtered (inner-join semantics —
  * identical to the composed form, where a null bucket drops the row).
  */
final case class RangeJoinNode(left: LogicalPlan, right: LogicalPlan,
    leftKeys: Seq[Attribute], rightKeys: Seq[Attribute],
    pt: Attribute, lo: Attribute, hi: Attribute,
    rightCarry: Seq[Attribute]) extends BinaryNode {
  override def output: Seq[Attribute] = left.output ++ rightCarry
  override protected def withNewChildrenInternal(
      newLeft: LogicalPlan, newRight: LogicalPlan): RangeJoinNode =
    copy(left = newLeft, right = newRight)
}

object RangeJoinStrategy extends SparkStrategy {
  override def apply(plan: LogicalPlan): Seq[SparkPlan] = plan match {
    case RangeJoinNode(l, r, lk, rk, pt, lo, hi, carry) =>
      RangeJoinExec(lk, rk, pt, lo, hi, carry,
        planLater(l), planLater(r)) :: Nil
    case _ => Nil
  }
}

final case class RangeJoinExec(
    leftKeys: Seq[Attribute], rightKeys: Seq[Attribute],
    pt: Attribute, lo: Attribute, hi: Attribute,
    rightCarry: Seq[Attribute],
    left: SparkPlan, right: SparkPlan) extends BinaryExecNode {

  override def output: Seq[Attribute] = left.output ++ rightCarry

  override def requiredChildDistribution: Seq[Distribution] =
    ClusteredDistribution(leftKeys) :: ClusteredDistribution(rightKeys) :: Nil

  override def requiredChildOrdering: Seq[Seq[SortOrder]] = Seq(
    leftKeys.map(SortOrder(_, Ascending)) :+ SortOrder(pt, Ascending),
    rightKeys.map(SortOrder(_, Ascending)) :+ SortOrder(lo, Ascending))

  override def outputPartitioning: Partitioning = left.outputPartitioning
  override def outputOrdering: Seq[SortOrder] =
    leftKeys.map(SortOrder(_, Ascending)) :+ SortOrder(pt, Ascending)

  override protected def withNewChildrenInternal(
      newLeft: SparkPlan, newRight: SparkPlan): RangeJoinExec =
    copy(left = newLeft, right = newRight)

  override protected def doExecute(): RDD[InternalRow] = {
    val lOut = left.output
    val rOut = right.output
    val lKeyExprs = leftKeys
    val rKeyExprs = rightKeys
    val ptExpr = pt
    val loExpr = lo
    val hiExpr = hi
    val carryExprs = rightCarry
    val keyTypes = leftKeys.map(_.dataType)
    left.execute().zipPartitions(right.execute()) { (lit, rit) =>
      val lKeyProj = UnsafeProjection.create(lKeyExprs, lOut)
      val rKeyProj = UnsafeProjection.create(rKeyExprs, rOut)
      val ptProj = UnsafeProjection.create(Seq(ptExpr), lOut)
      val loProj = UnsafeProjection.create(Seq(loExpr), rOut)
      val hiProj = UnsafeProjection.create(Seq(hiExpr), rOut)
      val carryProj = UnsafeProjection.create(carryExprs, rOut)
      val keyOrd = RowOrdering.createNaturalAscendingOrdering(keyTypes)
      val joiner = new org.apache.spark.sql.catalyst.expressions.JoinedRow
      var curRight: InternalRow = if (rit.hasNext) rit.next() else null
      var activeKey: UnsafeRow = null
      // intervals of the current key whose lo the frontier has passed
      // and whose hi is still ahead — every entry matches the current
      // point by construction
      val activeHi = new scala.collection.mutable.ArrayBuffer[Long]
      val activeCarry = new scala.collection.mutable.ArrayBuffer[UnsafeRow]
      lit.flatMap { lrow =>
        val lk = lKeyProj(lrow)
        val p = ptProj(lrow).getLong(0)
        if (activeKey == null || keyOrd.compare(activeKey, lk) != 0) {
          activeHi.clear(); activeCarry.clear()
          activeKey = lk.copy()
        }
        var advance = curRight != null
        while (advance) {
          val rk = rKeyProj(curRight)
          val cmp = keyOrd.compare(rk, lk)
          if (cmp < 0) { // right key already behind every future left row
            curRight = if (rit.hasNext) rit.next() else null
            advance = curRight != null
          } else if (cmp == 0 && loProj(curRight).getLong(0) <= p) {
            val h = hiProj(curRight).getLong(0)
            if (h >= p) { // an already-expired interval can never match
              activeHi += h
              activeCarry += carryProj(curRight).copy()
            }
            curRight = if (rit.hasNext) rit.next() else null
            advance = curRight != null
          } else advance = false
        }
        // evict intervals the frontier has passed (hi < pt), in place
        var i = 0
        var j = 0
        while (i < activeHi.length) {
          if (activeHi(i) >= p) {
            if (j != i) {
              activeHi(j) = activeHi(i); activeCarry(j) = activeCarry(i)
            }
            j += 1
          }
          i += 1
        }
        activeHi.remove(j, activeHi.length - j)
        activeCarry.remove(j, activeCarry.length - j)
        // every surviving buffer entry has lo <= pt <= hi — emit all.
        // The inner iterator is exhausted before flatMap pulls the next
        // left row, so referencing lrow/joiner here is safe (the same
        // single-row validity window every Spark join relies on).
        activeCarry.iterator.map(c => joiner(lrow, c))
      }
    }
  }
}

object RangeJoinNative {

  /** Install the planner strategy on a live session (idempotent). */
  def install(spark: SparkSession): Unit =
    if (!spark.experimental.extraStrategies.contains(RangeJoinStrategy))
      spark.experimental.extraStrategies =
        RangeJoinStrategy +: spark.experimental.extraStrategies

  /** Same surface and output schema as the composed
    * [[graft.ops.RangeJoin.rangeJoin]] (every left column + every
    * non-key right column, inner-join semantics), planned through
    * [[RangeJoinExec]]. Axis columns must be long (micros). */
  def rangeJoinNative(left: DataFrame, right: DataFrame,
      keys: Seq[String], ptCol: String, loCol: String,
      hiCol: String): DataFrame = {
    require(keys.nonEmpty, "range join needs at least one equality key")
    val spark = left.sparkSession
    install(spark)
    val wp = "__rngr_"
    require(!left.columns.exists(_.startsWith(wp)) &&
      !right.columns.exists(_.startsWith(wp)),
      s"column names starting with $wp are reserved by rangeJoinNative")
    Seq(loCol, hiCol).foreach(c => require(right.columns.contains(c),
      s"right side has no column '$c' (${right.columns.mkString(", ")})"))
    // inner-join semantics: null axis values can never match (the
    // composed form's null bucket drops them identically), and null
    // KEYS never equi-join — this must be filtered HERE because the
    // merge's RowOrdering compares null keys as EQUAL, which would
    // match two null-key rows where SQL join semantics match none
    val keyNotNull = keys.map(col(_).isNotNull).reduce(_ && _)
    val leftClean = left.filter(col(ptCol).isNotNull && keyNotNull)
    val rightClean = right
      .filter(col(loCol).isNotNull && col(hiCol).isNotNull && keyNotNull)
      .select(right.columns.map(c => col(c).as(wp + c)).toSeq: _*)
    val lPlan = leftClean.queryExecution.analyzed
    val rPlan = rightClean.queryExecution.analyzed
    def attr(plan: LogicalPlan, name: String, side: String): Attribute =
      plan.output.find(_.name == name).getOrElse(
        throw new IllegalArgumentException(
          s"$side side has no column '$name' " +
            s"(${plan.output.map(_.name).mkString(", ")})"))
    val lKeys = keys.map(attr(lPlan, _, "left"))
    val rKeys = keys.map(k => attr(rPlan, wp + k, "right"))
    val ptA = attr(lPlan, ptCol, "left")
    val loA = attr(rPlan, wp + loCol, "right")
    val hiA = attr(rPlan, wp + hiCol, "right")
    Seq(ptA, loA, hiA).foreach(a => require(a.dataType == LongType,
      s"range-join axis columns must be long (micros): ${a.name} is " +
        a.dataType.simpleString))
    lKeys.zip(rKeys).foreach { case (l, r) =>
      require(l.dataType == r.dataType,
        s"key type mismatch: ${l.name} ${l.dataType.simpleString} vs " +
          s"${r.name} ${r.dataType.simpleString}")
    }
    val carry = rPlan.output.filterNot(a => keys.map(wp + _).contains(a.name))
    val carryBare = carry.map(_.name.stripPrefix(wp))
    val collisions = carryBare.filter(left.columns.contains)
    require(collisions.isEmpty,
      s"non-key columns present on both sides would be ambiguous after " +
        s"the join: ${collisions.mkString(", ")} — rename before joining")
    val node = RangeJoinNode(lPlan, rPlan, lKeys, rKeys, ptA, loA, hiA, carry)
    val joined = org.apache.spark.sql.GraftFunctionRegistry
      .dataFrame(spark, node)
    joined.select(left.columns.toSeq.map(col) ++
      carry.map(a => col(a.name).as(a.name.stripPrefix(wp))): _*)
  }

  /** Skew-mitigated [[rangeJoinNative]]. The native merge declares
    * `ClusteredDistribution(keys)`, so ALL of one key's work lands in
    * one task — and unlike SortMergeJoin, AQE's skew-join splitting
    * does not know this operator. A key whose point rows exceed
    * `hotThreshold` is therefore SALTED: its left rows spread across
    * `splits` sub-partitions (deterministic hash of the point column)
    * and its intervals replicate to every split, then the merge runs
    * on `keys :+ salt`. Each (point, interval) pair still meets exactly
    * once — the point sits in one split, the interval is in all of
    * them — so the result is row-identical to the unmitigated join
    * (j17's DuckDB oracle is j14's, verbatim). Non-hot keys take
    * salt 0 on both sides: zero replication, unchanged plan shape.
    *
    * Cost model: detection is one map-side-combined count over the
    * left keys plus a broadcast of keys above threshold (≤ |L| /
    * hotThreshold keys — bounded, tiny). Mitigation replicates ONLY
    * hot keys' intervals `splits`×; a hot key's pair enumeration
    * (points × concurrently-open intervals, the real cost) divides by
    * `splits`. The threshold is deliberately ABSOLUTE, not relative:
    * the quantity that matters is whether one key's merge fits a
    * single task's budget, which does not change when the corpus
    * grows around it (same rule as [[graft.llm.Dedup]]'s
    * volume-derived widths). */
  def rangeJoinSkew(left: DataFrame, right: DataFrame,
      keys: Seq[String], ptCol: String, loCol: String, hiCol: String,
      splits: Int = 32, hotThreshold: Long = 1000000L): DataFrame = {
    require(splits >= 2, s"splits=$splits must be >= 2")
    require(hotThreshold >= 1, s"hotThreshold=$hotThreshold must be >= 1")
    // selective import: functions.{left,right} would shadow the params
    import org.apache.spark.sql.functions.{array, broadcast, count,
      explode, lit, pmod, sequence, when, xxhash64}
    val salt = "__rngs_salt"
    val hotFlag = "__rngs_hot"
    Seq(salt, hotFlag).foreach { c =>
      require(!left.columns.contains(c) && !right.columns.contains(c),
        s"column name $c is reserved by rangeJoinSkew")
    }
    val hot = left.groupBy(keys.map(col): _*)
      .agg(count(lit(1)).as("__rngs_n"))
      .filter(col("__rngs_n") > hotThreshold)
      .select(keys.map(col): _*)
      .withColumn(hotFlag, lit(1))
    val lS = left.join(broadcast(hot), keys, "left")
      .withColumn(salt,
        when(col(hotFlag).isNotNull,
          pmod(xxhash64(col(ptCol)), lit(splits)).cast("int"))
          .otherwise(lit(0)))
      .drop(hotFlag)
    val rS = right.join(broadcast(hot), keys, "left")
      .withColumn(salt, explode(
        when(col(hotFlag).isNotNull,
          sequence(lit(0), lit(splits - 1)))
          .otherwise(array(lit(0)))))
      .drop(hotFlag)
    rangeJoinNative(lS, rS, keys :+ salt, ptCol, loCol, hiCol)
      .drop(salt)
  }

  /** The decision input the router measures, and the form it picks.
    * Exposed so specs can assert the regime mapping directly and so a
    * caller can audit why a plan was chosen. */
  final case class RangeJoinChoice(
      form: String, // "native" | "composed" | "salted"
      nHotKeys: Long,
      bucketWidth: Long,
      effectiveBuckets: Long)

  /** Measure the three routing inputs (r13 verdict item 2): per-key
    * left counts (the [[rangeJoinSkew]] detection aggregate — one
    * map-side-combined count), the max interval width, and the axis
    * span. Decision rule, from the measured ×100-skew trade
    * (SCALE.md skew tier):
    *
    *  - NO hot key → the native merge ([[rangeJoinNative]]): fastest
    *    unskewed at every measured factor (5.4-5.5 vs 5.9-6.8 s at
    *    ×100), zero exchanges from bucketed stores, sorted output.
    *  - hot key AND `span / bucketWidth ≥ splits` → the COMPOSED
    *    bucketized join with `bucketWidth = maxWidth` (≤ 2 bucket
    *    copies per interval): the time-bucket key is an implicit salt
    *    that divides a hot key into span/width sub-keys — MORE
    *    parallelism than `splits` whenever intervals are narrow
    *    relative to the axis, and measured fastest in both hot
    *    regimes (7.7 s narrow, 13.1 s wide, vs 10.7/28.4 s salted).
    *  - hot key AND `span / bucketWidth < splits` → the SALTED native
    *    merge ([[rangeJoinSkew]]): intervals so wide relative to the
    *    axis that bucketing cannot split the hot key (the composed
    *    form degenerates toward one giant bucket), while the salt
    *    still divides the point side `splits` ways. Also the fallback
    *    for a negative axis, where the composed form's truncating
    *    `div` is not a floor.
    */
  /** Detection wall-clock bound (r15 verdict nit): a hung scan on
    * either side must not block the router forever — past the bound
    * the router falls back to SALTED, the always-correct form (all
    * three are row-identical; a suboptimal choice costs time, never
    * rows). Overridable via -Dgraft.rangejoin.detectTimeoutSec. */
  private def detectTimeout: scala.concurrent.duration.Duration =
    scala.concurrent.duration.Duration(
      sys.props.get("graft.rangejoin.detectTimeoutSec")
        .flatMap(_.toLongOption).filter(_ > 0).getOrElse(600L),
      java.util.concurrent.TimeUnit.SECONDS)

  def chooseRangeJoinForm(left: DataFrame, right: DataFrame,
      keys: Seq[String], ptCol: String, loCol: String, hiCol: String,
      splits: Int = 32, hotThreshold: Long = 1000000L): RangeJoinChoice = {
    import org.apache.spark.sql.functions.{count, lit, max, min}
    import org.apache.spark.sql.types.{ByteType, IntegerType, ShortType}
    // the width/span probe reads the aggregate row with getLong, so the
    // detection aggregates CAST the axis to long — any integral axis
    // routes (r15 advice: the strict LongType require rejected int/short
    // axes the forms themselves accept after rangeJoinAuto's widening);
    // a non-integral axis (string, decimal) still fails LOUD here
    Seq(ptCol -> left, loCol -> right, hiCol -> right).foreach {
      case (c, side) =>
        val dt = side.schema(c).dataType
        require(Seq(org.apache.spark.sql.types.LongType, IntegerType,
          ShortType, ByteType).contains(dt),
          s"chooseRangeJoinForm needs an integral axis; $c is $dt — " +
            "cast the axis (e.g. unix_micros) before routing")
    }
    // the two detection aggregates touch DIFFERENT tables, so they run
    // as CONCURRENT Spark jobs: detection wall cost is max(left count,
    // right width/span) instead of their sum — the left count is one
    // column-pruned scan with a map-side-combined aggregate, and the
    // right aggregate is wasted work only on a cold workload, where it
    // overlaps the left scan and adds no wall time
    import scala.concurrent.{Await, Future}
    import scala.concurrent.ExecutionContext.Implicits.global
    // both detection jobs run in a dedicated JOB GROUP (r15 advice): an
    // early return cancels the still-running speculative right-side
    // aggregate instead of leaving it consuming cluster resources, and
    // a failure it hits before cancellation is logged at WARN rather
    // than silently dropped
    val sc = left.sparkSession.sparkContext
    val groupId =
      s"graft-rangejoin-detect-${java.util.UUID.randomUUID()}"
    @volatile var abandoned = false
    def inGroup[T](body: => T): T = {
      sc.setJobGroup(groupId, "rangeJoin form detection",
        interruptOnCancel = true)
      try body finally sc.clearJobGroup()
    }
    // cancel only when something is still running — an unconditional
    // cancel of an already-drained group makes the DAGScheduler log a
    // spurious WARN on every routed call
    def abandonAndCancel(f: scala.concurrent.Future[_]): Unit = {
      abandoned = true
      if (!f.isCompleted) sc.cancelJobGroup(groupId)
    }
    // bounded result: ≤ |L| / hotThreshold keys survive the filter
    val nHotF = Future(inGroup(left.groupBy(keys.map(col): _*)
      .agg(count(lit(1)).as("__rja_n"))
      .filter(col("__rja_n") > hotThreshold)
      .count()))
    val spanF = Future(
      if (abandoned) null
      else inGroup(right.agg(
        max(col(hiCol).cast("long") - col(loCol).cast("long")).as("w"),
        min(col(loCol).cast("long")).as("lo"),
        max(col(hiCol).cast("long")).as("hi")).head()))
    spanF.onComplete {
      case scala.util.Failure(e) if !abandoned =>
        System.err.println("[rangeJoinAuto] WARN speculative right-side " +
          s"span aggregate failed: ${Option(e.getMessage)
            .getOrElse(e.getClass.getName).take(200)}")
      case _ => ()
    }
    // await the LEFT aggregate first and decide "native" on nHot == 0
    // WITHOUT awaiting the right side (r14 advice): on a cold workload
    // the right aggregate is wasted-work overlap only, and a failure or
    // hang scanning the right table must not fail/block a call that
    // never needed it. The await is BOUNDED (r15 nit): a hung left scan
    // abandons detection and routes to the salted form.
    val nHot =
      try Await.result(nHotF, detectTimeout)
      catch {
        case _: java.util.concurrent.TimeoutException =>
          abandonAndCancel(nHotF)
          System.err.println("[rangeJoinAuto] WARN detection timed out " +
            s"after $detectTimeout — routing to the salted form")
          return RangeJoinChoice("salted", -1L, 0L, 0L)
      }
    if (nHot == 0) {
      abandonAndCancel(spanF)
      return RangeJoinChoice("native", 0L, 0L, 0L)
    }
    val s =
      try Await.result(spanF, detectTimeout)
      catch {
        case _: java.util.concurrent.TimeoutException =>
          abandonAndCancel(spanF)
          System.err.println("[rangeJoinAuto] WARN span detection timed " +
            s"out after $detectTimeout — routing to the salted form")
          return RangeJoinChoice("salted", nHot, 0L, 0L)
      }
    if (s == null) return RangeJoinChoice("salted", nHot, 0L, 0L)
    if (s.isNullAt(0)) return RangeJoinChoice("native", nHot, 0L, 0L)
    val bucketWidth = math.max(1L, s.getLong(0))
    val span = s.getLong(2) - s.getLong(1)
    val effectiveBuckets = span / bucketWidth + 1
    val form =
      if (s.getLong(1) < 0) "salted" // composed div ≠ floor below zero
      else if (effectiveBuckets >= splits) "composed"
      else "salted"
    RangeJoinChoice(form, nHot, bucketWidth, effectiveBuckets)
  }

  /** Skew/width ROUTER over the three range-join forms — same surface
    * and row-identical output as [[rangeJoinNative]] (all three forms
    * verify against the same DuckDB inequality-join oracle; j18).
    * Detection costs one map-side count over the left keys plus one
    * three-value aggregate over the right side; the salted branch
    * re-runs the hot-key aggregate inside [[rangeJoinSkew]] (kept —
    * one cheap extra pass beats threading private state between the
    * forms). See [[chooseRangeJoinForm]] for the measured decision
    * rule. */
  def rangeJoinAuto(left: DataFrame, right: DataFrame,
      keys: Seq[String], ptCol: String, loCol: String, hiCol: String,
      splits: Int = 32, hotThreshold: Long = 1000000L): DataFrame = {
    // widen any integral axis to long ONCE so the router and all three
    // forms share the long-axis contract (r15 advice: int/short axes
    // must route instead of failing at the router's entry), then cast
    // back so the caller's output schema is exactly the input's —
    // widening is value-preserving for every integral type
    import org.apache.spark.sql.types.DataType
    val ptT = left.schema(ptCol).dataType
    val loT = right.schema(loCol).dataType
    val hiT = right.schema(hiCol).dataType
    def widen(df: DataFrame, c: String, t: DataType): DataFrame =
      if (t == LongType) df else df.withColumn(c, col(c).cast(LongType))
    val l = widen(left, ptCol, ptT)
    val r = widen(widen(right, loCol, loT), hiCol, hiT)
    val out = rangeJoinChosen(l, r, keys, ptCol, loCol, hiCol,
      chooseRangeJoinForm(l, r, keys, ptCol, loCol, hiCol,
        splits, hotThreshold),
      splits, hotThreshold)
    def narrow(df: DataFrame, c: String, t: DataType): DataFrame =
      if (t == LongType || !df.columns.contains(c)) df
      else df.withColumn(c, col(c).cast(t))
    narrow(narrow(narrow(out, ptCol, ptT), loCol, loT), hiCol, hiT)
  }

  /** Dispatch a PRECOMPUTED [[RangeJoinChoice]] — the amortization hook
    * for repeat callers (a nightly join over a slowly-drifting key
    * distribution pays [[chooseRangeJoinForm]]'s two aggregates once
    * and reuses the choice): dispatch adds NO operator over the chosen
    * form, so the amortized cost IS the chosen form's own cost. All
    * forms are row-identical (j18's oracle), so a stale choice can
    * only cost time, never correctness. */
  def rangeJoinChosen(left: DataFrame, right: DataFrame,
      keys: Seq[String], ptCol: String, loCol: String, hiCol: String,
      choice: RangeJoinChoice,
      splits: Int = 32, hotThreshold: Long = 1000000L): DataFrame = {
    choice.form match {
      case "native" =>
        rangeJoinNative(left, right, keys, ptCol, loCol, hiCol)
      case "composed" =>
        // normalize to the native form's column order (left columns
        // then right carry) — the using-column join reorders keys first
        graft.ops.RangeJoin.rangeJoin(left, right, keys, ptCol, loCol,
            hiCol, bucketWidth = choice.bucketWidth)
          .select((left.columns ++ right.columns.filterNot(keys.contains))
            .map(col).toSeq: _*)
      case _ =>
        rangeJoinSkew(left, right, keys, ptCol, loCol, hiCol, splits,
          hotThreshold)
    }
  }

  /** J14 — the j7 range workload planned through [[RangeJoinExec]]
    * against the SAME DuckDB inequality-join oracle: the custom
    * physical operator hash-verified end to end (j8's pattern), with
    * the composed bucketized j7 kept green beside it as the behavioral
    * reference. */
  val j14 = graft.QueryDef.sql(
    "j14_range_join_native",
    """WITH l AS (SELECT user_id, event_id, epoch_us(ts) AS us
      |           FROM events WHERE ts IS NOT NULL),
      |r AS (SELECT user_id, event_id AS rid,
      |             epoch_us(ts) - 300000000 AS lo,
      |             epoch_us(ts) + 300000000 AS hi
      |      FROM events WHERE event_type = 'purchase' AND ts IS NOT NULL)
      |SELECT count(*) AS n_pairs,
      |       CAST(coalesce(sum(l.event_id + r.rid), 0) AS BIGINT)
      |         AS pair_checksum
      |FROM l JOIN r
      |  ON l.user_id = r.user_id AND l.us BETWEEN r.lo AND r.hi""".stripMargin) {
    (s, d) =>
      import org.apache.spark.sql.functions._
      val ev = graft.Tables.events(s, d).filter(col("ts").isNotNull)
      val l = ev.select(col("user_id"), col("event_id"),
        unix_micros(col("ts")).as("us"))
      val r = ev.filter(col("event_type") === "purchase")
        .select(col("user_id"), col("event_id").as("rid"),
          (unix_micros(col("ts")) - 300000000L).as("lo"),
          (unix_micros(col("ts")) + 300000000L).as("hi"))
      rangeJoinNative(l, r, Seq("user_id"), "us", "lo", "hi")
        .agg(count(lit(1)).as("n_pairs"),
          coalesce(sum(col("event_id") + col("rid")), lit(0L))
            .cast("long").as("pair_checksum"))
  }

  /** J16 — j15's WIDE-interval workload (±2 h windows) through the
    * native merge operator, same oracle. The narrow j7/j14 pair is
    * overhead-dominated at bench scale; this pair is where the
    * composed form's bucket-copy shuffle and candidate re-filter
    * actually cost, and the merge's advantage is measurable (see
    * SCALE.md for the 10x/100x numbers). */
  val j16 = graft.QueryDef.sql(
    "j16_range_join_wide_native",
    """WITH l AS (SELECT user_id, event_id, epoch_us(ts) AS us
      |           FROM events WHERE ts IS NOT NULL),
      |r AS (SELECT user_id, event_id AS rid,
      |             epoch_us(ts) - 7200000000 AS lo,
      |             epoch_us(ts) + 7200000000 AS hi
      |      FROM events WHERE event_type = 'purchase' AND ts IS NOT NULL)
      |SELECT count(*) AS n_pairs,
      |       CAST(coalesce(sum(l.event_id + r.rid), 0) AS BIGINT)
      |         AS pair_checksum
      |FROM l JOIN r
      |  ON l.user_id = r.user_id AND l.us BETWEEN r.lo AND r.hi""".stripMargin) {
    (s, d) =>
      import org.apache.spark.sql.functions._
      val ev = graft.Tables.events(s, d).filter(col("ts").isNotNull)
      val l = ev.select(col("user_id"), col("event_id"),
        unix_micros(col("ts")).as("us"))
      val r = ev.filter(col("event_type") === "purchase")
        .select(col("user_id"), col("event_id").as("rid"),
          (unix_micros(col("ts")) - 7200000000L).as("lo"),
          (unix_micros(col("ts")) + 7200000000L).as("hi"))
      rangeJoinNative(l, r, Seq("user_id"), "us", "lo", "hi")
        .agg(count(lit(1)).as("n_pairs"),
          coalesce(sum(col("event_id") + col("rid")), lit(0L))
            .cast("long").as("pair_checksum"))
  }

  /** J17 — [[rangeJoinSkew]] on the j14 workload, against j14's DuckDB
    * oracle VERBATIM: salting must be row-invisible. The threshold (70)
    * sits inside the per-user event-count distribution at every test
    * sf (≈31% of users above it at sf0.01, 5/15 at sf0.001), so the
    * gate exercises BOTH the salted-hot and the salt-0 pass-through
    * branches and their union in one hash-verified result. Production
    * callers keep the 1M-row default — hot means "one key's merge
    * exceeds a task's budget", an absolute quantity (see
    * [[rangeJoinSkew]]). */
  val j17 = graft.QueryDef.sql(
    "j17_range_join_skew",
    """WITH l AS (SELECT user_id, event_id, epoch_us(ts) AS us
      |           FROM events WHERE ts IS NOT NULL),
      |r AS (SELECT user_id, event_id AS rid,
      |             epoch_us(ts) - 300000000 AS lo,
      |             epoch_us(ts) + 300000000 AS hi
      |      FROM events WHERE event_type = 'purchase' AND ts IS NOT NULL)
      |SELECT count(*) AS n_pairs,
      |       CAST(coalesce(sum(l.event_id + r.rid), 0) AS BIGINT)
      |         AS pair_checksum
      |FROM l JOIN r
      |  ON l.user_id = r.user_id AND l.us BETWEEN r.lo AND r.hi""".stripMargin) {
    (s, d) =>
      import org.apache.spark.sql.functions._
      val ev = graft.Tables.events(s, d).filter(col("ts").isNotNull)
      val l = ev.select(col("user_id"), col("event_id"),
        unix_micros(col("ts")).as("us"))
      val r = ev.filter(col("event_type") === "purchase")
        .select(col("user_id"), col("event_id").as("rid"),
          (unix_micros(col("ts")) - 300000000L).as("lo"),
          (unix_micros(col("ts")) + 300000000L).as("hi"))
      rangeJoinSkew(l, r, Seq("user_id"), "us", "lo", "hi",
          splits = 4, hotThreshold = 70L)
        .agg(count(lit(1)).as("n_pairs"),
          coalesce(sum(col("event_id") + col("rid")), lit(0L))
            .cast("long").as("pair_checksum"))
  }

  /** J18 — [[rangeJoinAuto]] on the j14 workload, against j14's DuckDB
    * oracle VERBATIM: whatever form the router picks must be
    * row-invisible. With hotThreshold = 70 (inside the per-user count
    * distribution at every test sf — j17's setting) hot keys EXIST and
    * the narrow ±5 min intervals against the events axis give
    * span/width ≫ splits, so the registry gate exercises detection +
    * the COMPOSED routing hash-verified end to end; the native and
    * salted branches are hash-verified by j14/j17 and the regime
    * mapping itself is spec-asserted on planted fixtures
    * (RangeJoinNativeSpec). */
  val j18 = graft.QueryDef.sql(
    "j18_range_join_auto",
    """WITH l AS (SELECT user_id, event_id, epoch_us(ts) AS us
      |           FROM events WHERE ts IS NOT NULL),
      |r AS (SELECT user_id, event_id AS rid,
      |             epoch_us(ts) - 300000000 AS lo,
      |             epoch_us(ts) + 300000000 AS hi
      |      FROM events WHERE event_type = 'purchase' AND ts IS NOT NULL)
      |SELECT count(*) AS n_pairs,
      |       CAST(coalesce(sum(l.event_id + r.rid), 0) AS BIGINT)
      |         AS pair_checksum
      |FROM l JOIN r
      |  ON l.user_id = r.user_id AND l.us BETWEEN r.lo AND r.hi""".stripMargin) {
    (s, d) =>
      import org.apache.spark.sql.functions._
      val ev = graft.Tables.events(s, d).filter(col("ts").isNotNull)
      val l = ev.select(col("user_id"), col("event_id"),
        unix_micros(col("ts")).as("us"))
      val r = ev.filter(col("event_type") === "purchase")
        .select(col("user_id"), col("event_id").as("rid"),
          (unix_micros(col("ts")) - 300000000L).as("lo"),
          (unix_micros(col("ts")) + 300000000L).as("hi"))
      rangeJoinAuto(l, r, Seq("user_id"), "us", "lo", "hi",
          splits = 4, hotThreshold = 70L)
        .agg(count(lit(1)).as("n_pairs"),
          coalesce(sum(col("event_id") + col("rid")), lit(0L))
            .cast("long").as("pair_checksum"))
  }

  def all: Seq[graft.QueryDef] = Seq(j14, j16, j17, j18)
}
