package graft.plans

import org.apache.spark.rdd.RDD
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Ascending, Attribute,
  Expression, GenericInternalRow, JoinedRow, RowOrdering, SortOrder,
  UnsafeProjection, UnsafeRow}
import org.apache.spark.sql.catalyst.plans.logical.{BinaryNode, LogicalPlan}
import org.apache.spark.sql.catalyst.plans.physical.{ClusteredDistribution,
  Distribution, Partitioning}
import org.apache.spark.sql.execution.{BinaryExecNode, SparkPlan, SparkStrategy}
import org.apache.spark.sql.types.LongType
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions.col

/** The as-of join as a FIRST-CLASS Catalyst operator — the (c) tier of
  * the custom-operator ladder (compose < Expression < LogicalPlan +
  * Strategy + SparkPlan): a logical node, a planner strategy, and a
  * physical merge join that DECLARES its distribution and ordering
  * requirements instead of encoding them as a union + window (the
  * composed formulation in [[graft.ops.AsofJoin]], which remains the
  * portable fallback and the behavioral reference).
  *
  * Physical semantics: for each left row, the LATEST right row of the
  * same key with right ts ≤ left ts (ties inclusive — DuckDB
  * `ASOF JOIN ... ON l.ts >= r.ts`). Both children are hash-clustered
  * on the key and sorted (key, ts), so each partition is a single
  * forward merge: O(|L|+|R|) per partition, one buffered right row,
  * no per-key window state, no re-sort of the union. Catalyst's
  * EnsureRequirements inserts the exchanges/sorts exactly as for a
  * SortMergeJoin — and AQE can still re-plan them.
  *
  * At 100 TB this beats the union+window shape on two axes: the right
  * side ships only (key, ts, carry) instead of being null-padded to
  * the left schema, and the merge emits left rows streamingly instead
  * of materializing per-key window frames.
  *
  * Preconditions (enforced by the [[asofJoinNative]] wrapper): long
  * (micros) timestamps, non-null right ts, right unique per (key, ts)
  * for determinism — the same contract as the composed operator.
  */
final case class AsofJoinNode(left: LogicalPlan, right: LogicalPlan,
    leftKeys: Seq[Attribute], rightKeys: Seq[Attribute],
    leftTs: Attribute, rightTs: Attribute,
    rightCarry: Seq[Attribute],
    toleranceUs: Long = Long.MaxValue) extends BinaryNode {
  override def output: Seq[Attribute] =
    left.output ++ rightCarry.map(_.withNullability(true))
  override protected def withNewChildrenInternal(
      newLeft: LogicalPlan, newRight: LogicalPlan): AsofJoinNode =
    copy(left = newLeft, right = newRight)
}

object AsofJoinStrategy extends SparkStrategy {
  override def apply(plan: LogicalPlan): Seq[SparkPlan] = plan match {
    case AsofJoinNode(l, r, lk, rk, lts, rts, carry, tol) =>
      AsofJoinExec(lk, rk, lts, rts, carry,
        planLater(l), planLater(r), tol) :: Nil
    case _ => Nil
  }
}

final case class AsofJoinExec(
    leftKeys: Seq[Attribute], rightKeys: Seq[Attribute],
    leftTs: Attribute, rightTs: Attribute, rightCarry: Seq[Attribute],
    left: SparkPlan, right: SparkPlan,
    toleranceUs: Long = Long.MaxValue) extends BinaryExecNode {

  override def output: Seq[Attribute] =
    left.output ++ rightCarry.map(_.withNullability(true))

  // Both sides hash-clustered on the equality keys → co-partitioned
  // merge; EnsureRequirements plans the exchanges (or reuses existing
  // compatible partitioning — a bucketed store joins with no shuffle).
  override def requiredChildDistribution: Seq[Distribution] =
    ClusteredDistribution(leftKeys) :: ClusteredDistribution(rightKeys) :: Nil

  override def requiredChildOrdering: Seq[Seq[SortOrder]] = Seq(
    leftKeys.map(SortOrder(_, Ascending)) :+ SortOrder(leftTs, Ascending),
    rightKeys.map(SortOrder(_, Ascending)) :+ SortOrder(rightTs, Ascending))

  override def outputPartitioning: Partitioning = left.outputPartitioning
  override def outputOrdering: Seq[SortOrder] =
    leftKeys.map(SortOrder(_, Ascending)) :+ SortOrder(leftTs, Ascending)

  override protected def withNewChildrenInternal(
      newLeft: SparkPlan, newRight: SparkPlan): AsofJoinExec =
    copy(left = newLeft, right = newRight)

  override protected def doExecute(): RDD[InternalRow] = {
    val lOut = left.output
    val rOut = right.output
    val lKeyExprs = leftKeys
    val rKeyExprs = rightKeys
    val lTsExpr = leftTs
    val rTsExpr = rightTs
    val carryExprs = rightCarry
    val keyTypes = leftKeys.map(_.dataType)
    left.execute().zipPartitions(right.execute()) { (lit, rit) =>
      val lKeyProj = UnsafeProjection.create(lKeyExprs, lOut)
      val rKeyProj = UnsafeProjection.create(rKeyExprs, rOut)
      val lTsProj = UnsafeProjection.create(Seq(lTsExpr), lOut)
      val rTsProj = UnsafeProjection.create(Seq(rTsExpr), rOut)
      val carryProj = UnsafeProjection.create(carryExprs, rOut)
      val keyOrd = RowOrdering.createNaturalAscendingOrdering(keyTypes)
      val joiner = new JoinedRow
      val nullCarry = new GenericInternalRow(carryExprs.length)
      val tol = toleranceUs
      var curRight: InternalRow = if (rit.hasNext) rit.next() else null
      // last right row at-or-before the merge frontier, per current key
      var fillKey: UnsafeRow = null
      var fill: UnsafeRow = null
      var fillTs: Long = Long.MinValue
      lit.map { lrow =>
        val lk = lKeyProj(lrow)
        val ltRow = lTsProj(lrow)
        // a null left ts matches nothing (the composed form's
        // semantics: nulls sort first, so no prior right row exists);
        // reading it as getLong's 0 would also consume right rows a
        // later NEGATIVE-micros left row still needs
        val ltNull = ltRow.isNullAt(0)
        val lt = ltRow.getLong(0)
        var advance = !ltNull && curRight != null
        while (advance) {
          val rk = rKeyProj(curRight)
          val cmp = keyOrd.compare(rk, lk)
          if (cmp < 0 || (cmp == 0 && rTsProj(curRight).getLong(0) <= lt)) {
            fillKey = rk.copy()
            fill = carryProj(curRight).copy()
            fillTs = rTsProj(curRight).getLong(0)
            curRight = if (rit.hasNext) rit.next() else null
            advance = curRight != null
          } else advance = false
        }
        // tolerance bound (pandas merge_asof semantics): a candidate
        // older than `tol` micros does NOT match. The explicit
        // fillTs <= lt check restores the at-or-before invariant even
        // when an earlier left row advanced the fill past this row's
        // ts (reachable only via the null-first + negative-micros
        // corner, but cheap to pin); with it, the subtraction cannot
        // overflow for micros-scale values.
        val matched = !ltNull && fillKey != null &&
          keyOrd.compare(fillKey, lk) == 0 && fillTs <= lt &&
          lt - fillTs <= tol
        joiner(lrow, if (matched) fill else nullCarry)
      }
    }
  }
}

object AsofJoinNative {

  /** Install the planner strategy on a live session (idempotent).
    * `experimental.extraStrategies` is the public registration point
    * for already-running sessions; a session built from scratch can
    * equivalently use `SparkSessionExtensions.injectPlannerStrategy`.
    */
  def install(spark: SparkSession): Unit =
    if (!spark.experimental.extraStrategies.contains(AsofJoinStrategy))
      spark.experimental.extraStrategies =
        AsofJoinStrategy +: spark.experimental.extraStrategies

  /** Same surface as [[graft.ops.AsofJoin.asofJoin]] (every left column
    * + each non-key right column as `asof_<name>`, null when no right
    * row at or before), planned through [[AsofJoinExec]].
    * `toleranceUs` bounds the match age (pandas merge_asof semantics):
    * a right row older than `leftTs − toleranceUs` is treated as no
    * match. None = unbounded (classic ASOF).
    */
  def asofJoinNative(left: DataFrame, right: DataFrame, keys: Seq[String],
      leftTs: String, rightTs: String, prefix: String = "asof_",
      toleranceUs: Option[Long] = None): DataFrame = {
    require(keys.nonEmpty, "as-of join needs at least one equality key")
    require(toleranceUs.forall(_ >= 0),
      s"toleranceUs must be >= 0: $toleranceUs")
    val spark = left.sparkSession
    install(spark)
    // Alias every right column to a fresh working name: aliasing mints
    // fresh exprIds, so a self-join (both sides derived from the same
    // scan) cannot leave the node's right-key attributes pointing at
    // the LEFT child after deduplication — the classic ambiguity that
    // otherwise breaks the right-side exchange binding.
    val wp = "__asofr_"
    require(!left.columns.exists(_.startsWith(wp)) &&
      !right.columns.exists(_.startsWith(wp)),
      s"column names starting with $wp are reserved by asofJoinNative")
    require(right.columns.contains(rightTs),
      s"right side has no column '$rightTs' (${right.columns.mkString(", ")})")
    // null right ts and null-KEY right rows never match (the composed
    // form's contract, r12: RowOrdering compares null keys EQUAL, so
    // an unfiltered null-key right row would fill a null-key left row
    // where SQL/pandas equi-key semantics fill none; left null-key
    // rows pass through unfilled per left-join semantics)
    val rightClean = right.filter(
      keys.map(col(_).isNotNull).foldLeft(col(rightTs).isNotNull)(_ && _))
      .select(right.columns.map(c => col(c).as(wp + c)).toSeq: _*)
    val lPlan = left.queryExecution.analyzed
    val rPlan = rightClean.queryExecution.analyzed
    def attr(plan: LogicalPlan, name: String, side: String): Attribute =
      plan.output.find(_.name == name).getOrElse(
        throw new IllegalArgumentException(
          s"$side side has no column '$name' (${plan.output.map(_.name).mkString(", ")})"))
    val lKeys = keys.map(attr(lPlan, _, "left"))
    val rKeys = keys.map(k => attr(rPlan, wp + k, "right"))
    val lTs = attr(lPlan, leftTs, "left")
    val rTs = attr(rPlan, wp + rightTs, "right")
    require(lTs.dataType == LongType && rTs.dataType == LongType,
      s"as-of timestamps must be long (micros): $leftTs is " +
        s"${lTs.dataType.simpleString}, $rightTs is ${rTs.dataType.simpleString}")
    lKeys.zip(rKeys).foreach { case (l, r) =>
      require(l.dataType == r.dataType,
        s"key type mismatch: ${l.name} ${l.dataType.simpleString} vs " +
          s"${r.name} ${r.dataType.simpleString}")
    }
    val carry = rPlan.output.filterNot(a => keys.map(wp + _).contains(a.name))
    val carryBare = carry.map(_.name.stripPrefix(wp))
    val collisions = carryBare.filter(left.columns.contains) ++
      carryBare.map(prefix + _).filter(left.columns.contains)
    require(collisions.isEmpty,
      s"right columns collide with left columns (raw or $prefix-prefixed): " +
        s"${collisions.distinct.mkString(", ")} — rename before joining")
    val node = AsofJoinNode(lPlan, rPlan, lKeys, rKeys, lTs, rTs, carry,
      toleranceUs.getOrElse(Long.MaxValue))
    val joined = org.apache.spark.sql.GraftFunctionRegistry.dataFrame(spark, node)
    val lCols = left.columns.toSeq
    joined.select(lCols.map(col) ++
      carry.map(a => col(a.name).as(prefix + a.name.stripPrefix(wp))): _*)
  }

  /** J8 — the same as-of workload as j6 (events ⋈ latest purchase at or
    * before), planned through [[AsofJoinExec]] against the SAME DuckDB
    * native ASOF oracle — so the custom physical operator is
    * hash-verified end to end, not just spec-compared to the composed
    * form.
    */
  val j8 = graft.QueryDef.sql(
    "j8_asof_native",
    """WITH l AS (SELECT user_id, event_id, epoch_us(ts) AS us
      |           FROM events WHERE ts IS NOT NULL),
      |r AS (SELECT user_id, max(event_id) AS rid, epoch_us(ts) AS rus
      |      FROM events WHERE event_type = 'purchase' AND ts IS NOT NULL
      |      GROUP BY user_id, epoch_us(ts))
      |SELECT count(*) AS n_events,
      |       CAST(sum(CASE WHEN rid IS NOT NULL THEN 1 ELSE 0 END) AS BIGINT)
      |         AS n_matched,
      |       CAST(coalesce(sum(rid), 0) AS BIGINT) AS matched_checksum,
      |       CAST(coalesce(sum(us - rus), 0) AS BIGINT) AS total_lag_us
      |FROM l ASOF LEFT JOIN r
      |  ON l.user_id = r.user_id AND l.us >= r.rus""".stripMargin) {
    (s, d) =>
      import org.apache.spark.sql.functions._
      val ev = graft.Tables.events(s, d).filter(col("ts").isNotNull)
      val l = ev.select(col("user_id"), col("event_id"),
        unix_micros(col("ts")).as("us"))
      val r = ev.filter(col("event_type") === "purchase")
        .groupBy(col("user_id"), unix_micros(col("ts")).as("rus"))
        .agg(max(col("event_id")).as("rid"))
        .select(col("user_id"), col("rid"), col("rus"))
      asofJoinNative(l, r, Seq("user_id"), "us", "rus")
        .agg(count(lit(1)).as("n_events"),
          sum(when(col("asof_rid").isNotNull, 1L).otherwise(0L))
            .cast("long").as("n_matched"),
          coalesce(sum(col("asof_rid")), lit(0L))
            .cast("long").as("matched_checksum"),
          coalesce(sum(col("us") - col("asof_rus")), lit(0L))
            .cast("long").as("total_lag_us"))
  }

  /** J12 — tolerance-bounded as-of (pandas merge_asof semantics): the
    * j8 workload with matches older than 1 day rejected. DuckDB has no
    * ASOF tolerance, so the oracle blanks stale matches with a CASE
    * after its native ASOF — proving the operator's in-merge bound
    * equals the compose-then-filter semantics exactly.
    */
  val j12 = graft.QueryDef.sql(
    "j12_asof_tolerance",
    """WITH l AS (SELECT user_id, event_id, epoch_us(ts) AS us
      |           FROM events WHERE ts IS NOT NULL),
      |r AS (SELECT user_id, max(event_id) AS rid, epoch_us(ts) AS rus
      |      FROM events WHERE event_type = 'purchase' AND ts IS NOT NULL
      |      GROUP BY user_id, epoch_us(ts)),
      |j AS (SELECT us, rid, rus FROM l ASOF LEFT JOIN r
      |      ON l.user_id = r.user_id AND l.us >= r.rus),
      |g AS (SELECT us,
      |        CASE WHEN us - rus <= 86400000000 THEN rid END AS rid,
      |        CASE WHEN us - rus <= 86400000000 THEN rus END AS rus
      |      FROM j)
      |SELECT count(*) AS n_events,
      |       CAST(sum(CASE WHEN rid IS NOT NULL THEN 1 ELSE 0 END) AS BIGINT)
      |         AS n_matched,
      |       CAST(coalesce(sum(rid), 0) AS BIGINT) AS matched_checksum,
      |       CAST(coalesce(sum(us - rus), 0) AS BIGINT) AS total_lag_us
      |FROM g""".stripMargin) {
    (s, d) =>
      import org.apache.spark.sql.functions._
      val ev = graft.Tables.events(s, d).filter(col("ts").isNotNull)
      val l = ev.select(col("user_id"), col("event_id"),
        unix_micros(col("ts")).as("us"))
      val r = ev.filter(col("event_type") === "purchase")
        .groupBy(col("user_id"), unix_micros(col("ts")).as("rus"))
        .agg(max(col("event_id")).as("rid"))
        .select(col("user_id"), col("rid"), col("rus"))
      asofJoinNative(l, r, Seq("user_id"), "us", "rus",
        toleranceUs = Some(86400000000L))
        .agg(count(lit(1)).as("n_events"),
          sum(when(col("asof_rid").isNotNull, 1L).otherwise(0L))
            .cast("long").as("n_matched"),
          coalesce(sum(col("asof_rid")), lit(0L))
            .cast("long").as("matched_checksum"),
          coalesce(sum(col("us") - col("asof_rus")), lit(0L))
            .cast("long").as("total_lag_us"))
  }

  def all: Seq[graft.QueryDef] = Seq(j8, j12)
}
