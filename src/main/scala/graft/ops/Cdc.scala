package graft.ops

import graft.{QueryDef, Tables}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window

/** Change-data-capture application: merge an append-only changelog of
  * upserts/deletes into a snapshot (the MERGE INTO shape), and derive
  * SCD2-style validity intervals from a change history.
  *
  * The reference's pipelines re-land whole tables; at 100 TB the
  * production shape is a snapshot plus a day's changelog, merged with
  * ONE hash shuffle on the key — never a full-table rewrite driven
  * from the driver. Both operators here are single-exchange plans:
  * union → window on the key → filter. On a real deployment the
  * snapshot side would be bucketed by the key so only the (small)
  * changelog shuffles; the operator is agnostic to that, Spark's
  * EnsureRequirements just drops the snapshot exchange when the
  * bucketing matches.
  */
object Cdc {

  /** Latest-wins changelog merge. `snapshot` rows carry implicit
    * sequence −∞; `changes` rows carry `seqCol` (monotone per key) and
    * `opCol` ∈ {"U","D"} (upsert/delete). Result = the latest version
    * of every key, minus keys whose latest op is a delete.
    *
    * Plan: union both sides with a (seq, is_change) ordering tuple →
    * `row_number` over (key, ORDER BY seq DESC, is_change DESC) → keep
    * rn=1, drop D. The is_change tiebreak makes a change row beat the
    * snapshot row even at seq == Long.MinValue (the snapshot's implicit
    * sentinel), so the merge is deterministic for ANY changelog seq;
    * duplicate (key, seq) pairs WITHIN the changelog still violate the
    * monotone-seq contract and pick an arbitrary winner. One exchange
    * on the key; no driver state, no collect. Skewed hot keys are
    * bounded by the changelog's per-key cardinality, not the
    * snapshot's (a key appears once in the snapshot).
    */
  def applyChangelog(snapshot: DataFrame, changes: DataFrame,
      keyCol: String, seqCol: String, opCol: String): DataFrame = {
    val dataCols = snapshot.columns.filterNot(_ == keyCol).toSeq
    require(Seq(seqCol, opCol).forall(changes.columns.contains),
      s"changes must carry $seqCol and $opCol")
    require(!snapshot.columns.contains(seqCol) && !snapshot.columns.contains(opCol),
      s"snapshot must not carry $seqCol/$opCol (they are changelog metadata)")
    require(!snapshot.columns.contains("__is_change") &&
      !changes.columns.contains("__is_change"),
      "__is_change is reserved by applyChangelog")
    val snapTagged = snapshot
      .withColumn(seqCol, lit(Long.MinValue))
      .withColumn(opCol, lit("U"))
      .withColumn("__is_change", lit(0))
    val merged = snapTagged.unionByName(
        changes.select(snapTagged.columns.filterNot(_ == "__is_change")
            .map(col).toSeq: _*)
          .withColumn("__is_change", lit(1)))
      .withColumn("__rn", row_number().over(
        Window.partitionBy(col(keyCol))
          .orderBy(col(seqCol).desc, col("__is_change").desc)))
      .filter(col("__rn") === 1 && col(opCol) === "U")
    merged.select(col(keyCol) +: dataCols.map(col): _*)
  }

  /** SCD2 interval derivation: from a per-key change history
    * (key, seq, attrs…) build one row per version with
    * `valid_from` = its seq and `valid_to` = the next version's seq
    * (null = current). Pure window (`lead`) over the key — one
    * exchange, codegen'd, no state.
    */
  def scd2Intervals(history: DataFrame, keyCol: String, seqCol: String): DataFrame =
    history.withColumn("valid_from", col(seqCol))
      .withColumn("valid_to", lead(col(seqCol), 1).over(
        Window.partitionBy(col(keyCol)).orderBy(col(seqCol))))
      .drop(seqCol)

  /** Deterministic changelog over `orders`: every key %7==0 gets a
    * price-doubled upsert (seq 1; ×2 is IEEE-exact, so both engines
    * compute bit-identical update values — round(x*1.1, 2) is NOT
    * cross-engine stable at half-cent boundaries), every key %11==0 a
    * delete (seq 2 — a key hit by both ends deleted), and 500
    * brand-new keys are inserted. The oracle replays the same policy
    * in set-SQL (DuckDB lacks MERGE): latest-op-per-key via window,
    * then anti-join.
    */
  val u5 = QueryDef.sql(
    "u5_cdc_merge",
    """WITH changes AS (
      |  SELECT o_orderkey AS k, 1 AS seq, 'U' AS op,
      |         round(o_totalprice, 2) * 2 AS price
      |  FROM orders WHERE o_orderkey % 7 = 0
      |  UNION ALL
      |  SELECT o_orderkey, 2, 'D', NULL FROM orders WHERE o_orderkey % 11 = 0
      |  UNION ALL
      |  SELECT o_orderkey + 10000000, 1, 'U', 99.99
      |  FROM orders WHERE o_orderkey <= 500),
      |latest AS (
      |  SELECT k, op, price,
      |         row_number() OVER (PARTITION BY k ORDER BY seq DESC) AS rn
      |  FROM changes),
      |fin AS (
      |  SELECT o.o_orderkey AS k,
      |         CASE WHEN l.k IS NOT NULL THEN l.price
      |              ELSE round(o.o_totalprice, 2) END AS price
      |  FROM orders o
      |  LEFT JOIN (SELECT * FROM latest WHERE rn = 1) l ON o.o_orderkey = l.k
      |  WHERE l.k IS NULL OR l.op = 'U'
      |  UNION ALL
      |  SELECT k, price FROM latest
      |  WHERE rn = 1 AND op = 'U' AND k >= 10000000)
      |SELECT count(*) AS n_rows,
      |       CAST(sum(k) AS BIGINT) AS key_checksum,
      |       round(sum(price), 2) AS price_sum
      |FROM fin""".stripMargin) { (s, d) =>
    val orders = Tables.load(s, d, "orders")
      .select(col("o_orderkey"), round(col("o_totalprice"), 2).as("price"))
    val changes = orders.filter(col("o_orderkey") % 7 === 0)
      .select(col("o_orderkey"), lit(1L).as("seq"), lit("U").as("op"),
        (col("price") * 2).as("price"))
      .unionByName(orders.filter(col("o_orderkey") % 11 === 0)
        .select(col("o_orderkey"), lit(2L).as("seq"), lit("D").as("op"),
          lit(null).cast("double").as("price")))
      .unionByName(orders.filter(col("o_orderkey") <= 500)
        .select((col("o_orderkey") + 10000000).as("o_orderkey"),
          lit(1L).as("seq"), lit("U").as("op"), lit(99.99).as("price")))
    applyChangelog(orders, changes, "o_orderkey", "seq", "op")
      .agg(count(lit(1)).as("n_rows"),
        sum(col("o_orderkey")).cast("long").as("key_checksum"),
        round(sum(col("price")), 2).as("price_sum"))
  }

  /** SCD2 gate: version history = each user's events ordered by time;
    * intervals must tile the history exactly — every non-final version
    * has valid_to = the next valid_from, exactly one open (null
    * valid_to) version per key, and version counts are preserved.
    */
  val u6 = QueryDef.sql(
    "u6_scd2_intervals",
    """WITH h AS (
      |  SELECT user_id, epoch_us(ts) AS seq, event_type
      |  FROM events WHERE ts IS NOT NULL
      |  QUALIFY row_number() OVER (PARTITION BY user_id, epoch_us(ts)
      |                             ORDER BY event_id) = 1),
      |iv AS (
      |  SELECT user_id, event_type, seq AS valid_from,
      |         lead(seq) OVER (PARTITION BY user_id ORDER BY seq) AS valid_to
      |  FROM h)
      |SELECT count(*) AS n_versions,
      |       CAST(sum(CASE WHEN valid_to IS NULL THEN 1 ELSE 0 END) AS BIGINT)
      |         AS n_open,
      |       CAST(count(DISTINCT user_id) AS BIGINT) AS n_keys,
      |       CAST(sum(valid_from % 1000000007) AS BIGINT) AS from_checksum
      |FROM iv""".stripMargin) { (s, d) =>
    // dedup ties on (user, ts) the same way the oracle does so lead()
    // sees an identical per-key sequence
    val h = Tables.events(s, d).filter(col("ts").isNotNull)
      .select(col("user_id"), unix_micros(col("ts")).as("seq"),
        col("event_type"), col("event_id"))
      .withColumn("__tie", row_number().over(
        Window.partitionBy(col("user_id"), col("seq")).orderBy(col("event_id"))))
      .filter(col("__tie") === 1)
      .select(col("user_id"), col("seq"), col("event_type"))
    scd2Intervals(h, "user_id", "seq")
      .agg(count(lit(1)).as("n_versions"),
        sum(when(col("valid_to").isNull, 1).otherwise(0)).cast("long").as("n_open"),
        countDistinct(col("user_id")).cast("long").as("n_keys"),
        sum(col("valid_from") % 1000000007L).cast("long").as("from_checksum"))
  }

  /** Snapshot diff — the INVERSE of [[applyChangelog]]: given two
    * versions of a keyed table, derive the minimal changelog
    * (op ∈ I/U/D, plus the surviving row for I/U and the old row for
    * D) that replays v1 into v2. The table-maintenance primitive
    * behind incremental downstream refresh ("what changed since the
    * last snapshot?") when the upstream re-lands whole tables.
    *
    * One full-outer hash join on the key — each side shuffles once (on
    * a bucketed layout, zero times); content equality is a null-safe
    * struct compare over every shared non-key column, evaluated
    * scan-local. No driver state at any table size.
    */
  def snapshotDiff(v1: DataFrame, v2: DataFrame, keyCol: String,
      keepOld: Boolean = false): DataFrame = {
    val cols = v1.columns.filter(_ != keyCol).toSeq
    // set equality is the real precondition: both structs below select
    // v2's columns in v1's ORDER, so a reordered v2 diffs correctly
    require(v2.columns.filter(_ != keyCol).toSet == cols.toSet,
      s"snapshotDiff: non-key column sets differ: $cols vs " +
        s"${v2.columns.filter(_ != keyCol).toSeq}")
    val a = v1.select(col(keyCol).as("__k"),
      struct(cols.map(col): _*).as("__a"))
    val b = v2.select(col(keyCol).as("__k"),
      struct(cols.map(col): _*).as("__b"))
    val base = a.join(b, Seq("__k"), "full_outer")
      .withColumn("op",
        when(col("__b").isNull, "D")
          .when(col("__a").isNull, "I")
          .when(!(col("__a") <=> col("__b")), "U"))
      .filter(col("op").isNotNull)
    // keepOld adds the pre-image (null for inserts) — what incremental
    // aggregate maintenance needs to retract U/D contributions (u10)
    val sel = Seq(col("__k").as(keyCol), col("op"),
      coalesce(col("__b"), col("__a")).as("row")) ++
      (if (keepOld) Seq(col("__a").as("row_old")) else Nil)
    base.select(sel: _*)
  }

  /** U9 — changelog derivation between two deterministic versions of
    * the orders table (deletes every 13th key, doubles the price of
    * every 5th, inserts a low-key batch under shifted ids). FULL
    * oracle: DuckDB re-derives the same diff with a full join +
    * IS DISTINCT FROM — per-op counts, key checksums, and surviving
    * price cents all hash-match.
    */
  val u9 = QueryDef.sql(
    "u9_snapshot_diff",
    """WITH v1 AS (
      |  SELECT o_orderkey AS k, round(o_totalprice, 2) AS price,
      |         o_orderstatus AS st
      |  FROM orders),
      |v2 AS (
      |  SELECT k, CASE WHEN k % 5 = 0 THEN round(price * 2, 2)
      |                 ELSE price END AS price, st
      |  FROM v1 WHERE k % 13 <> 0
      |  UNION ALL
      |  SELECT k + 20000000, 99.99, 'X' FROM v1 WHERE k <= 300),
      |d AS (
      |  SELECT coalesce(v1.k, v2.k) AS k,
      |         CASE WHEN v2.k IS NULL THEN 'D'
      |              WHEN v1.k IS NULL THEN 'I'
      |              WHEN v1.price IS DISTINCT FROM v2.price
      |                OR v1.st IS DISTINCT FROM v2.st THEN 'U' END AS op,
      |         coalesce(v2.price, v1.price) AS price
      |  FROM v1 FULL JOIN v2 ON v1.k = v2.k)
      |SELECT op, count(*) AS n, CAST(sum(k) AS BIGINT) AS key_sum,
      |       CAST(sum(CAST(round(price * 100) AS BIGINT)) AS BIGINT)
      |         AS price_cents
      |FROM d WHERE op IS NOT NULL GROUP BY 1""".stripMargin) { (s, d) =>
    val v1 = Tables.load(s, d, "orders")
      .select(col("o_orderkey"), round(col("o_totalprice"), 2).as("price"),
        col("o_orderstatus").as("st"))
    val v2 = v1.filter(col("o_orderkey") % 13 =!= 0)
      .withColumn("price", when(col("o_orderkey") % 5 === 0,
        round(col("price") * 2, 2)).otherwise(col("price")))
      .unionByName(v1.filter(col("o_orderkey") <= 300)
        .select((col("o_orderkey") + 20000000).as("o_orderkey"),
          lit(99.99).as("price"), lit("X").as("st")))
    snapshotDiff(v1, v2, "o_orderkey")
      .groupBy("op")
      .agg(count(lit(1)).as("n"),
        sum(col("o_orderkey")).cast("long").as("key_sum"),
        sum(round(col("row.price") * 100).cast("long")).as("price_cents"))
  }

  /** Incremental aggregate maintenance — the materialized-view delta
    * pattern: apply a `keepOld = true` [[snapshotDiff]] changelog to a
    * stored (group, n, v) count/sum aggregate WITHOUT rescanning the
    * base table. Inserts apply the post-image, deletes retract the
    * pre-image, updates do both (so rows that MOVE groups maintain
    * both groups correctly). Work is O(|changelog| + |groups|) — at
    * 100 TB the base table is never touched, which is the entire point
    * of maintaining the aggregate. Count and sum are the self-
    * maintainable aggregates (min/max need a re-scan on retraction of
    * the extremum; avg derives from n and v).
    *
    * `baseAgg` contract: columns (groupField, n, v) with integral v.
    * Groups whose maintained count reaches zero are dropped.
    */
  def maintainSumAgg(baseAgg: DataFrame, changelog: DataFrame,
      groupField: String, valueField: String): DataFrame = {
    // The integral-value contract is ENFORCED on the changelog, not just
    // documented for baseAgg: a fractional value would otherwise truncate
    // toward zero silently and corrupt the maintained view. raise_error
    // fails the maintenance job loud at the first offending row.
    def toLongExact(v: org.apache.spark.sql.Column) =
      when(v.isNull, lit(null).cast("long"))
        .when(v.cast("double") === v.cast("long").cast("double"), v.cast("long"))
        .otherwise(raise_error(concat(
          lit(s"maintainSumAgg: non-integral $valueField in changelog: "),
          v.cast("string"))).cast("long"))
    val applies = changelog.filter(col("op").isin("I", "U"))
      .select(col(s"row.$groupField").as("g"),
        lit(1L).as("dn"), toLongExact(col(s"row.$valueField")).as("dv"))
    val retracts = changelog.filter(col("op").isin("D", "U"))
      .select(col(s"row_old.$groupField").as("g"),
        lit(-1L).as("dn"),
        (-toLongExact(col(s"row_old.$valueField"))).as("dv"))
    val delta = applies.unionByName(retracts)
      .groupBy("g").agg(sum(col("dn")).as("dn"), sum(col("dv")).as("dv"))
    baseAgg.select(col(groupField).as("g"), col("n"), col("v"))
      .join(delta, Seq("g"), "full_outer")
      .select(col("g").as(groupField),
        (coalesce(col("n"), lit(0L)) + coalesce(col("dn"), lit(0L))).as("n"),
        (coalesce(col("v"), lit(0L)) + coalesce(col("dv"), lit(0L))).as("v"))
      .filter(col("n") > 0)
  }

  /** U10 — incremental maintenance of a per-status (count, cents-sum)
    * aggregate under the u9 mutation (deletes, in-place updates, and
    * inserts that LAND IN A NEW GROUP — exercising the retract+apply
    * pair). The emitted frame is the INCREMENTALLY maintained
    * aggregate; the oracle recomputes the v2 aggregate from scratch in
    * DuckDB, so a hash match proves incremental == rescan across
    * engines. The engine-side scratch-recompute equality gates
    * emission too (belt and braces — a compensating pair of errors in
    * both paths would still need to fool DuckDB's independent sum).
    */
  val u10 = QueryDef.sql(
    "u10_incremental_agg",
    """WITH v1 AS (
      |  SELECT o_orderkey AS k,
      |         CAST(round(o_totalprice * 100) AS BIGINT) AS cents,
      |         o_orderstatus AS st
      |  FROM orders),
      |v2 AS (
      |  SELECT k, CASE WHEN k % 5 = 0 THEN cents * 2 ELSE cents END AS cents,
      |         st
      |  FROM v1 WHERE k % 13 <> 0
      |  UNION ALL
      |  SELECT k + 20000000, 9999, 'X' FROM v1 WHERE k <= 300)
      |SELECT st, count(*) AS n,
      |       CAST(sum(cents) AS BIGINT) AS price_cents
      |FROM v2 GROUP BY 1""".stripMargin) { (s, d) =>
    val v1 = Tables.load(s, d, "orders")
      .select(col("o_orderkey"),
        round(col("o_totalprice") * 100).cast("long").as("cents"),
        col("o_orderstatus").as("st"))
    val v2 = v1.filter(col("o_orderkey") % 13 =!= 0)
      .withColumn("cents", when(col("o_orderkey") % 5 === 0,
        col("cents") * 2).otherwise(col("cents")))
      .unionByName(v1.filter(col("o_orderkey") <= 300)
        .select((col("o_orderkey") + 20000000).as("o_orderkey"),
          lit(9999L).as("cents"), lit("X").as("st")))
    val base = v1.groupBy("st")
      .agg(count(lit(1)).as("n"), sum(col("cents")).as("v"))
    val log = snapshotDiff(v1, v2, "o_orderkey", keepOld = true)
    val maintained = maintainSumAgg(base, log, "st", "cents")
    val direct = v2.groupBy("st")
      .agg(count(lit(1)).as("n"), sum(col("cents")).as("v"))
    val ok = maintained.collect().map(r =>
        (r.getString(0), r.getLong(1), r.getLong(2))).toSet ==
      direct.collect().map(r =>
        (r.getString(0), r.getLong(1), r.getLong(2))).toSet
    maintained
      .select(col("st"), col("n"), col("v").as("price_cents"))
      .filter(lit(ok))
  }

  def all: Seq[QueryDef] = Seq(u5, u6, u9, u10)

  /** Disk-backed maintained aggregate with an exactly-once batchId
    * guard — st16's foreachBatch sink, factored out so the guard's
    * DURABILITY is testable in isolation: ALL state (the aggregate and
    * the applied-batch marker) lives on storage, never in the
    * instance, so a brand-new instance (a restarted query, a new JVM)
    * reconstructs the guard from disk and a redelivered batchId is
    * still a no-op after the restart. In production the
    * aggregate+marker write is one transactional commit
    * (Delta/Iceberg); here they are two parquet writes, same shape.
    */
  final class MaintainedSumView(aggDir: String, metaDir: String,
      groupField: String, valueField: String) extends Serializable {

    /** Seed the stored view and reset the guard. */
    def init(base: DataFrame): Unit = {
      val spark = base.sparkSession
      import spark.implicits._
      base.write.mode("overwrite").parquet(aggDir)
      Seq(-1L).toDF("batch_id").write.mode("overwrite").parquet(metaDir)
    }

    def lastApplied(spark: SparkSession): Long =
      spark.read.parquet(metaDir).agg(max(col("batch_id")))
        .head().getLong(0)

    /** Apply one changelog micro-batch exactly once: an already-applied
      * batchId (redelivery after a crash or restart) is skipped. */
    def applyBatch(batch: DataFrame, batchId: Long): Unit = {
      val spark = batch.sparkSession
      import spark.implicits._
      if (batchId <= lastApplied(spark)) return
      val cur = spark.read.parquet(aggDir)
      val next = maintainSumAgg(cur, batch, groupField, valueField)
        .localCheckpoint(true) // materialize BEFORE overwriting its input
      next.write.mode("overwrite").parquet(aggDir)
      Seq(batchId).toDF("batch_id").write.mode("append").parquet(metaDir)
    }

    def rows(spark: SparkSession): DataFrame = spark.read.parquet(aggDir)
  }
}
