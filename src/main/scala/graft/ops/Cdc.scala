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

  def all: Seq[QueryDef] = Seq(u5, u6)
}
