package graft.ops

import graft.{QueryDef, Tables}
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Range (interval) join — left points joined to right intervals that
  * contain them, with key equality. A naive range-condition join cannot
  * hash-partition on the range predicate, so Spark would fall back to a
  * broadcast-nested-loop (or explode |left|×|right-per-key| before
  * filtering). The scale-safe classic instead BUCKETIZES the axis:
  *
  *   left point → its bucket (`pt div width`); right interval → the
  *   buckets it covers (`sequence(lo div width, hi div width)`, a
  *   bounded explode when width ≈ max interval span) → hash equi-join
  *   on (keys, bucket) → exact containment filter.
  *
  * Each (left, right) match meets in EXACTLY one bucket (the left
  * point's), so no dedup pass is needed. Cost: one hash exchange of
  * each side on (keys, bucket), right amplified by ≤
  * span/width + 1 rows. Integral `div` keeps bucket math exact for
  * epoch-scale longs (double division would round near 2^53).
  * Truncating `div` equals floor only for non-negative axes — use a
  * shifted axis for negative domains.
  */
object RangeJoin {

  def rangeJoin(left: DataFrame, right: DataFrame, keys: Seq[String],
      ptCol: String, loCol: String, hiCol: String,
      bucketWidth: Long): DataFrame = {
    require(keys.nonEmpty, "range join needs at least one equality key")
    require(bucketWidth > 0, s"bucketWidth must be positive: $bucketWidth")
    val collisions =
      left.columns.filterNot(keys.contains).intersect(right.columns.filterNot(keys.contains))
    require(collisions.isEmpty,
      s"non-key columns present on both sides would be ambiguous after the " +
        s"join: ${collisions.mkString(", ")} — rename before joining")
    require(!left.columns.contains("__bucket") && !right.columns.contains("__bucket"),
      "__bucket is reserved by rangeJoin")
    val lB = left.withColumn("__bucket", expr(s"$ptCol div $bucketWidth"))
    val rB = right.withColumn("__bucket",
      explode(sequence(expr(s"$loCol div $bucketWidth"),
        expr(s"$hiCol div $bucketWidth"))))
    lB.join(rB, keys :+ "__bucket")
      .filter(col(ptCol) >= col(loCol) && col(ptCol) <= col(hiCol))
      .drop("__bucket")
  }

  /** J7 — every event joined to the same user's purchase windows
    * (±5 minutes around each purchase). The oracle is DuckDB's plain
    * inequality join, so the bucketized plan's match set is proven
    * identical to the unbounded-range semantics. All-integer output.
    */
  val j7 = QueryDef.sql(
    "j7_range_join",
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
      val ev = Tables.events(s, d).filter(col("ts").isNotNull)
      val l = ev.select(col("user_id"), col("event_id"),
        unix_micros(col("ts")).as("us"))
      val r = ev.filter(col("event_type") === "purchase")
        .select(col("user_id"), col("event_id").as("rid"),
          (unix_micros(col("ts")) - 300000000L).as("lo"),
          (unix_micros(col("ts")) + 300000000L).as("hi"))
      rangeJoin(l, r, Seq("user_id"), "us", "lo", "hi",
          bucketWidth = 600000000L) // 10 min buckets: ≤ 2 per interval
        .agg(count(lit(1)).as("n_pairs"),
          coalesce(sum(col("event_id") + col("rid")), lit(0L))
            .cast("long").as("pair_checksum"))
  }

  /** J15 — the WIDE-interval range workload (±2 h windows): the regime
    * where bucketization's costs actually bite — at the documented-best
    * bucket width (≈ the interval span, here 4 h) every interval still
    * explodes to ≤ 2 bucket copies, but each (user, 4 h) bucket now
    * holds many candidate events, all materialized through the join
    * and re-filtered. j16 runs the identical workload through the
    * native merge operator; the pair is the measured comparison the
    * narrow j7/j14 pair (sub-second, overhead-dominated) cannot give.
    */
  val j15 = QueryDef.sql(
    "j15_range_join_wide",
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
      val ev = Tables.events(s, d).filter(col("ts").isNotNull)
      val l = ev.select(col("user_id"), col("event_id"),
        unix_micros(col("ts")).as("us"))
      val r = ev.filter(col("event_type") === "purchase")
        .select(col("user_id"), col("event_id").as("rid"),
          (unix_micros(col("ts")) - 7200000000L).as("lo"),
          (unix_micros(col("ts")) + 7200000000L).as("hi"))
      rangeJoin(l, r, Seq("user_id"), "us", "lo", "hi",
          bucketWidth = 14400000000L) // 4 h ≈ span: ≤ 2 buckets/interval
        .agg(count(lit(1)).as("n_pairs"),
          coalesce(sum(col("event_id") + col("rid")), lit(0L))
            .cast("long").as("pair_checksum"))
  }

  /** Interval-OVERLAP join: pairs whose intervals intersect
    * (loL ≤ hiR ∧ loR ≤ hiL), with key equality — the session-vs-
    * session / outage-vs-deploy shape rangeJoin's point-in-interval
    * form can't express. Same bucketization; both sides explode to
    * their covered buckets. An overlapping pair shares MANY buckets,
    * so emission is pinned to ONE canonical bucket — the bucket of
    * the overlap's start, max(loL, loR), which both sides necessarily
    * cover — making each match emit exactly once WITHOUT a distinct
    * pass (the dedup shuffle a naive bucket join would need).
    */
  def overlapJoin(left: DataFrame, right: DataFrame, keys: Seq[String],
      loL: String, hiL: String, loR: String, hiR: String,
      bucketWidth: Long): DataFrame = {
    require(keys.nonEmpty, "overlap join needs at least one equality key")
    require(bucketWidth > 0, s"bucketWidth must be positive: $bucketWidth")
    val collisions =
      left.columns.filterNot(keys.contains).intersect(right.columns.filterNot(keys.contains))
    require(collisions.isEmpty,
      s"non-key columns present on both sides would be ambiguous after the " +
        s"join: ${collisions.mkString(", ")} — rename before joining")
    require(!left.columns.contains("__bucket") && !right.columns.contains("__bucket"),
      "__bucket is reserved by overlapJoin")
    val lB = left.withColumn("__bucket",
      explode(sequence(expr(s"$loL div $bucketWidth"), expr(s"$hiL div $bucketWidth"))))
    val rB = right.withColumn("__bucket",
      explode(sequence(expr(s"$loR div $bucketWidth"), expr(s"$hiR div $bucketWidth"))))
    lB.join(rB, keys :+ "__bucket")
      .filter(col(loL) <= col(hiR) && col(loR) <= col(hiL) &&
        col("__bucket") === expr(s"greatest($loL, $loR) div $bucketWidth"))
      .drop("__bucket")
  }

  /** J11 — click windows ([ts, ts+5 min]) overlapping the same user's
    * purchase windows ([ts−2 min, ts+3 min]); DuckDB replays the plain
    * overlap inequality join, proving the canonical-bucket emission is
    * exactly-once.
    */
  val j11 = QueryDef.sql(
    "j11_interval_overlap_join",
    """WITH l AS (SELECT user_id, event_id AS lid, epoch_us(ts) AS lo_l,
      |                  epoch_us(ts) + 300000000 AS hi_l
      |           FROM events WHERE event_type = 'click' AND ts IS NOT NULL),
      |r AS (SELECT user_id, event_id AS rid,
      |             epoch_us(ts) - 120000000 AS lo_r,
      |             epoch_us(ts) + 180000000 AS hi_r
      |      FROM events WHERE event_type = 'purchase' AND ts IS NOT NULL)
      |SELECT count(*) AS n_pairs,
      |       CAST(coalesce(sum(l.lid + r.rid), 0) AS BIGINT) AS pair_checksum,
      |       CAST(coalesce(sum(greatest(l.lo_l, r.lo_r) % 1000000007), 0)
      |            AS BIGINT) AS start_checksum
      |FROM l JOIN r ON l.user_id = r.user_id
      |  AND l.lo_l <= r.hi_r AND r.lo_r <= l.hi_l""".stripMargin) {
    (s, d) =>
      val ev = Tables.events(s, d).filter(col("ts").isNotNull)
      val l = ev.filter(col("event_type") === "click")
        .select(col("user_id"), col("event_id").as("lid"),
          unix_micros(col("ts")).as("lo_l"),
          (unix_micros(col("ts")) + 300000000L).as("hi_l"))
      val r = ev.filter(col("event_type") === "purchase")
        .select(col("user_id"), col("event_id").as("rid"),
          (unix_micros(col("ts")) - 120000000L).as("lo_r"),
          (unix_micros(col("ts")) + 180000000L).as("hi_r"))
      overlapJoin(l, r, Seq("user_id"), "lo_l", "hi_l", "lo_r", "hi_r",
          bucketWidth = 600000000L) // 10 min: ≤ 2 buckets per interval
        .agg(count(lit(1)).as("n_pairs"),
          coalesce(sum(col("lid") + col("rid")), lit(0L))
            .cast("long").as("pair_checksum"),
          coalesce(sum(greatest(col("lo_l"), col("lo_r")) % 1000000007L),
            lit(0L)).cast("long").as("start_checksum"))
  }

  /** Coalesce overlapping-or-touching intervals per key (the bedtools
    * `merge` analog — flattening read alignments, sessions, locks):
    * sort each key's intervals by start, open a new merged group
    * whenever a start exceeds the running max end seen so far, then
    * min/max per group. Two window passes + one aggregate, all
    * partitioned BY KEY — group size is per-key activity, never
    * corpus size. All-integral arithmetic (µs) ⇒ bit-exact
    * cross-engine.
    */
  def coalesceIntervals(df: DataFrame, keyCol: String, startCol: String,
      endCol: String, tiebreak: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val order = Window.partitionBy(keyCol)
      .orderBy(col(startCol), col(tiebreak))
    val prevMax = max(col(endCol)).over(
      order.rowsBetween(Window.unboundedPreceding, -1))
    val grouped = df
      .withColumn("__new", when(prevMax.isNull ||
        col(startCol) > prevMax, 1L).otherwise(0L))
      .withColumn("__grp", sum(col("__new")).over(order))
    grouped.groupBy(col(keyCol), col("__grp"))
      .agg(min(col(startCol)).as("m_start"), max(col(endCol)).as("m_end"),
        count(lit(1)).as("n_source"))
      .drop("__grp")
  }

  /** J13 — per-user interval coalesce over events (each event opens a
    * 30-minute activity interval; merged spans ≈ the e2 sessions seen
    * through interval algebra). FULL DuckDB oracle replaying the same
    * running-max-end window logic; output is per-user merged-span
    * summaries, all integral µs.
    */
  val j13 = QueryDef.sql(
    "j13_interval_coalesce",
    """WITH iv AS (SELECT user_id, event_id, epoch_us(ts) AS s,
      |             epoch_us(ts) + 1800000000 AS e
      |            FROM events WHERE ts IS NOT NULL),
      |g AS (SELECT user_id, event_id, s, e,
      |             CASE WHEN max(e) OVER (PARTITION BY user_id ORDER BY s, event_id
      |                    ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING) IS NULL
      |                  OR s > max(e) OVER (PARTITION BY user_id ORDER BY s, event_id
      |                    ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING)
      |             THEN 1 ELSE 0 END AS nw
      |      FROM iv),
      |gg AS (SELECT user_id, s, e,
      |              sum(nw) OVER (PARTITION BY user_id ORDER BY s, event_id
      |                ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS grp
      |       FROM g),
      |m AS (SELECT user_id, grp, min(s) AS m_start, max(e) AS m_end,
      |             count(*) AS n_source
      |      FROM gg GROUP BY 1, 2)
      |SELECT user_id, CAST(count(*) AS BIGINT) AS n_merged,
      |       CAST(sum(m_end - m_start) AS BIGINT) AS covered_us,
      |       CAST(sum(n_source) AS BIGINT) AS n_events
      |FROM m GROUP BY 1""".stripMargin) { (s, d) =>
    val iv = Tables.events(s, d).filter(col("ts").isNotNull)
      .select(col("user_id"), col("event_id"),
        unix_micros(col("ts")).as("s"),
        (unix_micros(col("ts")) + 1800000000L).as("e"))
    coalesceIntervals(iv, "user_id", "s", "e", "event_id")
      .groupBy("user_id")
      .agg(count(lit(1)).as("n_merged"),
        sum(col("m_end") - col("m_start")).cast("long").as("covered_us"),
        sum(col("n_source")).cast("long").as("n_events"))
  }

  def all: Seq[QueryDef] = Seq(j7, j11, j13, j15)
}
