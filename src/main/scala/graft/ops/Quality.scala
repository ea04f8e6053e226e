package graft.ops

import graft.{QueryDef, Tables}
import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Data-quality operators a 100 TB ingest runs before anything else:
  * single-pass column profiling and declarative constraint validation
  * (the Deequ/"expectations" family, re-expressed as plain Catalyst
  * aggregates — Schelter et al., "Automating Large-Scale Data Quality
  * Verification", VLDB 2018, is the public reference for the shape).
  *
  * Scale design:
  *  - The profile stacks columns into (col_name, value) rows and
  *    aggregates TWICE: (col, value)→count partials first, then
  *    col→stats. The explode is scan-local (never shuffles raw rows);
  *    the shuffle carries only per-(col, distinct-value) partial
  *    counts — Σ|distinct(col)| rows, not |table|×|cols|. Exact
  *    distinct counts come free from the first level, with NO Expand
  *    (a multi-countDistinct agg duplicates every input row per
  *    distinct column — the k1 lesson).
  *  - Every constraint check is a map-side-combinable aggregate or a
  *    broadcast anti-join count; results union to an O(#checks)-row
  *    report. No check ever materializes violating rows unless asked.
  */
object Quality {

  /** One row per profiled column: counts, exact distinct, min/max,
    * and a two-level exact mean (Σ v·cnt / Σ cnt over the distinct-
    * value partials). Numeric and string columns profile through the
    * same machinery; string rows carry lexical min/max instead of
    * numeric stats.
    */
  def profile(df: DataFrame, table: String, numCols: Seq[String],
      strCols: Seq[String]): DataFrame = {
    def stacked(cols: Seq[String], cast: String): DataFrame =
      df.select(explode(array(cols.map(c =>
          struct(lit(s"$table.$c").as("col_name"),
            col(c).cast(cast).as("v"))): _*)).as("x"))
        .select(col("x.col_name"), col("x.v"))
        .groupBy("col_name", "v").agg(count(lit(1)).as("cnt"))
    val nNulls = coalesce(sum(when(col("v").isNull, col("cnt"))), lit(0L))
      .as("n_nulls")
    val nDistinct = count(when(col("v").isNotNull, lit(1))).as("n_distinct")
    val num = stacked(numCols, "double").groupBy("col_name").agg(
      sum(col("cnt")).as("n_rows"), nNulls, nDistinct,
      min(col("v")).as("min_v"), max(col("v")).as("max_v"),
      round(sum(col("v") * col("cnt")) /
        sum(when(col("v").isNotNull, col("cnt"))), 4).as("mean_v"),
      lit(null).cast("string").as("min_s"),
      lit(null).cast("string").as("max_s"))
    val str = stacked(strCols, "string").groupBy("col_name").agg(
      sum(col("cnt")).as("n_rows"), nNulls, nDistinct,
      lit(null).cast("double").as("min_v"),
      lit(null).cast("double").as("max_v"),
      lit(null).cast("double").as("mean_v"),
      min(col("v")).as("min_s"), max(col("v")).as("max_s"))
    num.unionByName(str)
  }

  /** Constraint report: (constraint, n_violations) per declared check.
    * Checks are (name, frame, violation-predicate) triples counted in
    * one aggregate each; FK checks count anti-join survivors against a
    * (broadcastable) key side.
    */
  def predicateViolations(checks: Seq[(String, DataFrame, Column)])
      (implicit s: SparkSession): DataFrame =
    checks.map { case (name, df, bad) =>
      df.agg(coalesce(sum(when(bad, 1L).otherwise(0L)), lit(0L))
        .as("n_violations"))
        .select(lit(name).as("constraint"), col("n_violations"))
    }.reduce(_ unionByName _)

  def fkViolations(name: String, fact: DataFrame, factKey: String,
      dim: DataFrame, dimKey: String): DataFrame =
    fact.join(dim.select(col(dimKey).as(factKey)), Seq(factKey), "left_anti")
      .agg(count(lit(1)).as("n_violations"))
      .select(lit(name).as("constraint"), col("n_violations"))

  def uniqueViolations(name: String, df: DataFrame, key: String): DataFrame =
    df.agg((count(lit(1)) - countDistinct(col(key))).as("n_violations"))
      .select(lit(name).as("constraint"), col("n_violations"))

  // ----------------------------------------------------------- queries

  /** DQ1 — single-pass column profile of lineitem + documents (counts,
    * nulls, exact distinct, min/max, exact mean; lexical min/max for
    * strings). FULL DuckDB oracle replaying the identical two-level
    * (value→count→stats) arithmetic so the mean's accumulation
    * structure matches across engines.
    */
  private val dq1NumCols = Seq("l_quantity", "l_extendedprice",
    "l_discount", "l_tax")
  private val dq1StrCols = Seq("l_returnflag", "l_linestatus")

  private def dq1OracleSql: String = {
    def numSel(table: String, c: String) =
      s"""SELECT '$table.$c' AS col_name,
         |  CAST(sum(cnt) AS BIGINT) AS n_rows,
         |  CAST(COALESCE(sum(CASE WHEN v IS NULL THEN cnt END), 0) AS BIGINT) AS n_nulls,
         |  CAST(count(CASE WHEN v IS NOT NULL THEN 1 END) AS BIGINT) AS n_distinct,
         |  min(v) AS min_v, max(v) AS max_v,
         |  round(sum(v * cnt) / sum(CASE WHEN v IS NOT NULL THEN cnt END), 4) AS mean_v,
         |  CAST(NULL AS VARCHAR) AS min_s, CAST(NULL AS VARCHAR) AS max_s
         |FROM (SELECT CAST($c AS DOUBLE) AS v, count(*) AS cnt
         |      FROM $table GROUP BY 1)""".stripMargin
    def strSel(table: String, c: String) =
      s"""SELECT '$table.$c' AS col_name,
         |  CAST(sum(cnt) AS BIGINT) AS n_rows,
         |  CAST(COALESCE(sum(CASE WHEN v IS NULL THEN cnt END), 0) AS BIGINT) AS n_nulls,
         |  CAST(count(CASE WHEN v IS NOT NULL THEN 1 END) AS BIGINT) AS n_distinct,
         |  CAST(NULL AS DOUBLE) AS min_v, CAST(NULL AS DOUBLE) AS max_v,
         |  CAST(NULL AS DOUBLE) AS mean_v,
         |  min(v) AS min_s, max(v) AS max_s
         |FROM (SELECT CAST($c AS VARCHAR) AS v, count(*) AS cnt
         |      FROM $table GROUP BY 1)""".stripMargin
    (dq1NumCols.map(numSel("lineitem", _)) ++
      dq1StrCols.map(strSel("lineitem", _)) ++
      Seq(numSel("documents", "n_chars")) ++
      Seq("lang", "source").map(strSel("documents", _)))
      .mkString("\nUNION ALL\n")
  }

  val dq1 = QueryDef.sql("dq1_profile", dq1OracleSql) { (s, d) =>
    profile(Tables.lineitem(s, d), "lineitem", dq1NumCols, dq1StrCols)
      .unionByName(profile(Tables.documents(s, d), "documents",
        Seq("n_chars"), Seq("lang", "source")))
  }

  /** DQ2 — constraint validation with PLANTED violations (the shipped
    * tables are clean — all-zero checks would gate nothing): both
    * engines union the same deterministic dirty rows (dup'd order
    * keys, orphaned+negated+overdiscounted lineitems, blanked
    * documents, truncated embeddings), then count violations per
    * declared constraint. FULL DuckDB oracle.
    */
  val dq2 = QueryDef.sql(
    "dq2_constraints",
    """WITH o2 AS (SELECT o_orderkey FROM orders
      |            UNION ALL SELECT o_orderkey FROM orders WHERE o_orderkey % 97 = 0),
      |li2 AS (SELECT l_orderkey, l_quantity, l_discount FROM lineitem
      |        UNION ALL
      |        SELECT l_orderkey + 100000000, -l_quantity, l_discount + 1.0
      |        FROM lineitem WHERE l_orderkey % 101 = 0),
      |d2 AS (SELECT doc_id, CASE WHEN doc_id % 7 = 0 THEN '' ELSE text END AS text
      |       FROM documents),
      |e2 AS (SELECT vec_id,
      |              CASE WHEN vec_id % 11 = 0 THEN embedding[1:32]
      |                   ELSE embedding END AS embedding
      |       FROM embeddings)
      |SELECT 'orders_pk_unique' AS constraint,
      |       CAST(count(*) - count(DISTINCT o_orderkey) AS BIGINT) AS n_violations
      |FROM o2
      |UNION ALL
      |SELECT 'lineitem_fk_orders',
      |       CAST(count(*) AS BIGINT)
      |FROM li2 WHERE l_orderkey NOT IN (SELECT o_orderkey FROM orders)
      |UNION ALL
      |SELECT 'lineitem_quantity_positive',
      |       CAST(COALESCE(sum(CASE WHEN l_quantity <= 0 THEN 1 ELSE 0 END), 0) AS BIGINT)
      |FROM li2
      |UNION ALL
      |SELECT 'lineitem_discount_in_range',
      |       CAST(COALESCE(sum(CASE WHEN l_discount < 0 OR l_discount > 1 THEN 1 ELSE 0 END), 0) AS BIGINT)
      |FROM li2
      |UNION ALL
      |SELECT 'documents_text_nonempty',
      |       CAST(COALESCE(sum(CASE WHEN text IS NULL OR length(text) = 0 THEN 1 ELSE 0 END), 0) AS BIGINT)
      |FROM d2
      |UNION ALL
      |SELECT 'embeddings_dim_64',
      |       CAST(COALESCE(sum(CASE WHEN len(embedding) <> 64 THEN 1 ELSE 0 END), 0) AS BIGINT)
      |FROM e2""".stripMargin) { (s, d) =>
    implicit val spark: SparkSession = s
    val orders = Tables.orders(s, d)
    val li = Tables.lineitem(s, d)
    val o2 = orders.select("o_orderkey")
      .unionByName(orders.filter(col("o_orderkey") % 97 === 0)
        .select("o_orderkey"))
    val li2 = li.select("l_orderkey", "l_quantity", "l_discount")
      .unionByName(li.filter(col("l_orderkey") % 101 === 0)
        .select((col("l_orderkey") + 100000000L).as("l_orderkey"),
          (-col("l_quantity")).as("l_quantity"),
          (col("l_discount") + 1.0).as("l_discount")))
    val d2 = Tables.documents(s, d).select(col("doc_id"),
      when(col("doc_id") % 7 === 0, lit("")).otherwise(col("text")).as("text"))
    val e2 = Tables.embeddings(s, d).select(col("vec_id"),
      when(col("vec_id") % 11 === 0, slice(col("embedding"), 1, 32))
        .otherwise(col("embedding")).as("embedding"))
    uniqueViolations("orders_pk_unique", o2, "o_orderkey")
      .unionByName(fkViolations("lineitem_fk_orders",
        li2, "l_orderkey", orders, "o_orderkey"))
      .unionByName(predicateViolations(Seq(
        ("lineitem_quantity_positive", li2, col("l_quantity") <= 0),
        ("lineitem_discount_in_range", li2,
          col("l_discount") < 0 || col("l_discount") > 1),
        ("documents_text_nonempty", d2,
          col("text").isNull || length(col("text")) === 0),
        ("embeddings_dim_64", e2, size(col("embedding")) =!= 64))))
  }

  // --------------------------------------------------------- profile drift

  /** Population Stability Index between two snapshots of one column,
    * over caller-supplied integer bucket ids (the standard drift
    * metric credit-risk monitoring popularized; PSI > 0.2 is the
    * conventional "investigate" threshold). Add-1 smoothing keeps
    * empty buckets finite — documented, deterministic. Each side is
    * one map-side-combinable (bucket → count) aggregate; the PSI sum
    * runs over ≤|buckets| joined rows.
    */
  def psi(snapA: DataFrame, snapB: DataFrame, bucketCol: String): DataFrame = {
    def hist(df: DataFrame, out: String): DataFrame =
      df.groupBy(bucketCol).agg(count(lit(1)).as(out))
    val j = hist(snapA, "ca").join(hist(snapB, "cb"), Seq(bucketCol), "full")
      .select(coalesce(col("ca"), lit(0L)).as("ca"),
        coalesce(col("cb"), lit(0L)).as("cb"))
    // add-1 per bucket; denominators carry the same smoothing mass.
    // coalesce: sums over ZERO buckets (two empty snapshots) are null —
    // the drift of nothing against nothing is 0, not a crash
    val tot = j.agg(coalesce(sum(col("ca")), lit(0L)).as("na"),
      coalesce(sum(col("cb")), lit(0L)).as("nb"),
      count(lit(1)).as("k")).head()
    val (na, nb, k) = (tot.getLong(0), tot.getLong(1), tot.getLong(2))
    j.select((((col("cb") + 1).cast("double") / lit((nb + k).toDouble) -
        (col("ca") + 1).cast("double") / lit((na + k).toDouble)) *
        (log((col("cb") + 1).cast("double") / lit((nb + k).toDouble)) -
          log((col("ca") + 1).cast("double") / lit((na + k).toDouble))))
        .as("term"))
      .agg(round(sum(col("term")), 6).as("psi"))
  }

  /** DQ3 — snapshot drift report: documents-vs-perturbed-twin (both
    * engines build the identical twin: 10% of docs dropped, a third
    * re-sourced, n_chars inflated 20% on a deterministic slice — the
    * ingest-regression shapes a daily 100 TB snapshot diff actually
    * catches). Per monitored column: row/distinct deltas and PSI over
    * INTEGRAL equal-width buckets (bucket = (v−min)·10 div (max−min),
    * all-integer arithmetic — no float boundary can disagree across
    * engines). FULL DuckDB oracle replaying the same smoothing and
    * log-term sum.
    */
  val dq3 = QueryDef.sql(
    "dq3_profile_drift",
    """WITH a AS (SELECT doc_id, n_chars, source FROM documents),
      |b AS (SELECT doc_id,
      |             CASE WHEN doc_id % 3 = 0 THEN (n_chars * 12) // 10
      |                  ELSE n_chars END AS n_chars,
      |             CASE WHEN source = 'src1' THEN 'src1b' ELSE source END AS source
      |      FROM documents WHERE doc_id % 10 <> 0),
      |rng AS (SELECT min(n_chars) AS lo, max(n_chars) AS hi FROM
      |         (SELECT n_chars FROM a UNION ALL SELECT n_chars FROM b)),
      |ba AS (SELECT least(9, ((n_chars - lo) * 10) // (hi - lo)) AS bucket
      |       FROM a, rng),
      |bb AS (SELECT least(9, ((n_chars - lo) * 10) // (hi - lo)) AS bucket
      |       FROM b, rng),
      |npsi AS (
      |  SELECT round(sum(term), 6) AS psi FROM (
      |    SELECT (CAST(cb + 1 AS DOUBLE) / nbs - CAST(ca + 1 AS DOUBLE) / nas)
      |         * (ln(CAST(cb + 1 AS DOUBLE) / nbs) - ln(CAST(ca + 1 AS DOUBLE) / nas)) AS term
      |    FROM (
      |      SELECT COALESCE(ha.c, 0) AS ca, COALESCE(hb.c, 0) AS cb,
      |             CAST((SELECT count(*) FROM ba) + count(*) OVER () AS DOUBLE) AS nas,
      |             CAST((SELECT count(*) FROM bb) + count(*) OVER () AS DOUBLE) AS nbs
      |      FROM (SELECT bucket, count(*) AS c FROM ba GROUP BY 1) ha
      |      FULL JOIN (SELECT bucket, count(*) AS c FROM bb GROUP BY 1) hb
      |      USING (bucket)))),
      |spsi AS (
      |  SELECT round(sum(term), 6) AS psi FROM (
      |    SELECT (CAST(cb + 1 AS DOUBLE) / nbs - CAST(ca + 1 AS DOUBLE) / nas)
      |         * (ln(CAST(cb + 1 AS DOUBLE) / nbs) - ln(CAST(ca + 1 AS DOUBLE) / nas)) AS term
      |    FROM (
      |      SELECT COALESCE(ha.c, 0) AS ca, COALESCE(hb.c, 0) AS cb,
      |             CAST((SELECT count(*) FROM a) + count(*) OVER () AS DOUBLE) AS nas,
      |             CAST((SELECT count(*) FROM b) + count(*) OVER () AS DOUBLE) AS nbs
      |      FROM (SELECT source, count(*) AS c FROM a GROUP BY 1) ha
      |      FULL JOIN (SELECT source, count(*) AS c FROM b GROUP BY 1) hb
      |      USING (source))))
      |SELECT 'n_chars' AS col_name,
      |       (SELECT count(*) FROM a) AS n_a, (SELECT count(*) FROM b) AS n_b,
      |       (SELECT count(DISTINCT n_chars) FROM a) AS distinct_a,
      |       (SELECT count(DISTINCT n_chars) FROM b) AS distinct_b,
      |       (SELECT psi FROM npsi) AS psi
      |UNION ALL
      |SELECT 'source',
      |       (SELECT count(*) FROM a), (SELECT count(*) FROM b),
      |       (SELECT count(DISTINCT source) FROM a),
      |       (SELECT count(DISTINCT source) FROM b),
      |       (SELECT psi FROM spsi)""".stripMargin) { (s, d) =>
    val a = Tables.documents(s, d).select(col("doc_id"), col("n_chars"),
      col("source"))
    val b = a.filter(col("doc_id") % 10 =!= 0)
      .select(col("doc_id"),
        when(col("doc_id") % 3 === 0, expr("(n_chars * 12) div 10"))
          .otherwise(col("n_chars")).as("n_chars"),
        when(col("source") === "src1", "src1b").otherwise(col("source"))
          .as("source"))
    val rng = a.select(col("n_chars")).unionByName(b.select(col("n_chars")))
      .agg(min("n_chars").as("lo"), max("n_chars").as("hi")).head()
    val (lo, hi) = (rng.getLong(0), rng.getLong(1))
    def buckets(df: DataFrame): DataFrame =
      df.select(least(lit(9),
        expr(s"((n_chars - ${lo}L) * 10) div (${hi}L - ${lo}L)")).as("bucket"))
    def stats(df: DataFrame, c: String): (Long, Long) = {
      val r = df.agg(count(lit(1)), countDistinct(col(c))).head()
      (r.getLong(0), r.getLong(1))
    }
    val (na, da) = stats(a, "n_chars"); val (nb, db) = stats(b, "n_chars")
    val (_, dsa) = stats(a, "source"); val (_, dsb) = stats(b, "source")
    val nPsi = psi(buckets(a), buckets(b), "bucket").head().getDouble(0)
    val sPsi = psi(a.select("source"), b.select("source"), "source")
      .head().getDouble(0)
    val spark = s; import spark.implicits._
    Seq(("n_chars", na, nb, da, db, nPsi),
      ("source", na, nb, dsa, dsb, sPsi))
      .toDF("col_name", "n_a", "n_b", "distinct_a", "distinct_b", "psi")
  }

  // ------------------------------------------------------ quarantine split

  /** Dead-letter split: route rows violating ANY declared constraint
    * to a quarantine side tagged with the full sorted reason list;
    * clean rows pass through untouched. ONE scan evaluates every
    * predicate (no per-check pass); the reason list is a scan-local
    * array filter. The ingest pattern at 100 TB: bad rows must not
    * kill the load OR silently vanish — they land quarantined with
    * machine-readable reasons for replay after the upstream fix.
    */
  def quarantineSplit(df: DataFrame, checks: Seq[(String, Column)])
      : (DataFrame, DataFrame) = {
    require(checks.nonEmpty, "quarantineSplit needs at least one check")
    val reasons = array(checks.map { case (name, bad) =>
      when(bad, lit(name)).otherwise(lit(null).cast("string"))
    }: _*)
    val tagged = df.withColumn("__reasons",
      sort_array(filter(reasons, r => r.isNotNull)))
    (tagged.filter(size(col("__reasons")) === 0).drop("__reasons"),
      tagged.filter(size(col("__reasons")) > 0)
        .withColumn("reasons", array_join(col("__reasons"), ","))
        .drop("__reasons"))
  }

  /** DQ4 — quarantine report over the dq2 planted-dirty lineitem:
    * quarantined rows aggregate by their exact reason COMBINATION
    * (bad rows often violate several checks at once — the combo is
    * what triage buckets on), plus the clean count. FULL DuckDB
    * oracle replaying the same predicate→sorted-reason-list logic.
    */
  val dq4 = QueryDef.sql(
    "dq4_quarantine_split",
    """WITH li2 AS (SELECT l_orderkey, l_quantity, l_discount FROM lineitem
      |        UNION ALL
      |        SELECT l_orderkey + 100000000, -l_quantity, l_discount + 1.0
      |        FROM lineitem WHERE l_orderkey % 101 = 0),
      |tagged AS (
      |  SELECT *, list_sort(list_filter([
      |      CASE WHEN l_quantity <= 0 THEN 'nonpositive_quantity' END,
      |      CASE WHEN l_discount < 0 OR l_discount > 1 THEN 'discount_range' END,
      |      CASE WHEN l_orderkey > 100000000 THEN 'orphan_orderkey' END],
      |    x -> x IS NOT NULL)) AS rs
      |  FROM li2)
      |SELECT array_to_string(rs, ',') AS reasons,
      |       count(*) AS n FROM tagged WHERE len(rs) > 0 GROUP BY 1
      |UNION ALL
      |SELECT '__clean__', count(*) FROM tagged WHERE len(rs) = 0""".stripMargin) {
    (s, d) =>
      val li = Tables.lineitem(s, d)
      val li2 = li.select("l_orderkey", "l_quantity", "l_discount")
        .unionByName(li.filter(col("l_orderkey") % 101 === 0)
          .select((col("l_orderkey") + 100000000L).as("l_orderkey"),
            (-col("l_quantity")).as("l_quantity"),
            (col("l_discount") + 1.0).as("l_discount")))
      val (clean, bad) = quarantineSplit(li2, Seq(
        ("nonpositive_quantity", col("l_quantity") <= 0),
        ("discount_range", col("l_discount") < 0 || col("l_discount") > 1),
        ("orphan_orderkey", col("l_orderkey") > 100000000L)))
      bad.groupBy("reasons").agg(count(lit(1)).as("n"))
        .unionByName(clean.agg(count(lit(1)).as("n"))
          .select(lit("__clean__").as("reasons"), col("n")))
  }

  /** DQ5 — relationship fan-out profile: the distribution of children
    * per parent across orders→lineitem (INCLUDING zero-child parents
    * via the left join — the bucket an inner-join profile silently
    * drops, and exactly where referential bugs hide). Two stacked
    * map-side aggregates; output is O(max fan-out) rows. The modeling
    * sanity check behind every join-strategy choice: a fan-out
    * histogram with an unexpected heavy tail is how you find the
    * skewed key BEFORE the shuffle does. FULL DuckDB oracle.
    */
  val dq5 = QueryDef.sql(
    "dq5_fanout_profile",
    """WITH f AS (SELECT o.o_orderkey,
      |             count(l.l_orderkey) AS n_children
      |           FROM orders o LEFT JOIN lineitem l
      |             ON o.o_orderkey = l.l_orderkey
      |           GROUP BY 1)
      |SELECT n_children, count(*) AS n_parents
      |FROM f GROUP BY 1""".stripMargin) { (s, d) =>
    Tables.orders(s, d).select("o_orderkey")
      .join(Tables.lineitem(s, d).select(col("l_orderkey")),
        col("o_orderkey") === col("l_orderkey"), "left")
      .groupBy("o_orderkey")
      .agg(count(col("l_orderkey")).as("n_children"))
      .groupBy("n_children").agg(count(lit(1)).as("n_parents"))
  }

  /** DQ6 — EMBEDDING-space drift between two corpus windows: the
    * vector-column counterpart of dq3's scalar PSI, the monitor an
    * embedding pipeline actually needs (a silently retrained or
    * corrupted encoder shifts vectors long before any scalar column
    * moves). Centroid-cosine is the naive metric and is USELESS on
    * near-isotropic corpora (two windows' noise means are small-norm
    * vectors with random mutual angle), so the score is the proper
    * two-sample statistic per (label, dimension): z² = (m_cur −
    * m_ref)² / (s²_ref/n_ref + s²_cur/n_cur), averaged over
    * dimensions. Undrifted windows score ≈ 1 (by construction of z);
    * the planted drifted cohort (label 0 shifted +0.25 per dim, an
    * exactly-representable float add in both engines) scores orders
    * of magnitude higher. Flag bar at 4 = 3σ-ish over the ≈1 null
    * with the 64-dim averaging. One posexplode scan per window, one
    * (label, dim)-keyed aggregate each, |labels|×dims join — scale
    * cost is two scans regardless of corpus size. FULL DuckDB oracle:
    * identical mean/variance/z² arithmetic, score rounded to 4dp.
    */
  val dq6 = QueryDef.sql(
    "dq6_embedding_drift",
    """WITH e AS (SELECT vec_id, label,
      |                  generate_subscripts(embedding, 1) AS dim,
      |                  unnest(embedding) AS v
      |           FROM embeddings),
      |ref AS (SELECT label, dim, avg(CAST(v AS DOUBLE)) AS m,
      |               var_samp(CAST(v AS DOUBLE)) AS s2,
      |               count(*) AS n
      |        FROM e WHERE vec_id % 2 = 0 GROUP BY 1, 2),
      |cur0 AS (SELECT label, dim,
      |                CASE WHEN label = 0
      |                     THEN v + CAST(0.25 AS REAL) ELSE v END AS v
      |         FROM e WHERE vec_id % 2 = 1),
      |cur AS (SELECT label, dim, avg(CAST(v AS DOUBLE)) AS m,
      |               var_samp(CAST(v AS DOUBLE)) AS s2,
      |               count(*) AS n
      |        FROM cur0 GROUP BY 1, 2),
      |z AS (SELECT r.label,
      |             (c.m - r.m) * (c.m - r.m) /
      |               (r.s2 / r.n + c.s2 / c.n) AS z2
      |      FROM ref r JOIN cur c ON r.label = c.label AND r.dim = c.dim)
      |SELECT CAST(label AS BIGINT) AS label,
      |       CAST(count(*) AS BIGINT) AS n_dims,
      |       round(avg(z2), 4) AS drift_score,
      |       CAST(CASE WHEN round(avg(z2), 4) > 4 THEN 1 ELSE 0 END
      |         AS BIGINT) AS drifted
      |FROM z GROUP BY label""".stripMargin) { (s, d) =>
    val emb = Tables.embeddings(s, d)
      .select(col("vec_id"), col("label"), col("embedding"))
    def melt(df: DataFrame): DataFrame =
      df.select(col("label"),
        posexplode(col("embedding")).as(Seq("dim", "v")))
    def stats(df: DataFrame, tag: String): DataFrame =
      melt(df).groupBy("label", "dim")
        .agg(avg(col("v").cast("double")).as(s"m_$tag"),
          var_samp(col("v").cast("double")).as(s"s_$tag"),
          count(lit(1)).as(s"n_$tag"))
    val ref = stats(emb.filter(col("vec_id") % 2 === 0), "r")
    val curBase = emb.filter(col("vec_id") % 2 === 1)
      .withColumn("embedding",
        when(col("label") === 0,
          transform(col("embedding"), x => x + lit(0.25f)))
          .otherwise(col("embedding")))
    val cur = stats(curBase, "c")
    val z2 = (col("m_c") - col("m_r")) * (col("m_c") - col("m_r")) /
      (col("s_r") / col("n_r") + col("s_c") / col("n_c"))
    val perLabel = ref.join(cur, Seq("label", "dim"))
      .select(col("label"), z2.as("z2"))
      .groupBy("label")
      .agg(count(lit(1)).as("n_dims"), round(avg(col("z2")), 4).as("drift_score"))
      .select(col("label").cast("long").as("label"), col("n_dims"),
        col("drift_score"),
        when(col("drift_score") > 4, 1L).otherwise(0L).as("drifted"))
      .localCheckpoint(eager = true)
    // golden gates on top of the hash oracle: exactly the planted
    // cohort flags
    val nDrifted = perLabel.filter(col("drifted") === 1).count()
    val zeroDrifted = perLabel
      .filter(col("label") === 0 && col("drifted") === 1).count()
    perLabel.filter(lit(nDrifted == 1 && zeroDrifted == 1))
  }

  /** DQ7 — pairwise correlation profile of the lineitem numeric
    * columns (the Deequ/profiling "correlations" panel dq1 doesn't
    * carry): Pearson r for every pair, from ONE map-side-combinable
    * aggregate over the scan — O(cols²) moments per partition, one
    * reduce, 6 output rows at any table size.
    *
    * DETERMINISM: every measure is first made integral (quantity,
    * price cents, discount/tax percent units (l_discount 0.07 -> 7)), and every moment
    * accumulates EXACTLY — Σxy for the price² pair reaches ~6e19 at
    * sf0.1, past int64, so the sums run in Spark DECIMAL(38,0) /
    * DuckDB HUGEINT (both exact); the r formula then derives from the
    * exact sums through identical double expressions in both engines
    * and rounds at 6. A double Σxy would carry ~ulp·n noise straight
    * into r's 6th decimal.
    */
  val dq7 = QueryDef.sql(
    "dq7_correlation_matrix", {
      val cols = Seq("qty" -> "CAST(round(l_quantity) AS BIGINT)",
        "price_c" -> "CAST(round(l_extendedprice * 100) AS BIGINT)",
        "disc_pct" -> "CAST(round(l_discount * 100) AS BIGINT)",
        "tax_pct" -> "CAST(round(l_tax * 100) AS BIGINT)")
      val moments = cols.map { case (n, e) =>
        s"CAST(sum(CAST($e AS HUGEINT)) AS DOUBLE) AS s_$n"
      } ++ (for {
        (i, (nx, ex)) <- cols.zipWithIndex.map(_.swap)
        (ny, ey) <- cols.drop(i)
      } yield s"CAST(sum(CAST($ex AS HUGEINT) * ($ey)) AS DOUBLE) AS s_${nx}_$ny")
      val pairs = for {
        (i, (nx, _)) <- cols.zipWithIndex.map(_.swap)
        (ny, _) <- cols.drop(i + 1)
      } yield
        s"""SELECT '$nx' AS col_x, '$ny' AS col_y, n,
           |  round((n * s_${nx}_$ny - s_$nx * s_$ny)
           |        / sqrt((n * s_${nx}_$nx - s_$nx * s_$nx)
           |               * (n * s_${ny}_$ny - s_$ny * s_$ny)), 6) AS r
           |FROM m""".stripMargin
      s"""WITH m AS (
         |  SELECT CAST(count(*) AS DOUBLE) AS n, ${moments.mkString(",\n    ")}
         |  FROM lineitem)
         |${pairs.mkString("\nUNION ALL\n")}""".stripMargin
    }) { (s, d) =>
    val base = Tables.lineitem(s, d).select(
      round(col("l_quantity")).cast("long").as("qty"),
      round(col("l_extendedprice") * 100).cast("long").as("price_c"),
      round(col("l_discount") * 100).cast("long").as("disc_pct"),
      round(col("l_tax") * 100).cast("long").as("tax_pct"))
    val names = Seq("qty", "price_c", "disc_pct", "tax_pct")
    val dec = names.map(n => col(n).cast("decimal(18,0)").as(n))
    val withDec = base.select(dec: _*)
    val momentAggs =
      names.map(n => sum(col(n)).cast("double").as(s"s_$n")) ++
        (for {
          (nx, i) <- names.zipWithIndex
          ny <- names.drop(i)
        } yield sum(col(nx) * col(ny)).cast("double").as(s"s_${nx}_$ny"))
    val aggCols = count(lit(1)).cast("double").as("n") +: momentAggs
    val m = withDec.agg(aggCols.head, aggCols.tail: _*)
    // one struct per pair, exploded from the SINGLE aggregate row — a
    // union of per-pair selects would re-run the aggregate (and its
    // full scan) once per pair
    val pairStructs = for {
      (nx, i) <- names.zipWithIndex
      ny <- names.drop(i + 1)
    } yield struct(lit(nx).as("col_x"), lit(ny).as("col_y"), col("n"),
      round((col("n") * col(s"s_${nx}_$ny") - col(s"s_$nx") * col(s"s_$ny")) /
        sqrt((col("n") * col(s"s_${nx}_$nx") - col(s"s_$nx") * col(s"s_$nx")) *
          (col("n") * col(s"s_${ny}_$ny") - col(s"s_$ny") * col(s"s_$ny"))), 6)
        .as("r"))
    m.select(explode(array(pairStructs: _*)).as("p"))
      .select(col("p.col_x"), col("p.col_y"), col("p.n"), col("p.r"))
  }

  def all: Seq[QueryDef] = Seq(dq1, dq2, dq3, dq4, dq5, dq6, dq7)
}
