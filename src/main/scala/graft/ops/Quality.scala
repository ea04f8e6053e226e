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

  def all: Seq[QueryDef] = Seq(dq1, dq2)
}
