package graft.ml

import graft.{QueryDef, Tables}
import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Evaluators A9 (AUC), A10 (RMSE), A11 (R²) — reference
  * `daxos/crossvalidate.py:130-145`, `daxos/scoring.py:122-133`.
  *
  * AUC uses the Mann–Whitney rank form with average ranks for ties —
  * identical to trapezoidal ROC area. Scale design: rows are first
  * reduced to one record PER DISTINCT SCORE (a hash aggregate with
  * map-side combine), then the cumulative rank is computed by a
  * range-partitioned parallel sort plus a two-pass prefix-sum (the
  * same carry pattern as [[graft.stats.FDR.bhAdjustScalable]]): pass 1
  * emits one count per partition, the driver prefix-sums that tiny
  * array, pass 2 applies the carry per partition. No stage ever
  * serializes the score table through a single task — model scores
  * are continuous, so "distinct scores" is ~n and a global window
  * here would be the hot-path scale-killer (every CV fold × param
  * scores through AUC twice).
  *
  * All three evaluators return 1-row DataFrames so they compose as
  * declared queries; `Double` convenience accessors collect that row.
  */
object Scoring {

  /** NaN-aware pre-filter (P5): evaluation drops rows with NaN labels,
    * mirroring crossvalidate.py:133-139. */
  def dropNanLabels(df: DataFrame, labelCol: String): DataFrame =
    df.filter(col(labelCol).isNotNull && !isnan(col(labelCol)))

  /** A9 — AUC(label ∈ {0,1}, score). One hash-agg pass to distinct
    * scores, then a range-partitioned sort + two-pass distributed
    * prefix-sum. avg rank of a tie group = (#rows before) + (c+1)/2.
    *
    * Pass 1 collects ONE double per partition (the partition's row
    * count); pass 2 accumulates the Mann–Whitney partials with the
    * driver-computed carry and collects one triple per partition.
    * Both passes re-read the sort's shuffle files (no persist — the
    * deterministic sort stage is skipped on the second job, and
    * pinning the score table would poison later queries' memory).
    * The term order matches the oracle's ascending-score window, so
    * the double arithmetic is sequence-identical to DuckDB's.
    */
  def aucDF(df: DataFrame, labelCol: String, scoreCol: String): DataFrame = {
    val spark = df.sparkSession
    val g = dropNanLabels(df, labelCol)
      .groupBy(col(scoreCol).as("s"))
      .agg(count(lit(1)).cast("double").as("c"),
        sum(col(labelCol)).cast("double").as("pos"))
    val sorted = g.orderBy(col("s")) // range-partitioned parallel sort
    val cIdx = sorted.schema.fieldIndex("c")
    val posIdx = sorted.schema.fieldIndex("pos")
    val rdd = sorted.rdd
    // pass 1: rows-per-partition — one tiny record each
    val partCounts = rdd.mapPartitionsWithIndex { (pid, it) =>
      var sumC = 0.0
      it.foreach(r => sumC += r.getDouble(cIdx))
      Iterator((pid, sumC))
    }.collect().sortBy(_._1).map(_._2)
    // carry(pid) = #rows in partitions strictly before pid
    val carry = partCounts.scanLeft(0.0)(_ + _)
    // pass 2: per-partition Mann–Whitney partials under the carry
    val partials = rdd.mapPartitionsWithIndex { (pid, it) =>
      var cumb = carry(pid)
      var sumr = 0.0; var np = 0.0; var n = 0.0
      it.foreach { r =>
        val c = r.getDouble(cIdx); val pos = r.getDouble(posIdx)
        sumr += pos * (cumb + (c + 1) / 2.0)
        np += pos; n += c; cumb += c
      }
      Iterator((pid, sumr, np, n))
    }.collect().sortBy(_._1)
    var sumr = 0.0; var np = 0.0; var n = 0.0
    partials.foreach { case (_, sr, p, c) => sumr += sr; np += p; n += c }
    val auc = (sumr - np * (np + 1) / 2.0) / (np * (n - np))
    import spark.implicits._
    Seq(auc).toDF("auc")
  }

  def auc(df: DataFrame, labelCol: String, scoreCol: String): Double =
    aucDF(df, labelCol, scoreCol).head().getDouble(0)

  /** A17 — average precision (area under the precision-recall curve,
    * step-wise with tie groups): AP = Σ_g pos_g · TP_g/(TP_g+FP_g) / P
    * over distinct scores g in DESCENDING order, cumulative counts
    * inclusive of the tie group. Same scale shape as [[aucDF]]: hash
    * aggregate to distinct scores, range-partitioned descending sort,
    * two passes (per-partition counts → carry → partials) with one
    * small record per partition collected each pass — never a
    * single-task window over the score table. Preferred over ROC-AUC
    * when positives are rare (quality classifiers over a 100 TB
    * corpus): ROC-AUC saturates under class imbalance, PR-AUC does
    * not.
    */
  def prAucDF(df: DataFrame, labelCol: String, scoreCol: String): DataFrame = {
    val spark = df.sparkSession
    val g = dropNanLabels(df, labelCol)
      .groupBy(col(scoreCol).as("s"))
      .agg(count(lit(1)).cast("double").as("c"),
        sum(col(labelCol)).cast("double").as("pos"))
    val sorted = g.orderBy(col("s").desc)
    val cIdx = sorted.schema.fieldIndex("c")
    val posIdx = sorted.schema.fieldIndex("pos")
    val rdd = sorted.rdd
    // pass 1: per-partition (rows, positives) — one tiny record each
    val partCounts = rdd.mapPartitionsWithIndex { (pid, it) =>
      var sumC = 0.0; var sumPos = 0.0
      it.foreach { r => sumC += r.getDouble(cIdx); sumPos += r.getDouble(posIdx) }
      Iterator((pid, sumC, sumPos))
    }.collect().sortBy(_._1)
    val carryN = partCounts.map(_._2).scanLeft(0.0)(_ + _)
    val carryP = partCounts.map(_._3).scanLeft(0.0)(_ + _)
    // pass 2: AP partials under the (rows, positives) carries
    val partials = rdd.mapPartitionsWithIndex { (pid, it) =>
      var cumN = carryN(pid); var cumP = carryP(pid)
      var ap = 0.0
      it.foreach { r =>
        val c = r.getDouble(cIdx); val pos = r.getDouble(posIdx)
        cumN += c; cumP += pos
        if (pos > 0) ap += pos * (cumP / cumN) // precision at this threshold
      }
      Iterator((pid, ap))
    }.collect().sortBy(_._1)
    val totalPos = carryP.last // scanLeft's final element = grand total
    require(totalPos > 0, "prAucDF: no positive labels")
    val ap = partials.map(_._2).sum / totalPos
    import spark.implicits._
    Seq(ap).toDF("pr_auc")
  }

  /** A10 — RMSE. Single aggregate. */
  def rmseDF(df: DataFrame, labelCol: String, predCol: String): DataFrame =
    dropNanLabels(df, labelCol).agg(
      sqrt(avg(pow(col(labelCol) - col(predCol), 2))).as("rmse"))

  def rmse(df: DataFrame, labelCol: String, predCol: String): Double =
    rmseDF(df, labelCol, predCol).head().getDouble(0)

  /** A11 — R² = 1 − SS_res/SS_tot. Two-moment single pass:
    * SS_tot = Σy² − (Σy)²/n, SS_res = Σ(y−ŷ)².
    */
  def r2DF(df: DataFrame, labelCol: String, predCol: String): DataFrame =
    dropNanLabels(df, labelCol).agg(
      sum(pow(col(labelCol) - col(predCol), 2)).as("ssres"),
      sum(pow(col(labelCol), 2)).as("syy"),
      sum(col(labelCol)).as("sy"),
      count(lit(1)).cast("double").as("n"))
      .select((lit(1.0) - col("ssres") /
        (col("syy") - col("sy") * col("sy") / col("n"))).as("r2"))

  def r2(df: DataFrame, labelCol: String, predCol: String): Double =
    r2DF(df, labelCol, predCol).head().getDouble(0)

  // ---------------------------------------------------------------- queries

  /** Deterministic pseudo-prediction table from orders: y = parity of
    * o_orderkey, score = fractional part of o_totalprice (~U(0,1),
    * label-independent, so AUC ≈ 0.5 — the value itself is the oracle
    * contract, not the discriminative power).
    */
  private def pseudoPreds(s: org.apache.spark.sql.SparkSession, d: String): DataFrame =
    Tables.orders(s, d).select(
      (col("o_orderkey") % 2).cast("double").as("y"),
      (col("o_totalprice") - floor(col("o_totalprice"))).as("score"))

  private val pseudoPredsSql =
    "SELECT CAST(o_orderkey % 2 AS DOUBLE) AS y, o_totalprice - floor(o_totalprice) AS score FROM orders"

  val a9 = QueryDef.sql(
    "a9_auc_rank",
    s"""WITH p AS ($pseudoPredsSql),
      |g AS (SELECT score AS s, CAST(count(*) AS DOUBLE) c, CAST(sum(y) AS DOUBLE) pos
      |      FROM p GROUP BY 1),
      |o AS (SELECT s, c, pos,
      |             coalesce(sum(c) OVER (ORDER BY s
      |               ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) cumb
      |      FROM g),
      |t AS (SELECT sum(pos * (cumb + (c + 1) / 2.0)) sumr, sum(pos) np, sum(c) n FROM o)
      |SELECT round((sumr - np * (np + 1) / 2.0) / (np * (n - np)), 6) AS auc
      |FROM t""".stripMargin) {
    (s, d) => aucDF(pseudoPreds(s, d), "y", "score")
      .select(round(col("auc"), 6).as("auc"))
  }

  /** PR-AUC over the same pseudo-prediction table as a9 (label-
    * independent scores → AP ≈ prevalence ≈ 0.5; the exact value is
    * the oracle contract). DuckDB replays the step-wise tie-grouped
    * definition with an inclusive running-count window.
    */
  val a17 = QueryDef.sql(
    "a17_pr_auc",
    s"""WITH p AS ($pseudoPredsSql),
      |g AS (SELECT score AS s, CAST(count(*) AS DOUBLE) c, CAST(sum(y) AS DOUBLE) pos
      |      FROM p GROUP BY 1),
      |o AS (SELECT pos,
      |             sum(c) OVER (ORDER BY s DESC) AS tpfp,
      |             sum(pos) OVER (ORDER BY s DESC) AS tp
      |      FROM g)
      |SELECT round(sum(pos * tp / tpfp) / (SELECT sum(y) FROM p), 6) AS pr_auc
      |FROM o WHERE pos > 0""".stripMargin) {
    (s, d) => prAucDF(pseudoPreds(s, d), "y", "score")
      .select(round(col("pr_auc"), 6).as("pr_auc"))
  }

  /** A18 — calibration (reliability) bins: equal-width score bins →
    * (n, positives, mean label). ONE hash aggregate, map-side
    * combinable, 10 rows out — the trivially-scalable diagnostic that
    * pairs with Platt scaling (M10): a calibrated model has
    * mean_label ≈ bin midpoint. Mean label is one division of two
    * exact integer counts, so the value is bit-deterministic
    * cross-engine (no float-sum ordering anywhere).
    */
  val a18 = QueryDef.sql(
    "a18_calibration_bins",
    s"""WITH p AS ($pseudoPredsSql),
      |b AS (SELECT least(CAST(floor(score * 10) AS BIGINT), 9) AS bin, y
      |      FROM p)
      |SELECT bin, count(*) AS n, CAST(sum(y) AS BIGINT) AS n_pos,
      |       round(CAST(sum(y) AS DOUBLE) / count(*), 6) AS mean_label
      |FROM b GROUP BY bin""".stripMargin) {
    (s, d) => pseudoPreds(s, d)
      .select(least(floor(col("score") * 10).cast("long"), lit(9L)).as("bin"),
        col("y"))
      .groupBy("bin")
      .agg(count(lit(1)).as("n"), sum(col("y")).cast("long").as("n_pos"))
      .select(col("bin"), col("n"), col("n_pos"),
        round(col("n_pos").cast("double") / col("n"), 6).as("mean_label"))
  }

  val a10 = QueryDef.sql(
    "a10_rmse",
    s"""WITH p AS ($pseudoPredsSql)
      |SELECT round(sqrt(avg(pow(y - score, 2))), 6) AS rmse FROM p""".stripMargin) {
    (s, d) => rmseDF(pseudoPreds(s, d), "y", "score")
      .select(round(col("rmse"), 6).as("rmse"))
  }

  val a11 = QueryDef.sql(
    "a11_r2",
    s"""WITH p AS ($pseudoPredsSql)
      |SELECT round(1.0 - sum(pow(y - score, 2)) /
      |       (sum(pow(y, 2)) - sum(y) * sum(y) / count(*)), 6) AS r2
      |FROM p""".stripMargin) {
    (s, d) => r2DF(pseudoPreds(s, d), "y", "score")
      .select(round(col("r2"), 6).as("r2"))
  }

  def all: Seq[QueryDef] = Seq(a9, a17, a18, a10, a11)
}
