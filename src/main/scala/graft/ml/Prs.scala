package graft.ml

import graft.{QueryDef, Tables}
import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Polygenic risk scoring (the PLINK `--score` analog — reference
  * frame: daxos consumes GBT/SHAP rankings, but every GWAS pipeline's
  * downstream deliverable is Σ_j β_j·dosage_ij per sample; Choi et
  * al., "PRS analyses" tutorial, Nat Protoc 2020 is the public
  * reference).
  *
  * Two layouts, two scale regimes:
  *  - LONG format (variant-major rows): the 100 TB shape — scores are
  *    one broadcast join against the |variants|-sized weight table
  *    plus one map-side-combinable per-sample sum. Never pivots to a
  *    wide matrix.
  *  - MATRIX format (per-sample dosage array, the Sim-bundle layout):
  *    a scan-local dot product against a broadcast weight vector —
  *    zero shuffle, for cohorts already stored sample-major.
  */
object Prs {

  /** Long-format PRS: genotypes(sample, variant, dosage) ⋈ weights
    * (variant, beta) → per-sample Σ β·dosage + matched-variant count.
    * Missing-weight variants drop (inner join) — PLINK's default
    * no-mean-imputation behavior.
    */
  def prsLong(genotypes: DataFrame, weights: DataFrame,
      sampleCol: String, variantCol: String, dosageCol: String,
      betaCol: String): DataFrame =
    genotypes.join(broadcast(weights), variantCol)
      .groupBy(sampleCol)
      .agg(sum(col(dosageCol) * col(betaCol)).as("prs"),
        count(lit(1)).as("n_variants"))

  /** Matrix-format PRS: dot(features, β) as one scan-local fold over
    * the zipped arrays — no shuffle, no explode. */
  def prsMatrix(features: Column, betas: Seq[Double]): Column = {
    val b = typedLit(betas)
    aggregate(zip_with(features, b, (x, w) => x.cast("double") * w),
      lit(0.0), (acc, v) => acc + v)
  }

  /** M18 — PRS over a lineitem-derived long-format cohort: samples =
    * orders, variants = parts, dosage = l_quantity, weights = a
    * deterministic per-part β in integer CENTS (β_cents =
    * round(100·retailprice) − 100000). All arithmetic INTEGRAL, so
    * per-sample sums are exact under any accumulation order and the
    * DuckDB replay hash-matches bit-for-bit (the g1 fixed-point
    * contract — a float β would drift in last ulps between engines).
    */
  val m18 = QueryDef.sql(
    "m18_prs_score",
    """WITH w AS (SELECT p_partkey,
      |             CAST(round(p_retailprice * 100, 0) AS BIGINT) - 100000 AS beta_c
      |           FROM part),
      |g AS (SELECT l_orderkey AS sample_id, l_partkey,
      |             CAST(l_quantity AS BIGINT) AS dosage
      |      FROM lineitem)
      |SELECT sample_id,
      |       CAST(sum(dosage * beta_c) AS BIGINT) AS prs_cents,
      |       count(*) AS n_variants
      |FROM g JOIN w ON g.l_partkey = w.p_partkey
      |GROUP BY sample_id""".stripMargin) { (s, d) =>
    val weights = Tables.part(s, d).select(col("p_partkey").as("l_partkey"),
      (round(col("p_retailprice") * 100, 0).cast("long") - 100000L)
        .as("beta_c"))
    val geno = Tables.lineitem(s, d).select(
      col("l_orderkey").as("sample_id"), col("l_partkey"),
      col("l_quantity").cast("long").as("dosage"))
    prsLong(geno, weights, "sample_id", "l_partkey", "dosage", "beta_c")
      .select(col("sample_id"), col("prs").cast("long").as("prs_cents"),
        col("n_variants"))
  }

  /** M19 — genomic-control inflation factor λGC (Devlin & Roeder,
    * Biometrics 1999): λ = median(χ²)/0.455936 over a battery of
    * 1-df association tests — THE first-line GWAS QC statistic
    * (λ ≫ 1 ⇒ stratification/batch confounding inflates every test).
    * The test battery here is a per-part 2×2 contingency χ² from
    * lineitem (high-quantity × high-discount), n ≥ 20 per test —
    * the same "many independent weak tests" shape as SNP association.
    *
    * Scale shape: per-key contingency cells are ONE map-side
    * combinable aggregate; χ² is a fixed scan-local double expression
    * (bit-identical cross-engine); the median runs through the a4
    * distributed sort-and-select, never a driver collect of the test
    * battery. FULL DuckDB oracle (quantile_cont replays the same
    * interpolated median — the proven a4 parity).
    */
  val m19 = QueryDef.sql(
    "m19_lambda_gc",
    """WITH cells AS (
      |  SELECT l_partkey,
      |         CAST(count(*) AS DOUBLE) AS n,
      |         CAST(sum(CASE WHEN l_quantity > 25 AND l_discount > 0.05
      |                       THEN 1 ELSE 0 END) AS DOUBLE) AS a,
      |         CAST(sum(CASE WHEN l_quantity > 25 AND l_discount <= 0.05
      |                       THEN 1 ELSE 0 END) AS DOUBLE) AS b,
      |         CAST(sum(CASE WHEN l_quantity <= 25 AND l_discount > 0.05
      |                       THEN 1 ELSE 0 END) AS DOUBLE) AS c
      |  FROM lineitem GROUP BY 1 HAVING count(*) >= 20),
      |chi AS (
      |  SELECT n * (a * (n - a - b - c) - b * c) * (a * (n - a - b - c) - b * c)
      |         / ((a + b) * (c + (n - a - b - c)) * (a + c) * (b + (n - a - b - c)))
      |           AS chisq
      |  FROM cells
      |  WHERE (a + b) > 0 AND (c + (n - a - b - c)) > 0
      |    AND (a + c) > 0 AND (b + (n - a - b - c)) > 0)
      |SELECT CAST(count(*) AS BIGINT) AS n_tests,
      |       round(quantile_cont(chisq, 0.5), 6) AS median_chisq,
      |       round(quantile_cont(chisq, 0.5) / 0.45493642311957, 6) AS lambda_gc
      |FROM chi""".stripMargin) { (s, d) =>
    val cells = Tables.lineitem(s, d)
      .groupBy("l_partkey")
      .agg(count(lit(1)).cast("double").as("n"),
        sum(when(col("l_quantity") > 25 && col("l_discount") > 0.05, 1)
          .otherwise(0)).cast("double").as("a"),
        sum(when(col("l_quantity") > 25 && col("l_discount") <= 0.05, 1)
          .otherwise(0)).cast("double").as("b"),
        sum(when(col("l_quantity") <= 25 && col("l_discount") > 0.05, 1)
          .otherwise(0)).cast("double").as("c"))
      .filter(col("n") >= 20)
    val dd = col("n") - col("a") - col("b") - col("c")
    val det = col("a") * dd - col("b") * col("c")
    val chi = cells
      .filter((col("a") + col("b")) > 0 && (col("c") + dd) > 0 &&
        (col("a") + col("c")) > 0 && (col("b") + dd) > 0)
      .select((col("n") * det * det /
        ((col("a") + col("b")) * (col("c") + dd) *
          (col("a") + col("c")) * (col("b") + dd))).as("chisq"))
    val nTests = chi.count()
    val med = graft.ops.RelationalQueries.exactQuantilesSorted(
      chi, "chisq", Seq(0.5)).head
    val spark = s; import spark.implicits._
    // Catalyst round (BigDecimal HALF_UP) to match DuckDB's round —
    // driver float tricks are HALF_UP only approximately (m15's note)
    Seq((nTests, med, med / 0.45493642311957))
      .toDF("n_tests", "median_chisq_raw", "lambda_gc_raw")
      .select(col("n_tests"),
        round(col("median_chisq_raw"), 6).as("median_chisq"),
        round(col("lambda_gc_raw"), 6).as("lambda_gc"))
  }

  /** χ²(1df) survival function via the Abramowitz–Stegun/Numerical-
    * Recipes erfc polynomial (|rel err| < 1.2e-7 — far inside the
    * round-6 gate), expressed as ONE SQL string spliced verbatim into
    * BOTH engines so the expression tree — and thus every rounding —
    * is structurally identical. `x` is the χ² statistic column name.
    */
  /** erfc of a NON-NEGATIVE argument as shared SQL text (see
    * [[chi2PvalSql]] for the determinism rationale). */
  private[graft] def erfcSql(z: String): String = {
    val t = s"(1.0 / (1.0 + $z / 2.0))"
    s"""least(1.0, $t * exp(-$z * $z - 1.26551223 + $t * (1.00002368 +
       |  $t * (0.37409196 + $t * (0.09678418 + $t * (-0.18628806 +
       |  $t * (0.27886807 + $t * (-1.13520398 + $t * (1.48851587 +
       |  $t * (-0.82215223 + $t * 0.17087277))))))))))""".stripMargin
      .replace("\n", " ")
  }

  private def chi2PvalSql(x: String): String = erfcSql(s"sqrt($x / 2.0)")

  /** M20 — the composed GWAS association scan: the m19 per-key χ²
    * battery → 1-df p-values (shared erfc formula) → distributed
    * Benjamini–Hochberg over all ~2k tests (stats/FDR.bhAdjustScalable
    * — the two-pass range-partitioned suffix-min, no global window).
    * This is the pipeline a real sumstats producer runs end-to-end;
    * the output is every test with its q-value and rejection flag
    * (the battery is null-distributed here, so rejections ≈ 0 — the
    * gate hashes the FULL battery, not just survivors). FULL DuckDB
    * oracle: identical χ², identical p expression text, o4's BH
    * window replay.
    */
  val m20 = QueryDef.sql(
    "m20_assoc_fdr_scan",
    s"""WITH cells AS (
       |  SELECT l_partkey,
       |         CAST(count(*) AS DOUBLE) AS n,
       |         CAST(sum(CASE WHEN l_quantity > 25 AND l_discount > 0.05
       |                       THEN 1 ELSE 0 END) AS DOUBLE) AS a,
       |         CAST(sum(CASE WHEN l_quantity > 25 AND l_discount <= 0.05
       |                       THEN 1 ELSE 0 END) AS DOUBLE) AS b,
       |         CAST(sum(CASE WHEN l_quantity <= 25 AND l_discount > 0.05
       |                       THEN 1 ELSE 0 END) AS DOUBLE) AS c
       |  FROM lineitem GROUP BY 1 HAVING count(*) >= 20),
       |chi AS (
       |  SELECT l_partkey,
       |         n * (a * (n - a - b - c) - b * c) * (a * (n - a - b - c) - b * c)
       |         / ((a + b) * (c + (n - a - b - c)) * (a + c) * (b + (n - a - b - c)))
       |           AS chisq
       |  FROM cells
       |  WHERE (a + b) > 0 AND (c + (n - a - b - c)) > 0
       |    AND (a + c) > 0 AND (b + (n - a - b - c)) > 0),
       |pv AS (SELECT l_partkey, chisq, ${chi2PvalSql("chisq")} AS p FROM chi),
       |r AS (SELECT l_partkey, chisq, p,
       |             CAST(row_number() OVER (ORDER BY p, l_partkey) AS BIGINT) AS rnk,
       |             count(*) OVER () AS nn
       |      FROM pv),
       |m AS (SELECT l_partkey, chisq, p, rnk,
       |             min(p * nn / rnk) OVER (ORDER BY rnk
       |               ROWS BETWEEN CURRENT ROW AND UNBOUNDED FOLLOWING) AS cummin,
       |             max(CASE WHEN p * nn <= rnk * 0.05 THEN rnk END) OVER () AS max_rej
       |      FROM r)
       |SELECT l_partkey, round(chisq, 6) AS chisq, round(p, 6) AS p,
       |       round(least(cummin, 1.0), 6) AS q,
       |       CAST(CASE WHEN max_rej IS NOT NULL AND rnk <= max_rej
       |            THEN 1 ELSE 0 END AS BIGINT) AS rejected
       |FROM m""".stripMargin) { (s, d) =>
    val cells = Tables.lineitem(s, d)
      .groupBy("l_partkey")
      .agg(count(lit(1)).cast("double").as("n"),
        sum(when(col("l_quantity") > 25 && col("l_discount") > 0.05, 1)
          .otherwise(0)).cast("double").as("a"),
        sum(when(col("l_quantity") > 25 && col("l_discount") <= 0.05, 1)
          .otherwise(0)).cast("double").as("b"),
        sum(when(col("l_quantity") <= 25 && col("l_discount") > 0.05, 1)
          .otherwise(0)).cast("double").as("c"))
      .filter(col("n") >= 20)
    val dd = col("n") - col("a") - col("b") - col("c")
    val det = col("a") * dd - col("b") * col("c")
    val chi = cells
      .filter((col("a") + col("b")) > 0 && (col("c") + dd) > 0 &&
        (col("a") + col("c")) > 0 && (col("b") + dd) > 0)
      .select(col("l_partkey"), (col("n") * det * det /
        ((col("a") + col("b")) * (col("c") + dd) *
          (col("a") + col("c")) * (col("b") + dd))).as("chisq"))
    val pv = chi.withColumn("p", expr(chi2PvalSql("chisq")))
    graft.stats.FDR.bhAdjustScalable(pv, "p", col("l_partkey"))
      .select(col("l_partkey"), round(col("chisq"), 6).as("chisq"),
        round(col("p"), 6).as("p"),
        round(least(col("p_adj"), lit(1.0)), 6).as("q"), col("rejected"))
  }

  def all: Seq[QueryDef] = Seq(m18, m19, m20)
}
