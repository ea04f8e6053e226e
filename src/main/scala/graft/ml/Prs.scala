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

  def all: Seq[QueryDef] = Seq(m18)
}
