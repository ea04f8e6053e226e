package graft.ml

import graft.{QueryDef, Tables}
import org.apache.spark.sql.{DataFrame, Row}
import org.apache.spark.sql.functions._

/** Deconfounding — A6 (mass per-column OLS betas), A7 (label betas),
  * A8 (covariate standardization), M13 (genome-wide residualization),
  * P6 (per-column NaN masking). Reference `daxos/deconfound.py:39-102`,
  * `workflows/preprocessing/scripts/adjust_hdf5_for_covariates.py:49-102`.
  *
  * The reference fits p INDEPENDENT sklearn regressions (one per SNP
  * column). Here all p fits collapse into ONE distributed pass: a
  * `treeAggregate` accumulating the normal-equation blocks
  *   CᵀC (k×k)  and  CᵀX (k×p)
  * in float64, then a driver-side solve of B = (CᵀC)⁻¹ CᵀX (k ≤ ~20, so
  * the solve is microseconds). NaN masking (deconfound.py:45-47) is
  * per-column: a row with NaN in column j contributes to every block
  * except column j's — handled by accumulating a *sparse* per-column
  * CᵀC correction only when NaNs are actually present, so the clean-data
  * fast path stays O(k² + k·p) per row with no per-column branching
  * cost at 100 TB.
  *
  * treeAggregate (depth 2) keeps driver merge fan-in at √numPartitions —
  * the buffers are k·(k+p) doubles (k=20, p=215k → ~34 MB), well inside
  * executor/driver budgets, and only ~√P of them ever meet.
  */
object Deconfound {

  /** Row-major k×k + k-vector linear solve, Gaussian elimination with
    * partial pivoting. k ≤ ~20 ⇒ driver-side, exact-enough in float64.
    */
  def solve(aIn: Array[Double], bIn: Array[Double], k: Int): Array[Double] = {
    val a = aIn.clone(); val b = bIn.clone()
    var col = 0
    while (col < k) {
      var piv = col; var best = math.abs(a(col * k + col))
      var r = col + 1
      while (r < k) {
        val v = math.abs(a(r * k + col)); if (v > best) { best = v; piv = r }; r += 1
      }
      require(best > 1e-12, s"singular covariate matrix at column $col")
      if (piv != col) {
        var j = 0
        while (j < k) {
          val t = a(col * k + j); a(col * k + j) = a(piv * k + j); a(piv * k + j) = t
          j += 1
        }
        val t = b(col); b(col) = b(piv); b(piv) = t
      }
      r = col + 1
      while (r < k) {
        val f = a(r * k + col) / a(col * k + col)
        var j = col
        while (j < k) { a(r * k + j) -= f * a(col * k + j); j += 1 }
        b(r) -= f * b(col)
        r += 1
      }
      col += 1
    }
    val x = new Array[Double](k)
    var i = k - 1
    while (i >= 0) {
      var s = b(i); var j = i + 1
      while (j < k) { s -= a(i * k + j) * x(j); j += 1 }
      x(i) = s / a(i * k + i)
      i -= 1
    }
    x
  }

  /** Accumulator for one partition-tree branch. */
  private final class Acc(val k: Int, val p: Int) extends Serializable {
    val ctc = new Array[Double](k * k)
    val ctx = new Array[Double](k * p)
    // column index -> CᵀC contribution of rows where that column is NaN
    val nanCorr = scala.collection.mutable.HashMap.empty[Int, Array[Double]]
    def merge(o: Acc): Acc = {
      var i = 0
      while (i < ctc.length) { ctc(i) += o.ctc(i); i += 1 }
      i = 0
      while (i < ctx.length) { ctx(i) += o.ctx(i); i += 1 }
      o.nanCorr.foreach { case (j, m) =>
        val mine = nanCorr.getOrElseUpdate(j, new Array[Double](k * k))
        var t = 0
        while (t < m.length) { mine(t) += m(t); t += 1 }
      }
      this
    }
  }

  /** A6 — per-column OLS betas B (rows = covariate terms incl. leading
    * intercept, cols = feature positions). `covCols` are scalar numeric
    * columns; features is an array<float|double> column of width p.
    */
  def massOlsBetas(df: DataFrame, covCols: Seq[String], featuresCol: String,
      p: Int): Array[Array[Double]] = {
    val k = covCols.size + 1 // leading intercept term
    val projected = df.select((featuresCol +: covCols).map(col): _*)
    val fIdx = 0
    val cIdx = (1 to covCols.size).toArray
    val agg = projected.rdd.treeAggregate(new Acc(k, p))(
      seqOp = (acc, row) => {
        val c = new Array[Double](k)
        c(0) = 1.0
        var covOk = true
        var t = 0
        while (t < cIdx.length) {
          val v: Double = row.get(cIdx(t)) match {
            case null => Double.NaN
            case f: java.lang.Float => f.toDouble
            case dd: java.lang.Double => dd.doubleValue()
            case n: java.lang.Number => n.doubleValue()
          }
          if (java.lang.Double.isNaN(v)) covOk = false
          c(t + 1) = v
          t += 1
        }
        // a row with a missing/NaN covariate contributes to NO fit (the
        // reference validates covariates upstream; here it degrades to a
        // row drop instead of poisoning every accumulator with NaN)
        if (covOk) {
          // CᵀC over all valid rows
          var a = 0
          while (a < k) {
            var b = 0
            while (b < k) { acc.ctc(a * k + b) += c(a) * c(b); b += 1 }
            a += 1
          }
          val feats = row.getSeq[Any](fIdx)
          var j = 0
          val it = feats.iterator
          while (it.hasNext) {
            val x: Double = it.next() match {
              case f: java.lang.Float => f.toDouble
              case dd: java.lang.Double => dd.doubleValue()
              case null => Double.NaN
              case n: java.lang.Number => n.doubleValue()
            }
            if (java.lang.Double.isNaN(x)) {
              // P6: row drops out of column j's fit only
              val corr = acc.nanCorr.getOrElseUpdate(j, new Array[Double](k * k))
              var a2 = 0
              while (a2 < k) {
                var b2 = 0
                while (b2 < k) { corr(a2 * k + b2) += c(a2) * c(b2); b2 += 1 }
                a2 += 1
              }
            } else {
              var a2 = 0
              while (a2 < k) { acc.ctx(a2 * p + j) += c(a2) * x; a2 += 1 }
            }
            j += 1
          }
        }
        acc
      },
      combOp = (l, r) => l.merge(r),
      depth = 2)
    val betas = Array.ofDim[Double](k, p)
    val cleanCtc = agg.ctc
    var j = 0
    while (j < p) {
      val ctcJ = agg.nanCorr.get(j) match {
        case None => cleanCtc
        case Some(corr) =>
          val m = cleanCtc.clone()
          var t = 0
          while (t < m.length) { m(t) -= corr(t); t += 1 }
          m
      }
      val rhs = Array.tabulate(k)(a => agg.ctx(a * p + j))
      val bj = solve(ctcJ, rhs, k)
      var a = 0
      while (a < k) { betas(a)(j) = bj(a); a += 1 }
      j += 1
    }
    betas
  }

  /** A7 — single-target OLS betas y ~ [1, covars] (deconfound.py:54-62).
    * Reuses the A6 kernel with the label wrapped as a width-1 features
    * array.
    */
  def labelBetas(df: DataFrame, covCols: Seq[String], labelCol: String): Array[Double] = {
    val wrapped = df.select(
      (array(col(labelCol).cast("double")).as("_y") +: covCols.map(col)): _*)
    massOlsBetas(wrapped, covCols, "_y", p = 1).map(_(0))
  }

  /** A8 — z-standardization with fit-on-train / apply-anywhere semantics
    * (adjust_hdf5_for_covariates.py:229-235): moments come from
    * `statsFrom`, the transform applies to `df`. Population stddev (the
    * sklearn StandardScaler convention).
    */
  def standardize(df: DataFrame, covCols: Seq[String], statsFrom: DataFrame): DataFrame = {
    val stats = statsFrom.select(covCols.flatMap(c =>
      Seq(avg(col(c)).as(s"${c}_mean"),
        sqrt(avg(col(c) * col(c)) - avg(col(c)) * avg(col(c))).as(s"${c}_std"))): _*)
      .head()
    covCols.zipWithIndex.foldLeft(df) { case (acc, (c, i)) =>
      val m = stats.getDouble(2 * i); val sd = stats.getDouble(2 * i + 1)
      acc.withColumn(c, (col(c) - m) / (if (sd == 0.0) 1.0 else sd))
    }
  }

  /** M13 — residualize the feature matrix: features_adj = x − Bᵀc with
    * train-fit betas applied to any split (deconfound.py:87-102). B is
    * k×p (k ≤ 20, p ≤ ~1M ⇒ ≤ ~160 MB worst case; ships once per
    * executor via the task closure/broadcast). NaN features stay NaN.
    */
  def residualizeFeatures(df: DataFrame, covCols: Seq[String], featuresCol: String,
      betas: Array[Array[Double]], outCol: String = "features_adj"): DataFrame = {
    val spark = df.sparkSession
    val bc = spark.sparkContext.broadcast(betas)
    val k = betas.length
    val resid = udf { (feats: Seq[Float], covs: Seq[java.lang.Double]) =>
      val b = bc.value
      val p = feats.length
      val c = new Array[Double](k)
      c(0) = 1.0
      var covOk = true
      var t = 1
      while (t < k) {
        val v = covs(t - 1)
        if (v == null || v.isNaN) covOk = false else c(t) = v.doubleValue()
        t += 1
      }
      if (!covOk) Array.fill(p)(Float.NaN) // can't residualize this row
      else Array.tabulate(p) { j =>
        val x = feats(j)
        if (java.lang.Float.isNaN(x)) Float.NaN
        else {
          var fit = 0.0
          var a = 0
          while (a < k) { fit += c(a) * b(a)(j); a += 1 }
          (x - fit).toFloat
        }
      }
    }
    df.withColumn(outCol,
      resid(col(featuresCol), array(covCols.map(c => col(c).cast("double")): _*)))
  }

  /** M13 (label side) — label_adj = y − cᵀβ. */
  def residualizeLabel(df: DataFrame, covCols: Seq[String], labelCol: String,
      beta: Array[Double], outCol: String = "label_adj"): DataFrame = {
    val fit = covCols.zipWithIndex.foldLeft(lit(beta(0))) { case (acc, (c, i)) =>
      acc + col(c) * beta(i + 1)
    }
    df.withColumn(outCol, (col(labelCol) - fit).cast("float"))
  }

  // ---------------------------------------------------------------- queries

  /** A6 oracle — k=1 covariate (plus intercept) betas for two feature
    * columns of lineitem, checked against DuckDB's regr_slope /
    * regr_intercept. Proves the treeAggregate kernel end-to-end.
    */
  val a6 = QueryDef.sql(
    "a6_mass_ols_betas",
    """SELECT CAST(0 AS BIGINT) AS pos,
      |       round(regr_intercept(l_quantity, l_extendedprice), 6) AS beta0,
      |       round(regr_slope(l_quantity, l_extendedprice) * 1000, 6) AS beta1_x1k
      |FROM lineitem
      |UNION ALL
      |SELECT CAST(1 AS BIGINT) AS pos,
      |       round(regr_intercept(l_discount, l_extendedprice), 6) AS beta0,
      |       round(regr_slope(l_discount, l_extendedprice) * 1000, 6) AS beta1_x1k
      |FROM lineitem""".stripMargin) {
    (s, d) =>
      val li = Tables.lineitem(s, d)
        .select(array(col("l_quantity").cast("double"),
          col("l_discount").cast("double")).as("features"),
          col("l_extendedprice").cast("double").as("x"))
      val betas = massOlsBetas(li, Seq("x"), "features", p = 2)
      val spark = s; import spark.implicits._
      // slope is ~1e-6-scale; report ×1000 so round(…,6) keeps real
      // digits. Round via Catalyst (BigDecimal HALF_UP) to match
      // DuckDB's round — math.rint is HALF_EVEN and would flip the
      // hash on a beta landing exactly on a half-boundary.
      Seq(
        (0L, betas(0)(0), betas(1)(0) * 1000),
        (1L, betas(0)(1), betas(1)(1) * 1000))
        .toDF("pos", "beta0", "beta1_x1k")
        .select(col("pos"), round(col("beta0"), 6).as("beta0"),
          round(col("beta1_x1k"), 6).as("beta1_x1k"))
  }

  /** M13 oracle — residualize l_quantity on l_extendedprice; both engines
    * fit their OWN betas, then check the residual identities (mean 0,
    * orthogonal to the covariate). abs() before round keeps ±1e-14 noise
    * from flipping the sign of a rounded zero across engines.
    */
  val m13 = QueryDef.sql(
    "m13_residualize",
    """WITH b AS (SELECT regr_intercept(l_quantity, l_extendedprice) b0,
      |                  regr_slope(l_quantity, l_extendedprice) b1
      |           FROM lineitem)
      |SELECT count(*) AS n,
      |       round(abs(avg(l_quantity - (b.b0 + b.b1 * l_extendedprice))), 6) AS mean_resid,
      |       round(abs(sum((l_quantity - (b.b0 + b.b1 * l_extendedprice)) * l_extendedprice))
      |             / count(*) / 1000000, 4) AS ortho
      |FROM lineitem, b""".stripMargin) {
    (s, d) =>
      val li = Tables.lineitem(s, d)
        .select(array(col("l_quantity").cast("float")).as("features"),
          col("l_extendedprice").cast("double").as("x"))
      val betas = massOlsBetas(li, Seq("x"), "features", p = 1)
      residualizeFeatures(li, Seq("x"), "features", betas, "fadj")
        .select(col("fadj").getItem(0).cast("double").as("r"), col("x"))
        .agg(count(lit(1)).as("n"),
          round(abs(avg(col("r"))), 6).as("mean_resid"),
          round(abs(sum(col("r") * col("x"))) / count(lit(1)) / 1000000, 4).as("ortho"))
  }

  def all: Seq[QueryDef] = Seq(a6, m13)
}
