package graft.ml

import graft.SparkSpec

/** Evaluators vs hand-computed values, including AUC tie handling. */
class ScoringSpec extends SparkSpec {

  test("AUC: perfect, random-ish, and tied scores") {
    import spark.implicits._
    // perfect separation
    val perfect = Seq((0.0, 0.1), (0.0, 0.2), (1.0, 0.8), (1.0, 0.9))
      .toDF("y", "s")
    assert(math.abs(Scoring.auc(perfect, "y", "s") - 1.0) < 1e-12)
    // hand-computed with ties: y = (0,1,0,1), s = (.5,.5,.2,.8)
    // ranks ascending: .2→1, .5,.5→avg 2.5, .8→4
    // sum pos ranks = 2.5 + 4 = 6.5; AUC = (6.5 - 2*3/2)/(2*2) = 0.875
    val tied = Seq((0.0, 0.5), (1.0, 0.5), (0.0, 0.2), (1.0, 0.8)).toDF("y", "s")
    assert(math.abs(Scoring.auc(tied, "y", "s") - 0.875) < 1e-12)
    // all-same score ⇒ AUC 0.5
    val flat = Seq((0.0, 0.3), (1.0, 0.3), (0.0, 0.3), (1.0, 0.3)).toDF("y", "s")
    assert(math.abs(Scoring.auc(flat, "y", "s") - 0.5) < 1e-12)
  }

  test("AUC drops NaN labels (P5)") {
    import spark.implicits._
    val df = Seq((0.0, 0.1), (1.0, 0.9), (Double.NaN, 0.99)).toDF("y", "s")
    assert(math.abs(Scoring.auc(df, "y", "s") - 1.0) < 1e-12)
  }

  test("PR-AUC: perfect, tied, and rare-positive hand values") {
    import spark.implicits._
    def ap(df: org.apache.spark.sql.DataFrame): Double =
      Scoring.prAucDF(df, "y", "s").head().getDouble(0)
    // perfect ranking → AP 1.0
    val perfect = Seq((0.0, 0.1), (0.0, 0.2), (1.0, 0.8), (1.0, 0.9))
      .toDF("y", "s")
    assert(math.abs(ap(perfect) - 1.0) < 1e-12)
    // hand-computed with a tie group: y=(1,0,1,0), s=(.9,.9,.5,.2)
    // desc groups: s=.9 (c=2,pos=1): P=1/2, term=1·0.5
    //              s=.5 (c=1,pos=1): P=2/3, term=1·(2/3)
    // AP = (0.5 + 2/3) / 2 = 7/12
    val tied = Seq((1.0, 0.9), (0.0, 0.9), (1.0, 0.5), (0.0, 0.2)).toDF("y", "s")
    assert(math.abs(ap(tied) - 7.0 / 12) < 1e-12)
    // one positive ranked 3rd of 4 → AP = 1/3
    val rare = Seq((0.0, 0.9), (0.0, 0.8), (1.0, 0.5), (0.0, 0.2)).toDF("y", "s")
    assert(math.abs(ap(rare) - 1.0 / 3) < 1e-12)
  }

  test("RMSE and R² hand values") {
    import spark.implicits._
    val df = Seq((1.0, 2.0), (3.0, 3.0), (5.0, 4.0)).toDF("y", "p")
    // errors: -1, 0, 1 → rmse = sqrt(2/3)
    assert(math.abs(Scoring.rmse(df, "y", "p") - math.sqrt(2.0 / 3)) < 1e-12)
    // ss_res = 2; ss_tot = (1-3)^2+(3-3)^2+(5-3)^2 = 8 → r2 = 0.75
    assert(math.abs(Scoring.r2(df, "y", "p") - 0.75) < 1e-12)
  }

  test("RF-adjusted AUC recovers nonlinear covariate share (M11 RF regime)") {
    import org.apache.spark.sql.functions._
    // covariate acts via linear + 3-period sawtooth share (sawtooth is
    // uncorrelated with c1 over its uniform support): OLS removes only
    // the linear part, RF captures the sawtooth too → strict AUC
    // ordering with wide margins (numerically: raw≈0.61, ols≈0.72,
    // ideal nonlinear adjust≈0.98)
    val base = spark.range(1200).select(
      (col("id") % 2).cast("double").as("y_true"),
      ((col("id") % 101).cast("double") / 101.0).as("c1"),
      (pmod(xxhash64(col("id")), lit(1000)).cast("double") / 1000.0).as("_u"))
    val preds = base.withColumn("y_pred",
      col("y_true") * 0.25 + col("c1") * 1.5 +
        (col("c1") * 3.0 % 1.0 - 0.5) + col("_u") * 0.3)
      .select("y_true", "y_pred", "c1")
    val aucRaw = Scoring.auc(preds, "y_true", "y_pred")
    val aucOls = Pipeline.adjustedScore(preds, Seq("c1")).head().getDouble(0)
    val rfRow = Pipeline.adjustedScoreRf(preds, Seq("c1"), nTrees = 10,
      nIter = 2, nSubsample = 800, seed = 5L).head()
    val aucRf = rfRow.getDouble(0)
    assert(aucOls > aucRaw + 0.02, s"ols=$aucOls raw=$aucRaw")
    assert(aucRf > aucOls + 0.02, s"rf=$aucRf ols=$aucOls")
    assert(aucRf <= 1.0 && rfRow.getDouble(1) <= 1.0) // r2 of fit sane
  }

  test("HP sampler: seeded determinism and ranges") {
    val a = Train.sampleParams(50, 100, seed = 4L)
    val b = Train.sampleParams(50, 100, seed = 4L)
    assert(a == b)
    a.foreach { hp =>
      assert(hp.eta >= 1e-4 && hp.eta <= 0.1)
      assert(hp.subsample >= 0.5 && hp.subsample <= 1.0)
      assert(hp.colsampleBytree >= 0.5 && hp.colsampleBytree <= 1.0)
      assert(hp.maxDepth >= 2 && hp.maxDepth <= 8)
      assert(hp.nRounds == 100)
    }
    // log-uniform: median should be near geometric mean sqrt(1e-4*0.1)≈3.2e-3
    val etas = Train.sampleParams(2000, 1, seed = 8L).map(_.eta).sorted
    val med = etas(1000)
    assert(med > 1e-3 && med < 1e-2)
  }
}
