package graft.ml

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Mass-OLS betas vs closed form, NaN masking (P6), residualization —
  * mirrors the reference's tests/test_deconfound.py shape/value checks. */
class DeconfoundSpec extends SparkSpec {

  test("solve: 2x2 exact") {
    // [2 1; 1 3] x = [5; 10] → x = (5/..): solve by hand: x=(1,3)
    val x = Deconfound.solve(Array(2, 1, 1, 3), Array(5, 10), 2)
    assert(math.abs(x(0) - 1.0) < 1e-12 && math.abs(x(1) - 3.0) < 1e-12)
  }

  test("massOlsBetas recovers exact linear coefficients") {
    import spark.implicits._
    // features_j = a_j + b_j*c exactly ⇒ betas recovered to fp precision
    val rows = (1 to 200).map { i =>
      val c = i * 0.1
      (Array((2.0 + 3.0 * c).toFloat, (-1.0 + 0.5 * c).toFloat), c)
    }
    val df = rows.toDF("features", "c")
    val b = Deconfound.massOlsBetas(df, Seq("c"), "features", p = 2)
    assert(math.abs(b(0)(0) - 2.0) < 1e-3)   // float32 inputs limit precision
    assert(math.abs(b(1)(0) - 3.0) < 1e-3)
    assert(math.abs(b(0)(1) + 1.0) < 1e-3)
    assert(math.abs(b(1)(1) - 0.5) < 1e-3)
  }

  test("per-column NaN masking: NaN rows drop out of that column only") {
    import spark.implicits._
    // column 0: clean y=1+2c. column 1: y=4-c but rows c>15 are NaN —
    // the NaN rows carry a DIFFERENT relationship (poison) that must be
    // excluded from column 1's fit while still feeding column 0's.
    val rows = (1 to 200).map { i =>
      val c = i * 0.1
      val x1 = if (c > 15) Float.NaN else (4.0 - c).toFloat
      (Array((1.0 + 2.0 * c).toFloat, x1), c)
    }
    val df = rows.toDF("features", "c")
    val b = Deconfound.massOlsBetas(df, Seq("c"), "features", p = 2)
    assert(math.abs(b(0)(0) - 1.0) < 1e-3 && math.abs(b(1)(0) - 2.0) < 1e-3)
    assert(math.abs(b(0)(1) - 4.0) < 1e-3 && math.abs(b(1)(1) + 1.0) < 1e-3)
  }

  test("null/NaN covariates: rows drop from the fit instead of crashing") {
    import spark.implicits._
    // clean rows follow y = 1 + 2c exactly; poison rows carry a null
    // covariate and a WRONG relationship that must not leak into betas
    val clean = (1 to 100).map { i =>
      val c = i * 0.1
      (Array((1.0 + 2.0 * c).toFloat), Some(c))
    }
    val poison = (1 to 20).map(_ => (Array(999f), None: Option[Double]))
    val df = (clean ++ poison).toDF("features", "c")
      .select(col("features"), col("c").cast("double").as("c"))
    val b = Deconfound.massOlsBetas(df, Seq("c"), "features", p = 1)
    assert(math.abs(b(0)(0) - 1.0) < 1e-3 && math.abs(b(1)(0) - 2.0) < 1e-3)
    // residualize: null-covariate rows become NaN, clean rows near zero
    val out = Deconfound.residualizeFeatures(df, Seq("c"), "features", b)
      .select(col("features_adj").getItem(0)).collect().map(_.getFloat(0))
    assert(out.count(_.isNaN) == 20)
    assert(out.filterNot(_.isNaN).forall(v => math.abs(v) < 1e-3))
  }

  test("residualizeFeatures: exact fit ⇒ zero residuals, NaN preserved") {
    import spark.implicits._
    val rows = (1 to 100).map { i =>
      val c = i * 0.05
      val x = if (i == 50) Float.NaN else (3.0 + 2.0 * c).toFloat
      (Array(x), c)
    }
    val df = rows.toDF("features", "c")
    val b = Deconfound.massOlsBetas(df, Seq("c"), "features", p = 1)
    val out = Deconfound.residualizeFeatures(df, Seq("c"), "features", b)
      .select(col("features_adj").getItem(0)).collect().map(_.getFloat(0))
    assert(out.count(_.isNaN) == 1)
    assert(out.filterNot(_.isNaN).forall(v => math.abs(v) < 1e-3))
  }

  test("labelBetas + residualizeLabel") {
    import spark.implicits._
    val df = (1 to 100).map { i => (5.0 + 4.0 * i * 0.1, i * 0.1) }
      .toDF("y", "c")
    val beta = Deconfound.labelBetas(df, Seq("c"), "y")
    assert(math.abs(beta(0) - 5.0) < 1e-9 && math.abs(beta(1) - 4.0) < 1e-9)
    val resid = Deconfound.residualizeLabel(df, Seq("c"), "y", beta)
      .agg(max(abs(col("label_adj")))).head().getFloat(0)
    assert(resid < 1e-4f)
  }

  test("standardize: fit-on-train moments applied to test") {
    import spark.implicits._
    val train = (1 to 100).map(i => Tuple1(i.toDouble)).toDF("c")
    val test = (101 to 110).map(i => Tuple1(i.toDouble)).toDF("c")
    val out = Deconfound.standardize(test, Seq("c"), statsFrom = train)
    // train mean 50.5, population sd of 1..100 = sqrt((100^2-1)/12)
    val sd = math.sqrt((100.0 * 100 - 1) / 12)
    val got = out.agg(min("c"), max("c")).head()
    assert(math.abs(got.getDouble(0) - (101 - 50.5) / sd) < 1e-9)
    assert(math.abs(got.getDouble(1) - (110 - 50.5) / sd) < 1e-9)
  }
}
