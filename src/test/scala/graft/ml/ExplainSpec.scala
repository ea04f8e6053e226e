package graft.ml

import graft.SparkSpec

/** TreeSHAP vs brute-force Shapley values on real MLlib-fitted trees,
  * plus importance bookkeeping. */
class ExplainSpec extends SparkSpec {

  /** Brute-force conditional expectation (Lundberg EXPVALUE). */
  private def expValue(t: Explain.FlatTree, x: Array[Double], s: Set[Int]): Double = {
    def g(n: Int): Double =
      if (t.feature(n) == -1) t.value(n)
      else {
        val d = t.feature(n)
        if (s.contains(d)) {
          if (x(d) <= t.threshold(n)) g(t.left(n)) else g(t.right(n))
        } else {
          (g(t.left(n)) * t.cover(t.left(n)) +
            g(t.right(n)) * t.cover(t.right(n))) / t.cover(n)
        }
      }
    g(0)
  }

  private def bruteShap(t: Explain.FlatTree, x: Array[Double], p: Int): Array[Double] = {
    val phi = new Array[Double](p)
    def fact(n: Int): Double = (1 to n).map(_.toDouble).product
    for (j <- 0 until p) {
      val others = (0 until p).filterNot(_ == j).toList
      for (k <- 0 to others.size; subset <- others.combinations(k)) {
        val s = subset.toSet
        val w = fact(s.size) * fact(p - s.size - 1) / fact(p)
        phi(j) += w * (expValue(t, x, s + j) - expValue(t, x, s))
      }
    }
    phi
  }

  private lazy val fitted = {
    val cfg = Sim.Config(n = 300L, p = 5, seed = 77L, chunkRows = 100L)
    val bundle = Sim.bundle(spark, cfg)
    val hp = HyperParams(0.2, 1.0, 1.0, 3, 3)
    val model = Train.fitClassifier(Train.withVector(bundle), hp, 17L)
    (Explain.flattenModel(model.trees), model.treeWeights, bundle, cfg.p)
  }

  test("TreeSHAP equals brute-force Shapley on fitted trees") {
    val (flat, ws, bundle, p) = fitted
    val xs = bundle.select("features").take(5)
      .map(_.getSeq[Float](0).map(_.toDouble).toArray)
    xs.foreach { x =>
      val phi = new Array[Double](p + 1)
      flat.zip(ws).foreach { case (t, w) => Explain.shapTree(t, x, phi, w) }
      val brute = new Array[Double](p)
      flat.zip(ws).foreach { case (t, w) =>
        val b = bruteShap(t, x, p)
        for (j <- 0 until p) brute(j) += w * b(j)
      }
      for (j <- 0 until p)
        assert(math.abs(phi(j) - brute(j)) < 1e-9, s"feature $j")
      // additivity: Σφ + bias == margin
      val margin = Explain.margin(flat, ws, x)
      assert(math.abs(phi.sum - margin) < 1e-9)
    }
  }

  test("importances: weight counts splits, totals sum gains/covers") {
    val (flat, _, _, p) = fitted
    val imp = Explain.importances(flat, (0 until p).map(j => s"snp$j"), spark)
      .collect().map(r => r.getString(0) ->
        (r.getDouble(2), r.getDouble(4))).toMap
    val totalSplits = flat.map(_.feature.count(_ >= 0)).sum
    assert(imp.values.map(_._1).sum == totalSplits.toDouble)
    val totalGain = flat.map(t => t.gain.sum).sum
    assert(math.abs(imp.values.map(_._2).sum - totalGain) < 1e-9)
  }
}
