package graft.ml

import graft.SparkSpec
import org.apache.spark.sql.functions._

class BorutaSpec extends SparkSpec {

  test("binomial sf/cdf known values (n=8, p=1/2)") {
    // P[X >= 8] = 1/256; P[X >= 7] = 9/256; P[X <= 0] = 1/256
    assert(math.abs(Boruta.binomSf(8, 8) - 1.0 / 256) < 1e-12)
    assert(math.abs(Boruta.binomSf(7, 8) - 9.0 / 256) < 1e-12)
    assert(math.abs(Boruta.binomCdf(0, 8) - 1.0 / 256) < 1e-12)
    assert(math.abs(Boruta.binomSf(0, 8) - 1.0) < 1e-12)
    assert(math.abs(Boruta.binomCdf(8, 8) - 1.0) < 1e-12)
    // symmetry: sf(k) == cdf(n-k)
    for (k <- 0 to 8)
      assert(math.abs(Boruta.binomSf(k, 8) - Boruta.binomCdf(8 - k, 8)) < 1e-12)
  }

  test("driver-side BH matches the distributed implementation's example") {
    val adj = Boruta.bhAdjustArray(Array(0.01, 0.02, 0.03, 0.04, 0.05))
    adj.foreach(v => assert(math.abs(v - 0.05) < 1e-12))
    val adj2 = Boruta.bhAdjustArray(Array(0.039, 0.001, 0.09, 0.008, 0.041))
    // sorted: .001,.008,.039,.041,.09 → ratios .005,.02,.065,.05125,.09
    // suffix-min from right: .09,.05125,.05125,.02,.005 → map back
    assert(math.abs(adj2(1) - 0.005) < 1e-12)
    assert(math.abs(adj2(3) - 0.02) < 1e-12)
    assert(math.abs(adj2(0) - 0.05125) < 1e-12)
    assert(math.abs(adj2(4) - 0.05125) < 1e-12)
    assert(math.abs(adj2(2) - 0.09) < 1e-12)
  }

  test("withShadows: shape, min-pad to 5, per-partition multiset preserved") {
    import spark.implicits._
    val df = (1 to 120).map { i =>
      (i.toLong, Array(i.toFloat, (i * 2).toFloat, (i * 3).toFloat))
    }.toDF("id", "features").repartition(3)
    val out = Boruta.withShadows(df, p = 3, seed = 9L)
    val rows = out.select("features", "features_sh").collect()
    rows.foreach { r =>
      val f = r.getSeq[Float](0); val sh = r.getSeq[Float](1)
      assert(sh.length == 3 + 5) // p + max(p,5) with p=3 → padded to 5
      assert(sh.take(3) == f)    // original features lead
    }
    // global multiset per shadow column equals the original column's
    // (partition-local permutation preserves it per partition, hence globally)
    val origCol0 = rows.map(_.getSeq[Float](0)(0)).sorted.toSeq
    val shCol0 = rows.map(_.getSeq[Float](1)(3)).sorted.toSeq
    assert(shCol0 == origCol0)
    // padded columns cycle: shadow j draws from source column j % p
    val shCol3 = rows.map(_.getSeq[Float](1)(6)).sorted.toSeq // shadow idx 3 → src 0
    assert(shCol3 == origCol0)
  }

  test("simhash-style hamming helper") {
    import spark.implicits._
    val df = Seq((0L, 255L, 0L), (1L, 12L, 8L)).toDF("id", "a", "b")
    val got = df.select(col("id"), graft.llm.Dedup.hammingDist(col("a"), col("b")))
      .collect().map(r => r.getLong(0) -> r.getInt(1)).toMap
    assert(got == Map(0L -> 8, 1L -> 1))
  }
}
