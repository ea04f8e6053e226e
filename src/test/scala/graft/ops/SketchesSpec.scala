package graft.ops

import graft.SparkSpec
import org.apache.spark.sql.functions._

class SketchesSpec extends SparkSpec {

  test("HLL union is partition-invariant and exact at small cardinality") {
    import spark.implicits._
    // 200 distinct ids bucketed two different ways
    val df = (1L to 200L).map(i => (i, i % 7, i % 3)).toDF("id", "b7", "b3")
    def est(bucket: String): Double =
      Sketches.hllPartials(df.withColumn("g", lit("x")), Seq("g"), bucket, "id")
        .groupBy("g")
        .agg(hll_sketch_estimate(hll_union_agg(col("sketch"))).as("e"))
        .head().getLong(1).toDouble
    val (e7, e3) = (est("b7"), est("b3"))
    assert(e7 == e3, s"partitioning changed the union estimate: $e7 vs $e3")
    // 200 << 2^12 registers: sketch still in exact (coupon) range
    assert(math.abs(e7 - 200.0) < 1e-9)
  }

  test("KLL merge across partitions: exact n, estimates within rank-error window") {
    import org.apache.spark.sql.functions.col
    val s = spark
    // uniform 0..49999 scattered over 13 partitions: true quantile at
    // rank q is q*50000, rank error 3% ⇒ value window ±1500
    val df = s.range(50000)
      .select(((col("id") * 7919) % 50000).cast("double").as("x"))
      .repartition(13)
    val qs = Seq(0.1, 0.5, 0.9)
    val (n, ests) = Sketches.kllQuantiles(df, "x", 200, qs)
    assert(n == 50000L, s"sketch lost items: $n")
    qs.zip(ests).foreach { case (q, e) =>
      val truth = q * 50000
      assert(math.abs(e - truth) <= 1500.0,
        s"q=$q est $e outside rank window around $truth")
    }
  }

  test("theta set ops: exact-mode union/intersect/difference on planted overlap") {
    import org.apache.spark.sql.functions.col
    import org.apache.datasketches.theta.SetOperation
    val s = spark
    // A = 0..799, B = 500..1299: |A∩B| = 300, |A\B| = 500, |A∪B| = 1300
    val a = Sketches.thetaSketch(
      s.range(0, 800).select(col("id").as("u")), "u")
    val b = Sketches.thetaSketch(
      s.range(500, 1300).select(col("id").as("u")), "u")
    assert(!a.isEstimationMode && !b.isEstimationMode)
    val u = SetOperation.builder().buildUnion()
    u.union(a); u.union(b)
    val inter = SetOperation.builder().buildIntersection()
    inter.intersect(a); inter.intersect(b)
    val diff = SetOperation.builder().buildANotB().aNotB(a, b)
    assert(math.round(u.getResult.getEstimate) == 1300L)
    assert(math.round(inter.getResult.getEstimate) == 300L)
    assert(math.round(diff.getEstimate) == 500L)
  }

  test("CMS estimate never undercounts and respects the eps*N bound") {
    import spark.implicits._
    // skewed stream: one hot key, long tail
    val rows = Seq.fill(5000)("hot") ++ (1 to 2000).map(i => s"t$i")
    val df = rows.toDF("k")
    val bytes = df.agg(count_min_sketch(col("k"), lit(0.005), lit(0.99),
      lit(7)).as("c")).head().getAs[Array[Byte]](0)
    val cms = org.apache.spark.util.sketch.CountMinSketch.readFrom(
      new java.io.ByteArrayInputStream(bytes))
    val n = rows.size
    assert(cms.estimateCount("hot") >= 5000L)
    assert(cms.estimateCount("hot") <= 5000L + (0.005 * n).toLong)
    assert(cms.estimateCount("t17") >= 1L)
    assert(cms.estimateCount("t17") <= 1L + (0.005 * n).toLong)
  }
}
