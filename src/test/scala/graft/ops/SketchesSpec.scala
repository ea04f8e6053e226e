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
