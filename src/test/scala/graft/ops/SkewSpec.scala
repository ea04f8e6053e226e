package graft.ops

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Skew handling, both mechanisms the engine relies on at 100 TB:
  * explicit salting (`Skew.saltedJoin`, gated by sk1's oracle) and
  * AQE's runtime skew-join split — asserted here by forcing a
  * sort-merge join over a 90%-one-key dataset with thresholds scaled
  * to the fixture and checking the FINAL adaptive plan marks the join
  * `skew=true` (OptimizeSkewedJoin fired and split the fat partition).
  */
class SkewSpec extends SparkSpec {

  test("AQE splits the fat partition of a skewed sort-merge join") {
    val s = spark
    val keep = Seq(
      "spark.sql.adaptive.enabled",
      "spark.sql.adaptive.skewJoin.enabled",
      "spark.sql.adaptive.skewJoin.skewedPartitionFactor",
      "spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes",
      "spark.sql.adaptive.advisoryPartitionSizeInBytes",
      "spark.sql.adaptive.coalescePartitions.enabled",
      "spark.sql.autoBroadcastJoinThreshold",
      "spark.sql.adaptive.autoBroadcastJoinThreshold")
      .map(k => k -> s.conf.getOption(k)).toMap
    try {
      s.conf.set("spark.sql.adaptive.enabled", "true")
      s.conf.set("spark.sql.adaptive.skewJoin.enabled", "true")
      s.conf.set("spark.sql.adaptive.skewJoin.skewedPartitionFactor", "2")
      s.conf.set("spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes", "64KB")
      s.conf.set("spark.sql.adaptive.advisoryPartitionSizeInBytes", "64KB")
      s.conf.set("spark.sql.adaptive.coalescePartitions.enabled", "false")
      // both off: a broadcast join has no skew problem to solve, and AQE
      // would otherwise rightly demote this fixture-sized SMJ to one
      s.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
      s.conf.set("spark.sql.adaptive.autoBroadcastJoinThreshold", "-1")

      // 90% of the big side lands on key 0 → one fat shuffle partition
      val big = s.range(0, 200000L)
        .select(when(col("id") % 10 =!= 0, lit(0L)).otherwise(col("id"))
          .as("k"), col("id").as("payload"))
      val small = s.range(0, 2000L).select(col("id").as("k"),
        (col("id") * 2).as("v"))
      val joined = big.join(small, "k")
      // execute THIS dataframe (count() would plan a different query,
      // and the adaptive plan only finalizes after its own execution)
      val n = joined.collect().length
      // key 0 matches small's k=0 row: 180000 rows + the sprinkle keys
      assert(n > 100000L)

      val plan = joined.queryExecution.executedPlan.toString
      assert(plan.contains("skew=true"),
        s"expected OptimizeSkewedJoin to mark the join, got:\n$plan")
    } finally keep.foreach {
      case (k, Some(v)) => s.conf.set(k, v)
      case (k, None) => s.conf.unset(k)
    }
  }
}
