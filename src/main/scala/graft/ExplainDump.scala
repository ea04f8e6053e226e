package graft

import org.apache.spark.sql.SparkSession

/** Diagnostic main behind PLANS.md: prints the formatted physical plan
  * of each named query (all data-scale queries when none are named).
  *
  *   runMain graft.ExplainDump <sfDir> [name ...]
  *
  * Plans only — nothing is executed, so fixture/driver-action queries
  * that materialize eagerly inside their builder are skipped unless
  * named explicitly.
  */
object ExplainDump {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.01")
    val names = args.drop(1).toSeq
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "4")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.sql.adaptive.enabled", "true")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val targets =
      if (names.nonEmpty) names
      else SparkEntry.registry.filter(_.benchEligible).map(_.name)
    targets.foreach { name =>
      println(s"\n================ $name ================")
      try {
        val df = SparkEntry.queries(name)(spark, sfDir)
        println(df.queryExecution.explainString(
          org.apache.spark.sql.execution.FormattedMode))
      } catch {
        case scala.util.control.NonFatal(e) =>
          println(s"[explain] $name failed: ${e.getMessage}")
      }
    }
    spark.stop()
  }
}
