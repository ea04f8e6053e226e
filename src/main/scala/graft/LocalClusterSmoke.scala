package graft

import org.apache.spark.sql.SparkSession

/** Multi-executor deployment smoke: runs the m6 CV pipeline on
  * `local-cluster[2,2,2048]` — Spark's standalone-in-miniature test
  * master that forks two REAL executor JVMs (separate processes,
  * separate heaps, real serialization and shuffle over the wire) —
  * to prove the engine carries no hidden driver-locality assumption:
  * every closure must serialize, every kernel class must load on a
  * remote executor from `spark.executor.extraClassPath`, and shuffle /
  * broadcast cross process boundaries. This is the deployment-shape
  * analog of the reference's cluster bring-up
  * (daxos/distribute.py:8-101 spin_cluster/wait_for_workers), which on
  * Spark is the cluster manager's job — the engine-side obligation is
  * exactly what this smoke checks. Run with:
  *
  *   sbt "runMain graft.LocalClusterSmoke"
  *
  * (SPARK_HOME is set by build.sbt for forked runs; executors need it
  * to assemble their launch command.) Prints one PASS/FAIL line;
  * exits nonzero on failure. See PLANS.md "Deployment shape" for the
  * production spark-submit equivalent.
  */
object LocalClusterSmoke {
  def main(args: Array[String]): Unit = {
    val classes =
      new java.io.File("target/scala-2.13/classes").getAbsolutePath
    val addOpens = Seq(
      "java.lang", "java.lang.invoke", "java.lang.reflect", "java.io",
      "java.net", "java.nio", "java.util", "java.util.concurrent",
      "java.util.concurrent.atomic", "sun.nio.ch", "sun.nio.cs",
      "sun.security.action", "sun.util.calendar")
      .map(p => s"--add-opens=java.base/$p=ALL-UNNAMED").mkString(" ")
    val t0 = System.nanoTime()
    val spark = SparkSession.builder()
      .master("local-cluster[2,2,2048]")
      .config("spark.executor.extraClassPath", classes)
      .config("spark.executor.extraJavaOptions", addOpens)
      .config("spark.sql.shuffle.partitions", "8")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    try {
      // wait for both remote executors to register (driver shows up in
      // the memory-status map too, hence >= 3)
      val sc = spark.sparkContext
      var waited = 0
      while (sc.getExecutorMemoryStatus.size < 3 && waited < 120) {
        Thread.sleep(500); waited += 1
      }
      val nExec = sc.getExecutorMemoryStatus.size - 1
      require(nExec >= 2, s"expected 2 remote executors, got $nExec")
      // the m6 pipeline end-to-end: Sim fixture generation, chunked
      // k-fold splits, GBT fits, distributed AUC — the deepest
      // driver-vs-executor surface in the repo
      val out = SparkEntry.queries("m6_cv_driver")(spark, "unused")
      val n = out.count()
      require(n > 0, "m6 emitted zero rows on the multi-executor cluster")
      // and one shuffle-heavy relational query for the Exchange path
      val agg = SparkEntry.queries("a1_grouped_agg")(
        spark, sys.env.getOrElse("SPARK_GRAFT_SF_DIR",
          "/root/testdata/sf0.001"))
      require(agg.count() > 0, "a1 emitted zero rows")
      val secs = (System.nanoTime() - t0) / 1e9
      println(f"PASS local-cluster[2,2,2048]: executors=$nExec " +
        f"m6_rows=$n total=$secs%.1f s")
    } catch {
      case e: Throwable =>
        println(s"FAIL local-cluster smoke: ${e.getMessage}")
        spark.stop()
        sys.exit(1)
    }
    spark.stop()
  }
}
