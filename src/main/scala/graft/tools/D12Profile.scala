package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window

/** Stage-level timing for the d12 span chain at a given dir — used to
  * attribute the ×100 wall time between the window-table shuffle, the
  * in-place distinct-doc windows, and the candidate verify chain. */
object D12Profile {
  def main(args: Array[String]): Unit = {
    val dir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR",
      "target/scale/_root_testdata_sf0.1/x100")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.ui.enabled", "false")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.sql.adaptive.enabled", "true")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val docs = graft.Tables.documents(spark, dir)
    def time[T](label: String)(f: => T): T = {
      val t0 = System.nanoTime()
      val r = f
      println(f"[d12prof] $label: ${(System.nanoTime() - t0) / 1e9}%.1f s")
      r
    }
    val win = 50
    val wins = graft.llm.Dedup.rollingHashWindows(docs, win)
    val nWins = time("windows compute+count (no shuffle)")(wins.count())
    println(s"[d12prof] n_windows=$nWins")
    val parts = math.max(32, math.min(2048L, nWins / 2000000L + 1L).toInt)
    println(s"[d12prof] parts=$parts")
    val byH = wins.repartition(parts, col("h"))
    time("shuffle by h + count")(byH.count())
    val wNd = Window.partitionBy("h")
    val wNdOrd = Window.partitionBy("h").orderBy("doc_id")
    val cand = byH
      .withColumn("di", dense_rank().over(wNdOrd))
      .withColumn("nd", max(col("di")).over(wNd))
      .filter(col("nd") >= 2)
      .select(col("doc_id"), col("pos"))
    val nCand = time("shuffle + windows + hot filter count")(cand.count())
    println(s"[d12prof] n_candidates=$nCand")
    val candS = cand
      .join(docs.select(col("doc_id"), col("text")), "doc_id")
      .select(col("doc_id"), col("pos"),
        graft.expressions.Utf16Substr(col("text"), col("pos"), lit(win))
          .as("s"))
      .repartition(parts, col("s"))
    time("candidate text-extract + s shuffle count")(candS.count())
    time("FULL repeatedSubstringSpans")(
      graft.llm.Dedup.repeatedSubstringSpans(docs, win, 2)
        .write.format("noop").mode("overwrite").save())
    spark.stop()
  }
}
