package graft.tools

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Bounded investigation of the ~2× IN-SESSION sample accumulation the
  * round-16 campaigns documented (SCALE.md, hub story component 2): a
  * long campaign session's late measurements read ~2× their
  * fresh-session cost EVEN on a store/data state that is byte-identical
  * — the rebuilt reference searched 3.2 s warm late-session vs ~1.6 s
  * in a fresh JVM. The streaming ingest driver IS a long session, so
  * whether this is harness-only or engine-relevant needs a named cause.
  *
  * Protocol: fix ONE store + corpus; take warm search medians EARLY;
  * apply synthetic session load (the campaign's own shape — per-round
  * localCheckpoints and broadcast joins created and dropped); take the
  * degraded medians; then walk a REMEDIATION LADDER, re-measuring after
  * each step:
  *   1. System.gc() — is it uncollected RDD handles gating the
  *      ContextCleaner (the r16 harness fix's mechanism)?
  *   2. spark.catalog.clearCache() — leaked cached relations?
  *   3. explicit unpersist of every RDD the context still tracks
  *      (persistentRdds) — localCheckpoint blocks pinned by lingering
  *      references the GC alone never reaped?
  *   4. spark.newSession() — session-STATE (plan/listener/temp-view
  *      accumulation) vs context-global?
  *   5. the fresh-JVM bound is the campaign's own fresh-session number
  *      (not reproducible in-process; the ladder says which side of it
  *      the recoverable cost lives on).
  * Output: one JSON line (stdout + session_drift.json).
  *
  * Run: sbt "runMain graft.tools.SessionDriftProbe"
  * Env: SPARK_GRAFT_SF_DIR (default /root/testdata/sf0.1),
  *      SPARK_GRAFT_CPUS (16), SPARK_GRAFT_DRIFT_LOAD (40 load rounds).
  */
object SessionDriftProbe {

  private def jnum(d: Double): String =
    (math.floor(d * 1000 + 0.5) / 1000).toString

  private def secs[T](body: => T): Double = {
    val t0 = System.nanoTime()
    body
    (System.nanoTime() - t0) / 1e9
  }

  def main(args: Array[String]): Unit = {
    val baseSf = sys.env.getOrElse("SPARK_GRAFT_SF_DIR",
      "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "16")
    val loadRounds = sys.env.getOrElse("SPARK_GRAFT_DRIFT_LOAD", "40").toInt
    val spark0 = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.ui.enabled", "false")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.sql.adaptive.enabled", "true")
      .getOrCreate()
    spark0.sparkContext.setLogLevel("WARN")

    // fixed measurement subject: the v20 graph store over a ×10 corpus.
    // The subject frames are RE-READ FROM PARQUET per measurement (no
    // checkpoint/cache dependency), so every remediation step below —
    // including a blanket unpersist of all tracked RDDs — leaves the
    // measurement itself valid.
    val dataDir = ScaleBench.synthesize(spark0, baseSf, 10, "target/scale")
    val embPath = "target/session_drift/emb"
    graft.Tables.embeddings(spark0, dataDir)
      .select(col("vec_id"), col("embedding"))
      .repartition(spark0.sparkContext.defaultParallelism)
      .write.mode("overwrite").parquet(embPath)
    def embOf(spark: SparkSession): DataFrame = spark.read.parquet(embPath)
    val dir = "target/session_drift/graph"
    graft.util.StoreLease.break(spark0, dir)
    graft.util.Fs.rmTree(spark0, dir)
    graft.llm.GraphAnn.ensure(embOf(spark0), dir): Unit

    def warmMedian(spark: SparkSession): Double = {
      val live = embOf(spark)
      val panel = graft.llm.Similarity.probePanel(live)
      def one(): Double = secs {
        val g = graft.llm.GraphAnn.load(spark, dir)
        graft.llm.GraphAnn.beamSearch(panel, g, live, k = 1).count()
      }
      one() // warmup
      val xs = Seq(one(), one(), one()).sorted
      xs(1)
    }

    val early = warmMedian(spark0)
    System.err.println(s"[session-drift] early warm median ${jnum(early)} s")

    // synthetic session load: the campaign's own allocation shape —
    // per-round localCheckpointed frames (store ops pin working frames
    // eagerly), broadcast joins, a shuffle, and a parquet write, all
    // dropped after the round (references out of scope, blocks linger
    // until the JVM GCs the handles and the ContextCleaner reaps them)
    var r = 0
    while (r < loadRounds) {
      val emb = embOf(spark0)
      val chunk = emb
        .withColumn("salt", pmod(col("vec_id") + r, lit(7)))
        .localCheckpoint(true)
      chunk.groupBy("salt")
        .agg(count(lit(1))).localCheckpoint(true).count(): Unit
      emb.join(broadcast(chunk.select(col("vec_id")).limit(2000)),
        Seq("vec_id"), "left_semi").count(): Unit
      chunk.unionByName(chunk).localCheckpoint(true)
        .write.mode("overwrite")
        .parquet(s"target/session_drift/load_scratch")
      r += 1
    }
    val degraded = warmMedian(spark0)
    System.err.println(
      s"[session-drift] post-load warm median ${jnum(degraded)} s")

    // remediation ladder — measure after each step, in order
    System.gc(); Thread.sleep(500); System.gc(); Thread.sleep(500)
    val afterGc = warmMedian(spark0)
    System.err.println(s"[session-drift] after GC ${jnum(afterGc)} s")

    spark0.catalog.clearCache()
    val afterClearCache = warmMedian(spark0)
    System.err.println(
      s"[session-drift] after clearCache ${jnum(afterClearCache)} s")

    // unpersist EVERY RDD the context still tracks — lingering
    // localCheckpoint blocks whose frame references died but whose
    // handles the GC has not collected (safe here: the measurement
    // frames re-read parquet)
    val tracked = spark0.sparkContext.getPersistentRDDs
    val nTracked = tracked.size
    tracked.foreach { case (_, rdd) =>
      rdd.unpersist(blocking = false): Unit
    }
    System.gc(); Thread.sleep(500)
    val afterUnpersist = warmMedian(spark0)
    System.err.println(s"[session-drift] after unpersist of " +
      s"$nTracked tracked RDDs ${jnum(afterUnpersist)} s")

    val spark1 = spark0.newSession()
    val afterNewSession = warmMedian(spark1)
    System.err.println(
      s"[session-drift] fresh session, same context " +
        s"${jnum(afterNewSession)} s")

    val json = s"""{"metric":"session_drift","base":"$baseSf",""" +
      s""""load_rounds":$loadRounds,"tracked_rdds_at_peak":$nTracked,""" +
      s""""early_secs":${jnum(early)},"degraded_secs":${jnum(degraded)},""" +
      s""""after_gc_secs":${jnum(afterGc)},""" +
      s""""after_clear_cache_secs":${jnum(afterClearCache)},""" +
      s""""after_unpersist_secs":${jnum(afterUnpersist)},""" +
      s""""after_new_session_secs":${jnum(afterNewSession)}}"""
    java.nio.file.Files.writeString(
      java.nio.file.Paths.get("session_drift.json"), json + "\n")
    spark0.stop()
    println(json)
  }
}
