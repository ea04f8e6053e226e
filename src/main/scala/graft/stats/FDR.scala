package graft.stats

import graft.{QueryDef, Tables}
import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window

/** Benjamini–Hochberg FDR correction as a pure window-function pipeline
  * (SURVEY.md O4; reference daxos/boruta.py:159-179).
  *
  * Reference semantics, re-expressed relationally:
  *   1. rank p-values ascending (position i, 1-based); ecdf_i = i/n
  *   2. adjusted p_i = min over j>=i of (p_j / ecdf_j), capped at 1
  *      (the "reverse cumulative min")
  *   3. step-up rejection: find the LARGEST i with p_i <= ecdf_i * alpha;
  *      reject every hypothesis ranked at or below it.
  *
  * Numerics: comparisons/ratios are written in multiply form
  * (p*n vs i*alpha) so the Spark plan and a DuckDB oracle produce
  * bit-identical doubles.
  *
  * Scale: the window is global (single partition) — correct for the
  * reference's use (p-value vectors are feature-count-sized, ~1e5). For
  * row-scale inputs, partition by hypothesis family (e.g. per-chromosome)
  * or switch to the two-pass sort + broadcast-threshold variant.
  */
object FDR {

  /** Adds `p_adj` (BH-adjusted p, rounded to `roundTo` if >= 0) and
    * `rejected` (0/1 as BIGINT) to `df`. `tiebreak` makes the ranking —
    * and therefore the output — fully deterministic under tied p-values.
    */
  def bhAdjust(df: DataFrame, pCol: String, tiebreak: Column, alpha: Double = 0.05,
      roundTo: Int = 6): DataFrame = {
    val n = df.count()
    val ord = Window.orderBy(col(pCol).asc, tiebreak.asc)
    val full = ord.rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
    val suffix = ord.rowsBetween(Window.currentRow, Window.unboundedFollowing)
    val ranked = df
      .withColumn("_rnk", row_number().over(ord).cast("long"))
      .withColumn("_ratio", col(pCol) * lit(n) / col("_rnk"))
    ranked
      .withColumn("_cummin", min(col("_ratio")).over(suffix))
      .withColumn("_max_rej",
        max(when(col(pCol) * lit(n) <= col("_rnk") * lit(alpha), col("_rnk"))).over(full))
      .withColumn("p_adj", round(least(col("_cummin"), lit(1.0)), roundTo))
      .withColumn("rejected",
        when(col("_max_rej").isNotNull && col("_rnk") <= col("_max_rej"), 1L)
          .otherwise(0L))
      .drop("_rnk", "_ratio", "_cummin", "_max_rej")
  }

  /** Scale-safe BH: identical semantics to [[bhAdjust]] with NO
    * single-partition window. Plan:
    *   1. range-partitioned global sort by (p, tiebreak) — parallel;
    *   2. zipWithIndex → gap-free 1-based rank (one count job + map);
    *   3. per-partition suffix-min of p·n/rank and max rejected rank,
    *      collected (one tiny value per partition) and suffix-combined on
    *      the driver — the cross-partition carry is a broadcast of
    *      numPartitions doubles, never the data;
    *   4. second per-partition pass applies the carry from later
    *      partitions (buffers one partition in memory — bounded by
    *      maxPartitionBytes, not dataset size).
    * At 100 TB this is two scans + a global sort; the windowed variant
    * would serialize everything through one task.
    *
    * Unrounded `p_adj` / `rejected` are appended; callers round in
    * Catalyst so cross-engine rounding semantics stay in one place.
    */
  def bhAdjustScalable(df: DataFrame, pCol: String, tiebreak: Column,
      alpha: Double = 0.05): DataFrame = {
    val spark = df.sparkSession
    val n = df.count()
    val sorted = df.orderBy(col(pCol).asc, tiebreak.asc)
    val schema = sorted.schema
    val pIdx = schema.fieldIndex(pCol)
    // (row, 0-based global position). NOT persisted: zipWithIndex's
    // eager offsets job materializes the sort's shuffle files, so the
    // two downstream jobs (per-partition summary collect; final output)
    // skip the sort stage and re-run only the cheap map — persisting
    // here pinned the whole sorted dataset in executor storage for the
    // rest of the session (round-2 leak).
    val indexed = sorted.rdd.zipWithIndex()
    // one tiny record per partition: (min suffix ratio, max rejected rank)
    val perPart = indexed.mapPartitionsWithIndex { (pid, it) =>
      var minRatio = Double.PositiveInfinity
      var maxRej = 0L
      it.foreach { case (row, idx0) =>
        val p = row.getDouble(pIdx); val rnk = idx0 + 1
        val ratio = p * n / rnk
        if (ratio < minRatio) minRatio = ratio
        if (p * n <= rnk * alpha && rnk > maxRej) maxRej = rnk
      }
      Iterator((pid, minRatio, maxRej))
    }.collect().sortBy(_._1)
    val nParts = perPart.length
    // carryMin(pid) = min ratio over all partitions AFTER pid
    val carryMin = new Array[Double](nParts)
    var acc = Double.PositiveInfinity
    for (pid <- (nParts - 1) to 0 by -1) {
      carryMin(pid) = acc
      acc = math.min(acc, perPart(pid)._2)
    }
    val maxRej = if (perPart.isEmpty) 0L else perPart.map(_._3).max
    val out = indexed.mapPartitionsWithIndex { (pid, it) =>
      val buf = it.toArray // one partition resident; see scaladoc
      val nLocal = buf.length
      val adj = new Array[Double](nLocal)
      var running = carryMin(pid)
      for (i <- (nLocal - 1) to 0 by -1) {
        val (row, idx0) = buf(i)
        val ratio = row.getDouble(pIdx) * n / (idx0 + 1)
        running = math.min(running, ratio)
        adj(i) = running
      }
      buf.iterator.zipWithIndex.map { case ((row, idx0), i) =>
        val rejected = if (maxRej > 0 && idx0 + 1 <= maxRej) 1L else 0L
        org.apache.spark.sql.Row.fromSeq(
          row.toSeq :+ math.min(adj(i), 1.0) :+ rejected)
      }
    }
    val outSchema = schema
      .add("p_adj", org.apache.spark.sql.types.DoubleType, nullable = false)
      .add("rejected", org.apache.spark.sql.types.LongType, nullable = false)
    spark.createDataFrame(out, outSchema)
  }

  /** O4 oracle query: BH over a deterministic pseudo-p-value column (the
    * fractional part of o_totalprice, ~U(0,1)). Runs the SCALABLE variant
    * so the DuckDB hash-match proves the distributed two-pass kernel, not
    * just the windowed one (which FDRSpec checks equals this one).
    */
  val o4 = QueryDef.sql(
    "o4_fdr_bh",
    """WITH t AS (SELECT o_orderkey, o_totalprice - floor(o_totalprice) AS p FROM orders),
      |r AS (SELECT o_orderkey, p,
      |             CAST(row_number() OVER (ORDER BY p, o_orderkey) AS BIGINT) AS rnk,
      |             count(*) OVER () AS n
      |      FROM t),
      |m AS (SELECT o_orderkey, p, rnk,
      |             p * n / rnk AS ratio,
      |             min(p * n / rnk) OVER (ORDER BY rnk
      |               ROWS BETWEEN CURRENT ROW AND UNBOUNDED FOLLOWING) AS cummin,
      |             max(CASE WHEN p * n <= rnk * 0.05 THEN rnk END) OVER () AS max_rej
      |      FROM r)
      |SELECT o_orderkey, round(p, 6) AS p,
      |       round(least(cummin, 1.0), 6) AS p_adj,
      |       CAST(CASE WHEN max_rej IS NOT NULL AND rnk <= max_rej
      |            THEN 1 ELSE 0 END AS BIGINT) AS rejected
      |FROM m""".stripMargin) {
    (s, d) =>
      val withP = Tables.orders(s, d)
        .select(col("o_orderkey"),
          (col("o_totalprice") - floor(col("o_totalprice"))).as("p"))
      bhAdjustScalable(withP, "p", col("o_orderkey"))
        .select(col("o_orderkey"), round(col("p"), 6).as("p"),
          round(least(col("p_adj"), lit(1.0)), 6).as("p_adj"), col("rejected"))
  }

  def all: Seq[QueryDef] = Seq(o4)
}
