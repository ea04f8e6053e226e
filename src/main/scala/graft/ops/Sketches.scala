package graft.ops

import graft.{QueryDef, Tables}
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Mergeable-sketch operators — the pre-aggregation layer a 100 TB
  * warehouse materializes instead of raw data. k1 already gates the
  * one-shot sketch accuracy (HLL distinct + approx percentile); this
  * module gates the property that makes sketches operationally useful
  * at scale: REAGGREGABILITY. A per-(type, day) sketch table is tiny
  * (|types|×|days| rows × ~KB), yet answers any coarser distinct
  * question (per type, per week, global) by sketch UNION — no re-scan
  * of the raw events. Public algorithms: HyperLogLog (Flajolet et al.
  * 2007; Spark's `hll_sketch_agg` is the Apache DataSketches HLL) and
  * Count-Min (Cormode & Muthukrishnan 2005; Spark's `count_min_sketch`).
  */
object Sketches {

  /** Per-(keys, bucket) HLL sketch partials over `col` — the
    * materializable pre-aggregate. lgK fixed so every later union is
    * lossless (same-config DataSketches HLL merge is exact on the
    * register level: union-then-estimate == estimate-of-union).
    */
  def hllPartials(df: DataFrame, keys: Seq[String], bucket: String,
      valueCol: String, lgK: Int = 12): DataFrame =
    df.groupBy((keys :+ bucket).map(col): _*)
      .agg(hll_sketch_agg(col(valueCol), lit(lgK)).as("sketch"))

  /** K2 — HLL reaggregation gate on events: per-(type, day) sketch
    * partials union up to per-type distinct-user estimates. Rows-only
    * golden gates (DuckDB has no DataSketches HLL).
    *
    * What is NOT gated, deliberately: estimate EQUALITY across
    * partitionings or vs a direct one-shot sketch. Both differ by
    * design — a directly-fed sketch answers with the HIP estimator
    * (merging forfeits it), and near the sparse→dense transition the
    * union estimate is MERGE-ORDER sensitive (measured here: mod-7
    * user partials estimate 1500/1494/1502 where mod-3 partials and
    * any incremental fold give 1488 — registers promote from exact
    * coupon lists at different points depending on arrival order).
    * The operational contract a pipeline relies on is ACCURACY, so
    * that is the gate: every partitioning's union estimate within 5%
    * of the exact distinct count (lgK=12 ⇒ σ≈1.6%, ~3σ), both
    * estimates emitted for inspection.
    *
    * The sketch table is |types|×|buckets| rows × ~KB — the thing a
    * 100 TB pipeline stores and re-queries; the raw scan happens once.
    */
  val k2 = QueryDef.rowsOnly("k2_hll_union_reagg") { (s, d) =>
    val ev = Tables.events(s, d)
      .select(col("event_type"), col("user_id"),
        to_date(col("ts")).as("day"),
        date_trunc("week", col("ts")).as("week"))
    def unionEst(bucket: String, out: String): DataFrame =
      hllPartials(ev, Seq("event_type"), bucket, "user_id")
        .groupBy("event_type")
        .agg(hll_sketch_estimate(hll_union_agg(col("sketch"))).as(out))
    val byDay = unionEst("day", "hll_union_est")
    val byWeek = unionEst("week", "hll_union_week_est")
    val direct = ev.groupBy("event_type")
      .agg(hll_sketch_estimate(hll_sketch_agg(col("user_id"), lit(12)))
        .as("hll_direct_est"),
        countDistinct(col("user_id")).as("exact_distinct"))
    byDay.join(byWeek, "event_type").join(direct, "event_type")
      .select(col("event_type"), col("exact_distinct"),
        col("hll_union_est"), col("hll_union_week_est"),
        col("hll_direct_est"),
        (abs(col("hll_union_est") - col("exact_distinct")) /
          col("exact_distinct")).as("rel_err"))
      .filter(col("rel_err") < 0.05 &&
        abs(col("hll_union_week_est") - col("exact_distinct")) /
          col("exact_distinct") < 0.05)
  }

  /** K3 — Count-Min frequency estimates on events event_type: the
    * sketch answers per-key counts from O(w·d) state regardless of
    * stream size. Deterministic (fixed seed), gated on the CMS
    * contract: estimate NEVER undercounts, and overcounts by at most
    * eps·N (here with wide margin — 5 distinct types can't collide
    * at w=2719). Exact counts ride the same output row, so the gate
    * compares within one frame. Rows-only golden gate.
    */
  val k3 = QueryDef.rowsOnly("k3_cms_frequency") { (s, d) =>
    val ev = Tables.events(s, d).select(col("event_type"))
    val eps = 0.001
    val sketchBytes = ev
      .agg(count_min_sketch(col("event_type"), lit(eps), lit(0.99),
        lit(42)).as("cms"))
      .head().getAs[Array[Byte]](0)
    val cms = org.apache.spark.util.sketch.CountMinSketch.readFrom(
      new java.io.ByteArrayInputStream(sketchBytes))
    val exact = ev.groupBy("event_type").agg(count(lit(1)).as("exact_n"))
      .collect().map(r => (r.getString(0), r.getLong(1)))
    val n = exact.map(_._2).sum
    val spark = s; import spark.implicits._
    exact.toSeq.map { case (t, e) =>
      (t, e, cms.estimateCount(t))
    }.toDF("event_type", "exact_n", "cms_est")
      .filter(col("cms_est") >= col("exact_n") &&
        col("cms_est") <= col("exact_n") + lit((eps * n).toLong))
  }

  def all: Seq[QueryDef] = Seq(k2, k3)
}
