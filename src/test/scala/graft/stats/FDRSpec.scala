package graft.stats

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** BH-FDR against hand-computed vectors + windowed/scalable parity. */
class FDRSpec extends SparkSpec {

  test("bhAdjust matches the hand-computed BH vector") {
    import spark.implicits._
    // classic example: p = (.01, .02, .03, .04, .05), n = 5
    // adjusted_i = min_{j>=i}(p_j * n / j) capped at 1:
    //   .01*5/1=.05; .02*5/2=.05; .03*5/3=.05; .04*5/4=.05; .05*5/5=.05
    val df = Seq((1L, 0.01), (2L, 0.02), (3L, 0.03), (4L, 0.04), (5L, 0.05))
      .toDF("id", "p")
    val out = FDR.bhAdjust(df, "p", col("id"), alpha = 0.05)
      .select("id", "p_adj", "rejected").collect()
      .map(r => (r.getLong(0), r.getDouble(1), r.getLong(2))).sortBy(_._1)
    out.foreach { case (_, padj, _) => assert(math.abs(padj - 0.05) < 1e-12) }
    // step-up at alpha=.05: largest i with p_i <= i/n*alpha → i=1 only
    // p1=.01 <= .01? yes. p5=.05 <= .05 → ALL rejected (step-up takes max i)
    assert(out.forall(_._3 == 1L))
  }

  test("bhAdjust: mixed vector with known rejections") {
    import spark.implicits._
    // p = (.001, .008, .039, .041, .09), alpha=.05, n=5
    // thresholds i*alpha/n: .01, .02, .03, .04, .05
    // p_i <= thr_i: .001<=.01 T, .008<=.02 T, .039<=.03 F, .041<=.04 F, .09<=.05 F
    // max passing i = 2 → reject first two
    val df = Seq((1L, 0.001), (2L, 0.008), (3L, 0.039), (4L, 0.041), (5L, 0.09))
      .toDF("id", "p")
    val out = FDR.bhAdjust(df, "p", col("id"))
      .select("id", "rejected").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toMap
    assert(out == Map(1L -> 1L, 2L -> 1L, 3L -> 0L, 4L -> 0L, 5L -> 0L))
  }

  test("scalable variant equals windowed variant on random data") {
    import spark.implicits._
    val rng = new scala.util.Random(9)
    val df = (1 to 500).map(i => (i.toLong, rng.nextDouble())).toDF("id", "p")
      .repartition(7)
    val a = FDR.bhAdjust(df, "p", col("id"), roundTo = 9)
      .select("id", "p_adj", "rejected").collect()
      .map(r => (r.getLong(0), r.getDouble(1), r.getLong(2))).sortBy(_._1)
    val b = FDR.bhAdjustScalable(df, "p", col("id"))
      .select(col("id"), round(least(col("p_adj"), lit(1.0)), 9).as("p_adj"),
        col("rejected")).collect()
      .map(r => (r.getLong(0), r.getDouble(1), r.getLong(2))).sortBy(_._1)
    assert(a.length == b.length)
    a.zip(b).foreach { case ((ia, pa, ra), (ib, pb, rb)) =>
      assert(ia == ib); assert(ra == rb)
      assert(math.abs(pa - pb) < 1e-9, s"id $ia: $pa vs $pb")
    }
  }
}
