package graft.ml

import graft.SparkSpec
import org.apache.spark.sql.functions._

class PrsSpec extends SparkSpec {

  test("prsLong: per-sample weighted dosage sum; unweighted variants drop") {
    import spark.implicits._
    val geno = Seq(
      (1L, "v1", 2L), (1L, "v2", 1L), (1L, "vX", 5L), // vX has no weight
      (2L, "v1", 0L), (2L, "v2", 2L))
      .toDF("sample", "variant", "dosage")
    val w = Seq(("v1", 10L), ("v2", -3L)).toDF("variant", "beta")
    val got = Prs.prsLong(geno, w, "sample", "variant", "dosage", "beta")
      .collect().map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2))).toMap
    assert(got(1L) == (2 * 10 - 3, 2L)) // vX dropped, n_variants = 2
    assert(got(2L) == (-6L, 2L))
  }

  test("prsMatrix: scan-local dot product matches hand arithmetic") {
    import spark.implicits._
    val df = Seq(Tuple1(Array(1f, 0f, 2f)), Tuple1(Array(0f, 3f, 1f)))
      .toDF("features")
    val got = df.select(Prs.prsMatrix(col("features"), Seq(0.5, -1.0, 2.0)))
      .collect().map(_.getDouble(0)).sorted
    // (1*0.5 + 2*2) = 4.5 ; (3*-1 + 1*2) = -1.0
    assert(got.sameElements(Array(-1.0, 4.5)))
  }
}
