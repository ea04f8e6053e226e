package graft.llm

import graft.SparkSpec
import org.apache.spark.sql.functions._

class BinaryQuantSpec extends SparkSpec {

  test("signPack packs sign bits into the expected long") {
    import spark.implicits._
    // bits 0 and 2 positive, rest non-positive → 0b101 = 5
    val v = Array(1.0f, -1.0f, 0.5f, 0.0f) ++ Array.fill(60)(-1.0f)
    val got = Seq(Tuple1(v)).toDF("embedding")
      .select(BinaryQuant.signPack(col("embedding"))).head().getLong(0)
    assert(got == 5L)
    // all positive at 64 dims → all bits set
    val all = Seq(Tuple1(Array.fill(64)(1.0f))).toDF("embedding")
      .select(BinaryQuant.signPack(col("embedding"))).head().getLong(0)
    assert(all == -1L)
  }

  test("binaryTopK finds an exactly-duplicated vector via Hamming 0") {
    import spark.implicits._
    val rng = new scala.util.Random(7)
    val base = (0L until 50L).map(i =>
      (i, Array.fill(64)(rng.nextFloat() * 2 - 1)))
    // vec 50 duplicates vec 3: Hamming 0, cosine 1 — must be top-1
    val rows = base :+ ((50L, base(3)._2.clone()))
    val df = rows.toDF("vec_id", "embedding")
    val got = BinaryQuant.binaryTopK(df.filter(col("vec_id") === 50), df, 1)
      .head()
    assert(got.getAs[Long]("nid") == 3L)
    assert(got.getAs[Double]("sim") == 1.0)
  }
}
