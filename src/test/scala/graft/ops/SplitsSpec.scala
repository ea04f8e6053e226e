package graft.ops

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Split semantics on the REAL materialized-shuffle store (not the pmod
  * stand-in of the oracle query): disjoint, exhaustive, chunk-aligned. */
class SplitsSpec extends SparkSpec {

  private lazy val store = {
    import spark.implicits._
    val base = (1 to 330).map(i => (i.toLong, i * 2.0)).toDF("k", "x")
    Splits.materializedShuffle(base, seed = 5L, chunkRows = 30L).cache()
  }
  private val nBlocks = 11L // ceil(330/30)

  test("chunkedKFold: disjoint, exhaustive, chunk-aligned") {
    val folds = Splits.chunkedKFold(store, k = 4, nBlocks = nBlocks)
    assert(folds.size == 4)
    val testKeys = folds.map(_._2.select("k").collect().map(_.getLong(0)).toSet)
    // disjoint
    for (i <- testKeys.indices; j <- testKeys.indices if i < j)
      assert(testKeys(i).intersect(testKeys(j)).isEmpty)
    // exhaustive
    assert(testKeys.reduce(_ union _).size == 330)
    // complementary train side
    folds.foreach { case (tr, te) =>
      assert(tr.count() + te.count() == 330)
      val trKeys = tr.select("k").collect().map(_.getLong(0)).toSet
      assert(trKeys.intersect(te.select("k").collect().map(_.getLong(0)).toSet).isEmpty)
    }
    // chunk alignment: each fold's test block set is whole blocks
    folds.foreach { case (_, te) =>
      val blocks = te.select("block_id").distinct().collect().map(_.getLong(0))
      val full = store.filter(col("block_id").isin(blocks: _*)).count()
      assert(full == te.count(), "test fold must be a union of whole blocks")
    }
  }

  test("chunkedKFold guards") {
    intercept[IllegalArgumentException](Splits.chunkedKFold(store, 1, nBlocks))
    intercept[IllegalArgumentException](Splits.chunkedKFold(store, 20, nBlocks))
  }

  test("chunkedTrainTest small regime: exact block counts, disjoint, exhaustive") {
    val (tr, te) = Splits.chunkedTrainTest(store, trainFrac = 0.7, seed = 3L,
      nBlocks = nBlocks)
    assert(tr.count() + te.count() == 330)
    val trBlocks = tr.select("block_id").distinct().count()
    assert(trBlocks == math.round(nBlocks * 0.7)) // exact count regime
    val trKeys = tr.select("k").collect().map(_.getLong(0)).toSet
    val teKeys = te.select("k").collect().map(_.getLong(0)).toSet
    assert(trKeys.intersect(teKeys).isEmpty)
  }

  test("chunkedTrainTest determinism: same seed same split") {
    val (a, _) = Splits.chunkedTrainTest(store, 0.6, 11L, nBlocks)
    val (b, _) = Splits.chunkedTrainTest(store, 0.6, 11L, nBlocks)
    assert(a.select("k").collect().map(_.getLong(0)).toSet ==
      b.select("k").collect().map(_.getLong(0)).toSet)
  }

  test("headSubsample: first blocks only") {
    val sub = Splits.headSubsample(store, nRows = 90L, chunkRows = 30L)
    assert(sub.count() == 90)
    assert(sub.agg(max("block_id")).head().getLong(0) == 2L)
  }
}
