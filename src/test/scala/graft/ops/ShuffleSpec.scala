package graft.ops

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** The spec promised by Splits.scala's R1 scaladoc: seeded shuffle
  * determinism and the block-id contract of the materialized store. */
class ShuffleSpec extends SparkSpec {

  private def base = {
    import spark.implicits._
    (1 to 250).map(i => (i.toLong, s"v$i")).toDF("k", "v")
  }

  test("same seed ⇒ identical order, twice") {
    val a = Splits.materializedShuffle(base, seed = 42L, chunkRows = 50L)
      .select("k", "row_id").collect().sortBy(_.getLong(1)).map(_.getLong(0))
    val b = Splits.materializedShuffle(base, seed = 42L, chunkRows = 50L)
      .select("k", "row_id").collect().sortBy(_.getLong(1)).map(_.getLong(0))
    assert(a.sameElements(b))
  }

  test("different seed ⇒ different order (permutation of same rows)") {
    val a = Splits.materializedShuffle(base, 42L, 50L)
      .select("k", "row_id").collect().sortBy(_.getLong(1)).map(_.getLong(0))
    val c = Splits.materializedShuffle(base, 43L, 50L)
      .select("k", "row_id").collect().sortBy(_.getLong(1)).map(_.getLong(0))
    assert(!a.sameElements(c))
    assert(a.sorted.sameElements(c.sorted)) // same multiset
  }

  test("row_id is gap-free 0..n-1 and block_id = row_id div chunkRows") {
    val df = Splits.materializedShuffle(base, 7L, 50L)
    val rows = df.select("row_id", "block_id").collect()
    val ids = rows.map(_.getLong(0)).sorted
    assert(ids.sameElements(0L until 250L))
    assert(rows.forall(r => r.getLong(1) == r.getLong(0) / 50L))
    // every block full (250/50 = 5 exact blocks of 50)
    val counts = df.groupBy("block_id").count().collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(counts == Map(0L -> 50L, 1L -> 50L, 2L -> 50L, 3L -> 50L, 4L -> 50L))
  }
}
