package graft.llm

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Property-style checks for the round-10 primitive kernels: each is
  * compared against an independent straight-line reference over many
  * deterministic pseudo-random inputs (repo convention: seeded LCG,
  * never Math.random). */
class KernelPropertySpec extends SparkSpec {

  private def rng(seed: Int) = new scala.util.Random(seed)

  test("nearestCellKernel / probeCellsKernel match a brute reference on 200 random inputs") {
    val r = rng(4242)
    (0 until 200).foreach { trial =>
      val nCells = 2 + r.nextInt(15)
      val dim = Seq(4, 8, 16, 64)(r.nextInt(4))
      val cs = Array.fill(nCells)(Array.fill(dim)(r.nextDouble() * 2 - 1))
      val v = Seq.fill(dim)((r.nextDouble() * 2 - 1).toFloat)
      def d2(c: Array[Double]) =
        v.zip(c).map { case (x, y) => (x - y) * (x - y) }.sum
      val ref = cs.indices.minBy(i => (d2(cs(i)), i))
      assert(Similarity.nearestCellKernel(cs, v) == ref, s"trial $trial")
      val nP = 1 + r.nextInt(nCells)
      val refProbe = cs.indices.sortBy(i => (d2(cs(i)), i)).take(nP)
      val got = Similarity.probeCellsKernel(cs, v, nP).toSeq
      assert(got == refProbe, s"trial $trial: $got != $refProbe")
      assert(got.distinct.size == got.size)
    }
  }

  test("signPack hamming equals per-component sign-disagreement count (dim <= 64)") {
    import spark.implicits._
    val r = rng(77)
    val rows = (0 until 100).map { i =>
      (i.toLong, Array.fill(64)((r.nextFloat() * 2 - 1)))
    }
    val df = rows.toDF("vec_id", "embedding")
    val packed = df.select(col("vec_id"), BinaryQuant.signPack(col("embedding")).as("b"))
      .collect().map(x => x.getLong(0) -> x.getLong(1)).toMap
    rows.combinations(2).take(300).foreach { case Seq((ia, va), (ib, vb)) =>
      val ref = va.zip(vb).count { case (x, y) => (x > 0f) != (y > 0f) }
      val got = java.lang.Long.bitCount(packed(ia) ^ packed(ib))
      assert(got == ref, s"pair ($ia,$ib)")
    }
  }

  test("rrfFuse is invariant to input row order") {
    import spark.implicits._
    val r = rng(9)
    val rowsA = (0 until 30).map(i => (i.toLong % 3, 1 + i % 10, (i * 7L) % 20))
    val rowsB = (0 until 30).map(i => (i.toLong % 3, 1 + i % 10, (i * 11L) % 20))
    def fuse(a: Seq[(Long, Int, Long)], b: Seq[(Long, Int, Long)]) =
      HybridRetrieval.rrfFuse(
          a.toDF("qid", "rank", "doc").dropDuplicates("qid", "rank"),
          b.toDF("qid", "rank", "doc").dropDuplicates("qid", "rank"), 5)
        .collect().map(x => (x.getLong(0), x.getInt(1), x.getLong(2),
          x.getDouble(3))).toSet
    val base = fuse(rowsA, rowsB)
    assert(base == fuse(r.shuffle(rowsA), r.shuffle(rowsB)))
    assert(base.nonEmpty)
  }
}
