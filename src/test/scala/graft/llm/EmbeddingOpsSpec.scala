package graft.llm

import graft.SparkSpec
import graft.llm.EmbeddingOps._
import org.apache.spark.sql.functions._

class EmbeddingOpsSpec extends SparkSpec {

  /** Deterministic pseudo-random doubles (no Math.random in tests that
    * must reproduce across runs). */
  private def noise(seed: Int): Double = {
    val h = scala.util.hashing.MurmurHash3.productHash((seed, 0x9e3779b9))
    (h.toDouble / Int.MaxValue) // in [-1, 1]
  }

  test("pcaBasis recovers a planted dominant axis and its variance") {
    import spark.implicits._
    // 3-D data = t * axis + small isotropic noise; the top principal
    // component must align with `axis` and carry almost all variance
    val axis = Array(3.0 / 13, 4.0 / 13, 12.0 / 13) // unit vector
    val rows = (0 until 400).map { i =>
      val t = (i % 21 - 10).toDouble // planted spread, var = 36.67
      val eps = 0.01
      (i.toLong, Array(
        (t * axis(0) + eps * noise(3 * i)).toFloat,
        (t * axis(1) + eps * noise(3 * i + 1)).toFloat,
        (t * axis(2) + eps * noise(3 * i + 2)).toFloat))
    }
    val df = rows.toDF("vec_id", "embedding")
    val basis = pcaBasis(df, "embedding", 3)
    assert(basis.eigenvalues.length == 3)
    assert(basis.eigenvalues(0) > 30 && basis.eigenvalues(1) < 1e-3)
    val align = math.abs(
      basis.components(0).zip(axis).map { case (a, b) => a * b }.sum)
    assert(align > 0.9999, s"top axis alignment $align")
    // full-rank projection reconstructs exactly (double path)
    val maxErr = projectEmbeddings(df, basis, 3, withError = true)
      .agg(max(col("proj_err"))).head().getDouble(0)
    assert(maxErr < 1e-6, s"full-rank reconstruction err $maxErr")
    // rank-1 projection recovers the planted coordinate t (up to sign)
    val p1 = projectEmbeddings(df, basis, 1)
      .select(col("vec_id"), element_at(col("proj"), 1).as("p"))
      .collect().map(r => r.getLong(0) -> r.getFloat(1)).toMap
    val sign = math.signum(p1(0L) / (0 % 21 - 10).toDouble)
    rows.foreach { case (id, _) =>
      val t = (id % 21 - 10).toDouble
      assert(math.abs(sign * p1(id) - t) < 0.05,
        s"id=$id proj=${p1(id)} t=$t")
    }
  }

  test("projectEmbeddings keeps other columns and nulls pass through") {
    import spark.implicits._
    val df = Seq((1L, "a", Array(1f, 2f)), (2L, "b", null))
      .toDF("id", "tag", "embedding")
    val basis = PcaBasis(Array(0.0, 0.0),
      Array(Array(1.0, 0.0), Array(0.0, 1.0)), Array(1.0, 1.0))
    val got = projectEmbeddings(df, basis, 2).collect()
      .map(r => r.getLong(0) -> (r.getString(1), r.isNullAt(3))).toMap
    assert(got(1L) == (("a", false)))
    assert(got(2L) == (("b", true)))
  }

  test("semanticDedup: planted dups resolve within clusters, keeper rule") {
    import spark.implicits._
    // two well-separated blobs; ids 0/1/2 are a near-dup triple in blob
    // A (2 = slightly off-axis copy), ids 10/11 an exact pair in blob B,
    // id 20 a singleton in blob B
    val a = Array(10f, 0f, 0f); val b = Array(0f, 10f, 0f)
    val df = Seq(
      (0L, a), (1L, a), (2L, Array(10f, 0.05f, 0f)),
      (10L, b), (11L, b),
      (20L, Array(0f, 9f, 4f))) // cos to b ≈ 0.91 < eps
      .toDF("vec_id", "embedding")
    val groups = semanticDupGroups(df, eps = 0.99, k = 2, seed = 7)
      .collect().map(r => r.getLong(0) ->
        ((r.getLong(3), r.getBoolean(4)))).toMap
    // triple is one cluster labeled 0, pair one cluster labeled 10
    assert(groups(0L)._1 == 0L && groups(1L)._1 == 0L && groups(2L)._1 == 0L)
    assert(groups(10L)._1 == 10L && groups(11L)._1 == 10L)
    assert(!groups.contains(20L))
    // keeper of the triple = least centroid-similar member; 0 and 1 are
    // identical so the off-axis 2 is farther from the cell centroid
    // (centroid sits between the three) — verify exactly one keeper and
    // that it is id 2
    assert(groups(2L)._2 && !groups(0L)._2 && !groups(1L)._2)
    val kept = semanticDedup(df, eps = 0.99, k = 2, seed = 7)
      .select("vec_id").collect().map(_.getLong(0)).toSet
    assert(kept == Set(2L, 10L, 20L))
  }

  test("hot-cell chain path still catches identical copies") {
    import spark.implicits._
    // two separated blobs, k=2: the 6-vector blob exceeds
    // maxCellSize=4 and takes the adjacent-chain path; its two
    // identical pairs are adjacent in centroid-cos order and must
    // still resolve. The 2-vector blob stays on the cold path.
    val df = Seq(
      (1L, Array(1f, 0f)), (2L, Array(1f, 0f)),
      (3L, Array(0.95f, 0.2f)), (4L, Array(0.9f, 0.3f)),
      (5L, Array(0.8f, 0.45f)), (6L, Array(0.8f, 0.45f)),
      (7L, Array(0f, 1f)), (8L, Array(-0.1f, 1f)))
      .toDF("vec_id", "embedding")
    val groups = semanticDupGroups(df, eps = 0.9999, k = 2, seed = 7,
      maxCellSize = 4)
    val clusters = groups.collect().map(r => r.getLong(0) -> r.getLong(3)).toMap
    assert(clusters.get(1L) == clusters.get(2L) && clusters.contains(1L))
    assert(clusters.get(5L) == clusters.get(6L) && clusters.contains(5L))
    assert(Seq(3L, 4L, 7L, 8L).forall(!clusters.contains(_)))
  }

  test("eigenvalue trace equals summed per-dim variance") {
    import spark.implicits._
    val df = (0 until 100).map(i =>
      (i.toLong, Array.tabulate(4)(j => (noise(7 * i + j) * (j + 1)).toFloat)))
      .toDF("vec_id", "embedding")
    val basis = pcaBasis(df, "embedding", 4)
    val tv = df.select(posexplode(col("embedding")).as(Seq("d", "x")))
      .groupBy("d").agg(var_pop(col("x").cast("double")).as("v"))
      .agg(sum("v")).head().getDouble(0)
    assert(math.abs(basis.eigenvalues.sum - tv) < 1e-9 * math.max(tv, 1.0))
    assert(basis.eigenvalues.sameElements(basis.eigenvalues.sorted.reverse))
  }
}
