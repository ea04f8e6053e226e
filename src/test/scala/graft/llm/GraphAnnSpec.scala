package graft.llm

import graft.SparkSpec
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

class GraphAnnSpec extends SparkSpec {

  private def noiseF(seed: Int): Float = {
    val h = scala.util.hashing.MurmurHash3.productHash((seed, 0x9e3779b9))
    (h.toDouble / Int.MaxValue).toFloat
  }

  private def corpus(n: Int): DataFrame = {
    import spark.implicits._
    (0 until n).map { i =>
      val anchor = i % 8
      val v = Array.tabulate(64) { j =>
        (if (j % 8 == anchor) 2.0f else 0.0f) + noiseF(i * 64 + j)
      }
      (i.toLong, v)
    }.toDF("vec_id", "embedding")
  }

  private val base = graft.util.Fixtures.dir + "/spec_graph_ann"

  test("neighbor graph has bounded degree, no self-loops, full coverage") {
    val c = corpus(300).cache()
    val g = GraphAnn.buildNeighborGraph(c, m = 8).cache()
    // degree cap: symmetrization alone leaves hubs unbounded (measured
    // 21 at m=8 on this fixture); the 2m cap must hold exactly
    val maxDeg = g.groupBy("src").count().agg(max("count")).head().getLong(0)
    assert(maxDeg <= 16, s"degree $maxDeg exceeds 2m")
    assert(g.filter(col("src") === col("dst")).count() == 0)
    // every node keeps at least its own m strongest out-edges' worth of
    // connectivity (the cap trims hubs, never isolates a node)
    assert(g.select("src").distinct().count() == 300)
    g.unpersist(); c.unpersist()
  }

  test("beam search over the stored graph recovers exact top-1 on clustered data") {
    graft.util.Fs.rmRecursive(new java.io.File(base))
    val c = corpus(300).cache()
    val q = c.filter(col("vec_id") < 10)
    val g = GraphAnn.ensure(c, s"$base/a")
    val exact = Similarity.bruteForceTop1(q, c).select(col("qid"), col("nid"))
    val approx = GraphAnn.beamSearch(q, g, c, k = 1)
      .select(col("qid"), col("nid").as("na"))
    val nQ = exact.count().toDouble
    val hits = exact.join(approx, Seq("qid"))
      .filter(col("nid") === col("na")).count()
    assert(nQ == 10)
    // clustered fixture: the graph path should be essentially exact
    assert(hits / nQ >= 0.9, s"recall ${hits / nQ}")
    c.unpersist()
  }

  test("ensure builds once, reloads after, and rebuilds on corpus change") {
    graft.util.Fs.rmRecursive(new java.io.File(base))
    val c = corpus(300).cache()
    val before = GraphAnn.buildsThisProcess
    GraphAnn.ensure(c, s"$base/b")
    assert(GraphAnn.buildsThisProcess == before + 1)
    val g2 = GraphAnn.ensure(c, s"$base/b")
    assert(GraphAnn.buildsThisProcess == before + 1)
    assert(g2.count() > 0)
    GraphAnn.ensure(corpus(301), s"$base/b")
    assert(GraphAnn.buildsThisProcess == before + 2)
    c.unpersist()
  }
}
