package graft.ops

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** PageRank vs hand-replayed fixed-point arithmetic: uniform fixpoint
  * on a cycle, dangling-node redistribution (the branch the g1 oracle
  * graph can't reach), and mass conservation under truncation.
  */
class GraphOpsSpec extends SparkSpec {

  private val F = GraphOps.F

  /** Exact scala replay of the operator's integral update rule. */
  private def replay(edges: Seq[(Long, Long)], iters: Int): Map[Long, Long] = {
    val e = edges.distinct
    val nodes = (e.map(_._1) ++ e.map(_._2)).distinct.sorted
    val n = nodes.size.toLong
    val out = e.groupBy(_._1).map { case (s, xs) => s -> xs.size.toLong }
    var r = nodes.map(_ -> F / n).toMap
    val teleport = 3L * F / (20L * n)
    (1 to iters).foreach { _ =>
      val dangling = nodes.filterNot(out.contains).map(r).sum
      val contrib = e.groupBy(_._2).map { case (d, xs) =>
        d -> xs.map { case (s, _) => r(s) / out(s) }.sum
      }
      r = nodes.map(x =>
        x -> (teleport + 17L * (contrib.getOrElse(x, 0L) + dangling / n) / 20L))
        .toMap
    }
    r
  }

  private def run(edges: Seq[(Long, Long)], iters: Int): Map[Long, Long] = {
    import spark.implicits._
    GraphOps.pageRankFixedPoint(edges.toDF("src", "dst"), iters)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
  }

  test("3-cycle converges to the uniform fixpoint exactly") {
    val got = run(Seq((1L, 2L), (2L, 3L), (3L, 1L)), 5)
    assert(got == Map(1L -> F / 3, 2L -> F / 3, 3L -> F / 3))
  }

  test("chain with a dangling sink matches the exact integral replay") {
    // 3 is a sink: its mass must come back via the dangling term, not
    // vanish — exercised nowhere in g1's undirected oracle graph
    val edges = Seq((1L, 2L), (2L, 3L), (4L, 1L), (1L, 4L))
    val got = run(edges, 4)
    val want = replay(edges, 4)
    assert(got == want)
    // sink actually accumulated beyond teleport-only
    assert(got(3L) > 3L * F / (20L * 4))
  }

  test("star graph: hub outranks leaves; replay matches; mass conserved") {
    val leaves = (2L to 6L)
    val edges = leaves.flatMap(l => Seq((l, 1L), (1L, l)))
    val got = run(edges, 5)
    assert(got == replay(edges, 5))
    assert(leaves.forall(l => got(1L) > got(l)))
    val mass = got.values.sum
    // integral truncation only ever LEAKS mass, boundedly
    assert(mass <= F && mass > F - 100L * got.size)
  }
}
