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

  // ------------------------------------------------- connected components

  private def cc(edges: Seq[(Long, Long)]): Map[Long, Long] = {
    import spark.implicits._
    GraphOps.connectedComponents(edges.toDF("src", "dst"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
  }

  test("connectedComponents labels two disjoint chains by their minima") {
    // deep chain exercises multi-round star contraction
    val chainA = (1L until 6L).map(i => (i, i + 1))       // 1..6
    val chainB = (10L until 13L).map(i => (i + 1, i))     // 10..13, reversed
    val got = cc(chainA ++ chainB)
    assert((1L to 6L).forall(got(_) == 1L))
    assert((10L to 13L).forall(got(_) == 10L))
  }

  test("connectedComponents merges components sharing any node") {
    val got = cc(Seq((5L, 2L), (2L, 9L), (9L, 7L), (100L, 101L)))
    assert(Seq(2L, 5L, 7L, 9L).forall(got(_) == 2L))
    assert(got(100L) == 100L && got(101L) == 100L)
    assert(got.size == 6)
  }

  // ------------------------------------------------------ triangle counts

  private def tri(edges: Seq[(Long, Long)]): Map[Long, Long] = {
    import spark.implicits._
    GraphOps.triangleCounts(edges.toDF("x", "y"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
  }

  test("triangleCounts: K4 gives every node 3 triangles") {
    val k4 = for (i <- 1L to 4L; j <- (i + 1) to 4L) yield (i, j)
    assert(tri(k4) == Map(1L -> 3L, 2L -> 3L, 3L -> 3L, 4L -> 3L))
  }

  test("triangleCounts: a square has none; adding one diagonal makes two") {
    val square = Seq((1L, 2L), (2L, 3L), (3L, 4L), (1L, 4L))
    assert(tri(square).isEmpty)
    val withDiag = square :+ (1L, 3L)
    // diagonal 1-3 closes triangles {1,2,3} and {1,3,4}
    assert(tri(withDiag) ==
      Map(1L -> 2L, 3L -> 2L, 2L -> 1L, 4L -> 1L))
  }

  test("triangleCounts handles a hub star (orientation bounds wedge work)") {
    // star has no triangles regardless of hub degree; input arrives
    // unordered/duplicated to exercise canonicalization
    val star = (2L to 40L).flatMap(l => Seq((l, 1L), (1L, l)))
    assert(tri(star).isEmpty)
  }

  // ------------------------------------------------------------ BFS

  private def bfs(edges: Seq[(Long, Long)], seeds: Seq[Long],
      maxRounds: Int = 16): Map[Long, Long] = {
    import spark.implicits._
    GraphOps.bfsDistances(edges.toDF("src", "dst"), seeds.toDF("node"),
        maxRounds)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
  }

  test("bfsDistances: chain distances from one seed; directed edges") {
    // 1→2→3→4 directed: distances follow edge direction only
    val chain = Seq((1L, 2L), (2L, 3L), (3L, 4L))
    assert(bfs(chain, Seq(1L)) ==
      Map(1L -> 0L, 2L -> 1L, 3L -> 2L, 4L -> 3L))
    // seeding at 3 reaches only 4 (no back-edges)
    assert(bfs(chain, Seq(3L)) == Map(3L -> 0L, 4L -> 1L))
  }

  test("bfsDistances: multi-seed takes the MINIMUM distance; " +
      "disconnected nodes are omitted") {
    val e = Seq((1L, 2L), (2L, 3L), (3L, 4L), (4L, 5L), (10L, 11L))
      .flatMap { case (a, b) => Seq((a, b), (b, a)) } // undirect
    val d = bfs(e, Seq(1L, 5L))
    // node 3 is 2 hops from both seeds; 10/11 unreachable
    assert(d == Map(1L -> 0L, 5L -> 0L, 2L -> 1L, 4L -> 1L, 3L -> 2L))
  }

  test("bfsDistances: maxRounds truncates the horizon, never distorts " +
      "distances inside it") {
    val chain = (1L until 10L).map(i => (i, i + 1))
    val d = bfs(chain, Seq(1L), maxRounds = 3)
    assert(d == Map(1L -> 0L, 2L -> 1L, 3L -> 2L, 4L -> 3L))
  }
}
