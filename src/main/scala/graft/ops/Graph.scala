package graft.ops

import graft.{QueryDef, Tables}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Distributed graph analytics over DataFrames: PageRank as the
  * representative iterative-propagation operator (the web-corpus
  * quality prior — Common Crawl publishes exactly this family of
  * link-graph rank as a curation signal; Page et al. 1999).
  *
  * Design for scale:
  *  - Edges are deduped, hash-partitioned by `src` ONCE and cached —
  *    every iteration's rank⋈edge join reuses that partitioning; only
  *    the (node-sized, much smaller) rank table moves per round.
  *  - Each iteration is one join + one map-side-combinable sum — the
  *    standard Pregel-lite shape. Ranks are materialized (cache +
  *    count) per round so the lineage stays O(1) deep instead of
  *    O(iters) (at 1000 executors a 30-round lineage replay after a
  *    task failure would be the bottleneck, not the math).
  *  - Dangling-node mass is a single scalar aggregate per round
  *    (O(1) driver state), redistributed uniformly, per the paper.
  *
  * Determinism (the cross-engine gate): ranks are carried as FIXED-
  * POINT integers (units of 1e-12) — `F = 10^12` total mass. Every
  * operation is integral (`div`), so sums are exact under ANY
  * accumulation order; a floating-point PageRank would hash-differ in
  * final ulps between Spark's and DuckDB's aggregation orders. A
  * production run at 100 TB can flip to doubles freely — the plan
  * shape is identical — but the gated path keeps the bit-exact
  * contract. Truncation leaks ≤1e-12·|nodes| mass per round:
  * deterministic, documented, irrelevant at rank precision 1e-6.
  */
object GraphOps {

  val F: Long = 1000000000000L // fixed-point one: 1.0 == 1e12 units

  /** One dedicated child session per parent, created lazily and REUSED
    * by every iterative-loop call: a fresh `newSession()` per call
    * re-pays the session's lazy init (analyzer/optimizer/planner
    * instantiation on each newly constructed frame) across the whole
    * loop — measured ~2x on g1 (3.3 s parent-session vs 7.3 s
    * fresh-child). The cached child keeps the isolation property (loop
    * conf overrides never touch the caller's session) at parent-session
    * cost after the first call. */
  // WeakHashMap keyed on the parent: a discarded parent session (a
  // per-tenant/per-job newSession pattern) must not pin its child —
  // and the child's sessionState/catalog — for the JVM lifetime. The
  // synchronized wrapper is enough here: loop launches are rare and
  // coarse, never a hot path.
  private val loopSessions = java.util.Collections.synchronizedMap(
    new java.util.WeakHashMap[SparkSession, SparkSession]())
  private def loopSessionFor(parent: SparkSession): SparkSession =
    loopSessions.synchronized {
      loopSessions.computeIfAbsent(parent, p => p.newSession())
    }

  /** PageRank with damping 17/20 (= 0.85) over `edges(src, dst)`.
    * Returns (node, rank_fp) where rank_fp is in units of 1e-12.
    * Every node appearing as src or dst participates; nodes with no
    * out-edges contribute their mass uniformly (dangling handling).
    *
    * `assumeDistinctEdges = true` skips the defensive edge dedup — for
    * callers whose construction guarantees it (g1's undirected doubling
    * of an already-distinct pair set over disjoint even/odd key spaces
    * cannot collide), the dedup is a pure extra shuffle over the full
    * edge set.
    *
    * The iteration runs with AQE OFF and shuffle partitions sized to
    * the edge count (≈150k edge rows per partition, floor 8, cap
    * 4× default parallelism): every round has the identical 2-shuffle
    * shape, so adaptive re-planning buys nothing and costs a driver
    * re-optimization per round, and its partition coalescing broke
    * exchange reuse against the cached pre-partitioned edge relation
    * (measured at sf0.1, 1.17M edges: 0.33 s/round sized vs ~1 s/round
    * under AQE).
    *
    * CONF ISOLATION: the loop runs entirely on a dedicated CHILD
    * session ([[loopSessionFor]] — shared SparkContext and catalog,
    * private runtime conf, one per parent, reused across calls), so
    * the AQE-off + loop-sized-partition overrides below can never leak
    * into a query running on the caller's session. The edge relation
    * crosses sessions via [[org.apache.spark.sql.GraftSessionRebind]]
    * (zero row conversion). Residual hazard, documented: two CONCURRENT
    * loop calls share the child session, so one's `loopParts` can
    * momentarily apply to the other — a partition-count perf knob, not
    * a correctness input (both run AQE-off), and strictly narrower than
    * the pre-r11 leak to every query on the caller's session.
    */
  def pageRankFixedPoint(edges: DataFrame, iters: Int,
      assumeDistinctEdges: Boolean = false): DataFrame = {
    require(iters >= 1, s"iters must be >= 1, got $iters")
    val sess = loopSessionFor(edges.sparkSession)
    val eProj = edges.select(col("src").cast("long").as("src"),
      col("dst").cast("long").as("dst"))
    val e0 = org.apache.spark.sql.GraftSessionRebind.rebind(sess, eProj)
    val eDedup = if (assumeDistinctEdges) e0 else e0.distinct()
    val e = eDedup
      .repartition(col("src")) // reused by every iteration's join
      .cache()
    val nEdges = e.count() // materializes the cache; sizes the loop
    val nodes = e.select(col("src").as("node"))
      .union(e.select(col("dst").as("node"))).distinct().cache()
    val n = nodes.count()
    require(n > 0, "pageRank on an empty edge set")
    // outdeg per node (0 for dangling); node-sized, cached for reuse
    val deg = nodes.join(
        e.groupBy("src").agg(count(lit(1)).as("outdeg")),
        nodes("node") === col("src"), "left")
      .select(col("node"), coalesce(col("outdeg"), lit(0L)).as("outdeg"))
      .cache()
    val teleport = (3L * F) / (20L * n) // (1-d)/N, exact integral
    val loopParts = math.max(8L, math.min(nEdges / 150000L + 1L,
      sess.sparkContext.defaultParallelism * 4L)).toInt
    try {
      // child-session-local: concurrent queries on the caller's session
      // never see these
      sess.conf.set("spark.sql.adaptive.enabled", "false")
      sess.conf.set("spark.sql.shuffle.partitions", loopParts.toString)
      // bake outdeg INTO the cached edge table once: the iteration then
      // joins ranks against ONE pre-partitioned relation instead of
      // re-deriving rank⋈deg every round; materialized HERE (count) so
      // the build cost lands in setup, not inside round 0
      val e2 = e.join(deg.filter(col("outdeg") > 0)
          .withColumnRenamed("node", "src"), "src")
        .repartition(loopParts, col("src")).cache()
      e2.count()
      val danglingNodes = deg.filter(col("outdeg") === 0)
        .select(col("node")).cache()
      // one upfront count: graphs with no sinks (most real link graphs
      // after symmetrization) skip the per-round dangling aggregate job
      val hasDangling = danglingNodes.count() > 0
      // Per-round materialization MUST truncate the LOGICAL plan, not
      // just execution: `cache()` leaves the full logical tree in place,
      // so round k's plan embeds round k-1's — Catalyst re-analysis
      // doubles per round (measured: iter 9 spent 115 s in the optimizer
      // on a 1k-node graph). Eager localCheckpoint rewrites the frame to
      // an RDD scan — O(1) plan size AND O(1) recovery lineage per round
      // (the distributedClusters contract, llm/Dedup.scala).
      var ranks = deg.select(col("node"), lit(F / n).as("rank_fp"))
        .localCheckpoint(eager = true)
      var i = 0
      while (i < iters) {
        val dangling =
          if (hasDangling)
            ranks.join(danglingNodes, "node")
              .agg(coalesce(sum(col("rank_fp")), lit(0L))).head().getLong(0)
          else 0L
        val contrib = e2.join(ranks, col("src") === col("node"))
          .select(col("dst"), expr("rank_fp div outdeg").as("c"))
          .groupBy(col("dst").as("node")).agg(sum(col("c")).as("contrib"))
        val next = nodes.join(contrib, Seq("node"), "left")
          .select(col("node"),
            (lit(teleport) +
              expr(s"17 * (coalesce(contrib, 0L) + ${dangling / n}L) div 20"))
              .as("rank_fp"))
          .localCheckpoint(eager = true)
        ranks = next
        i += 1
      }
      e2.unpersist(); danglingNodes.unpersist()
      ranks
    } finally {
      e.unpersist(); nodes.unpersist(); deg.unpersist()
    }
  }

  /** The DuckDB oracle replays the SAME integral arithmetic, unrolled
    * one CTE pair (contribution, rank) per iteration. Generated
    * programmatically so iteration count stays in one place. Every
    * CTE is MATERIALIZED: inlined, the r5→r4→…→r0 reference chain
    * re-derives the edge join exponentially many times (measured: the
    * sf0.1 replay spilled past the disk budget; materialized it runs
    * in ~20 s).
    */
  private def pageRankOracleSql(iters: Int): String = {
    val base =
      """WITH le AS MATERIALIZED (SELECT DISTINCT o_custkey * 2 AS src,
        |                            l_suppkey * 2 + 1 AS dst
        |            FROM orders JOIN lineitem ON o_orderkey = l_orderkey),
        |edges AS MATERIALIZED (SELECT src, dst FROM le
        |                       UNION SELECT dst, src FROM le),
        |nodes AS MATERIALIZED (SELECT DISTINCT src AS node FROM edges
        |          UNION SELECT DISTINCT dst FROM edges),
        |nn AS MATERIALIZED (SELECT count(*) AS n FROM nodes),
        |deg AS MATERIALIZED (SELECT node, count(e.src) AS outdeg
        |        FROM nodes LEFT JOIN edges e ON node = e.src GROUP BY node),
        |r0 AS MATERIALIZED (SELECT node,
        |         1000000000000 // (SELECT n FROM nn) AS r
        |       FROM nodes)""".stripMargin
    val steps = (1 to iters).map { k =>
      val p = k - 1
      s"""c$k AS MATERIALIZED (SELECT e.dst AS node,
         |           sum(r.r // d.outdeg) AS contrib
         |       FROM edges e JOIN r$p r ON e.src = r.node
         |                    JOIN deg d ON e.src = d.node
         |       WHERE d.outdeg > 0 GROUP BY e.dst),
         |g$k AS MATERIALIZED (SELECT COALESCE(
         |                (SELECT sum(r.r) FROM r$p r JOIN deg d
         |                 ON r.node = d.node WHERE d.outdeg = 0), 0)
         |               // (SELECT n FROM nn) AS dang),
         |r$k AS MATERIALIZED (SELECT nodes.node,
         |              (3 * 1000000000000) // (20 * (SELECT n FROM nn))
         |              + (17 * (COALESCE(c$k.contrib, 0)
         |                       + (SELECT dang FROM g$k))) // 20 AS r
         |       FROM nodes LEFT JOIN c$k ON nodes.node = c$k.node)""".stripMargin
    }
    val tail =
      s"""SELECT node,
         |       CASE WHEN node % 2 = 0 THEN 'customer' ELSE 'supplier'
         |       END AS node_type,
         |       CAST(r AS BIGINT) AS rank_fp
         |FROM r$iters""".stripMargin
    (base +: steps).mkString(",\n") + "\n" + tail
  }

  private val pageRankIters = 5

  /** G1 — PageRank over the customer↔supplier trade graph (edges =
    * distinct customer→supplier pairs from orders⋈lineitem, doubled to
    * undirected so the chain is irreducible; node ids disambiguate the
    * two key spaces as 2k / 2k+1). FULL DuckDB oracle: the unrolled
    * CTE replay runs the identical integral fixed-point arithmetic —
    * every node's 5-round rank hash-matches exactly. The dangling
    * branch is structurally zero on this graph (undirected doubling
    * gives every node outdeg ≥ 1) and is exercised by GraphOpsSpec's
    * sink-node hand graph instead.
    */
  val g1 = QueryDef.sql("g1_pagerank", pageRankOracleSql(pageRankIters)) {
    (s, d) =>
      val le = Tables.orders(s, d).join(Tables.lineitem(s, d),
          col("o_orderkey") === col("l_orderkey"))
        .select((col("o_custkey") * 2).cast("long").as("src"),
          (col("l_suppkey") * 2 + 1).cast("long").as("dst"))
        .distinct()
      val edges = le.union(le.select(col("dst").as("src"), col("src").as("dst")))
      // distinct by construction: le is deduped and the doubled copies
      // live in disjoint (even→odd)/(odd→even) key spaces
      pageRankFixedPoint(edges, pageRankIters, assumeDistinctEdges = true)
        .select(col("node"),
          when(col("node") % 2 === 0, "customer").otherwise("supplier")
            .as("node_type"),
          col("rank_fp"))
  }

  // ------------------------------------------------- connected components

  /** Connected components over `edges(src, dst)` (undirected): returns
    * (node, component) with component = the component's minimum node id.
    * Delegates to the alternating large-star/small-star propagation
    * (Kiveris et al., SoCC 2014) shared with the near-dup cluster
    * resolver — O(log n) ROUNDS regardless of graph diameter, every
    * round two aggregate+join passes over the (shrinking) edge set.
    * This is the 100 TB shape: a naive min-label loop needs diameter
    * many joins (a 10M-hop chain ⇒ 10M rounds); star contraction
    * converges in ~25. Isolated nodes (no edges) don't appear — same
    * contract as the oracle replay.
    */
  def connectedComponents(edges: DataFrame): DataFrame =
    graft.llm.Dedup.distributedClusters(
        edges.select(col("src").cast("long").as("doc_a"),
          col("dst").cast("long").as("doc_b")))
      .select(col("doc_id").as("node"), col("cluster").as("component"))

  /** The oracle replays min-label propagation UNROLLED for a fixed
    * round count (one materialized aggregate+join CTE per round) —
    * valid because the gated graph's propagation depth is measured ≤ 9
    * at both sf0.01 and sf0.1 (16 rounds = 1.7× margin). An
    * under-unrolled oracle would HASH-MISMATCH (labels too high), never
    * silently pass — the gate fails loud on either engine's error.
    */
  private def ccOracleSql(rounds: Int): String = {
    val base =
      """WITH e AS MATERIALIZED (SELECT DISTINCT l_partkey * 2 AS src,
        |            l_suppkey * 2 + 1 AS dst
        |        FROM lineitem WHERE l_quantity > 49 AND l_discount > 0.07),
        |bi AS MATERIALIZED (SELECT src, dst FROM e
        |       UNION ALL SELECT dst, src FROM e),
        |l0 AS MATERIALIZED (SELECT DISTINCT src AS node, src AS comp FROM bi)""".stripMargin
    val steps = (1 to rounds).map { k =>
      val p = k - 1
      s"""l$k AS MATERIALIZED (
         |  SELECT n.node, least(n.comp, COALESCE(m.mn, n.comp)) AS comp
         |  FROM l$p n LEFT JOIN (
         |    SELECT b.dst AS node, min(l.comp) AS mn
         |    FROM l$p l JOIN bi b ON l.node = b.src GROUP BY b.dst) m
         |  ON n.node = m.node)""".stripMargin
    }
    (base +: steps).mkString(",\n") +
      s"\nSELECT node, comp AS component FROM l$rounds"
  }

  /** G2 — connected components of the sparse part↔supplier co-shipment
    * graph (high-quantity, high-discount line items; 60 components at
    * sf0.01, 746 at sf0.1). Node ids disambiguate the two key spaces
    * as part=2k / supplier=2k+1 (the g1 trick). FULL DuckDB oracle:
    * unrolled min-label propagation reaches the same per-node
    * component minimum the star contraction computes.
    */
  val g2 = QueryDef.sql("g2_connected_components", ccOracleSql(16)) { (s, d) =>
    val edges = Tables.lineitem(s, d)
      .filter(col("l_quantity") > 49 && col("l_discount") > 0.07)
      .select((col("l_partkey") * 2).cast("long").as("src"),
        (col("l_suppkey") * 2 + 1).cast("long").as("dst"))
      .distinct()
    connectedComponents(edges)
  }

  // ------------------------------------------------------ triangle counting

  /** Per-node triangle counts over an undirected simple graph
    * `edges(x, y)` (canonical x < y, distinct). Degree-ordered
    * enumeration (Suri & Vassilvitskii, WWW 2011 "the curse of the
    * last reducer"): orient every edge from its lower-(degree, id)
    * endpoint to the higher one, build wedges only at each node's
    * out-neighbors (out-degree is O(√m) for ANY graph under this
    * orientation, even a star with one 10M-degree hub), then close
    * wedges with a hash semi-join against the oriented edge set. Each
    * triangle is found exactly once; per-node counts come from
    * exploding the found triangle's three corners into a
    * map-side-combinable count. Every stage is an equi-join or
    * hash aggregate — no node ever enumerates deg² wedges at a hub.
    */
  def triangleCounts(edges: DataFrame): DataFrame = {
    val e = edges.select(col("x").cast("long").as("x"),
        col("y").cast("long").as("y"))
      .filter(col("x") < col("y")).distinct()
    val deg = e.select(col("x").as("node"))
      .unionAll(e.select(col("y").as("node")))
      .groupBy("node").agg(count(lit(1)).as("deg"))
    // orient lower (deg, id) -> higher (deg, id)
    val dx = deg.select(col("node").as("x"), col("deg").as("dx"))
    val dy = deg.select(col("node").as("y"), col("deg").as("dy"))
    val oriented = e.join(dx, "x").join(dy, "y")
      .select(
        when(col("dx") < col("dy") ||
            (col("dx") === col("dy") && col("x") < col("y")),
          struct(col("x").as("u"), col("y").as("v")))
          .otherwise(struct(col("y").as("u"), col("x").as("v"))).as("e"))
      .select(col("e.u"), col("e.v"))
    // wedges at u: (v, w) both out-neighbors of u; close v->w or w->v
    val w1 = oriented.select(col("u"), col("v").as("a"))
    val w2 = oriented.select(col("u"), col("v").as("b"))
    val wedges = w1.join(w2, "u").filter(col("a") < col("b"))
    val closure = oriented.select(
      least(col("u"), col("v")).as("a"), greatest(col("u"), col("v")).as("b"))
    val tris = wedges.join(closure, Seq("a", "b"), "left_semi")
    tris.select(explode(array(col("u"), col("a"), col("b"))).as("node"))
      .groupBy("node").agg(count(lit(1)).as("n_triangles"))
  }

  /** G3 — triangle counts on the supplier co-shipment graph (suppliers
    * joined by sharing a max-quantity part: 340 edges / 111 triangles
    * at sf0.01, 3.6k / 837 at sf0.1). FULL DuckDB oracle: plain
    * ordered three-way self-join — orientation changes the work bound,
    * never the answer, so both engines count the same triangles.
    */
  val g3 = QueryDef.sql(
    "g3_triangle_counts",
    """WITH ps AS MATERIALIZED (SELECT DISTINCT l_partkey AS p, l_suppkey AS s
      |        FROM lineitem WHERE l_quantity > 49),
      |e AS MATERIALIZED (SELECT DISTINCT least(a.s, b.s) AS x,
      |            greatest(a.s, b.s) AS y
      |        FROM ps a JOIN ps b ON a.p = b.p AND a.s <> b.s),
      |t AS (SELECT a.x AS u, a.y AS v, b.y AS w
      |      FROM e a JOIN e b ON a.y = b.x
      |             JOIN e c ON a.x = c.x AND b.y = c.y),
      |n AS (SELECT u AS node FROM t UNION ALL SELECT v FROM t
      |      UNION ALL SELECT w FROM t)
      |SELECT node, count(*) AS n_triangles FROM n GROUP BY node""".stripMargin) {
    (s, d) =>
      val ps = Tables.lineitem(s, d).filter(col("l_quantity") > 49)
        .select(col("l_partkey").as("p"), col("l_suppkey").as("s"))
        .distinct()
      val b = ps.select(col("p"), col("s").as("s2"))
      val edges = ps.join(b, "p").filter(col("s") =!= col("s2"))
        .select(least(col("s"), col("s2")).as("x"),
          greatest(col("s"), col("s2")).as("y"))
        .distinct()
      triangleCounts(edges)
  }

  // ------------------------------------------------------ degree histogram

  /** G4 — degree histogram of the g1 customer↔supplier trade graph:
    * (degree, n_nodes). Two map-side-combinable aggregates over the
    * distinct edge set — the O(1)-output structural summary a graph
    * pipeline checks before paying for iterate-until-converged work.
    * FULL DuckDB oracle.
    */
  val g4 = QueryDef.sql(
    "g4_degree_histogram",
    """WITH le AS (SELECT DISTINCT o_custkey * 2 AS src,
      |            l_suppkey * 2 + 1 AS dst
      |        FROM orders JOIN lineitem ON o_orderkey = l_orderkey),
      |d AS (SELECT node, count(*) AS degree FROM (
      |        SELECT src AS node FROM le UNION ALL SELECT dst FROM le) b
      |      GROUP BY node)
      |SELECT degree, count(*) AS n_nodes FROM d GROUP BY degree""".stripMargin) {
    (s, d) =>
      val le = Tables.orders(s, d).join(Tables.lineitem(s, d),
          col("o_orderkey") === col("l_orderkey"))
        .select((col("o_custkey") * 2).cast("long").as("src"),
          (col("l_suppkey") * 2 + 1).cast("long").as("dst"))
        .distinct()
      le.select(col("src").as("node")).unionAll(le.select(col("dst").as("node")))
        .groupBy("node").agg(count(lit(1)).as("degree"))
        .groupBy("degree").agg(count(lit(1)).as("n_nodes"))
  }

  /** G5 — weighted bipartite projection: supplier pairs scored by
    * co-shipment strength (shared max-quantity parts), with the
    * Jaccard of their part sets — the "related items" edge weight
    * every co-occurrence recommender starts from. Pair enumeration
    * happens per part (bounded groups via the same sparsifier as g3,
    * never supplier×supplier); weights are one map-side-combinable
    * count plus a broadcast-joined per-node degree. FULL DuckDB
    * oracle; weight fractions round at 6 from exact integer ratios.
    */
  val g5 = QueryDef.sql(
    "g5_weighted_projection",
    """WITH ps AS (SELECT DISTINCT l_partkey AS p, l_suppkey AS s
      |        FROM lineitem WHERE l_quantity > 49),
      |deg AS (SELECT s, count(*) AS d FROM ps GROUP BY 1),
      |pairs AS (SELECT least(a.s, b.s) AS x, greatest(a.s, b.s) AS y,
      |                 count(*) AS n_shared
      |          FROM ps a JOIN ps b ON a.p = b.p AND a.s < b.s
      |          GROUP BY 1, 2)
      |SELECT x, y, CAST(n_shared AS BIGINT) AS n_shared,
      |       round(CAST(n_shared AS DOUBLE)
      |             / (da.d + db.d - n_shared), 6) AS jaccard
      |FROM pairs JOIN deg da ON pairs.x = da.s
      |           JOIN deg db ON pairs.y = db.s""".stripMargin) { (s, d) =>
    val ps = Tables.lineitem(s, d).filter(col("l_quantity") > 49)
      .select(col("l_partkey").as("p"), col("l_suppkey").as("sup"))
      .distinct()
    val deg = ps.groupBy(col("sup").as("node")).agg(count(lit(1)).as("deg"))
    val b = ps.select(col("p"), col("sup").as("sup2"))
    val pairs = ps.join(b, "p").filter(col("sup") < col("sup2"))
      .groupBy(least(col("sup"), col("sup2")).as("x"),
        greatest(col("sup"), col("sup2")).as("y"))
      .agg(count(lit(1)).as("n_shared"))
    pairs
      .join(broadcast(deg).withColumnRenamed("node", "x")
        .withColumnRenamed("deg", "dx"), "x")
      .join(broadcast(deg).withColumnRenamed("node", "y")
        .withColumnRenamed("deg", "dy"), "y")
      .select(col("x"), col("y"), col("n_shared"),
        round(col("n_shared").cast("double") /
          (col("dx") + col("dy") - col("n_shared")), 6).as("jaccard"))
  }

  // --------------------------------------------------- multi-source BFS

  /** Multi-source BFS hop distances over directed `edges(src, dst)`
    * from `seeds(node)`: returns (node, dist) with dist = the minimum
    * hop count from ANY seed, nodes unreachable within `maxRounds`
    * omitted. Frontier-style Pregel-lite: each round joins ONLY the
    * newly-discovered frontier against the once-partitioned cached
    * edge relation (classic BFS — a node never re-expands), so total
    * work is O(|edges reachable|) across all rounds, not
    * O(rounds × |edges|); per-round `localCheckpoint` keeps lineage
    * O(1) like the PageRank loop. No session conf is touched, so no
    * isolation machinery is needed here. Rounds are bounded by the
    * reachable eccentricity (≤ 9 measured on the gated graph at both
    * scales; cap 16 = the g2 oracle's margin).
    */
  def bfsDistances(edges: DataFrame, seeds: DataFrame,
      maxRounds: Int = 16): DataFrame = {
    val e = edges.select(col("src").cast("long").as("src"),
        col("dst").cast("long").as("dst"))
      .repartition(col("src")).cache()
    e.count()
    try {
      var dist = seeds.select(col("node").cast("long").as("node")).distinct()
        .withColumn("dist", lit(0L)).localCheckpoint()
      var frontier = dist
      var r = 0L
      while (r < maxRounds && frontier.head(1).nonEmpty) {
        val cand = frontier.select(col("node").as("src")).join(e, "src")
          .select(col("dst").as("node")).distinct()
        frontier = cand
          .join(dist.select("node"), Seq("node"), "left_anti")
          .withColumn("dist", lit(r + 1L)).localCheckpoint()
        dist = dist.unionByName(frontier).localCheckpoint()
        r += 1
      }
      dist
    } finally e.unpersist()
  }

  /** G6 — BFS hop distance on the g2 sparse part↔supplier graph from
    * the five smallest node ids (a deterministic multi-seed set). FULL
    * DuckDB oracle: a native recursive CTE explores (node, depth)
    * pairs to the same 16-round cap and takes the per-node minimum —
    * frontier scheduling changes the work, never the distances.
    */
  val g6 = QueryDef.sql(
    "g6_bfs_distance",
    """WITH RECURSIVE e AS (
      |  SELECT DISTINCT l_partkey * 2 AS src, l_suppkey * 2 + 1 AS dst
      |  FROM lineitem WHERE l_quantity > 49 AND l_discount > 0.07),
      |bi AS (SELECT src, dst FROM e UNION ALL SELECT dst, src FROM e),
      |seeds AS (SELECT node FROM (SELECT DISTINCT src AS node FROM bi) n
      |          ORDER BY node LIMIT 5),
      |bfs AS (
      |  SELECT node, 0 AS d FROM seeds
      |  UNION
      |  SELECT bi.dst, bfs.d + 1 FROM bfs JOIN bi ON bi.src = bfs.node
      |  WHERE bfs.d < 16)
      |SELECT node, CAST(min(d) AS BIGINT) AS dist
      |FROM bfs GROUP BY 1""".stripMargin) { (s, d) =>
    val le = Tables.lineitem(s, d)
      .filter(col("l_quantity") > 49 && col("l_discount") > 0.07)
      .select((col("l_partkey") * 2).cast("long").as("src"),
        (col("l_suppkey") * 2 + 1).cast("long").as("dst"))
      .distinct()
    val bi = le.union(le.select(col("dst").as("src"), col("src").as("dst")))
    val seeds = bi.select(col("src").as("node")).distinct()
      .orderBy("node").limit(5)
    bfsDistances(bi, seeds, maxRounds = 16)
  }

  def all: Seq[QueryDef] = Seq(g1, g2, g3, g4, g5, g6)
}
