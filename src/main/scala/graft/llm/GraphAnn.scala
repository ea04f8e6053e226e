package graft.llm

import graft.{QueryDef, Tables}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window

/** Graph-based ANN (NSW family): beam search over a PERSISTED k-NN
  * neighbor graph — the fourth production vector-index family next to
  * LSH (v2), IVF (v4), PQ/IVF-PQ (v11/v12) and the stored-IVF-PQ path
  * (v19). Design follows the navigable-small-world line (Malkov &
  * Yashunin, TPAMI 2020) re-expressed for Spark's batch shape: HNSW's
  * in-memory priority-queue walk is inherently sequential, so the
  * Spark-native equivalent processes ALL queries' walks side by side —
  * each beam round is one join against the edge table plus one
  * windowed top-B, i.e. `rounds` joins total for the whole query set
  * instead of a per-query pointer chase.
  *
  * Build ([[buildNeighborGraph]]): candidate pairs come from shared
  * coarse cells (the same fused-Lloyd quantizer the IVF family uses) —
  * within-cell exact cosine, windowed top-M per node, then
  * symmetrized. Work is Σ_cells |cell|² — with nCells grown ~√N the
  * standard N^1.5 graph-construction bound, never the all-pairs N².
  * Long-range navigability comes from the symmetrized union plus the
  * multi-entry search, not from HNSW's layer hierarchy (layers buy
  * O(log N) hop-depth for a SINGLE walker; a batched beam with spread
  * entry points reaches the same neighborhoods in a fixed small round
  * count).
  *
  * Search ([[beamSearch]]): a fixed set of entry nodes seeds every
  * query's beam; each round expands the beam's out-edges, scores exact
  * cosine against the query (edge expansion is candidate-bounded:
  * beam × degree rows per query per round), keeps the top `beam` by
  * score, and the union with the previous beam makes the best-found
  * set monotone — convergence is by bounded rounds, the batch analog
  * of HNSW's ef-search frontier.
  *
  * The graph persists like v19's index ([[ensure]]): corpus
  * fingerprint in meta, edges as parquet, build once / search many.
  */
object GraphAnn {

  @volatile var buildsThisProcess: Int = 0

  /** Within-cell exact top-M neighbor edges, symmetrized then
    * degree-capped at 2M (HNSW's max-connections move: symmetrization
    * alone leaves hub nodes with unbounded in-degree — a skew source at
    * scale — so each node keeps only its 2M strongest edges; the cap
    * can re-orphan one direction of a weak edge, which is fine for a
    * directed beam search). Returns (src, dst, sim). */
  def buildNeighborGraph(corpus: DataFrame, m: Int = 16,
      nCells: Int = 16): DataFrame = {
    val centroids = Similarity.pqTrain(corpus, 1, nCells).head
    val bc = corpus.sparkSession.sparkContext.broadcast(centroids)
    val cellOf =
      udf { (v: Seq[Float]) => Similarity.nearestCellKernel(bc.value, v) }
    val celled = corpus.select(col("vec_id"), col("embedding"),
      cellOf(col("embedding")).as("cell"))
    val a = celled.select(col("cell"), col("vec_id").as("src"),
      col("embedding").as("sv"))
    val b = celled.select(col("cell"), col("vec_id").as("dst"),
      col("embedding").as("dv"))
    val w = Window.partitionBy("src").orderBy(col("sim").desc, col("dst").asc)
    val knn = a.join(b, "cell")
      .filter(col("src") =!= col("dst"))
      .withColumn("sim", round(Similarity.cosine(col("sv"), col("dv")), 6))
      .withColumn("rank", row_number().over(w))
      .filter(col("rank") <= m)
      .select(col("src"), col("dst"), col("sim"))
    knn.unionByName(
        knn.select(col("dst").as("src"), col("src").as("dst"), col("sim")))
      .groupBy("src", "dst").agg(max(col("sim")).as("sim"))
      .withColumn("rank", row_number().over(w))
      .filter(col("rank") <= 2 * m)
      .select(col("src"), col("dst"), col("sim"))
  }

  private def fingerprint(corpus: DataFrame): (Long, Long) = {
    val r = corpus
      .agg(count(lit(1)), expr("bit_xor(xxhash64(vec_id, embedding))"))
      .head()
    (r.getLong(0), if (r.isNullAt(1)) 0L else r.getLong(1))
  }

  /** Load the stored graph if its fingerprint matches `corpus`, else
    * (re)build and persist — v19's build-once contract. */
  def ensure(corpus: DataFrame, dir: String, m: Int = 16,
      nCells: Int = 16): DataFrame = {
    val spark = corpus.sparkSession
    import spark.implicits._
    val (n, sum) = fingerprint(corpus)
    val valid = try {
      val meta = spark.read.parquet(s"$dir/meta").head()
      meta.getAs[Long]("n_vectors") == n &&
        meta.getAs[Long]("checksum") == sum &&
        meta.getAs[Int]("m") == m && meta.getAs[Int]("n_cells") == nCells
    } catch { case _: Throwable => false }
    if (!valid) {
      buildsThisProcess += 1
      graft.util.Fs.rmRecursive(new java.io.File(dir))
      buildNeighborGraph(corpus, m, nCells)
        .write.mode("overwrite").parquet(s"$dir/edges")
      Seq((n, sum, m, nCells, 1))
        .toDF("n_vectors", "checksum", "m", "n_cells", "format_version")
        .repartition(1).write.mode("overwrite").parquet(s"$dir/meta")
    }
    spark.read.parquet(s"$dir/edges")
  }

  /** Batched beam search: every query walks the graph simultaneously;
    * one edge join + one window per round. Entry nodes are the
    * `entries` lowest corpus ids past the probe panel (deterministic,
    * and — like pqTrain's seeds — outside the panel every recall gate
    * queries with). */
  def beamSearch(queries: DataFrame, graph: DataFrame, corpus: DataFrame,
      k: Int, beam: Int = 32, rounds: Int = 4, entries: Int = 16): DataFrame = {
    // defaults measured on the near-isotropic gate corpus (the hard
    // regime): m=16/beam=32/rounds=4/entries=16 -> recall@1 1.0 / 0.975
    // / 0.85 at sf0.001/0.01/0.1, vs 0.3-0.48 at m=10/beam=16 -- degree
    // and entry spread, not rounds, are what buy navigability here
    val entryIds = corpus
      .filter(col("vec_id") >= Similarity.ProbePanelSize)
      .orderBy(col("vec_id")).limit(entries)
      .select(col("vec_id")).collect().map(_.getLong(0))
    val q = queries.select(col("vec_id").as("qid"), col("embedding").as("qv"))
    val emb = corpus.select(col("vec_id").as("nid"), col("embedding").as("nv"))
    val edges = graph.select(col("src"), col("dst"))
    val w = Window.partitionBy("qid").orderBy(col("sim").desc, col("nid").asc)
    def score(cands: DataFrame): DataFrame = cands
      .join(emb, "nid").join(q, "qid")
      .filter(col("qid") =!= col("nid"))
      .withColumn("sim", round(Similarity.cosine(col("qv"), col("nv")), 6))
      .withColumn("rank", row_number().over(w))
      .filter(col("rank") <= beam)
      .select(col("qid"), col("nid"), col("sim"))
    var beamDf = score(
      q.select(col("qid"), explode(typedLit(entryIds.toSeq)).as("nid")))
      .localCheckpoint(eager = true)
    var r = 0
    while (r < rounds) {
      val expanded = beamDf.select(col("qid"), col("nid").as("src"))
        .join(edges, "src").select(col("qid"), col("dst").as("nid"))
        .unionByName(beamDf.select(col("qid"), col("nid")))
        .distinct()
      // localCheckpoint per round: the beam is |Q|·beam rows — pinning
      // it keeps every round's plan two joins deep instead of r·2
      beamDf = score(expanded).localCheckpoint(eager = true)
      r += 1
    }
    beamDf
      .withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
      .select(col("qid"), col("rank"), col("nid"), col("sim"))
  }

  private def graphDirFor(sfDir: String): String =
    graft.util.Fixtures.dir + "/v20_graph/" +
      sfDir.replaceAll("[^A-Za-z0-9._-]", "_")

  /** V20 — graph-ANN recall gate, v19-hardened: emitted rows are the
    * exact brute-force truth (same oracle as v1/v19); they emit only
    * when beam search over the STORED neighbor graph reaches
    * recall@1 ≥ 0.6 (the IVF bar) and the persisted meta matches the
    * corpus. Completes the production index-family survey:
    * LSH / IVF / PQ / IVF-PQ / stored-IVF-PQ / neighbor-graph.
    */
  val graphAnn = QueryDef(
    "v20_graph_ann_recall",
    { (s, d) =>
      val emb = Tables.embeddings(s, d).select(col("vec_id"), col("embedding"))
        .cache()
      val graph = ensure(emb, graphDirFor(d))
      val queries = Similarity.probePanel(emb)
      val exact = Similarity.bruteForceTop1(queries, emb)
        .localCheckpoint(eager = true)
      val approx = beamSearch(queries, graph, emb, k = 1)
        .select(col("qid"), col("nid").as("nid_g"))
      val joined = exact.join(approx, Seq("qid"), "left").cache()
      val nQ = joined.count().toDouble
      val hits = joined.filter(col("nid") === col("nid_g")).count().toDouble
      joined.unpersist(); emb.unpersist()
      exact.filter(lit(hits / nQ >= 0.6 && nQ > 0))
        .select(col("qid"), col("nid"), col("sim"))
    },
    oracle = Some(
      """WITH q AS (SELECT vec_id AS qid, CAST(embedding AS DOUBLE[]) AS qv
        |           FROM embeddings WHERE vec_id < 40),
        |s AS (SELECT qid, e.vec_id AS nid,
        |             round(list_cosine_similarity(qv, CAST(e.embedding AS DOUBLE[])), 6) AS sim
        |      FROM q, embeddings e WHERE e.vec_id != qid),
        |r AS (SELECT qid, nid, sim,
        |             row_number() OVER (PARTITION BY qid
        |                                ORDER BY sim DESC, nid) AS rn
        |      FROM s)
        |SELECT qid, nid, sim FROM r WHERE rn = 1""".stripMargin))

  def all: Seq[QueryDef] = Seq(graphAnn)
}
