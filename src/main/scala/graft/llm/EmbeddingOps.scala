package graft.llm

import graft.{QueryDef, Tables}
import org.apache.spark.sql.{DataFrame, Row}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Embedding-corpus analytics beyond search: distributed PCA (the
  * dimensionality-reduction lever for a 100 TB embedding store) and
  * SemDeDup-style semantic deduplication (cluster-then-dedup, the
  * published web-scale curation recipe of Abbas et al. 2023,
  * arXiv:2303.09540).
  *
  * Scale design:
  *   - PCA never shuffles vectors: one `treeAggregate` pass folds every
  *     row into an O(d²) moment accumulator (d = 64 here ⇒ 4 KB of
  *     state), the d×d eigendecomposition runs on the driver in
  *     microseconds, and the projection is a broadcast-basis map-side
  *     kernel. Corpus size only affects the single scan.
  *   - semantic dedup compares vectors only WITHIN a KMeans cell — the
  *     paper's contract is k grows with n so cells stay small. Cells
  *     that exceed `maxCellSize` anyway are thinned to a
  *     centroid-similarity-ordered adjacent chain (near-identical
  *     vectors have near-identical centroid cosine, so true dups stay
  *     adjacent), the same documented best-effort shape as
  *     [[Dedup]]'s hot-bucket cap — never an unbounded within-cell
  *     cross product.
  */
object EmbeddingOps {

  // ------------------------------------------------------------- PCA

  /** Principal axes of an embedding corpus. `components(j)` is the j-th
    * axis (length d); `eigenvalues` are the matching covariance
    * eigenvalues, descending. Population covariance (divide by n) so
    * `eigenvalues.sum` equals the summed per-dimension `var_pop`.
    */
  final case class PcaBasis(mean: Array[Double],
      components: Array[Array[Double]], eigenvalues: Array[Double]) {
    def dim: Int = mean.length
  }

  /** O(d²) raw-moment accumulator: n, Σx, Σxxᵀ. */
  private final class MomentAcc(val d: Int) extends Serializable {
    var n = 0L
    val s = new Array[Double](d)
    val g = new Array[Double](d * d)
    def add(x: Array[Double]): MomentAcc = {
      n += 1
      var i = 0
      while (i < d) {
        val xi = x(i)
        s(i) += xi
        var j = 0
        val off = i * d
        while (j < d) { g(off + j) += xi * x(j); j += 1 }
        i += 1
      }
      this
    }
    def merge(o: MomentAcc): MomentAcc = {
      n += o.n
      var i = 0
      while (i < d) { s(i) += o.s(i); i += 1 }
      i = 0
      while (i < d * d) { g(i) += o.g(i); i += 1 }
      this
    }
  }

  private def toDoubles(xs: Seq[Any], d: Int): Array[Double] = {
    val out = new Array[Double](d)
    var i = 0
    val it = xs.iterator
    while (it.hasNext && i < d) {
      out(i) = it.next() match {
        case f: java.lang.Float => f.toDouble
        case dd: java.lang.Double => dd.doubleValue()
        case n: java.lang.Number => n.doubleValue()
        case null => Double.NaN
      }
      i += 1
    }
    out
  }

  /** One-pass distributed PCA: treeAggregate raw moments (the A6
    * CᵀC shape — see ml/Deconfound.massOlsBetas), covariance on the
    * driver, symmetric eigendecomposition via breeze `eigSym`
    * (shipped with Spark MLlib). Null vectors are skipped.
    */
  def pcaBasis(emb: DataFrame, vecCol: String = "embedding",
      dim: Int): PcaBasis = {
    require(dim > 0, "dim must be positive")
    val acc = emb.select(col(vecCol)).na.drop().rdd.treeAggregate(
      new MomentAcc(dim))(
      seqOp = (a, r) => {
        val xs = r.getSeq[Any](0)
        // fail loudly on a ragged corpus — zero-padding a short vector
        // would silently bias the covariance
        require(xs.length == dim,
          s"pcaBasis: vector of length ${xs.length}, expected $dim")
        a.add(toDoubles(xs, dim))
      },
      combOp = (l, r) => l.merge(r),
      depth = 2)
    require(acc.n > 0, "pcaBasis: no non-null vectors")
    val n = acc.n.toDouble
    val mean = acc.s.map(_ / n)
    val cov = breeze.linalg.DenseMatrix.zeros[Double](dim, dim)
    var i = 0
    while (i < dim) {
      var j = 0
      while (j < dim) {
        cov(i, j) = acc.g(i * dim + j) / n - mean(i) * mean(j)
        j += 1
      }
      i += 1
    }
    val es = breeze.linalg.eigSym(cov)
    // breeze returns eigenvalues ascending; flip to descending
    val order = es.eigenvalues.toArray.zipWithIndex.sortBy(-_._1)
    val eigs = order.map(_._1)
    val comps = order.map { case (_, c) =>
      Array.tabulate(dim)(r => es.eigenvectors(r, c))
    }
    PcaBasis(mean, comps, eigs)
  }

  /** Append the top-k PCA projection (`outCol`, float array) and, when
    * `withError` is set, the full-double reconstruction max-abs error
    * (`<outCol>_err`) computed from the SAME pass — the exactness
    * witness for k = d. Broadcast basis, map-side kernel, no shuffle.
    */
  def projectEmbeddings(df: DataFrame, basis: PcaBasis, k: Int,
      vecCol: String = "embedding", outCol: String = "proj",
      withError: Boolean = false): DataFrame = {
    require(k >= 1 && k <= basis.dim, s"k=$k out of range 1..${basis.dim}")
    val spark = df.sparkSession
    val idx = df.schema.fieldIndex(vecCol)
    val d = basis.dim
    val base = df.schema.add(outCol, ArrayType(FloatType, containsNull = false))
    val outSchema = if (withError) base.add(s"${outCol}_err", DoubleType) else base
    val bc = spark.sparkContext.broadcast((basis.mean, basis.components.take(k)))
    val kk = k
    val we = withError
    val out = df.rdd.mapPartitions { it =>
      val (mean, w) = bc.value
      it.map { row =>
        val xs = row.getSeq[Any](idx)
        if (xs == null) {
          Row.fromSeq(if (we) row.toSeq :+ null :+ null else row.toSeq :+ null)
        } else {
          val x = toDoubles(xs, d)
          val p = new Array[Double](kk)
          var j = 0
          while (j < kk) {
            val wj = w(j)
            var acc = 0.0
            var i2 = 0
            while (i2 < d) { acc += (x(i2) - mean(i2)) * wj(i2); i2 += 1 }
            p(j) = acc
            j += 1
          }
          val projF = new Array[Float](kk)
          j = 0
          while (j < kk) { projF(j) = p(j).toFloat; j += 1 }
          if (!we) Row.fromSeq(row.toSeq :+ projF.toSeq)
          else {
            // reconstruct in double from the double projection — the
            // error this reports is the basis' truncation error, not
            // float storage rounding
            var maxErr = 0.0
            var i2 = 0
            while (i2 < d) {
              var r = mean(i2)
              var j2 = 0
              while (j2 < kk) { r += p(j2) * w(j2)(i2); j2 += 1 }
              val e = math.abs(r - x(i2))
              if (e > maxErr) maxErr = e
              i2 += 1
            }
            Row.fromSeq(row.toSeq :+ projF.toSeq :+ maxErr)
          }
        }
      }
    }
    spark.createDataFrame(out, outSchema)
  }

  // -------------------------------------------------- semantic dedup

  /** Members of semantic-duplicate clusters: KMeans cells → within-cell
    * candidate pairs → exact cosine ≥ eps → connected components.
    * Output: (vec_id, cell, centroid_cos, cluster, is_keeper) — one row
    * per document that belongs to some duplicate cluster. The keeper is
    * the member LEAST similar to its cell centroid (ties: min id), the
    * SemDeDup paper's keep-the-edge-example rule.
    *
    * Cells over `maxCellSize` are thinned to an adjacent chain in
    * (centroid_cos, id) order — documented best-effort, see the object
    * doc. ids must be long-compatible (union-find reads longs).
    */
  def semanticDupGroups(emb: DataFrame, eps: Double, k: Int,
      seed: Long = 7L, maxCellSize: Int = 10000,
      idCol: String = "vec_id", vecCol: String = "embedding",
      maxIter: Int = 20): DataFrame = {
    require(eps > 0 && eps <= 1, s"eps=$eps out of (0, 1]")
    require(k >= 2, s"k=$k: the coarse quantizer needs at least 2 cells")
    val spark = emb.sparkSession
    // coarse cells only gate CANDIDATE generation (exact cosine verifies
    // every pair) — few Lloyd iterations suffice, per the SemDeDup
    // paper. Round 9: centroids from the fused-Lloyd pqTrain (m = 1) —
    // one treeAggregate per round vs spark.ml KMeans' ~20 paired jobs
    // per fit (same swap as ivfTopK; measured v10 3.6 → ~2 s), and
    // id-deterministic init instead of RNG-dependent kmeans||.
    val fv = emb.select(col(idCol).cast("long").as("id"), col(vecCol).as("v"))
      .filter(col("v").isNotNull)
    val centroids = Similarity.pqTrain(
      fv.select(col("id").as("vec_id"), col("v").as("embedding")),
      1, k, iters = maxIter).head
    val bcCents = spark.sparkContext.broadcast(centroids)
    val cellOf = udf { (v: Seq[Float]) =>
      val cs = bcCents.value
      var best = 0; var bestD = Double.MaxValue
      var c = 0
      while (c < cs.length) {
        var s2 = 0.0; var j = 0
        val cj = cs(c)
        while (j < cj.length) {
          val diff = v(j) - cj(j); s2 += diff * diff; j += 1
        }
        if (s2 < bestD) { bestD = s2; best = c }
        c += 1
      }
      best
    }
    val cents = typedLit(centroids.map(_.map(_.toFloat)))
    val assigned = fv
      .withColumn("cell", cellOf(col("v")))
      .withColumn("centroid_cos",
        round(Similarity.cosine(col("v"), element_at(cents, col("cell") + 1)), 9))
      .select(col("id"), col("v"), col("cell"), col("centroid_cos"))
      .localCheckpoint(eager = false)
    val cellCounts = assigned.groupBy("cell").count().collect() // ≤ k rows
    val hotCells = cellCounts.filter(_.getLong(1) > maxCellSize)
      .map(_.getInt(0)).toSet
    val cold =
      if (hotCells.size == cellCounts.length) null
      else {
        val c = assigned.filter(!col("cell").isInCollection(
          if (hotCells.isEmpty) Set(-1) else hotCells))
        c.select(col("id").as("id_a"), col("v").as("v_a"), col("cell"))
          .join(c.select(col("id").as("id_b"), col("v").as("v_b"), col("cell")),
            "cell")
          .filter(col("id_a") < col("id_b"))
      }
    val hot =
      if (hotCells.isEmpty) null
      else {
        val h = assigned.filter(col("cell").isInCollection(hotCells))
          .withColumn("rn", row_number().over(
            Window.partitionBy("cell").orderBy(col("centroid_cos"), col("id"))))
        h.select(col("id").as("id_a"), col("v").as("v_a"), col("cell"),
            col("rn"))
          .join(h.select(col("id").as("id_b"), col("v").as("v_b"),
            col("cell"), (col("rn") - 1).as("rn")), Seq("cell", "rn"))
          .select(col("id_a"), col("v_a"), col("cell"), col("id_b"),
            col("v_b"))
      }
    val cand = (cold, hot) match {
      case (c, null) => c
      case (null, h) => h
      case (c, h) => c.unionByName(h.select(c.columns.map(col).toIndexedSeq: _*))
    }
    val pairs = cand
      .filter(Similarity.cosine(col("v_a"), col("v_b")) >= eps)
      .select(col("id_a").as("doc_a"), col("id_b").as("doc_b"))
    val clusters = Dedup.nearDupClusters(pairs) // (doc_id, cluster)
    val members = clusters.join(
      assigned.select(col("id").as("doc_id"), col("cell"),
        col("centroid_cos")), "doc_id")
    members
      .withColumn("is_keeper", row_number().over(
        Window.partitionBy("cluster")
          .orderBy(col("centroid_cos"), col("doc_id"))) === 1)
      .select(col("doc_id").as(idCol), col("cell"), col("centroid_cos"),
        col("cluster"), col("is_keeper"))
  }

  /** SemDeDup: drop every duplicate-cluster member except its keeper.
    * Returns the surviving subset of `emb` (schema unchanged).
    */
  def semanticDedup(emb: DataFrame, eps: Double, k: Int, seed: Long = 7L,
      maxCellSize: Int = 10000, idCol: String = "vec_id",
      vecCol: String = "embedding", maxIter: Int = 20): DataFrame = {
    val losers = semanticDupGroups(emb, eps, k, seed, maxCellSize, idCol,
      vecCol, maxIter)
      .filter(!col("is_keeper"))
      .select(col(idCol))
    emb.join(losers, Seq(idCol), "left_anti")
  }

  // ---------------------------------------------------------- queries

  /** V9 — PCA spectrum gate, oracle-hardened: the output is the summed
    * per-dimension population variance (DuckDB recomputes and
    * hash-verifies it); every PCA invariant gates row emission, so a
    * broken basis empties the output:
    *   - trace parity: Σ eigenvalues == Σ var_pop within 1e-6 relative
    *     (the covariance trace is basis-independent);
    *   - eigenvalues descending, none below −1e-9;
    *   - basis orthonormality: max |WᵀW − I| < 1e-8;
    *   - full-rank reconstruction: distributed max row error < 1e-6.
    */
  val pca = QueryDef.sql(
    "v9_pca_spectrum",
    """WITH e AS (SELECT generate_subscripts(embedding, 1) AS dim,
      |                  CAST(unnest(embedding) AS DOUBLE) AS v
      |           FROM embeddings),
      |d AS (SELECT dim, var_pop(v) AS vv FROM e GROUP BY dim)
      |SELECT count(*) AS n_dims, round(sum(vv), 4) AS total_var
      |FROM d""".stripMargin) { (s, d) =>
    val emb = Tables.embeddings(s, d).select(col("vec_id"), col("embedding"))
    val dim = emb.select(size(col("embedding"))).head().getInt(0)
    val basis = pcaBasis(emb, "embedding", dim)
    val eigs = basis.eigenvalues
    val descending = eigs.zip(eigs.tail).forall { case (a, b) => a >= b }
    val nonNeg = eigs.forall(_ >= -1e-9)
    // WᵀW − I, driver-side d×d
    var orthoErr = 0.0
    var a = 0
    while (a < dim) {
      var b = 0
      while (b < dim) {
        var dot = 0.0
        var i = 0
        while (i < dim) {
          dot += basis.components(a)(i) * basis.components(b)(i); i += 1
        }
        val tgt = if (a == b) 1.0 else 0.0
        val e = math.abs(dot - tgt)
        if (e > orthoErr) orthoErr = e
        b += 1
      }
      a += 1
    }
    val maxRecon = projectEmbeddings(emb, basis, dim, withError = true)
      .agg(max(col("proj_err"))).head().getDouble(0)
    // the oracle quantity, computed relationally like the DuckDB side
    val varRow = emb
      .select(posexplode(col("embedding")).as(Seq("dim0", "x")))
      .groupBy("dim0").agg(var_pop(col("x").cast("double")).as("vv"))
      .agg(count(lit(1)).as("n_dims"), sum(col("vv")).as("tv"))
      .head()
    val totalVar = varRow.getDouble(1)
    val traceOk = math.abs(eigs.sum - totalVar) <= 1e-6 * totalVar
    import s.implicits._
    Seq((varRow.getLong(0), BigDecimal(totalVar)
      .setScale(4, BigDecimal.RoundingMode.HALF_UP).toDouble))
      .toDF("n_dims", "total_var")
      .filter(lit(descending && nonNeg && orthoErr < 1e-8 &&
        maxRecon < 1e-6 && traceOk))
  }

  /** V10 — SemDeDup gate (rows-only; KMeans cell assignment is not
    * DuckDB-replayable). Planted corpus = embeddings ∪ exact copies of
    * every vector (+1 000 000) ∪ a one-dimension-perturbed copy of every
    * 10th vector (+2 000 000, cosine ≈ 0.99998 to its source). Golden
    * checks gating emission:
    *   - every planted group resolves to ONE cluster (exact copies are
    *     bit-identical ⇒ same cell by construction);
    *   - drops == planted extras (this corpus is near-isotropic — v1's
    *     top-1 cosine ≈ 0.4 — so no natural ≥0.99 pairs exist);
    *   - survivors == corpus − drops, and exactly one member of each
    *     planted group survives.
    */
  val semdedup = QueryDef.sql(
    "v10_semantic_dedup",
    // ORACLE-HARDENED rows-only upgrade: DuckDB derives the planted
    // arithmetic (corpus size, group count, expected drops, zero bad
    // rows, expected keepers) independently from the embeddings table;
    // the engine's measured counts must hash-match it exactly, and the
    // emission filter still empties the output on any invariant break.
    """WITH n AS (SELECT count(*) AS c,
      |                  count(*) FILTER (WHERE vec_id % 10 = 0) AS p
      |           FROM embeddings)
      |SELECT CAST(2 * c + p AS BIGINT) AS n_corpus,
      |       CAST(c AS BIGINT) AS n_groups,
      |       CAST(c + p AS BIGINT) AS n_dropped,
      |       CAST(0 AS BIGINT) AS bad_groups,
      |       CAST(0 AS BIGINT) AS bad_kept,
      |       CAST(c AS BIGINT) AS n_kept
      |FROM n""".stripMargin) { (s, d) =>
    val emb = Tables.embeddings(s, d).select(col("vec_id"), col("embedding"))
    val perturbed = emb.filter(col("vec_id") % 10 === 0)
      .select((col("vec_id") + 2000000).as("vec_id"),
        transform(col("embedding"),
          (x, i) => when(i === 0, x * lit(1.05f) + lit(0.001f)).otherwise(x))
          .as("embedding"))
    val u = emb
      .unionByName(emb.select((col("vec_id") + 1000000).as("vec_id"),
        col("embedding")))
      .unionByName(perturbed)
    val nOrig = emb.count()
    val nPert = perturbed.count()
    val nCorpus = nOrig * 2 + nPert
    val groups = semanticDupGroups(u, eps = 0.99, k = 16, maxIter = 5)
      .localCheckpoint(eager = false)
    // group integrity: members of base id b are {b, b+1M, (b+2M)?} —
    // they must share one cluster label, and every base id must appear.
    // One aggregate row carries nDropped + badGroups + nBases (three
    // former actions): the gate arithmetic, not the operator, so fewer
    // jobs means less single-shot scheduler noise in the bench.
    // coalesce: on an empty groups frame the sums are NULL (count is 0)
    // — the gate must then emit zero rows via its filter, not NPE here
    val gRow = groups
      .withColumn("base", col("vec_id") % 1000000)
      .groupBy("base")
      .agg(countDistinct(col("cluster")).as("n_clusters"),
        sum(when(!col("is_keeper"), 1L).otherwise(0L)).as("n_dropped"))
      .agg(count(lit(1)),
        coalesce(sum(when(col("n_clusters") =!= 1, 1L).otherwise(0L)), lit(0L)),
        coalesce(sum(col("n_dropped")), lit(0L)))
      .head()
    val nBases = gRow.getLong(0)
    val badGroups = gRow.getLong(1)
    val nDropped = gRow.getLong(2)
    // survivors from the SAME groups result (semanticDedup re-runs the
    // whole pipeline incl. the KMeans fit — one fit is enough here; the
    // anti-join below is exactly its apply step)
    val survivors = u.join(
      groups.filter(!col("is_keeper")).select("vec_id"),
      Seq("vec_id"), "left_anti")
    val nKept = survivors.count()
    val keptPerBase = survivors
      .join(groups.select("vec_id"), Seq("vec_id"))
      .groupBy((col("vec_id") % 1000000).as("base")).count()
    val badKept = keptPerBase.filter(col("count") =!= 1).count()
    import s.implicits._
    Seq((nCorpus, nBases, nDropped, badGroups, badKept, nKept))
      .toDF("n_corpus", "n_groups", "n_dropped", "bad_groups", "bad_kept",
        "n_kept")
      .filter(col("n_groups") === nOrig && col("n_dropped") === nOrig + nPert &&
        col("bad_groups") === 0 && col("bad_kept") === 0 &&
        col("n_kept") === nCorpus - nDropped)
  }

  def all: Seq[QueryDef] = Seq(pca, semdedup)
}
