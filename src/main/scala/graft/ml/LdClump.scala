package graft.ml

import graft.QueryDef
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** LD clumping — the engine analog of the reference QC DAG's plink
  * `--clump` step (`workflows/preprocessing/Snakefile:106-155` with
  * `clump_kb/clump_p1/clump_p2/clump_r2` from config.yaml:14-19),
  * which runs immediately after the MAF filter and prunes the SNP set
  * to per-locus index SNPs before ML ingest.
  *
  * Semantics (plink 1.9 --clump, public documentation): order SNPs
  * with association p ≤ p1 by ascending p; the best unassigned SNP
  * becomes a clump INDEX and absorbs every still-unassigned SNP
  * within `kb` kilobases on the same chromosome whose squared Pearson
  * correlation (r²) of dosage vectors with the index is ≥ `r2` and
  * whose p ≤ p2. Repeat until no candidates remain. The kept set (the
  * reference's `--extract` snplist) is exactly the index SNPs; SNPs
  * absent from the sumstats never enter clumping and are dropped.
  *
  * Spark shape, designed for genome scale:
  *  - r² needs only second moments, so the windowed pair statistics
  *    come from ONE `treeAggregate` pass over the dosage matrix (the
  *    A6 CᵀC pattern, Deconfound.massOlsBetas): per in-window pair we
  *    accumulate (n, Σx, Σy, Σx², Σy², Σxy) over pairwise-complete
  *    rows — plink's own missing-data policy. The accumulator is
  *    O(window pairs), NOT O(p²): sorted by (chr, pos), each SNP only
  *    pairs forward inside its kb window.
  *  - At 100 TB / millions of SNPs, the SNP axis IS sliced into
  *    (block + kb halo) column ranges and the same pass runs per
  *    slice (`bandedR2`'s `maxPairsPerPass`, default
  *    [[DefaultMaxPairsPerPass]]) — column pruning keeps each pass's
  *    work to its slice, pair enumeration happens per slice, and
  *    slices are independent jobs. The greedy selection is inherently
  *    sequential (each clump consumes candidates), but it only needs
  *    the SPARSE pairs with r² ≥ threshold, per chromosome — driver
  *    state O(kept pairs), chromosomes independent.
  */
object LdClump {

  /** One SNP's clumping metadata: `idx` = its position in the features
    * array (file order), genomic (chr, pos), association p-value. */
  final case class SnpInfo(idx: Int, name: String, chr: Int, pos: Long,
      p: Double)

  /** plink --clump knobs; defaults = the reference config.yaml:15-18
    * (kb=1000, p1=1, p2=1, r2=0.75). */
  final case class ClumpParams(kb: Int = 1000, p1: Double = 1.0,
      p2: Double = 1.0, r2: Double = 0.75) {
    require(kb > 0 && r2 >= 0 && r2 <= 1 && p1 >= 0 && p2 >= 0,
      s"invalid clump params: $this")
  }

  /** All (a, b) SnpInfo pairs with a before b in (chr, pos) order,
    * same chr, pos diff ≤ kb·1000 — enumerated over the (chr, pos)
    * sort so the count is O(p × window width), never O(p²). */
  private[ml] def windowPairs(snps: Seq[SnpInfo], kb: Int): Array[(SnpInfo, SnpInfo)] = {
    val sorted = snps.sortBy(s => (s.chr, s.pos, s.idx)).toArray
    val bp = kb.toLong * 1000L
    val out = Array.newBuilder[(SnpInfo, SnpInfo)]
    var i = 0
    while (i < sorted.length) {
      var j = i + 1
      while (j < sorted.length && sorted(j).chr == sorted(i).chr &&
          sorted(j).pos - sorted(i).pos <= bp) {
        out += ((sorted(i), sorted(j)))
        j += 1
      }
      i += 1
    }
    out.result()
  }

  /** Pairwise-complete second-moment sums for every in-window pair. */
  private final class PairAcc(val nP: Int) extends Serializable {
    val n = new Array[Long](nP)
    val sx = new Array[Double](nP); val sy = new Array[Double](nP)
    val sxx = new Array[Double](nP); val syy = new Array[Double](nP)
    val sxy = new Array[Double](nP)
    def merge(o: PairAcc): PairAcc = {
      var i = 0
      while (i < nP) {
        n(i) += o.n(i); sx(i) += o.sx(i); sy(i) += o.sy(i)
        sxx(i) += o.sxx(i); syy(i) += o.syy(i); sxy(i) += o.sxy(i)
        i += 1
      }
      this
    }
  }

  /** Memory budget for one r² pass: pairs per treeAggregate. 48 bytes of
    * accumulator state per pair → 2M pairs ≈ 96 MB per task-local
    * accumulator. The production shape (215k SNPs × 1 Mb windows ≈ 21M
    * pairs) slices into ~11 independent passes instead of one multi-GB
    * accumulator + driver array. */
  val DefaultMaxPairsPerPass: Long = 2L * 1024 * 1024

  /** One column slice of the (chr, pos)-sorted SNP axis: core SNPs
    * [coreStart, coreEnd) own their forward window pairs; the halo
    * [coreEnd, haloEnd) carries the SNPs those windows reach into.
    * Slices partition the global pair set exactly (every in-window pair
    * is owned by its earlier SNP's slice, once). */
  private[ml] final case class Slice(coreStart: Int, coreEnd: Int,
      haloEnd: Int, pairCount: Long)

  /** Cut the sorted SNP axis into core+halo slices so each slice's
    * owned-pair count stays ≤ maxPairs (a single SNP whose own window
    * exceeds the budget gets a singleton slice — its window width is the
    * hard floor). Window counts come from one two-pointer sweep, so
    * slicing is O(p) on the driver with O(1) extra state per slice. */
  private[ml] def sliceRanges(sorted: Array[SnpInfo], kb: Int,
      maxPairs: Long): Seq[Slice] = {
    val p = sorted.length
    if (p == 0) return Seq.empty
    val bp = kb.toLong * 1000L
    // forward in-window neighbor count per SNP (two-pointer: j only moves
    // forward, so the sweep is O(p) total)
    val w = new Array[Int](p)
    var j = 0
    var i = 0
    while (i < p) {
      if (j < i + 1) j = i + 1
      while (j < p && sorted(j).chr == sorted(i).chr &&
          sorted(j).pos - sorted(i).pos <= bp) j += 1
      w(i) = j - i - 1
      i += 1
    }
    def haloEndFor(coreEnd: Int): Int = {
      val last = sorted(coreEnd - 1)
      var h = coreEnd
      while (h < p && sorted(h).chr == last.chr &&
          sorted(h).pos - last.pos <= bp) h += 1
      h
    }
    val out = Seq.newBuilder[Slice]
    var start = 0
    var cum = 0L
    i = 0
    while (i < p) {
      if (cum + w(i) > maxPairs && i > start) {
        out += Slice(start, i, haloEndFor(i), cum)
        start = i
        cum = 0L
      }
      cum += w(i)
      i += 1
    }
    out += Slice(start, p, p, cum)
    out.result()
  }

  /** One treeAggregate pass: pairwise-complete second moments → r².
    * `cols` = the GLOBAL array positions this slice touches (core +
    * halo); `ia`/`ib` index into `cols`. Only those elements of each
    * row's dosage array are decoded — per-row work is O(slice width +
    * slice pairs), independent of total SNP count. (The dosage layout
    * is one array column, so element pruning must happen here — there
    * is no narrower Catalyst projection of an array.) Zero-variance
    * (monomorphic) sides get r² = 0. */
  private def passR2(rows: DataFrame, cols: Array[Int], ia: Array[Int],
      ib: Array[Int]): Array[Double] = {
    val nP = ia.length
    val agg = rows.rdd.treeAggregate(new PairAcc(nP))(
      seqOp = (acc, row) => {
        val feats = row.getSeq[Any](0)
        val f = new Array[Double](cols.length)
        var t = 0
        while (t < cols.length) {
          f(t) = feats(cols(t)) match {
            case null => Double.NaN
            case fl: java.lang.Float => fl.toDouble
            case d: java.lang.Double => d.doubleValue()
            case x: java.lang.Number => x.doubleValue()
          }
          t += 1
        }
        var i = 0
        while (i < acc.nP) {
          val x = f(ia(i)); val y = f(ib(i))
          if (!java.lang.Double.isNaN(x) && !java.lang.Double.isNaN(y)) {
            acc.n(i) += 1
            acc.sx(i) += x; acc.sy(i) += y
            acc.sxx(i) += x * x; acc.syy(i) += y * y
            acc.sxy(i) += x * y
          }
          i += 1
        }
        acc
      },
      combOp = (a, b) => a.merge(b))
    Array.tabulate(nP) { i =>
      val n = agg.n(i).toDouble
      val covN = n * agg.sxy(i) - agg.sx(i) * agg.sy(i)
      val vxN = n * agg.sxx(i) - agg.sx(i) * agg.sx(i)
      val vyN = n * agg.syy(i) - agg.sy(i) * agg.sy(i)
      if (n < 2 || vxN <= 0 || vyN <= 0) 0.0
      else (covN * covN) / (vxN * vyN)
    }
  }

  /** r² of dosage vectors for every in-window SNP pair over `geno`
    * (rows = samples, `featuresCol` = array of dosages in file order).
    * Pairwise-complete: a row where either dosage is NaN/null
    * contributes nothing to that pair. Zero-variance (monomorphic)
    * sides get r² = 0.
    *
    * The SNP axis is cut into (core block + kb halo) column slices so
    * no single pass's accumulator exceeds `maxPairsPerPass` pairs
    * (~48 bytes each): each slice re-runs the treeAggregate decoding
    * only its own elements of the dosage array, and pair enumeration
    * happens per slice — driver peak state is O(maxPairsPerPass +
    * output) and per-row pass work is O(slice width), not O(total
    * window pairs) / O(p). Slices own disjoint pair sets, so the union
    * over slices is exactly the global in-window pair list; the
    * per-pair arithmetic is identical regardless of slicing. */
  def bandedR2(geno: DataFrame, featuresCol: String, snps: Seq[SnpInfo],
      kb: Int, maxPairsPerPass: Long = DefaultMaxPairsPerPass): Seq[(SnpInfo, SnpInfo, Double)] = {
    require(maxPairsPerPass > 0, s"maxPairsPerPass must be > 0: $maxPairsPerPass")
    val sorted = snps.sortBy(s => (s.chr, s.pos, s.idx)).toArray
    val bp = kb.toLong * 1000L
    val rows = geno.select(col(featuresCol))
    val out = Seq.newBuilder[(SnpInfo, SnpInfo, Double)]
    sliceRanges(sorted, kb, maxPairsPerPass).foreach { sl =>
      val slice = sorted.slice(sl.coreStart, sl.haloEnd)
      if (slice.length >= 2) {
        // enumerate this slice's owned pairs: first element in the core
        val local = slice.iterator.map(_.idx).zipWithIndex.toMap
        val pa = Array.newBuilder[SnpInfo]; val pb = Array.newBuilder[SnpInfo]
        val ia = Array.newBuilder[Int]; val ib = Array.newBuilder[Int]
        var nPairs = 0L
        var i = sl.coreStart
        while (i < sl.coreEnd) {
          var j = i + 1
          while (j < sl.haloEnd && sorted(j).chr == sorted(i).chr &&
              sorted(j).pos - sorted(i).pos <= bp) {
            pa += sorted(i); pb += sorted(j)
            ia += local(sorted(i).idx); ib += local(sorted(j).idx)
            nPairs += 1
            j += 1
          }
          i += 1
        }
        // budget invariant: only a single-SNP slice may exceed it (its
        // one window is unsplittable)
        assert(nPairs <= maxPairsPerPass || sl.coreEnd - sl.coreStart == 1,
          s"slice pair count $nPairs exceeds budget $maxPairsPerPass")
        if (nPairs > 0) {
          val r2 = passR2(rows, slice.map(_.idx), ia.result(), ib.result())
          val a = pa.result(); val b = pb.result()
          var k = 0
          while (k < a.length) { out += ((a(k), b(k), r2(k))); k += 1 }
        }
      }
    }
    out.result()
  }

  /** Greedy p-ordered clump formation over precomputed in-window r²
    * pairs. Returns (index SNPs in selection order, index idx →
    * absorbed member idxs). Ties in p break by file order (idx) —
    * deterministic. Only pairs with r² ≥ params.r2 matter; callers at
    * scale should filter before collecting.
    */
  def clump(snps: Seq[SnpInfo], r2pairs: Seq[(SnpInfo, SnpInfo, Double)],
      params: ClumpParams): (Seq[SnpInfo], Map[Int, Seq[Int]]) = {
    val adj = scala.collection.mutable.HashMap
      .empty[Int, List[SnpInfo]].withDefaultValue(Nil)
    r2pairs.foreach { case (a, b, r2) =>
      if (r2 >= params.r2) {
        adj(a.idx) = b :: adj(a.idx)
        adj(b.idx) = a :: adj(b.idx)
      }
    }
    val assigned = scala.collection.mutable.HashSet.empty[Int]
    val kept = Seq.newBuilder[SnpInfo]
    val members = Map.newBuilder[Int, Seq[Int]]
    snps.filter(_.p <= params.p1).sortBy(s => (s.p, s.idx)).foreach { s =>
      if (!assigned.contains(s.idx)) {
        assigned += s.idx
        val absorbed = adj(s.idx)
          .filter(m => !assigned.contains(m.idx) && m.p <= params.p2)
          .map(_.idx).sorted
        absorbed.foreach(assigned += _)
        kept += s
        members += s.idx -> absorbed
      }
    }
    (kept.result(), members.result())
  }

  /** One-call form for ingest: feature-array indices to KEEP (ascending
    * file order), = the clump index SNPs. */
  def clumpIndexIdx(geno: DataFrame, featuresCol: String,
      snps: Seq[SnpInfo], params: ClumpParams): Seq[Int] = {
    val pairs = bandedR2(geno, featuresCol, snps, params.kb)
    clump(snps, pairs, params)._1.map(_.idx).sorted
  }

  /** Sumstats TSV (the reference's `--clump` input: config.yaml
    * clump_snp_field/clump_field name the SNP and p columns; chr/pos
    * ride along because the engine has no .bim) joined to the .raw
    * column table → SnpInfo per sumstats-covered SNP. SNPs missing
    * from the sumstats are dropped from clumping — and therefore from
    * the kept set — exactly like plink's snplist + --extract.
    */
  def fromSumstats(spark: SparkSession, path: String, cols: DataFrame,
      snpField: String, pField: String): Seq[SnpInfo] = {
    val ss = spark.read.option("header", "true").option("delimiter", "\t")
      .csv(path)
    Seq(snpField, "chr", "pos", pField).foreach(c =>
      require(ss.columns.contains(c),
        s"sumstats $path lacks column '$c' (has ${ss.columns.mkString(",")})"))
    val byName = ss.select(col(snpField), col("chr").cast("int"),
        col("pos").cast("long"), col(pField).cast("double"))
      .collect()
      .map(r => r.getString(0) -> (r.getInt(1), r.getLong(2), r.getDouble(3)))
      .toMap
    cols.collect().flatMap { r =>
      val (idx, name) = (r.getInt(0), r.getString(1))
      byName.get(name).map { case (c, bp, p) => SnpInfo(idx, name, c, bp, p) }
    }.toSeq
  }

  // ---------------------------------------------------------------- query

  /** Deterministic dosage patterns for the m14 fixture: over 297
    * samples (a multiple of 9), `base` = id%3 and `ind` = (id/3)%3 hit
    * all 9 value combinations equally often, so corr(base, ind) is
    * EXACTLY zero; `anti` = 2−base has r² exactly 1 with base. */
  private def pattern(id: Long, kind: String): Double = kind match {
    case "base" => (id % 3).toDouble
    case "anti" => 2.0 - (id % 3).toDouble
    case "ind" => ((id / 3) % 3).toDouble
  }

  /** The m14 fixture's SNP metadata (chr-1 LD block + isolated SNPs +
    * chr-2 block; see [[m14]]). Shared by m14 and the m14_r2 oracle. */
  private val fixtureSnps = Seq(
    SnpInfo(0, "s_a1", 1, 100000L, 1e-8),  // index: absorbs a2, a3
    SnpInfo(1, "s_a2", 1, 400000L, 1e-6),  // anti pattern, r²=1 w/ a1
    SnpInfo(2, "s_a3", 1, 800000L, 1e-4),  // base + NaN holes, r²=1 w/ a1
    SnpInfo(3, "s_b1", 1, 2000000L, 1e-5), // base, but 1.9Mb from a1: kept
    SnpInfo(4, "s_c1", 1, 2300000L, 0.5),  // ind, r²=0: kept
    SnpInfo(5, "s_d1", 2, 100000L, 0.01),  // index: absorbs d2
    SnpInfo(6, "s_d2", 2, 150000L, 0.02),  // base, absorbed by d1
    SnpInfo(7, "s_d3", 2, 120000L, 0.9),   // base but p > p2: kept
    SnpInfo(8, "s_e1", 2, 160000L, 0.001)) // ind, r²=0 w/ d*: kept
  private val fixtureKinds = Seq("base", "anti", "base", "base", "ind",
    "base", "base", "base", "ind")

  /** 297 samples × 9 deterministic dosage columns (see [[pattern]]);
    * NaNs punched into a3 (idx 2) so pairwise-complete r² is exercised. */
  private def fixtureGeno(s: SparkSession): DataFrame =
    s.range(0, 297).select(col("id"),
      array(fixtureSnps.indices.map { i =>
        val v = fixtureKinds(i) match {
          case "base" => (col("id") % 3).cast("double")
          case "anti" => lit(2.0) - (col("id") % 3).cast("double")
          case "ind" => ((col("id") / 3).cast("long") % 3).cast("double")
        }
        if (i == 2) when(col("id") % 50 === 0, lit(Double.NaN)).otherwise(v)
        else v
      }: _*).as("features"))
      .repartition(8)

  /** M14 — LD clump on planted blocks, now FULL-oracled: chr-1 block
    * {a1←a2,a3} (r²=1 via copy/anti-copy, within 1000 kb), b1 = same
    * pattern as a1 but 1.9 Mb away (window excludes), c1/e1 exactly
    * uncorrelated, chr-2 block {d1←d2} with d3 protected by p2, NaNs
    * punched into a3 to exercise pairwise-complete r². The in-query
    * golden gate (hand-derived plink greedy order) stays as belt; the
    * DuckDB oracle replays the WHOLE operator as suspenders — fixture
    * dosages, windowed corr()² pairs (the m14_r2 layer), and the
    * greedy p-ordered selection itself as a RECURSIVE CTE (one kept
    * index per recursion step, assigned set carried as a list). A
    * greedy-order regression now hash-mismatches instead of silently
    * emptying the gate.
    */
  val m14 = QueryDef(
    "m14_ld_clump",
    { (s, _) =>
      import s.implicits._
      val snps = fixtureSnps
      val geno = fixtureGeno(s)
      val params = ClumpParams(kb = 1000, p1 = 1.0, p2 = 0.5, r2 = 0.75)
      val pairs = bandedR2(geno, "features", snps, params.kb)
      val (kept, members) = clump(snps, pairs, params)
      val gotR2 = pairs.map { case (a, b, r2) => (a.name, b.name) -> r2 }.toMap
      val planted =
        gotR2(("s_a1", "s_a2")) == 1.0 && gotR2(("s_a1", "s_a3")) == 1.0 &&
          gotR2(("s_d1", "s_d2")) == 1.0 && gotR2(("s_b1", "s_c1")) == 0.0 &&
          !gotR2.contains(("s_a1", "s_b1")) // outside the kb window: no pair
      val got = kept.map(k => k.name -> members(k.idx).length).toMap
      val want = Map("s_a1" -> 2, "s_b1" -> 0, "s_e1" -> 0, "s_d1" -> 1,
        "s_c1" -> 0, "s_d3" -> 0)
      kept.map(k => (k.name, k.chr, k.pos, k.p, members(k.idx).length.toLong))
        .toDF("snp", "chr", "pos", "p", "n_members")
        .filter(lit(planted && got == want))
    },
    oracle = Some(
      """WITH RECURSIVE snps(idx, name, chr, pos, p, kind) AS (VALUES
        |  (0, 's_a1', 1, 100000, 1e-8, 'base'), (1, 's_a2', 1, 400000, 1e-6, 'anti'),
        |  (2, 's_a3', 1, 800000, 1e-4, 'base_nan'), (3, 's_b1', 1, 2000000, 1e-5, 'base'),
        |  (4, 's_c1', 1, 2300000, 0.5, 'ind'), (5, 's_d1', 2, 100000, 0.01, 'base'),
        |  (6, 's_d2', 2, 150000, 0.02, 'base'), (7, 's_d3', 2, 120000, 0.9, 'base'),
        |  (8, 's_e1', 2, 160000, 0.001, 'ind')),
        |ids AS (SELECT unnest(range(0, 297)) AS id),
        |dos AS (SELECT s.idx, i.id,
        |          CASE WHEN s.kind = 'base_nan' AND i.id % 50 = 0 THEN NULL
        |               WHEN s.kind = 'anti' THEN 2.0 - (i.id % 3)
        |               WHEN s.kind = 'ind' THEN CAST((i.id // 3) % 3 AS DOUBLE)
        |               ELSE CAST(i.id % 3 AS DOUBLE) END AS d
        |        FROM snps s CROSS JOIN ids i),
        |wpairs AS (SELECT a.idx AS ia, b.idx AS ib
        |           FROM snps a JOIN snps b
        |             ON a.chr = b.chr
        |            AND (b.pos > a.pos OR (b.pos = a.pos AND b.idx > a.idx))
        |            AND b.pos - a.pos <= 1000000),
        |r2 AS (SELECT p.ia, p.ib,
        |         coalesce(pow(corr(da.d, db.d), 2), 0.0) AS r2
        |       FROM wpairs p
        |       JOIN dos da ON da.idx = p.ia
        |       JOIN dos db ON db.idx = p.ib AND db.id = da.id
        |       GROUP BY p.ia, p.ib),
        |adj AS (SELECT ia AS a, ib AS b FROM r2 WHERE r2 >= 0.75
        |        UNION ALL
        |        SELECT ib AS a, ia AS b FROM r2 WHERE r2 >= 0.75),
        |sel AS (
        |  SELECT 0 AS it, CAST(NULL AS INT) AS kept_idx,
        |         CAST([] AS INT[]) AS assigned
        |  UNION ALL
        |  SELECT sel.it + 1, nxt.idx,
        |         sel.assigned || [nxt.idx] ||
        |           coalesce((SELECT list(m.idx ORDER BY m.idx)
        |                     FROM adj a JOIN snps m ON m.idx = a.b
        |                     WHERE a.a = nxt.idx
        |                       AND NOT list_contains(sel.assigned, m.idx)
        |                       AND m.p <= 0.5), [])
        |  FROM sel,
        |       LATERAL (SELECT s.idx FROM snps s
        |                WHERE s.p <= 1.0
        |                  AND NOT list_contains(sel.assigned, s.idx)
        |                ORDER BY s.p, s.idx LIMIT 1) nxt(idx)
        |),
        |kept AS (
        |  SELECT s.name AS snp, s.chr, CAST(s.pos AS BIGINT) AS pos, s.p,
        |         CAST((SELECT count(*) FROM adj a JOIN snps m ON m.idx = a.b
        |               WHERE a.a = sel.kept_idx AND m.p <= 0.5
        |                 AND NOT list_contains(
        |                   (SELECT s2.assigned FROM sel s2 WHERE s2.it = sel.it - 1),
        |                   m.idx)) AS BIGINT) AS n_members
        |  FROM sel JOIN snps s ON s.idx = sel.kept_idx
        |  WHERE sel.it >= 1)
        |SELECT snp, chr, pos, p, n_members FROM kept""".stripMargin),
    benchEligible = false)

  /** M14_R2 — FULL DuckDB oracle for the r² layer: the oracle rebuilds
    * the exact m14 fixture (generate_series id patterns, NULL where the
    * engine plants NaN — both sides drop the row pairwise), enumerates
    * the same (chr, pos)-ordered kb window pairs from a VALUES list,
    * and replays pairwise-complete r² as corr()² (DuckDB two-arg
    * aggregates skip NULL pairs — plink's missing-data policy). Both
    * sides round to 6 dp; the planted patterns make every r² exactly
    * 0 or 1 so rounding only absorbs last-bit accumulation-order noise.
    */
  val m14r2 = QueryDef(
    "m14_r2",
    { (s, _) =>
      import s.implicits._
      bandedR2(fixtureGeno(s), "features", fixtureSnps, kb = 1000)
        .map { case (a, b, r2) => (a.name, b.name, r2) }
        .toDF("snp_a", "snp_b", "r2_raw")
        // Catalyst round (HALF_UP) to match DuckDB round(x, 6) —
        // math.rint is HALF_EVEN and diverges on half-boundary values
        // (Deconfound's rounding note documents the hash flip)
        .withColumn("r2", round(col("r2_raw"), 6)).drop("r2_raw")
    },
    oracle = Some(
      """WITH snps(name, idx, chr, pos, kind) AS (VALUES
        |  ('s_a1', 0, 1, 100000, 'base'), ('s_a2', 1, 1, 400000, 'anti'),
        |  ('s_a3', 2, 1, 800000, 'base_nan'), ('s_b1', 3, 1, 2000000, 'base'),
        |  ('s_c1', 4, 1, 2300000, 'ind'), ('s_d1', 5, 2, 100000, 'base'),
        |  ('s_d2', 6, 2, 150000, 'base'), ('s_d3', 7, 2, 120000, 'base'),
        |  ('s_e1', 8, 2, 160000, 'ind')),
        |ids AS (SELECT unnest(range(0, 297)) AS id),
        |dos AS (SELECT s.name, i.id,
        |          CASE WHEN s.kind = 'base_nan' AND i.id % 50 = 0 THEN NULL
        |               WHEN s.kind = 'anti' THEN 2.0 - (i.id % 3)
        |               WHEN s.kind = 'ind' THEN CAST((i.id // 3) % 3 AS DOUBLE)
        |               ELSE CAST(i.id % 3 AS DOUBLE) END AS d
        |        FROM snps s CROSS JOIN ids i),
        |pairs AS (SELECT a.name AS snp_a, b.name AS snp_b
        |          FROM snps a JOIN snps b
        |            ON a.chr = b.chr
        |           AND (b.pos > a.pos OR (b.pos = a.pos AND b.idx > a.idx))
        |           AND b.pos - a.pos <= 1000000)
        |SELECT p.snp_a, p.snp_b,
        |       round(coalesce(pow(corr(da.d, db.d), 2), 0.0), 6) AS r2
        |FROM pairs p
        |JOIN dos da ON da.name = p.snp_a
        |JOIN dos db ON db.name = p.snp_b AND db.id = da.id
        |GROUP BY p.snp_a, p.snp_b""".stripMargin),
    benchEligible = false)

  /** Hardy–Weinberg equilibrium genotype counts (plink --hardy analog,
    * public method): per SNP, observed genotype counts (dosage 0/1/2 =
    * copies of the counted allele, NaN = missing) in ONE treeAggregate
    * pass with a bounded 4×p accumulator — no n×p explode, no shuffle;
    * the massOlsBetas accumulation shape. The chi-square statistic is
    * driver arithmetic on the p-sized count matrix.
    */
  def hweCounts(geno: DataFrame, featuresCol: String, p: Int): Array[Array[Long]] =
    geno.select(col(featuresCol)).rdd.treeAggregate(Array.fill(p, 4)(0L))(
      (acc, row) => {
        val a = row.getSeq[Double](0)
        var i = 0
        while (i < p) {
          val d = a(i)
          // HWE is only meaningful on hard calls: a fractional (imputed/
          // adjusted) or out-of-range dosage must fail LOUDLY here, not
          // silently truncate into a genotype bin (or index out of the
          // 0..2 range)
          if (d.isNaN) acc(i)(3) += 1
          else if (d == 0.0 || d == 1.0 || d == 2.0) acc(i)(d.toInt) += 1
          else throw new IllegalArgumentException(
            s"hweCounts expects hard-call dosages 0/1/2 or NaN; " +
              s"got $d in column $i — run HWE on raw genotypes, not " +
              "adjusted/imputed data")
          i += 1
        }
        acc
      },
      (x, y) => {
        var i = 0
        while (i < p) {
          var j = 0
          while (j < 4) { x(i)(j) += y(i)(j); j += 1 }
          i += 1
        }
        x
      })

  /** 1-df HWE chi-square from genotype counts: allele frequency from the
    * counts themselves, expected (q², 2pq, p²)·n, Σ(obs−exp)²/exp. */
  def hweChiSq(n0: Long, n1: Long, n2: Long): Double = {
    val n = (n0 + n1 + n2).toDouble
    if (n == 0) return 0.0
    val pA = (2.0 * n2 + n1) / (2.0 * n)
    val q = 1.0 - pA
    val e0 = n * q * q
    val e1 = 2.0 * n * pA * q
    val e2 = n * pA * pA
    def term(o: Long, e: Double) =
      if (e > 0) { val d = o - e; d * d / e } else 0.0
    term(n0, e0) + term(n1, e1) + term(n2, e2)
  }

  /** M15 — HWE QC over the planted fixture, FULL oracle: DuckDB rebuilds
    * the same dosage patterns (the m14 dos CTE), counts genotypes with
    * NULL-aware CASE sums, and replays the chi-square arithmetic with
    * the identical double operations. The uniform 0/1/2 patterns are
    * maximally out of HWE (chisq = 33.0 at n=297), so the fail flag
    * discriminates; a3's punched NaNs exercise the missing channel
    * (97/97/97 + 6 missing).
    */
  val m15 = QueryDef(
    "m15_hwe",
    { (s, _) =>
      import s.implicits._
      val snps = fixtureSnps
      val counts = hweCounts(fixtureGeno(s), "features", snps.length)
      snps.map { sn =>
        val c = counts(sn.idx)
        val raw = hweChiSq(c(0), c(1), c(2))
        (sn.name, c(0), c(1), c(2), c(3), raw, raw > 3.841459)
      }.toDF("snp", "n0", "n1", "n2", "n_miss", "chisq_raw", "hwe_fail")
        // Catalyst round (HALF_UP) to match the oracle's round(x, 6);
        // math.rint is HALF_EVEN and flips the hash on half-boundary
        // values (Deconfound's rounding note)
        .withColumn("chisq", round(col("chisq_raw"), 6)).drop("chisq_raw")
    },
    oracle = Some(
      """WITH snps(name, kind) AS (VALUES
        |  ('s_a1', 'base'), ('s_a2', 'anti'), ('s_a3', 'base_nan'),
        |  ('s_b1', 'base'), ('s_c1', 'ind'), ('s_d1', 'base'),
        |  ('s_d2', 'base'), ('s_d3', 'base'), ('s_e1', 'ind')),
        |ids AS (SELECT unnest(range(0, 297)) AS id),
        |dos AS (SELECT s.name, i.id,
        |          CASE WHEN s.kind = 'base_nan' AND i.id % 50 = 0 THEN NULL
        |               WHEN s.kind = 'anti' THEN 2.0 - (i.id % 3)
        |               WHEN s.kind = 'ind' THEN CAST((i.id // 3) % 3 AS DOUBLE)
        |               ELSE CAST(i.id % 3 AS DOUBLE) END AS d
        |        FROM snps s CROSS JOIN ids i),
        |cnt AS (SELECT name AS snp,
        |          CAST(sum(CASE WHEN d = 0 THEN 1 ELSE 0 END) AS BIGINT) AS n0,
        |          CAST(sum(CASE WHEN d = 1 THEN 1 ELSE 0 END) AS BIGINT) AS n1,
        |          CAST(sum(CASE WHEN d = 2 THEN 1 ELSE 0 END) AS BIGINT) AS n2,
        |          CAST(sum(CASE WHEN d IS NULL THEN 1 ELSE 0 END) AS BIGINT) AS n_miss
        |        FROM dos GROUP BY name),
        |stat AS (SELECT snp, n0, n1, n2, n_miss,
        |           (2.0 * n2 + n1) / (2.0 * (n0 + n1 + n2)) AS pa,
        |           CAST(n0 + n1 + n2 AS DOUBLE) AS n
        |         FROM cnt)
        |SELECT snp, n0, n1, n2, n_miss,
        |       round(pow(n0 - n * (1.0 - pa) * (1.0 - pa), 2) / (n * (1.0 - pa) * (1.0 - pa))
        |           + pow(n1 - 2.0 * n * pa * (1.0 - pa), 2) / (2.0 * n * pa * (1.0 - pa))
        |           + pow(n2 - n * pa * pa, 2) / (n * pa * pa), 6) AS chisq,
        |       (pow(n0 - n * (1.0 - pa) * (1.0 - pa), 2) / (n * (1.0 - pa) * (1.0 - pa))
        |           + pow(n1 - 2.0 * n * pa * (1.0 - pa), 2) / (2.0 * n * pa * (1.0 - pa))
        |           + pow(n2 - n * pa * pa, 2) / (n * pa * pa)) > 3.841459 AS hwe_fail
        |FROM stat""".stripMargin),
    benchEligible = false)

  /** M16 — per-SAMPLE heterozygosity (plink --het analog, public
    * method): the transpose of m15's per-variant QC — for each sample,
    * the het-genotype fraction over its non-missing calls (outlier het
    * rates flag contamination / inbreeding). Pure scan-local array
    * arithmetic per row — no shuffle at all; at biobank scale this is
    * a single pass over the bundle. FULL oracle: DuckDB rebuilds the
    * dosages and replays count/divide per sample.
    */
  val m16 = QueryDef(
    "m16_sample_het",
    { (s, _) =>
      fixtureGeno(s).select(col("id"),
        size(filter(col("features"), x => x === 1.0d))
          .cast("long").as("n_het"),
        size(filter(col("features"), x => !isnan(x)))
          .cast("long").as("n_non_missing"))
        .withColumn("het_rate",
          round(col("n_het").cast("double") / col("n_non_missing"), 6))
    },
    oracle = Some(
      """WITH snps(name, kind) AS (VALUES
        |  ('s_a1', 'base'), ('s_a2', 'anti'), ('s_a3', 'base_nan'),
        |  ('s_b1', 'base'), ('s_c1', 'ind'), ('s_d1', 'base'),
        |  ('s_d2', 'base'), ('s_d3', 'base'), ('s_e1', 'ind')),
        |ids AS (SELECT unnest(range(0, 297)) AS id),
        |dos AS (SELECT s.name, i.id,
        |          CASE WHEN s.kind = 'base_nan' AND i.id % 50 = 0 THEN NULL
        |               WHEN s.kind = 'anti' THEN 2.0 - (i.id % 3)
        |               WHEN s.kind = 'ind' THEN CAST((i.id // 3) % 3 AS DOUBLE)
        |               ELSE CAST(i.id % 3 AS DOUBLE) END AS d
        |        FROM snps s CROSS JOIN ids i)
        |SELECT id,
        |       CAST(sum(CASE WHEN d = 1 THEN 1 ELSE 0 END) AS BIGINT) AS n_het,
        |       CAST(count(d) AS BIGINT) AS n_non_missing,
        |       round(sum(CASE WHEN d = 1 THEN 1 ELSE 0 END) * 1.0 / count(d), 6)
        |         AS het_rate
        |FROM dos GROUP BY id""".stripMargin),
    benchEligible = false)

  /** Per-variant NaN counts in ONE treeAggregate pass (p-sized bounded
    * accumulator + row tally, no shuffle — the m15 accumulation shape).
    * Unlike [[hweCounts]] this is defined for ANY dosage data:
    * missingness is meaningful on adjusted/imputed values too, so only
    * NaN-ness is inspected, never the genotype value.
    */
  def variantMissingness(geno: DataFrame, featuresCol: String,
      p: Int): (Array[Long], Long) =
    geno.select(col(featuresCol)).rdd
      .treeAggregate((Array.fill(p)(0L), 0L))(
        (acc, row) => {
          val a = row.getSeq[Double](0)
          var i = 0
          while (i < p) { if (a(i).isNaN) acc._1(i) += 1; i += 1 }
          (acc._1, acc._2 + 1L)
        },
        (x, y) => {
          var i = 0
          while (i < p) { x._1(i) += y._1(i); i += 1 }
          (x._1, x._2 + y._2)
        })

  /** M17 — missingness report (plink --missing analog, public method):
    * BOTH sections of the report in one frame — per-VARIANT (.lmiss:
    * missing calls per SNP over all samples, one treeAggregate) and
    * per-SAMPLE (.imiss: missing calls per sample, scan-local array
    * arithmetic like m16) — tagged by `kind`, keyed uniformly as
    * strings. FULL oracle: DuckDB rebuilds the dosages and replays
    * both GROUP BYs; a3's punched NaNs (6 per variant side, 1 per
    * affected sample) discriminate both sections. Catalyst round
    * (HALF_UP) on both engines for f_miss.
    */
  val m17 = QueryDef(
    "m17_missingness",
    { (s, _) =>
      import s.implicits._
      val snps = fixtureSnps
      val (miss, n) = variantMissingness(fixtureGeno(s), "features", snps.length)
      val perVariant = snps.map { sn =>
        ("variant", sn.name, miss(sn.idx), n)
      }.toDF("kind", "key", "n_miss", "n_total")
      val perSample = fixtureGeno(s).select(
        lit("sample").as("kind"),
        col("id").cast("string").as("key"),
        size(filter(col("features"), x => isnan(x)))
          .cast("long").as("n_miss"),
        lit(snps.length.toLong).as("n_total"))
      perVariant.unionByName(perSample)
        .withColumn("f_miss",
          round(col("n_miss").cast("double") / col("n_total"), 6))
    },
    oracle = Some(
      """WITH snps(name, kind) AS (VALUES
        |  ('s_a1', 'base'), ('s_a2', 'anti'), ('s_a3', 'base_nan'),
        |  ('s_b1', 'base'), ('s_c1', 'ind'), ('s_d1', 'base'),
        |  ('s_d2', 'base'), ('s_d3', 'base'), ('s_e1', 'ind')),
        |ids AS (SELECT unnest(range(0, 297)) AS id),
        |dos AS (SELECT s.name, i.id,
        |          CASE WHEN s.kind = 'base_nan' AND i.id % 50 = 0 THEN NULL
        |               WHEN s.kind = 'anti' THEN 2.0 - (i.id % 3)
        |               WHEN s.kind = 'ind' THEN CAST((i.id // 3) % 3 AS DOUBLE)
        |               ELSE CAST(i.id % 3 AS DOUBLE) END AS d
        |        FROM snps s CROSS JOIN ids i)
        |SELECT 'variant' AS kind, name AS key,
        |       CAST(sum(CASE WHEN d IS NULL THEN 1 ELSE 0 END) AS BIGINT) AS n_miss,
        |       CAST(count(*) AS BIGINT) AS n_total,
        |       round(sum(CASE WHEN d IS NULL THEN 1 ELSE 0 END) * 1.0 / count(*), 6)
        |         AS f_miss
        |FROM dos GROUP BY name
        |UNION ALL
        |SELECT 'sample' AS kind, CAST(id AS VARCHAR) AS key,
        |       CAST(sum(CASE WHEN d IS NULL THEN 1 ELSE 0 END) AS BIGINT) AS n_miss,
        |       CAST(count(*) AS BIGINT) AS n_total,
        |       round(sum(CASE WHEN d IS NULL THEN 1 ELSE 0 END) * 1.0 / count(*), 6)
        |         AS f_miss
        |FROM dos GROUP BY id""".stripMargin),
    benchEligible = false)

  /** Pairwise IBS (identity-by-state) kinship over a dosage matrix —
    * the PLINK `--genome` relatedness QC every GWAS runs before
    * association (cryptic relatedness inflates every test; cf. m19's
    * λGC, which DETECTS the inflation this REMOVES). IBS(i,j) =
    * Σ_valid (2 − |d_i − d_j|) / (2·n_valid) over SNPs where both
    * samples are non-missing; dosages are 0/1/2 so the numerator is
    * INTEGRAL — bit-exact cross-engine. O(n²) by definition (as is
    * PLINK's); at biobank scale the standard practice is LD-pruned
    * SNP subsets + blocked candidate screening (KING), with this
    * exact kernel on candidate pairs only.
    */
  /** Exact IBS kernel over an explicit candidate-pair set: joins each
    * side's dosage vector back on and computes the integral numerator /
    * pairwise-complete denominator. This is the VERIFY stage — every
    * screening path feeds it; the brute-force path feeds it all pairs.
    */
  def ibsOnPairs(pairs: DataFrame, geno: DataFrame, idCol: String,
      featCol: String): DataFrame =
    pairs
      .join(geno.select(col(idCol).as("id_a"), col(featCol).as("fa")), "id_a")
      .join(geno.select(col(idCol).as("id_b"), col(featCol).as("fb")), "id_b")
      .select(col("id_a"), col("id_b"),
        aggregate(zip_with(col("fa"), col("fb"), (x, y) =>
          when(!isnan(x) && !isnan(y),
            lit(2.0) - abs(x.cast("double") - y.cast("double")))
            .otherwise(lit(0.0))),
          lit(0.0), (acc, v) => acc + v).cast("long").as("ibs_num"),
        aggregate(zip_with(col("fa"), col("fb"), (x, y) =>
          when(!isnan(x) && !isnan(y), 1.0).otherwise(0.0)),
          lit(0.0), (acc, v) => acc + v).cast("long").as("n_valid"))
      .withColumn("ibs",
        round(col("ibs_num").cast("double") / (lit(2.0) * col("n_valid")), 6))

  def ibsPairs(geno: DataFrame, idCol: String, featCol: String): DataFrame = {
    val ids = geno.select(col(idCol).as("id"))
    val pairs = ids.select(col("id").as("id_a"))
      .crossJoin(ids.select(col("id").as("id_b")))
      .filter(col("id_a") < col("id_b"))
    ibsOnPairs(pairs, geno, idCol, featCol)
  }

  /** Candidate BLOCKING for the high-IBS screen — the KING-style move
    * that replaces the all-pairs crossJoin with a banded equi-join
    * (Manichaikul et al. 2010 run the same shape: cheap blocked screen,
    * exact kernel on survivors; cf. the dedup split at Dedup.scala's
    * `bucketCandidates`). Reference analog: the plink relatedness QC
    * the preprocessing DAG assumes upstream
    * (workflows/preprocessing/Snakefile:73-104). The SNP axis is cut into `bands` contiguous
    * slices; each sample emits one hash per slice (NaN → sentinel, so
    * identical missing patterns still collide); a pair becomes a
    * candidate iff it agrees EXACTLY on at least one whole band.
    *
    * Deterministic recall guarantee (not probabilistic): a pair whose
    * dosage vectors differ — by value OR by missingness pattern — in at
    * most `bands − 1` distinct positions must share an untouched band.
    * A pair at IBS ≥ T with both-valid denominator n_v has at most
    * ⌊2·p·(1−T)⌋ value mismatches (each contributes ≥ 1 to Σ|dᵢ−dⱼ|),
    * so size `bands` > value-mismatch budget + expected asymmetric-NaN
    * positions (≈ 2·p·missRate on LD-pruned, low-missingness QC panels).
    * Shuffle is (samples × bands) signature rows keyed by (band, hash);
    * pathological hot buckets (monomorphic bands — a b-SNP integral
    * band has at most 3^b values, so a common one can collect a large
    * sample fraction) are handled the same way dedup's
    * `bucketCandidates` handles hot shingle buckets: a bucket larger
    * than `maxBucketSize` emits a sorted id-CHAIN (m−1 consecutive
    * pairs, linear) instead of its m(m−1)/2 all-pairs. The
    * deterministic recall bound above holds for every bucket ≤ the cap;
    * past it recall is BEST-EFFORT (a true pair whose only agreeing
    * band is a capped bucket survives only as a chain-connected
    * component after the exact kernel), which is the price of bounded
    * work — never all-pairs, never silent skew.
    */
  def ibsCandidatePairs(geno: DataFrame, idCol: String, featCol: String,
      bands: Int, maxBucketSize: Int = 2000): DataFrame =
    ibsSized(geno, idCol, featCol, bands) match {
      case None =>
        geno.sparkSession.range(0)
          .select(col("id").as("id_a"), col("id").as("id_b"))
      case Some(sized) => candidatePairsFromSized(sized, maxBucketSize)
    }

  private def candidatePairsFromSized(sized: DataFrame,
      maxBucketSize: Int): DataFrame = {
    require(maxBucketSize >= 2,
      s"maxBucketSize must be >= 2: $maxBucketSize")
    val small = sized.filter(col("bsz") <= maxBucketSize)
    val allPairs = small.alias("a").join(small.alias("b"),
        col("a.band") === col("b.band") && col("a.h") === col("b.h") &&
          col("a.id") < col("b.id"))
      .select(col("a.id").as("id_a"), col("b.id").as("id_b"))
    allPairs.unionByName(ibsChainFromSized(sized, maxBucketSize))
      .distinct()
  }

  /** Shared signature builder for the banded IBS screen: one row per
    * (sample, band) carrying the band-slice content hash and the
    * (band, hash) bucket size. The bucket-size window and the
    * downstream self-join share the (band, h) hash partitioning, so
    * sizing costs no extra shuffle. None ⇔ empty input. */
  private def ibsSized(geno: DataFrame, idCol: String, featCol: String,
      bands: Int): Option[DataFrame] = {
    val head = geno.select(size(col(featCol))).head(1)
    if (head.isEmpty) return None
    val p = head(0).getInt(0)
    require(bands >= 1 && bands <= p,
      s"ibs screen: bands=$bands outside [1, $p]")
    val bounds = (0 to bands).map(b => (b * p) / bands)
    val bandCols = (0 until bands).map { b =>
      val start = bounds(b); val len = bounds(b + 1) - start
      struct(lit(b).as("band"),
        xxhash64(transform(slice(col(featCol), start + 1, len),
          x => when(isnan(x), lit(-1.0)).otherwise(x.cast("double"))))
          .as("h"))
    }
    val sig = geno
      .select(col(idCol).as("id"), explode(array(bandCols: _*)).as("bh"))
      .select(col("id"), col("bh.band").as("band"), col("bh.h").as("h"))
    val bucket = org.apache.spark.sql.expressions.Window
      .partitionBy(col("band"), col("h"))
    Some(sig.withColumn("bsz", count(lit(1)).over(bucket)))
  }

  private def ibsChainFromSized(sized: DataFrame,
      maxBucketSize: Int): DataFrame = {
    val bucket = org.apache.spark.sql.expressions.Window
      .partitionBy(col("band"), col("h"))
    sized.filter(col("bsz") > maxBucketSize)
      .withColumn("prev", lag(col("id"), 1).over(bucket.orderBy(col("id"))))
      .filter(col("prev").isNotNull)
      .select(col("prev").as("id_a"), col("id").as("id_b"))
  }

  /** The capped branch alone: for every (band, hash) bucket LARGER
    * than `maxBucketSize`, the sorted id-chain (m−1 consecutive pairs)
    * that replaces its m(m−1)/2 all-pairs. Exposed so the capped
    * path's construction is directly gateable (m23) instead of only
    * observable as "whatever distinct() merged in". */
  def ibsChainPairs(geno: DataFrame, idCol: String, featCol: String,
      bands: Int, maxBucketSize: Int): DataFrame =
    ibsSized(geno, idCol, featCol, bands) match {
      case None => geno.sparkSession.range(0)
        .select(col("id").as("id_a"), col("id").as("id_b"))
      case Some(sized) => ibsChainFromSized(sized, maxBucketSize).distinct()
    }

  /** Per-band bucket audit for the screen — the no-silent-caps
    * surface: (band, n_buckets, n_capped, max_bucket). A capped bucket
    * means recall past the deterministic bound degraded to the id-
    * chain best-effort for pairs whose ONLY agreeing band is that
    * bucket; callers at scale should alert on n_capped > 0 (m21/m23
    * surface the count as an output column). One extra pass over the
    * signature table (samples × bands rows), nothing over the matrix
    * beyond the slice hashes. */
  def ibsCapStats(geno: DataFrame, idCol: String, featCol: String,
      bands: Int, maxBucketSize: Int): DataFrame =
    ibsSized(geno, idCol, featCol, bands) match {
      case None => geno.sparkSession.range(0)
        .select(col("id").as("band"), col("id").as("n_buckets"),
          col("id").as("n_capped"), col("id").as("max_bucket"))
      case Some(sized) => capStatsFromSized(sized, maxBucketSize)
    }

  private def capStatsFromSized(sized: DataFrame,
      maxBucketSize: Int): DataFrame =
    sized.select(col("band"), col("h"), col("bsz")).distinct()
      .groupBy("band")
      .agg(count(lit(1)).as("n_buckets"),
        sum(when(col("bsz") > maxBucketSize, 1L).otherwise(0L))
          .as("n_capped"),
        max(col("bsz")).as("max_bucket"))

  /** Blocked high-IBS screen: banded candidates → exact kernel. The
    * production path for `ibs ≥ threshold` queries — O(samples·bands)
    * signatures + kernel work proportional to true-ish pairs, vs the
    * brute path's O(n²). `bands` must satisfy the recall bound in
    * [[ibsCandidatePairs]] for the target threshold; LdClumpSpec proves
    * candidate recall = 1.0 against the brute kernel on the planted
    * fixture.
    */
  def ibsPairsScreened(geno: DataFrame, idCol: String, featCol: String,
      bands: Int): DataFrame =
    ibsOnPairs(ibsCandidatePairs(geno, idCol, featCol, bands), geno,
      idCol, featCol)

  /** M21 — relatedness screen on the m15 fixture (9 planted dosage
    * patterns over 297 samples ⇒ 9 identity classes; same-class pairs
    * are IBS=1 "duplicates/twins", the exact thing the QC exists to
    * flag). Runs the SCREENED path — banded candidate blocking, exact
    * kernel on candidates only — with bands=3: at threshold 0.95 over
    * p=9 integral dosages the value-mismatch budget is ⌊2·9·0.05⌋ = 0
    * and the fixture punches NaNs into exactly one SNP, so every true
    * pair touches ≤ 1 of 3 bands and recall is exact by the
    * [[ibsCandidatePairs]] bound. FULL DuckDB oracle: the m15 VALUES
    * replay self-joined per pair with the identical integral
    * arithmetic — a screening false negative loses oracle rows and
    * fails the hash compare loudly. Output: all pairs with IBS ≥ 0.95.
    */
  val m21 = QueryDef(
    "m21_ibs_kinship",
    { (s, _) =>
      val g = fixtureGeno(s)
      // no-silent-caps: the capped-bucket count rides on every output
      // row, COMPUTED on both engines (here from the sized signature
      // table, in DuckDB by grouping samples on their exact band-slice
      // tuples) — a screening run that silently degraded to chains
      // would change this column and hash-mismatch loudly. The sized
      // table is built ONCE and checkpointed: cap stats and the
      // candidate screen both read it (a second ibsSized call would
      // re-pay the matrix slice-hash pass).
      val sized = ibsSized(g, "id", "features", bands = 3)
        .get.localCheckpoint(true)
      val nCapped = capStatsFromSized(sized, maxBucketSize = 2000)
        .agg(coalesce(sum(col("n_capped")), lit(0L))).head().getLong(0)
      ibsOnPairs(candidatePairsFromSized(sized, maxBucketSize = 2000),
          g, "id", "features")
        // filter on the RAW ratio exactly as the oracle does (the
        // rounded display column could disagree at a threshold edge)
        .filter(col("ibs_num").cast("double") /
          (lit(2.0) * col("n_valid")) >= 0.95)
        .select(col("id_a"), col("id_b"), col("ibs_num"), col("n_valid"),
          col("ibs"), lit(nCapped).as("n_capped_buckets"))
    },
    oracle = Some(
      """WITH snps(idx, kind) AS (VALUES
        |  (0, 'base'), (1, 'anti'), (2, 'base_nan'),
        |  (3, 'base'), (4, 'ind'), (5, 'base'),
        |  (6, 'base'), (7, 'base'), (8, 'ind')),
        |ids AS (SELECT unnest(range(0, 297)) AS id),
        |dos AS (SELECT s.idx, i.id,
        |          CASE WHEN s.kind = 'base_nan' AND i.id % 50 = 0 THEN NULL
        |               WHEN s.kind = 'anti' THEN 2.0 - (i.id % 3)
        |               WHEN s.kind = 'ind' THEN CAST((i.id // 3) % 3 AS DOUBLE)
        |               ELSE CAST(i.id % 3 AS DOUBLE) END AS d
        |        FROM snps s CROSS JOIN ids i),
        |bt AS (SELECT id, idx // 3 AS band,
        |         string_agg(coalesce(d::VARCHAR, 'NA'), ',' ORDER BY idx) AS tup
        |       FROM dos GROUP BY 1, 2),
        |caps AS (SELECT CAST(count(*) FILTER (WHERE c > 2000) AS BIGINT)
        |           AS n_capped
        |         FROM (SELECT band, tup, count(*) AS c FROM bt GROUP BY 1, 2)),
        |p AS (SELECT a.id AS id_a, b.id AS id_b,
        |             CAST(COALESCE(sum(CASE WHEN a.d IS NOT NULL AND b.d IS NOT NULL
        |                      THEN 2.0 - abs(a.d - b.d) END), 0) AS BIGINT) AS ibs_num,
        |             CAST(count(CASE WHEN a.d IS NOT NULL AND b.d IS NOT NULL
        |                      THEN 1 END) AS BIGINT) AS n_valid
        |      FROM dos a JOIN dos b ON a.idx = b.idx AND a.id < b.id
        |      GROUP BY 1, 2)
        |SELECT id_a, id_b, ibs_num, n_valid,
        |       round(CAST(ibs_num AS DOUBLE) / (2.0 * n_valid), 6) AS ibs,
        |       (SELECT n_capped FROM caps) AS n_capped_buckets
        |FROM p WHERE CAST(ibs_num AS DOUBLE) / (2.0 * n_valid) >= 0.95""".stripMargin))

  /** M23 — the CAPPED branch of the IBS screen, gated directly: run
    * the screen on the m15 fixture with maxBucketSize=40, which forces
    * band 0's three (residue-class) buckets of 97 samples past the cap
    * (bands 1–2 stay at 33-sized buckets, under it). Output = the
    * id-CHAIN candidates those capped buckets emit, run through the
    * exact kernel, kept at IBS ≥ 0.85 — a mix of passing (16/18) and
    * failing (14/18) chain pairs, so the threshold does real work —
    * plus the capped-bucket count on every row. FULL DuckDB oracle:
    * buckets are replayed by grouping samples on their exact
    * band-slice value tuples (hashing is an implementation detail;
    * equal tuples ⇔ equal xxhash64 buckets, collision-free at 9
    * tuples/band), chains by lag() over id within capped buckets,
    * then the m21 kernel on exactly those pairs. A wrong cap
    * comparison, chain order, or bucket sizing hash-mismatches. */
  val m23 = QueryDef(
    "m23_ibs_capped_chain",
    { (s, _) =>
      val g = fixtureGeno(s)
      // one sized pass shared by cap stats and the chain branch (m21's
      // single-build discipline)
      val sized = ibsSized(g, "id", "features", bands = 3)
        .get.localCheckpoint(true)
      val nCapped = capStatsFromSized(sized, maxBucketSize = 40)
        .agg(coalesce(sum(col("n_capped")), lit(0L))).head().getLong(0)
      ibsOnPairs(ibsChainFromSized(sized, maxBucketSize = 40).distinct(),
          g, "id", "features")
        .filter(col("ibs_num").cast("double") /
          (lit(2.0) * col("n_valid")) >= 0.85)
        .select(col("id_a"), col("id_b"), col("ibs_num"), col("n_valid"),
          col("ibs"), lit(nCapped).as("n_capped_buckets"))
    },
    oracle = Some(
      """WITH snps(idx, kind) AS (VALUES
        |  (0, 'base'), (1, 'anti'), (2, 'base_nan'),
        |  (3, 'base'), (4, 'ind'), (5, 'base'),
        |  (6, 'base'), (7, 'base'), (8, 'ind')),
        |ids AS (SELECT unnest(range(0, 297)) AS id),
        |dos AS MATERIALIZED (SELECT s.idx, i.id,
        |          CASE WHEN s.kind = 'base_nan' AND i.id % 50 = 0 THEN NULL
        |               WHEN s.kind = 'anti' THEN 2.0 - (i.id % 3)
        |               WHEN s.kind = 'ind' THEN CAST((i.id // 3) % 3 AS DOUBLE)
        |               ELSE CAST(i.id % 3 AS DOUBLE) END AS d
        |        FROM snps s CROSS JOIN ids i),
        |bt AS MATERIALIZED (SELECT id, idx // 3 AS band,
        |         string_agg(coalesce(d::VARCHAR, 'NA'), ',' ORDER BY idx) AS tup
        |       FROM dos GROUP BY 1, 2),
        |sized AS MATERIALIZED (SELECT id, band, tup,
        |         count(*) OVER (PARTITION BY band, tup) AS bsz
        |       FROM bt),
        |caps AS (SELECT CAST(count(*) AS BIGINT) AS n_capped
        |         FROM (SELECT DISTINCT band, tup FROM sized WHERE bsz > 40)),
        |chain AS (SELECT lag(id) OVER (PARTITION BY band, tup ORDER BY id)
        |            AS id_a, id AS id_b
        |          FROM sized WHERE bsz > 40),
        |cp AS (SELECT DISTINCT id_a, id_b FROM chain WHERE id_a IS NOT NULL),
        |p AS (SELECT c.id_a, c.id_b,
        |             CAST(COALESCE(sum(CASE WHEN a.d IS NOT NULL AND b.d IS NOT NULL
        |                      THEN 2.0 - abs(a.d - b.d) END), 0) AS BIGINT) AS ibs_num,
        |             CAST(count(CASE WHEN a.d IS NOT NULL AND b.d IS NOT NULL
        |                      THEN 1 END) AS BIGINT) AS n_valid
        |      FROM cp c JOIN dos a ON a.id = c.id_a
        |                JOIN dos b ON b.id = c.id_b AND b.idx = a.idx
        |      GROUP BY 1, 2)
        |SELECT id_a, id_b, ibs_num, n_valid,
        |       round(CAST(ibs_num AS DOUBLE) / (2.0 * n_valid), 6) AS ibs,
        |       (SELECT n_capped FROM caps) AS n_capped_buckets
        |FROM p WHERE CAST(ibs_num AS DOUBLE) / (2.0 * n_valid) >= 0.85""".stripMargin),
    benchEligible = false) // fixture-bound (297 samples): cost does not scale with sfDir

  /** Per-SNP mean-dosage imputation (the PLINK `--fill-missing-a2` /
    * 2·allele-frequency fill — the default missingness policy before
    * PRS scoring or ML on dosage matrices). Two passes: per-column
    * means from ONE exploded (idx → sum, n) map-side-combinable
    * aggregate (missing = NaN channel), then a scan-local
    * `transform` against the BROADCAST p-sized mean vector — rows
    * never shuffle, the matrix is touched exactly twice.
    */
  def meanImpute(geno: DataFrame, featCol: String): (DataFrame, Array[Double]) = {
    val exploded = geno.select(posexplode(col(featCol)).as(Seq("idx", "d")))
    val means = exploded.filter(!isnan(col("d")))
      .groupBy("idx")
      .agg((sum(col("d").cast("double")) / count(lit(1))).as("m"))
      .collect().map(r => r.getInt(0) -> r.getDouble(1)).toMap
    // empty cohort: nothing to impute, no width to probe — identity
    val firstRow = geno.select(size(col(featCol))).head(1)
    if (firstRow.isEmpty) return (geno, Array.empty[Double])
    val p = firstRow(0).getInt(0)
    val mv = Array.tabulate(p)(i => means.getOrElse(i, 0.0))
    val mLit = typedLit(mv.toSeq)
    val imputed = geno.withColumn(featCol,
      zip_with(col(featCol), mLit, (v, m) =>
        when(isnan(v), m).otherwise(v.cast("double"))))
    (imputed, mv)
  }

  /** M22 — imputation audit on the m15 fixture: per SNP, the missing
    * count, the fill value (= column mean of observed dosages — an
    * EXACT integer ratio, bit-identical cross-engine), and the
    * post-imputation column sum. FULL DuckDB oracle; the NaN-punched
    * SNP is the one that actually imputes, the rest must pass through
    * untouched (fill value never applied ⇒ sums stay integral).
    */
  val m22 = QueryDef(
    "m22_mean_impute",
    { (s, _) =>
      val (imputed, _) = meanImpute(fixtureGeno(s), "features")
      imputed.select(posexplode(col("features")).as(Seq("idx", "d")))
        .groupBy("idx")
        .agg(round(sum(col("d")), 6).as("post_sum"),
          count(lit(1)).as("n_samples"))
        .join(
          fixtureGeno(s)
            .select(posexplode(col("features")).as(Seq("idx", "d")))
            .groupBy("idx")
            .agg(coalesce(sum(when(isnan(col("d")), 1L)), lit(0L))
              .as("n_missing"),
              round(sum(when(!isnan(col("d")), col("d"))) /
                count(when(!isnan(col("d")), lit(1))), 6).as("fill_value")),
          Seq("idx"))
        .select(col("idx").cast("long").as("idx"), col("n_missing"),
          col("fill_value"), col("post_sum"), col("n_samples"))
    },
    oracle = Some(
      """WITH snps(idx, kind) AS (VALUES
        |  (0, 'base'), (1, 'anti'), (2, 'base_nan'),
        |  (3, 'base'), (4, 'ind'), (5, 'base'),
        |  (6, 'base'), (7, 'base'), (8, 'ind')),
        |ids AS (SELECT unnest(range(0, 297)) AS id),
        |dos AS (SELECT s.idx, i.id,
        |          CASE WHEN s.kind = 'base_nan' AND i.id % 50 = 0 THEN NULL
        |               WHEN s.kind = 'anti' THEN 2.0 - (i.id % 3)
        |               WHEN s.kind = 'ind' THEN CAST((i.id // 3) % 3 AS DOUBLE)
        |               ELSE CAST(i.id % 3 AS DOUBLE) END AS d
        |        FROM snps s CROSS JOIN ids i),
        |st AS (SELECT idx,
        |         CAST(count(CASE WHEN d IS NULL THEN 1 END) AS BIGINT) AS n_missing,
        |         round(sum(d) / count(d), 6) AS fill_value,
        |         sum(d) AS obs_sum,
        |         count(d) AS n_obs,
        |         count(*) AS n_samples
        |       FROM dos GROUP BY 1)
        |SELECT CAST(idx AS BIGINT) AS idx, n_missing, fill_value,
        |       round(obs_sum + n_missing * (obs_sum / n_obs), 6) AS post_sum,
        |       CAST(n_samples AS BIGINT) AS n_samples
        |FROM st""".stripMargin))

  def all: Seq[QueryDef] = Seq(m14, m14r2, m15, m16, m17, m21, m22, m23)
}
