package graft.ml

import graft.SparkSpec
import graft.ml.LdClump.{ClumpParams, SnpInfo}
import org.apache.spark.sql.functions._
import java.nio.file.{Files, Paths}

/** LD clumping vs hand-computed plink --clump outcomes: window/chr
  * blocking, exact banded r² (copies, anti-copies, exact-zero
  * independents, NaN pairwise-complete), greedy p-ordered selection
  * with p1/p2 gates, and the Ingest CLI wiring.
  */
class LdClumpSpec extends SparkSpec {

  test("windowPairs: same-chr within-kb pairs only, O(window) not O(p²)") {
    val snps = Seq(
      SnpInfo(0, "x1", 1, 100000L, 0.1), SnpInfo(1, "x2", 1, 600000L, 0.1),
      SnpInfo(2, "x3", 1, 1200000L, 0.1), SnpInfo(3, "y1", 2, 150000L, 0.1))
    val got = LdClump.windowPairs(snps, kb = 1000)
      .map { case (a, b) => (a.name, b.name) }.toSet
    // x1-x2 500kb, x2-x3 600kb in-window; x1-x3 1100kb out; y1 other chr
    assert(got == Set(("x1", "x2"), ("x2", "x3")))
  }

  test("bandedR2: exact 1 for copies/anti-copies, exact 0 for planted independents") {
    val s = spark; import s.implicits._
    val snps = Seq(SnpInfo(0, "a", 1, 1000L, 0.1), SnpInfo(1, "b", 1, 2000L, 0.1),
      SnpInfo(2, "c", 1, 3000L, 0.1), SnpInfo(3, "d", 1, 4000L, 0.1))
    // 297 = multiple of 9: (id%3) and ((id/3)%3) are exactly independent
    val geno = s.range(0, 297).select(array(
      (col("id") % 3).cast("double"),
      lit(2.0) - (col("id") % 3).cast("double"),
      ((col("id") / 3).cast("long") % 3).cast("double"),
      // NaN holes: pairwise-complete must still see the copy exactly
      when(col("id") % 7 === 0, lit(Double.NaN))
        .otherwise((col("id") % 3).cast("double"))).as("features"))
    val r2 = LdClump.bandedR2(geno, "features", snps, kb = 1000)
      .map { case (a, b, v) => (a.name, b.name) -> v }.toMap
    assert(r2(("a", "b")) == 1.0) // anti-copy: perfect negative corr
    assert(r2(("a", "c")) == 0.0) // exact independence by construction
    assert(r2(("a", "d")) == 1.0) // copy with NaN holes
  }

  test("clump: greedy p-order, p1/p2 gates, members consumed") {
    val snps = Seq(
      SnpInfo(0, "idx", 1, 100000L, 1e-8),
      SnpInfo(1, "mem", 1, 200000L, 1e-4),
      SnpInfo(2, "p2guard", 1, 300000L, 0.9), // r²=1 but p > p2
      SnpInfo(3, "p1out", 1, 350000L, 0.99))  // p > p1: never a candidate
    val pairs = Seq(
      (snps(0), snps(1), 1.0), (snps(0), snps(2), 1.0),
      (snps(0), snps(3), 1.0), (snps(1), snps(2), 1.0))
    val (kept, members) = LdClump.clump(snps, pairs,
      ClumpParams(kb = 1000, p1 = 0.95, p2 = 0.5, r2 = 0.75))
    assert(kept.map(_.name) == Seq("idx", "p2guard"))
    assert(members(0) == Seq(1)) // mem absorbed; p2guard survives to index
    assert(members(2) == Seq.empty)
  }

  test("m14 fixture query: golden gate passes with the hand-derived kept set") {
    val rows = LdClump.m14.fn(spark, "unused")
      .collect().map(r => r.getString(0) -> r.getLong(4)).toMap
    assert(rows == Map("s_a1" -> 2L, "s_b1" -> 0L, "s_e1" -> 0L,
      "s_d1" -> 1L, "s_c1" -> 0L, "s_d3" -> 0L))
  }

  test("sliceRanges: disjoint cores cover the axis, budgets hold, halos reach the window") {
    val snps = (0 until 10000).map(j =>
      SnpInfo(j, s"s$j", j / 5000 + 1, ((j % 5000).toLong + 1) * 300000L, 0.5))
    val sorted = snps.toArray // already (chr, pos)-sorted by construction
    val budget = 4000L
    val slices = LdClump.sliceRanges(sorted, kb = 1000, maxPairs = budget)
    assert(slices.length > 1, "10k SNPs under a 4k-pair budget must slice")
    // cores tile [0, p) exactly, in order
    assert(slices.head.coreStart == 0 && slices.last.coreEnd == sorted.length)
    slices.sliding(2).foreach {
      case Seq(a, b) => assert(a.coreEnd == b.coreStart)
      case _ =>
    }
    slices.foreach { sl =>
      assert(sl.pairCount <= budget || sl.coreEnd - sl.coreStart == 1)
      // halo = exactly the forward SNPs the last core SNP's window reaches
      val last = sorted(sl.coreEnd - 1)
      (sl.coreEnd until sl.haloEnd).foreach { h =>
        assert(sorted(h).chr == last.chr &&
          sorted(h).pos - last.pos <= 1000000L)
      }
      if (sl.haloEnd < sorted.length) {
        val nxt = sorted(sl.haloEnd)
        assert(nxt.chr != last.chr || nxt.pos - last.pos > 1000000L)
      }
    }
  }

  test("bandedR2: sliced passes are bit-identical to the unsliced pass (10k SNPs)") {
    val s = spark
    val p = 10000
    val n = 36 // multiple of 3: every (i*7 + j*31) % 3 column is exact
    val snps = (0 until p).map(j =>
      SnpInfo(j, s"s$j", j / 5000 + 1, ((j % 5000).toLong + 1) * 300000L, 0.5))
    val schema = org.apache.spark.sql.types.StructType(Seq(
      org.apache.spark.sql.types.StructField("features",
        org.apache.spark.sql.types.ArrayType(
          org.apache.spark.sql.types.DoubleType, false), false)))
    val rows = s.sparkContext.parallelize(0 until n, 4).map(i =>
      org.apache.spark.sql.Row(
        (0 until p).map(j => ((i * 7 + j * 31) % 3).toDouble)))
    val geno = s.createDataFrame(rows, schema)
    // integer-valued dosages: every moment sum is exact in double, so
    // accumulation order cannot perturb a bit — equality is exact
    val whole = LdClump.bandedR2(geno, "features", snps, kb = 1000,
      maxPairsPerPass = Long.MaxValue)
    val sliced = LdClump.bandedR2(geno, "features", snps, kb = 1000,
      maxPairsPerPass = 4000L)
    def keyed(r: Seq[(SnpInfo, SnpInfo, Double)]) =
      r.map { case (a, b, v) => (a.idx, b.idx) -> v }.toMap
    val (wm, sm) = (keyed(whole), keyed(sliced))
    assert(wm.keySet == sm.keySet, "sliced pair set must equal global pair set")
    assert(wm.nonEmpty && wm.forall { case (k, v) => sm(k) == v },
      "per-pair r2 must be bit-identical under slicing")
  }

  test("Ingest --clump-sumstats prunes the bundle to index SNPs") {
    val s = spark
    val dir = graft.util.Fixtures.dir + "/ldclump"
    Files.createDirectories(Paths.get(dir))
    // 6 SNPs: g1,g2 perfect LD block (g1 better p), g3 independent,
    // g4 same pattern as g1 but 2Mb away, g5 not in sumstats (dropped),
    // g6 independent on chr 2
    val names = Seq("g1_A", "g2_A", "g3_A", "g4_A", "g5_A", "g6_A")
    val header = (graft.io.Plink.metaCols ++ names).mkString(" ")
    val lines = (0 until 297).map { id =>
      val base = id % 3
      val ind = (id / 3) % 3
      val ind2 = (id / 9) % 3
      val pheno = 1 + (id % 2)
      s"f$id i$id 0 0 1 $pheno $base ${2 - base} $ind $base $ind2 $ind2"
    }
    Files.write(Paths.get(s"$dir/clump.raw"),
      (header +: lines).mkString("\n").getBytes)
    val ss = Seq("snp\tchr\tpos\tp",
      "g1_A\t1\t100000\t1e-8", "g2_A\t1\t200000\t1e-5",
      "g3_A\t1\t300000\t0.2", "g4_A\t1\t2200000\t1e-6",
      "g6_A\t2\t100000\t0.3")
    Files.write(Paths.get(s"$dir/sumstats.tsv"), ss.mkString("\n").getBytes)
    graft.cli.Ingest.main(Array("--raw", s"$dir/clump.raw", "--out", s"$dir/store",
      "--chunk-rows", "50", "--seed", "7",
      "--clump-sumstats", s"$dir/sumstats.tsv",
      "--clump-kb", "1000", "--clump-r2", "0.75"))
    val s2 = spark
    val cols = graft.io.Bundle.readCols(s2, s"$dir/store")
      .orderBy("pos").collect().map(_.getString(1)).toSeq
    // g2 absorbed by g1; g5 not in sumstats -> dropped; rest kept
    assert(cols == Seq("g1_A", "g3_A", "g4_A", "g6_A"))
    val store = graft.io.Bundle.read(s2, s"$dir/store")
    assert(store.select(max(size(col("features")))).head().getInt(0) == 4)
    assert(store.count() == 297L)
  }

  test("hweChiSq: equilibrium passes, uniform fails, edge counts are finite") {
    // perfect HWE at p=0.5: (n/4, n/2, n/4) -> chisq exactly 0
    assert(LdClump.hweChiSq(25, 50, 25) == 0.0)
    // uniform thirds (the fixture pattern): hand-derived 33.0 at n=297
    assert(math.abs(LdClump.hweChiSq(99, 99, 99) - 33.0) < 1e-9)
    // monomorphic SNP (pA = 0): expected e1 = e2 = 0, guarded terms
    assert(LdClump.hweChiSq(100, 0, 0) == 0.0)
    assert(LdClump.hweChiSq(0, 0, 100) == 0.0)
    assert(LdClump.hweChiSq(0, 0, 0) == 0.0)
  }

  test("hweCounts: one-pass accumulator matches a per-column recount") {
    val s = spark
    val geno = s.range(0, 120).select(col("id"),
      org.apache.spark.sql.functions.array(
        (col("id") % 3).cast("double"),
        org.apache.spark.sql.functions.when(col("id") % 10 === 0,
          Double.NaN).otherwise((col("id") % 2).cast("double")),
        org.apache.spark.sql.functions.lit(2.0)).as("features"))
      .repartition(7)
    val c = LdClump.hweCounts(geno, "features", 3)
    assert(c(0).toSeq == Seq(40L, 40L, 40L, 0L))
    // col 1: id%2 over 120 = 60/60, minus NaNs at id%10==0 (12 ids, all
    // even -> all would have been 0): 48 zeros, 60 ones, 12 missing
    assert(c(1).toSeq == Seq(48L, 60L, 0L, 12L))
    assert(c(2).toSeq == Seq(0L, 0L, 120L, 0L))
  }

  test("hweCounts: adjusted (fractional) dosages fail loudly, not mis-bin") {
    val s = spark
    // 1.5 = a typical imputed/covariate-adjusted dosage — HWE on it is
    // statistically meaningless and must not silently count as a het
    val geno = s.range(0, 10).select(
      org.apache.spark.sql.functions.array(
        org.apache.spark.sql.functions.when(col("id") === 7, 1.5)
          .otherwise((col("id") % 3).cast("double"))).as("features"))
    val ex = intercept[org.apache.spark.SparkException] {
      LdClump.hweCounts(geno, "features", 1)
    }
    assert(ex.getMessage.contains("hard-call") ||
      Option(ex.getCause).exists(_.getMessage.contains("hard-call")),
      s"expected the hard-call message, got: ${ex.getMessage}")
    // out-of-range hard values are equally invalid (3.0 would have
    // indexed past the genotype bins; -1 would have crashed obscurely)
    val geno2 = s.range(0, 4).select(
      org.apache.spark.sql.functions.array(
        org.apache.spark.sql.functions.lit(3.0)).as("features"))
    intercept[org.apache.spark.SparkException] {
      LdClump.hweCounts(geno2, "features", 1)
    }
  }

  test("ibs screening: banded candidates recall 1.0 on planted relatedness, blocked not all-pairs") {
    val s = spark
    // 180 samples in 6 identity classes over 12 SNPs: dosage(j) =
    // ((id % 6) + j) % 3, so same-class vectors are identical and
    // cross-class vectors differ at EVERY position (IBS well below the
    // bar). SNP 5 is NaN-punched for id % 40 == 0 — the asymmetric-
    // missingness case the banding must survive (a punched/unpunched
    // same-class pair differs in exactly one band of four).
    val geno = s.range(0, 180).select(col("id"),
      array((0 until 12).map { j =>
        val base = ((col("id") % 6) + lit(j)) % 3
        if (j == 5)
          when(col("id") % 40 === 0, lit(Double.NaN))
            .otherwise(base.cast("double"))
        else base.cast("double")
      }: _*).as("features"))
      .repartition(7)
    def pairSet(df: org.apache.spark.sql.DataFrame) =
      df.select("id_a", "id_b").collect()
        .map(r => (r.getLong(0), r.getLong(1))).toSet
    val brute = LdClump.ibsPairs(geno, "id", "features")
      .filter(col("ibs_num").cast("double") /
        (lit(2.0) * col("n_valid")) >= 0.95)
    val bruteSet = pairSet(brute)
    assert(bruteSet.nonEmpty, "fixture must plant related pairs")
    val cands = pairSet(LdClump.ibsCandidatePairs(geno, "id", "features", 4))
    // recall = 1.0: every true >=0.95 pair survives the blocking stage
    assert((bruteSet -- cands).isEmpty,
      s"screening missed ${(bruteSet -- cands).size} true pairs")
    // and the blocking actually blocks: far fewer candidates than the
    // 180*179/2 = 16110 all-pairs space
    assert(cands.size < 16110 / 2,
      s"candidate set ${cands.size} is not meaningfully blocked")
    // end-to-end: screened output at the threshold == brute output
    val screened = LdClump.ibsPairsScreened(geno, "id", "features", 4)
      .filter(col("ibs_num").cast("double") /
        (lit(2.0) * col("n_valid")) >= 0.95)
    val bruteRows = brute.orderBy("id_a", "id_b").collect().toSeq
    val screenedRows = screened.orderBy("id_a", "id_b").collect().toSeq
    assert(screenedRows == bruteRows)
  }

  test("ibs screening: recall above the bucket cap is quantified, not silent") {
    val s = spark
    // Worst case for the cap: a MONOMORPHIC band. 60 samples, 6 SNPs,
    // 2 bands. Band 0 (SNPs 0-2) is all-zero — one bucket of 60, past
    // any cap below that. Band 1 (SNPs 3-5) = (id % 3, 0, 0): three
    // 20-sized buckets. True pairs at IBS >= 0.9 (ibs_num >= 11/12):
    // within-residue twins (12/12, found via band-1 buckets) AND
    // cross-residue pairs differing by one dosage unit (11/12) whose
    // ONLY agreeing band is the capped band 0 — exactly the pairs the
    // chain degradation loses.
    val geno = s.range(0, 60).select(col("id"),
      array(lit(0.0), lit(0.0), lit(0.0),
        (col("id") % 3).cast("double"), lit(0.0), lit(0.0)).as("features"))
      .repartition(5)
    def pairSet(df: org.apache.spark.sql.DataFrame) =
      df.select("id_a", "id_b").collect()
        .map(r => (r.getLong(0), r.getLong(1))).toSet
    def atThreshold(pairs: org.apache.spark.sql.DataFrame) =
      pairSet(LdClump.ibsOnPairs(pairs, geno, "id", "features")
        .filter(col("ibs_num").cast("double") /
          (lit(2.0) * col("n_valid")) >= 0.9))
    val brute = pairSet(LdClump.ibsPairs(geno, "id", "features")
      .filter(col("ibs_num").cast("double") /
        (lit(2.0) * col("n_valid")) >= 0.9))
    // 3 * C(20,2) twins + 2 * 20 * 20 diff-1 cross pairs
    assert(brute.size == 3 * 190 + 2 * 400)
    // the audit surface reports the capped bucket — never silent
    val stats = LdClump.ibsCapStats(geno, "id", "features", bands = 2,
        maxBucketSize = 40)
      .collect().map(r => r.getAs[Long]("band") ->
        (r.getAs[Long]("n_buckets"), r.getAs[Long]("n_capped"),
          r.getAs[Long]("max_bucket"))).toMap
    assert(stats(0L) == ((1L, 1L, 60L)), s"band 0 audit: ${stats(0L)}")
    assert(stats(1L) == ((3L, 0L, 20L)), s"band 1 audit: ${stats(1L)}")
    // the capped bucket degrades to its sorted id-chain: 59 pairs
    val chain = pairSet(LdClump.ibsChainPairs(geno, "id", "features",
      bands = 2, maxBucketSize = 40))
    assert(chain == (0L until 59L).map(i => (i, i + 1)).toSet)
    // recall above the cap is EXACTLY the documented best-effort: twins
    // via band-1 buckets (570) + the chain's diff-1 survivors (40 of
    // 59: consecutive ids with residues (0,1)/(1,2) pass, (2,0) is a
    // diff-2 pair the exact kernel rejects) out of 1370 true pairs
    val capped = atThreshold(LdClump.ibsCandidatePairs(geno, "id",
      "features", bands = 2, maxBucketSize = 40))
    assert(capped.subsetOf(brute), "screen must never invent pairs")
    assert(capped.size == 570 + 40,
      s"above-cap recall changed: ${capped.size} of ${brute.size}")
    val recall = capped.size.toDouble / brute.size
    assert(recall > 0.4 && recall < 0.5, f"recall $recall%.3f")
    // and with the cap above the bucket size, recall returns to 1.0
    val uncapped = atThreshold(LdClump.ibsCandidatePairs(geno, "id",
      "features", bands = 2, maxBucketSize = 60))
    assert(uncapped == brute, "uncapped screen must recover full recall")
  }

  test("variantMissingness: NaN-only inspection, defined on adjusted dosages") {
    val s = spark
    // 1.5 would make hweCounts throw — missingness must accept it
    val geno = s.range(0, 120).select(
      org.apache.spark.sql.functions.array(
        org.apache.spark.sql.functions.when(col("id") % 10 === 0, Double.NaN)
          .otherwise(1.5),
        org.apache.spark.sql.functions.lit(0.0)).as("features"))
      .repartition(5)
    val (miss, n) = LdClump.variantMissingness(geno, "features", 2)
    assert(n == 120L)
    assert(miss.toSeq == Seq(12L, 0L))
  }
}
