package graft.llm

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Behavior of the round-4 curation operators: benchmark
  * decontamination, PII redaction, repetition metrics, deterministic
  * mixing, and the kernel id-type guard.
  */
class CurationOpsSpec extends SparkSpec {

  private def docsDF(rows: (Long, String)*) = {
    val s = spark; import s.implicits._
    rows.toDF("doc_id", "text")
  }

  test("decontaminate drops exactly the gram-overlap set") {
    val bench = docsDF(
      (100L, "alpha beta gamma delta epsilon"),
      (101L, "tiny")) // < n tokens: whole-text gram
    val corpus = docsDF(
      (1L, "prefix words alpha beta gamma delta more tail"), // shares a 4-gram
      (2L, "completely unrelated content with other words here"),
      (3L, "alpha beta gamma zeta eta"), // 3-token overlap only — clean at n=4
      (4L, "tiny")) // exact short-doc match
    val cont = Contamination
      .contaminatedIds(corpus, bench, "doc_id", "text", n = 4)
      .collect().map(_.getLong(0)).toSet
    assert(cont == Set(1L, 4L))
    val clean = Contamination
      .decontaminate(corpus, bench, "doc_id", "text", n = 4)
      .collect().map(_.getLong(0)).toSet
    assert(clean == Set(2L, 3L))
  }

  test("PII redaction finds and replaces emails, phones, IPs") {
    val df = docsDF(
      (1L, "reach me at first.last+tag@sub.example.org thanks"),
      (2L, "call 555-0199 or visit 192.168.1.254 today"),
      (3L, "no sensitive content at all"))
      .withColumn("red", TextAnalysis.redactPii(col("text")))
    val red = df.orderBy("doc_id").collect().map(_.getString(2))
    assert(red(0) == "reach me at <EMAIL> thanks")
    assert(red(1) == "call <PHONE> or visit <IP> today")
    assert(red(2) == "no sensitive content at all")
  }

  test("repetition metrics: degenerate text scores above diverse text") {
    val df = docsDF(
      (1L, "spam spam spam spam spam spam"),
      (2L, "one two three four five six"))
    val m = TextAnalysis.repetitionMetrics(df, "doc_id", "text")
      .orderBy("doc_id").collect()
    val (dupSpam, topSpam) = (m(0).getDouble(1), m(0).getDouble(2))
    val (dupDiv, topDiv) = (m(1).getDouble(1), m(1).getDouble(2))
    // "spam spam" occurs 5 times out of 5 grams: fully repetitive
    assert(dupSpam == 0.8 && topSpam == 1.0)
    assert(dupDiv == 0.0 && topDiv == 0.2)
    assert(dupSpam > dupDiv && topSpam > topDiv)
  }

  test("deterministic hash mixing: same input, same kept set, twice") {
    val df = docsDF((0L to 199L).map(i => (i, s"doc number $i")): _*)
    def keptIds() = df.filter(Curation.hashPct(col("doc_id")) < 40)
      .collect().map(_.getLong(0)).toSet
    val a = keptIds(); val b = keptIds()
    assert(a == b)
    assert(a.nonEmpty && a.size < 200) // a real subsample, not all/none
  }

  test("sequence packing: hand-computed pack ids and boundary crossers") {
    val s = spark; import s.implicits._
    // one group, rank = id: toks 300, 300, 500, 100 → cum 300, 600, 1100, 1200
    // seqLen 512: starts 0, 300, 600, 1100 → packs 0, 0, 1, 2
    // ends(cum-1) 299, 599, 1099, 1199 → end packs 0, 1, 2, 2 → crossers: doc 2, 3
    val df = Seq((1L, "g", 300L), (2L, "g", 300L), (3L, "g", 500L), (4L, "g", 100L))
      .toDF("doc_id", "grp", "toks")
      .withColumn("rk", col("doc_id"))
    val out = Curation.packSequences(df, "grp", "toks", "rk", "doc_id", 512L)
      .orderBy("doc_id")
      .select("doc_id", "cum", "pack_id", "crosses_boundary").collect()
    assert(out.map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getBoolean(3)))
      .toSeq == Seq((1L, 300L, 0L, false), (2L, 600L, 0L, true),
        (3L, 1100L, 1L, true), (4L, 1200L, 2L, false)))
  }

  test("prefix sum isolates groups and matches a window cumsum") {
    val s = spark; import s.implicits._
    val df = Seq((1L, "a", 10L), (2L, "b", 5L), (3L, "a", 7L), (4L, "b", 2L))
      .toDF("doc_id", "grp", "v").withColumn("rk", col("doc_id"))
    val cum = Curation.withGroupedPrefixSum(df, "grp", "v", "rk", "doc_id")
      .orderBy("doc_id").select("doc_id", "cum").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSeq
    assert(cum == Seq((1L, 10L), (2L, 5L), (3L, 17L), (4L, 7L)))
  }

  test("boundaryCarries: one pair per partition, chained through spans and gaps") {
    import Curation.{PartEdge, boundaryCarries}
    // partitions: [gA..gA][gA..gA][empty][gA|gB][gB|gC][gC..gC]
    // group A spans 0-3 (through the empty partition), B spans 3-4, C 4-5
    val edges = Array[Option[PartEdge]](
      Some(PartEdge("A", "A", 10L)),
      Some(PartEdge("A", "A", 7L)),
      None,
      Some(PartEdge("A", "B", 4L)),
      Some(PartEdge("B", "C", 9L)),
      Some(PartEdge("C", "C", 1L)))
    val c = boundaryCarries(edges)
    assert(c(0).isEmpty) // nothing before partition 0
    assert(c(1).contains(("A", 10L)))
    assert(c(2).isEmpty) // empty partition gets no carry...
    assert(c(3).contains(("A", 17L))) // ...but passes it through
    assert(c(4).contains(("B", 4L))) // multi-group partition resets the chain
    assert(c(5).contains(("C", 9L)))
    // the invariant the fix exists for: ≤ 1 carry pair per partition
    assert(c.forall(_.toSeq.size <= 1))
  }

  test("boundaryCarries: 1000 random partitionings == brute-force reference") {
    import Curation.{PartEdge, boundaryCarries}
    val rnd = new scala.util.Random(20260813L)
    for (_ <- 1 to 1000) {
      // sorted (group, value) rows split at random contiguous cuts —
      // exactly the range-sort precondition the fold relies on
      val nGroups = 1 + rnd.nextInt(6)
      val rows = (0 until nGroups).flatMap { g =>
        Seq.fill(rnd.nextInt(5))((s"g$g", rnd.nextInt(100).toLong - 30L))
      }
      val nParts = 1 + rnd.nextInt(6)
      val cuts = Seq.fill(nParts - 1)(rnd.nextInt(rows.length + 1))
        .sorted :+ rows.length
      val parts = (0 +: cuts).zip(cuts).map { case (a, b) =>
        rows.slice(a, b)
      }
      val edges = parts.map { p =>
        if (p.isEmpty) None
        else {
          val lastG = p.last._1
          Some(PartEdge(p.head._1, lastG,
            p.reverse.takeWhile(_._1 == lastG).map(_._2).sum))
        }
      }.toArray
      val carries = boundaryCarries(edges)
      // reference: global running sums replayed partition by partition
      val global = scala.collection.mutable.HashMap.empty[String, Long]
      parts.zipWithIndex.foreach { case (p, pid) =>
        // pass-2 simulation: per-partition map seeded with ONLY the carry
        val local = scala.collection.mutable.HashMap.empty[String, Long]
        carries(pid).foreach { case (g, s) => local(g) = s }
        p.foreach { case (g, v) =>
          global(g) = global.getOrElse(g, 0L) + v
          local(g) = local.getOrElse(g, 0L) + v
          assert(local(g) == global(g),
            s"divergence at part $pid group $g: ${local(g)} != ${global(g)}\n" +
              s"parts=$parts\ncarries=${carries.toSeq}")
        }
      }
    }
  }

  test("prefix sum with 100k distinct groups: window parity, O(partitions) carries") {
    val s = spark; import s.implicits._
    // 100k groups × 2 rows — the per-domain shape that used to build an
    // O(partitions × groups) cumulative carry broadcast
    val n = 100000
    val df = (0 until 2 * n).map { i =>
      (i.toLong, s"dom${i % n}", (i % 13).toLong + 1L)
    }.toDF("doc_id", "grp", "v")
      .withColumn("rk", col("doc_id"))
      .repartition(32)
    val got = Curation.withGroupedPrefixSum(df, "grp", "v", "rk", "doc_id")
      .select("doc_id", "cum").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toMap
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy("grp").orderBy("rk", "doc_id")
    val want = df.withColumn("cum", sum("v").over(w))
      .select("doc_id", "cum").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toMap
    assert(got == want)
  }

  test("byte-slice kernels reject non-integral id columns loudly") {
    val s = spark; import s.implicits._
    val bad = Seq(("uuid-1", "some text here")).toDF("doc_id", "text")
    val e = intercept[IllegalArgumentException] {
      Dedup.shingleHashes(bad, "doc_id", "text")
    }
    assert(e.getMessage.contains("integral id column"))
  }

  test("canonicalizeUrl: host lowering, fragment/tracking strip, path case kept") {
    val s = spark; import s.implicits._
    val cases = Seq(
      // host lowered, PATH case preserved
      ("HTTP://Example.COM/KeepCase/Path", "http://example.com/KeepCase/Path"),
      // fragment stripped
      ("https://a.com/p#section-2", "https://a.com/p"),
      // tracking-only query collapses entirely
      ("https://a.com/p?utm_source=x", "https://a.com/p"),
      // leading tracker keeps the real param behind one '?'
      ("https://a.com/p?utm_source=x&id=7", "https://a.com/p?id=7"),
      // trailing tracker leaves no dangling '&'
      ("https://a.com/p?id=7&utm_campaign=y&fbclid=z", "https://a.com/p?id=7"),
      // gclid in the middle
      ("https://a.com/p?a=1&gclid=g&b=2", "https://a.com/p?a=1&b=2"),
      // everything at once
      ("HTTPS://B.com/Q?utm_a=1&x=2#f", "https://b.com/Q?x=2"),
      // no scheme/host match: string passes through untouched
      ("not a url", "not a url"))
    val got = cases.map(_._1).toDF("url")
      .select(Curation.canonicalizeUrl(col("url"))).collect().map(_.getString(0))
    got.zip(cases).foreach { case (g, (in, want)) =>
      assert(g == want, s"canon('$in') = '$g', want '$want'")
    }
  }

  test("capPerDomain equals the row_number-window definition") {
    val s = spark; import s.implicits._
    // 3 domains x uneven sizes, spread over many partitions so partial
    // buffers genuinely merge across map tasks
    val df = (1L to 200L).map { i =>
      (i, s"dom${(i % 3)}", i * 10)
    }.toDF("doc_id", "domain", "toks").repartition(16)
    val capped = Curation.capPerDomain(df, "domain", "doc_id", "toks", cap = 7)
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2))).toSet
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy("domain")
      .orderBy(md5(col("doc_id").cast("string")), col("doc_id"))
    val expected = df
      .withColumn("rn", row_number().over(w)).filter(col("rn") <= 7)
      .select(col("domain"), col("doc_id"), col("toks"))
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2))).toSet
    assert(capped == expected)
    assert(capped.size == 21)
  }

  test("capPerDomain keeps whole domains smaller than the cap") {
    val s = spark; import s.implicits._
    val df = Seq((1L, "small", 5L), (2L, "small", 6L))
      .toDF("doc_id", "domain", "toks")
    val kept = Curation.capPerDomain(df, "domain", "doc_id", "toks", cap = 10)
      .collect().map(_.getLong(1)).toSet
    assert(kept == Set(1L, 2L))
  }

  test("compressionRatios: degenerate text compresses below prose, deterministic") {
    val s = spark; import s.implicits._
    val df = Seq(
      (1L, "a", "spam spam spam spam spam spam spam spam spam spam spam spam"),
      (2L, "a", "the quick brown fox jumps over one lazy dog near riverbanks"),
      (3L, "b", "")).toDF("doc_id", "source", "text")
    val r = TextAnalysis.compressionRatios(df, "doc_id", "text", "source")
      .orderBy("doc_id").collect()
    val ratios = r.map(_.getDouble(4))
    assert(ratios(0) < ratios(1)) // repetition compresses better
    assert(ratios(2) == 1.0) // empty doc: defined, not NaN/zero-div
    assert(r.map(_.getString(1)).toSeq == Seq("a", "a", "b")) // carry col
    // deterministic across a second evaluation (fresh kernel instances)
    val again = TextAnalysis.compressionRatios(df, "doc_id", "text", "source")
      .orderBy("doc_id").collect().map(_.getDouble(4))
    assert(ratios.sameElements(again))
  }

  test("chunkDocuments covers every token with the declared overlap") {
    val s = spark; import s.implicits._
    val text = (1 to 103).map(i => s"w$i").mkString(" ")
    val df = Seq((1L, text), (2L, "short doc"), (3L, "")).toDF("doc_id", "text")
    val chunks = Curation.chunkDocuments(df, "doc_id", "text",
      chunkSize = 10, overlap = 3)
    val c1 = chunks.filter(col("doc_id") === 1L)
      .orderBy("chunk_id").collect()
    // starts 0,7,14,...: last start is the largest multiple of 7 <= 99
    val starts = c1.map(_.getLong(c1.head.fieldIndex("chunk_id")) * 7)
    assert(starts.head == 0L && starts.last == 98L)
    // consecutive chunks overlap by exactly 3 tokens; union covers 1..103
    val texts = c1.map(_.getString(c1.head.fieldIndex("chunk_text")))
    texts.sliding(2).foreach { case Array(a, b) =>
      assert(a.split(" ").takeRight(3).sameElements(b.split(" ").take(3)))
    case _ => ()
    }
    assert(texts.last.split(" ").last == "w103")
    assert(c1.map(_.getLong(c1.head.fieldIndex("chunk_toks"))).sum ==
      103L + (c1.length - 1) * 3)
    // a doc shorter than one window yields exactly one full-doc chunk
    val c2 = chunks.filter(col("doc_id") === 2L).collect()
    assert(c2.length == 1 && c2.head.getString(c2.head.fieldIndex("chunk_text")) == "short doc")
    // empty text still yields one (empty) chunk, not zero rows
    assert(chunks.filter(col("doc_id") === 3L).count() == 1L)
  }

  test("dsirWeights: hand-computed smoothed likelihood ratio") {
    // target: a=3, b=1 (Nt=4); raw: a=2, c=2 (Nr=4); V={a,b,c}=3
    //   token a: ln(4/7) - ln(3/7) = ln(4/3) =  0.2877
    //   token c: ln(1/7) - ln(3/7) = ln(1/3) = -1.0986
    val raw = docsDF(1L -> "a a", 2L -> "c c")
    val tgt = docsDF(10L -> "a a a b")
    val got = Curation.dsirWeights(raw, tgt)
      .collect().map(r => r.getLong(0) -> ((r.getLong(1), r.getDouble(2))))
      .toMap
    assert(got(1L) == ((2L, 0.2877)))
    assert(got(2L) == ((2L, -1.0986)))
    // selection keeps the target-like doc, drops the alien one
    val kept = Curation.dsirSelect(
      docsDF(1L -> "a a", 2L -> "a c", 3L -> "c c"), tgt, frac = 0.34)
      .select("doc_id").collect().map(_.getLong(0)).toSet
    assert(kept.contains(1L) && !kept.contains(3L), s"kept=$kept")
  }

  test("semanticDecontaminate: exact copy and near-paraphrase flagged") {
    val s = spark; import s.implicits._
    val ev = Seq((100L, Array(1f, 0f, 0f))).toDF("vec_id", "embedding")
    val corpus = Seq(
      (1L, Array(2f, 0f, 0f)), // scaled copy: cos = 1
      (2L, Array(1f, 0.1f, 0f)), // near: cos ≈ 0.995
      (3L, Array(0f, 1f, 0f))) // orthogonal
      .toDF("vec_id", "embedding")
    val pairs = Contamination
      .semanticContaminationPairs(corpus, ev, threshold = 0.99)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(pairs == Set((1L, 100L), (2L, 100L)))
    val kept = Contamination.semanticDecontaminate(corpus, ev, 0.99)
      .select("vec_id").collect().map(_.getLong(0)).toSet
    assert(kept == Set(3L))
  }

  test("qualityFeatures: 7-dim vector, single-token and repeated docs") {
    import org.apache.spark.ml.linalg.Vector
    val fz = Curation.qualityFeatures(docsDF(
      1L -> "the cat sat on the mat",
      2L -> "x", // single token: no 2-grams → repetition features 0
      3L -> "spam spam spam spam"))
      .select(col("doc_id"), col("fv"))
      .collect().map(r => r.getLong(0) -> r.getAs[Vector](1)).toMap
    assert(fz.values.forall(_.size == 7))
    assert(fz(2L)(5) == 0.0 && fz(2L)(6) == 0.0)
    // "spam spam..." has one distinct 2-gram out of 3 → dup2 = 2/3
    assert(math.abs(fz(3L)(5) - 2.0 / 3) < 1e-12)
    assert(fz(3L)(6) == 1.0)
    assert(fz(1L)(0) == 6.0) // n_tokens
  }

  test("unigramLogProbs: hand-computed corpus distribution") {
    // counts: a=3, b=1, total=4
    //   doc 1 "a a": avg(ln .75, ln .75)          = -0.2877
    //   doc 2 "a b": avg(ln .75, ln .25)          = -0.8370
    val got = TextAnalysis.unigramLogProbs(docsDF(1L -> "a a", 2L -> "a b"))
      .collect().map(r => r.getLong(0) -> ((r.getLong(1), r.getDouble(2))))
      .toMap
    assert(got(1L) == ((2L, -0.2877)))
    assert(got(2L) == ((2L, -0.837)))
    // null text contributes nothing and emits no row
    assert(TextAnalysis.unigramLogProbs(
      docsDF(1L -> "x").unionByName(
        spark.createDataFrame(
          spark.sparkContext.parallelize(Seq(
            org.apache.spark.sql.Row(2L, null: String))),
          docsDF(1L -> "x").schema))).count() == 1L)
  }

  test("groupSplit: every group lands whole in one split, deterministically") {
    val s = spark
    import s.implicits._
    import org.apache.spark.sql.functions._
    // 200 rows over 40 groups
    val df = (0L until 200L).map(i => (i, s"dom${i % 40}"))
      .toDF("id", "domain")
    val split = Curation.groupSplit(df, col("domain"), testPct = 30)
    // leakage-safety: no group straddles the splits
    val straddlers = split.groupBy("domain")
      .agg(countDistinct(col("split")).as("k"))
      .filter(col("k") > 1).count()
    assert(straddlers == 0L)
    // both splits non-empty at 30% over 40 groups
    val bySplit = split.groupBy("split").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(bySplit.keySet == Set("train", "test") &&
      bySplit.values.forall(_ > 0))
    // deterministic under repartitioning and re-evaluation
    val again = Curation.groupSplit(df.repartition(7), col("domain"), 30)
      .select("id", "split").collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    val first = split.select("id", "split").collect()
      .map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(again == first)
    // a different seed moves at least one group
    val reseeded = Curation.groupSplit(df, col("domain"), 30, seed = 7L)
      .select("id", "split").collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(reseeded != first)
    // invalid pct fails loudly
    intercept[IllegalArgumentException] {
      Curation.groupSplit(df, col("domain"), 0)
    }
  }

  test("weightedSample: deterministic, exact k, weight-proportional bias") {
    val s = spark; import s.implicits._
    val df = (1L to 2000L).map(i => (i, if (i <= 1000) 1L else 9L))
      .toDF("id", "w")
    val sel = Curation.weightedSample(df, "id", "w", k = 300, seed = 11L)
    assert(sel.count() == 300)
    val ids = sel.select("id").collect().map(_.getLong(0)).toSet
    assert(ids.size == 300) // without replacement
    // identical under re-evaluation and repartitioning (derived
    // uniforms, no RNG state)
    val again = Curation.weightedSample(df.repartition(7), "id", "w", 300, 11L)
      .select("id").collect().map(_.getLong(0)).toSet
    assert(again == ids)
    // weight-9 half must dominate the sample: E[share] = 0.9, and the
    // light half still appears (it holds 10% of the mass)
    val heavy = ids.count(_ > 1000L)
    assert(heavy > 200 && heavy < 300, s"heavy=$heavy of 300")
    // a different seed draws a different set
    val reseeded = Curation.weightedSample(df, "id", "w", 300, 12L)
      .select("id").collect().map(_.getLong(0)).toSet
    assert(reseeded != ids)
    // zero/negative/null weights are excluded, never selected
    val withBad = df.withColumn("w",
      when(col("id") % 5 === 0, lit(0L))
        .when(col("id") % 7 === 0, lit(-3L))
        .otherwise(col("w")))
    val cleanSel = Curation.weightedSample(withBad, "id", "w", 300, 11L)
      .select("id").collect().map(_.getLong(0))
    assert(cleanSel.forall(i => i % 5 != 0 && i % 7 != 0))
    intercept[IllegalArgumentException] {
      Curation.weightedSample(df, "id", "w", k = 0, seed = 1L)
    }
  }

  test("stratifiedWeightedSample: exact k per group == windowed brute force") {
    val s = spark; import s.implicits._
    val df = (1L to 900L).map(i => (s"g${i % 3}", i, 1L + (i % 17)))
      .toDF("grp", "id", "w")
    val sel = Curation.stratifiedWeightedSample(df, "grp", "id", "w", 25, 99L)
    val byGroup = sel.groupBy("grp").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(byGroup == Map("g0" -> 25L, "g1" -> 25L, "g2" -> 25L))
    // brute force: replay the key, window-rank within each group
    val u = (conv(substring(md5(
      concat(lit("es:"), col("id").cast("string"), lit(":"), lit("99"))),
      1, 13), 16, 10).cast("long") + lit(0.5)) / lit(4503599627370496.0d)
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy("grp").orderBy(col("nk"), col("id"))
    val brute = df.withColumn("nk", -log(u) / col("w"))
      .withColumn("rn", row_number().over(w)).filter(col("rn") <= 25)
      .select("grp", "id").collect().map(r => (r.getString(0), r.getLong(1))).toSet
    val got = sel.select("grp", "id").collect()
      .map(r => (r.getString(0), r.getLong(1))).toSet
    assert(got == brute)
    // deterministic under repartitioning
    val again = Curation.stratifiedWeightedSample(
      df.repartition(13), "grp", "id", "w", 25, 99L)
      .select("grp", "id").collect().map(r => (r.getString(0), r.getLong(1))).toSet
    assert(again == got)
  }

  test("weightedSample: k >= population returns everyone with positive weight") {
    val s = spark; import s.implicits._
    val df = Seq((1L, 5L), (2L, 1L), (3L, 0L)).toDF("id", "w")
    val sel = Curation.weightedSample(df, "id", "w", k = 10, seed = 3L)
      .select("id").collect().map(_.getLong(0)).toSet
    assert(sel == Set(1L, 2L))
  }

  test("weightedSample contract: duplicate ids draw identical uniforms (correlated inclusion)") {
    val s = spark; import s.implicits._
    // The scaladoc contract says idCol must be row-unique because the
    // derived uniform is a pure function of (id, seed). PIN the failure
    // mode deterministically: every id appears twice, once with w=1 and
    // once with w=9. Both copies share ONE uniform u, so their keys are
    // ln(u)/1 < ln(u)/9 (ln(u) < 0) — the heavy copy of an id ALWAYS
    // outranks its own light copy. Inclusion must therefore be monotone
    // in weight WITHIN every id: a selected light copy implies its
    // heavy twin is selected too. Independent draws would violate this
    // for some id with overwhelming probability at this size. (No
    // tie-rank brittleness: the two keys of a pair always differ.)
    val dup = (1L to 100L).flatMap(i => Seq((i, 1L), (i, 9L)))
    val sel = Curation.weightedSample(dup.toDF("id", "w"), "id", "w",
      k = 100, seed = 5L)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val lightIn = sel.collect { case (id, 1L) => id }
    assert(lightIn.forall(id => sel.contains((id, 9L))),
      s"light copy selected without its heavy twin: " +
        s"${lightIn.filterNot(id => sel.contains((id, 9L)))}")
    // and the sample is not degenerate: some pairs split (heavy in,
    // light out), so the assertion above actually discriminates
    val heavyOnly = sel.collect { case (id, 9L) => id }
      .count(id => !sel.contains((id, 1L)))
    assert(heavyOnly > 0, "fixture degenerate: every pair fully in/out")
  }

  test("lexicalDiversity: hand-computed TTR / hapax / bigram ratios") {
    val out = TextAnalysis.lexicalDiversity(docsDF(
        (1L, "the cat sat on the mat"), // 6 tok, 5 types, 4 hapax, 5/5 bigrams
        (2L, "a a a"),                  // all same: 0 hapax, 1/2 bigrams
        (3L, "solo"),                   // single token: bigram_ttr null
        (4L, "B b B")))                 // lowercased: one type
      .select("doc_id", "n_tokens", "n_distinct", "ttr", "hapax_ratio",
        "bigram_ttr")
      .collect().map(r => r.getLong(0) -> r).toMap
    def d(x: Any): Double = x.asInstanceOf[Double]
    assert(out(1L).getLong(1) == 6 && out(1L).getLong(2) == 5)
    assert(d(out(1L).get(3)) == 0.833333 && d(out(1L).get(4)) == 0.666667)
    assert(d(out(1L).get(5)) == 1.0)
    assert(d(out(2L).get(3)) == 0.333333 && d(out(2L).get(4)) == 0.0)
    assert(d(out(2L).get(5)) == 0.5)
    assert(out(3L).getLong(1) == 1 && d(out(3L).get(4)) == 1.0 &&
      out(3L).isNullAt(5))
    assert(out(4L).getLong(2) == 1 && d(out(4L).get(4)) == 0.0)
  }

  test("temperatureSample flattens: rare sources keep a larger fraction") {
    import spark.implicits._
    val docs = ((1L to 1600L).map(i => (i, "big")) ++
      (2001L to 2100L).map(i => (i, "small"))).toDF("doc_id", "src")
    val kept = Curation.temperatureSample(docs, "doc_id", "src", c = 4.0,
      seed = 1L)
    val bySrc = kept.groupBy("src").count()
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    // q_big = 4/40 = 0.1 (E=160), q_small = 4/10 = 0.4 (E=40): the kept
    // FRACTION of the rare source must be well above the big one's
    val fBig = bySrc("big").toDouble / 1600
    val fSmall = bySrc("small").toDouble / 100
    assert(fSmall > 2 * fBig, s"no flattening: big=$fBig small=$fSmall")
    // weights are exactly 1/q (round6)
    val w = kept.select("src", "weight").distinct()
      .collect().map(r => r.getString(0) -> r.getDouble(1)).toMap
    assert(w("big") == 10.0 && w("small") == 2.5)
    // deterministic: same seed reproduces the identical kept set
    val again = Curation.temperatureSample(docs, "doc_id", "src", 4.0, 1L)
    assert(kept.select("doc_id").except(again.select("doc_id")).isEmpty &&
      again.select("doc_id").except(kept.select("doc_id")).isEmpty)
  }
}
