package graft.llm

import graft.{QueryDef, Tables}
import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** End-to-end corpus-curation pipeline — the composed shape a
  * training-data run actually executes, as ONE declarative plan:
  *
  *   exact dedup (keep min-id per content hash)
  *     → quality scoring + language ID (pure expression columns)
  *       → filter (quality ≥ 0.8, identified language)
  *         → token-budget report
  *
  * Every stage reuses the already-gated operators (d1's hash-agg dedup,
  * t1/t2's scoring columns, t4's BPE-ish count), so this query gates the
  * COMPOSITION: column dependencies across stages, filter pushdown
  * through the semi-join, and one shuffle total (the dedup groupBy —
  * scoring/filtering/counting are all scan-local expressions).
  *
  * At 100 TB: the dedup keeper aggregate is map-side combinable on
  * md5(text); everything downstream is narrow. This is the plan shape
  * to copy for a real curation run (swap the quality threshold and the
  * near-dup stage in as needed — Dedup.dropNearDuplicates composes the
  * same way).
  */
object Curation {

  /** Token-budget sampling — the data-MIXING primitive: keep, per
    * group (language/domain), the deterministic hash-ordered prefix of
    * documents whose cumulative token count stays within `budget`.
    * Ordering by a content-independent hash rank makes the kept set a
    * reproducible unbiased sample; the SQL-equivalent semantics are
    * `WHERE sum(tokens) OVER (PARTITION BY group ORDER BY rank) <=
    * budget`.
    *
    * A per-group window would serialize each group (languages are FEW
    * and HUGE — the opposite of o5's bounded-group assumption), so
    * this reuses the two-pass distributed prefix-sum shape proven in
    * `Scoring.aucDF`/`FDR.bhAdjustScalable`: range-partitioned sort on
    * (group, rank), pass 1 collects one tiny per-partition per-group
    * token total, the driver scans them into carries, pass 2 walks
    * each partition with its carry and keeps rows while the running
    * group total fits. Both passes re-read the deterministic sort's
    * shuffle files; nothing group-sized ever sits in one task and
    * driver state is O(partitions) — one boundary-group carry each.
    */
  /** Append an INCLUSIVE per-group running sum of `valueCol` as `cum`
    * (long), with rows ordered by (group, rank, id) — the distributed
    * equivalent of `SUM(v) OVER (PARTITION BY g ORDER BY rank, id)`.
    * Shared engine for [[sampleToTokenBudget]] and [[packSequences]]:
    * range-partitioned sort, pass 1 collects one tiny per-partition
    * BOUNDARY summary, the driver folds them into carries, pass 2 walks
    * each partition with its carry. A per-group window would serialize
    * each group through one task (groups here are FEW and HUGE —
    * languages, sources); this keeps parallelism = shuffle partitions.
    *
    * Driver state is O(partitions), NOT O(partitions × groups): the
    * range sort makes each group's rows a contiguous partition span, so
    * the only group in partition p that can have mass in earlier
    * partitions is p's FIRST group — one (group, carry) pair per
    * partition is the whole cross-partition state, even with millions
    * of distinct groups.
    */
  def withGroupedPrefixSum(docs: DataFrame, groupCol: String,
      valueCol: String, rankCol: String, idCol: String): DataFrame = {
    require(!docs.columns.contains("cum"),
      "input already has a 'cum' column — rename it before the prefix sum")
    val spark = docs.sparkSession
    val sorted = docs.orderBy(col(groupCol), col(rankCol), col(idCol))
    val schema = sorted.schema
    val gi = schema.fieldIndex(groupCol)
    val ti = schema.fieldIndex(valueCol)
    val rdd = sorted.rdd
    // numeric-widening reads: an IntegerType value column (the natural
    // size() output) or non-string group keys must not ClassCastException
    def valueOf(r: org.apache.spark.sql.Row): Long =
      r.get(ti).asInstanceOf[Number].longValue
    def groupOf(r: org.apache.spark.sql.Row): String = String.valueOf(r.get(gi))
    // pass 1: per partition, only the boundary summary — first group,
    // last group, and the last group's in-partition total (None = empty)
    val edges = rdd.mapPartitionsWithIndex { (pid, it) =>
      var first: String = null
      var cur: String = null
      var curSum = 0L
      it.foreach { r =>
        val g = groupOf(r)
        if (first == null) first = g
        if (g != cur) { cur = g; curSum = 0L }
        curSum += valueOf(r)
      }
      Iterator((pid, if (first == null) None else Some(PartEdge(first, cur, curSum))))
    }.collect().sortBy(_._1).map(_._2)
    val carries = boundaryCarries(edges)
    val bc = spark.sparkContext.broadcast(carries)
    val out = rdd.mapPartitionsWithIndex { (pid, it) =>
      val cum = scala.collection.mutable.HashMap.empty[String, Long]
      bc.value(pid).foreach { case (g, s) => cum(g) = s }
      it.map { r =>
        val g = groupOf(r)
        val c = cum.getOrElse(g, 0L) + valueOf(r)
        cum(g) = c
        org.apache.spark.sql.Row.fromSeq(r.toSeq :+ c)
      }
    }
    spark.createDataFrame(out,
      schema.add("cum", org.apache.spark.sql.types.LongType, nullable = false))
  }

  /** Boundary summary of one sorted partition: its first group, its
    * last group, and the last group's total within the partition
    * (first == last when the partition holds a single group, in which
    * case `lastSum` is the whole-partition total).
    */
  private[llm] final case class PartEdge(
      firstGroup: String, lastGroup: String, lastSum: Long)

  /** Fold per-partition boundary summaries into at most ONE
    * (group, carried-sum) pair per partition: `carries(p)` is defined
    * iff partition p's first group also appears in earlier partitions,
    * and then holds that group's total over all earlier partitions.
    * Relies on the range sort: a group's rows span contiguous
    * partitions, so a carry chain survives a partition only while that
    * partition is single-group (empty partitions pass it through).
    */
  private[llm] def boundaryCarries(
      edges: Array[Option[PartEdge]]): Array[Option[(String, Long)]] = {
    val out = Array.fill[Option[(String, Long)]](edges.length)(None)
    var carryG: String = null
    var carryS = 0L
    var pid = 0
    while (pid < edges.length) {
      edges(pid) match {
        case None => // empty partition: carry flows through unchanged
        case Some(e) =>
          if (carryG != null && carryG == e.firstGroup)
            out(pid) = Some((carryG, carryS))
          if (e.firstGroup == e.lastGroup && carryG != null && carryG == e.lastGroup)
            carryS += e.lastSum // same group keeps accumulating
          else { carryG = e.lastGroup; carryS = e.lastSum }
      }
      pid += 1
    }
    out
  }

  def sampleToTokenBudget(docs: DataFrame, groupCol: String,
      tokensCol: String, rankCol: String, idCol: String,
      budget: Long): DataFrame =
    withGroupedPrefixSum(docs, groupCol, tokensCol, rankCol, idCol)
      .filter(col("cum") <= budget).drop("cum")

  /** Sequence packing — concatenate each group's token stream (in
    * deterministic hash-rank order) and cut it into fixed `seqLen`
    * training sequences. Each doc is assigned the pack containing its
    * FIRST token (`floor(start / seqLen)`); docs whose span crosses a
    * pack boundary are the ones a trainer would split across sequences
    * (or shift, under a no-split policy) — their count is the packing
    * quality metric. Pure expressions over the prefix sum; no extra
    * shuffle beyond [[withGroupedPrefixSum]]'s sort.
    */
  def packSequences(docs: DataFrame, groupCol: String, tokensCol: String,
      rankCol: String, idCol: String, seqLen: Long): DataFrame = {
    require(seqLen >= 1, s"seqLen must be >= 1: $seqLen")
    val reserved = Seq("pack_id", "crosses_boundary").filter(docs.columns.contains)
    require(reserved.isEmpty,
      s"input already has ${reserved.mkString(", ")} — rename before packing")
    // `div` is integral long division — `/` would round-trip through
    // double, which cannot represent corpus-scale cumulative token
    // counts (> 2^53) exactly.
    withGroupedPrefixSum(docs, groupCol, tokensCol, rankCol, idCol)
      .withColumn("pack_id",
        expr(s"(cum - `$tokensCol`) div ${seqLen}L"))
      .withColumn("crosses_boundary",
        col(tokensCol) > 0 &&
          expr(s"(cum - 1L) div ${seqLen}L") =!= col("pack_id"))
  }

  /** Seeded weighted sampling WITHOUT replacement (Efraimidis–Spirakis
    * A-Res, IPL 2006 — public algorithm): each row draws key =
    * ln(u)/w for a uniform u and weight w > 0, and the k largest keys
    * are the sample — equivalent to u^(1/w) order statistics, so
    * inclusion probability is proportional to weight at every prefix.
    * The uniform is DERIVED, not drawn: 52 bits of md5(prefix:id:seed)
    * scaled to (0,1) — fully deterministic given (seed, id), identical
    * across retries/engines, and never exactly 0 or 1 (the +0.5 offset
    * keeps ln finite). No rand(), no RNG state.
    *
    * Scale shape: the key is one scan-local codegen'd expression;
    * selection is `orderBy(key desc).limit(k)` which Spark plans as
    * TakeOrderedAndProject — per-partition top-k heaps merged on the
    * driver, O(k) driver state, NO global sort or single-partition
    * shuffle. The weight column must be strictly positive; weights are
    * validated in the plan (a filter, not a collect).
    *
    * CONTRACT: `idCol` must uniquely identify rows. The derived uniform
    * is a pure function of (id, seed), so rows sharing an id draw
    * IDENTICAL uniforms — their inclusion keys are perfectly correlated
    * (identical when weights also match), which breaks the
    * independent-draw premise of E–S and biases the sample toward or
    * against the duplicated rows as a block. This is inherent to the
    * determinism that makes the draw oracle-replayable; dedupe or
    * synthesize a row-unique id upstream if ids can repeat.
    */
  def weightedSample(docs: DataFrame, idCol: String, weightCol: String,
      k: Int, seed: Long): DataFrame = {
    require(k >= 1, s"k must be >= 1: $k")
    val u = (conv(substring(md5(
      concat(lit("es:"), col(idCol).cast("string"), lit(":"), lit(seed.toString))),
      1, 13), 16, 10).cast("long") + lit(0.5)) / lit(4503599627370496.0d)
    docs.filter(col(weightCol).isNotNull && col(weightCol) > 0)
      .withColumn("__es_key", log(u) / col(weightCol))
      .orderBy(col("__es_key").desc, col(idCol))
      .limit(k)
      .drop("__es_key")
  }

  /** C12 — weighted corpus sample: 200 docs drawn ∝ n_chars. The
    * oracle replays the derived-uniform key in DuckDB (same md5 bits,
    * same ln/division), so the selected SET is cross-engine exact; the
    * float key itself never leaves the plan (only ids and integer
    * weights are hashed). Boundary safety: the k-th/k+1-th key gap is
    * ~1/n relative — astronomically wider than any last-ulp ln()
    * difference between libm and the JVM.
    */
  val weightedSampleQ = QueryDef.sql(
    "c12_weighted_sample",
    """WITH d AS (SELECT doc_id, n_chars AS w FROM documents
      |           WHERE n_chars IS NOT NULL AND n_chars > 0),
      |k AS (SELECT doc_id, CAST(w AS BIGINT) AS weight,
      |             ln((CAST('0x' || substr(md5('es:' || CAST(doc_id AS VARCHAR) || ':42'), 1, 13) AS BIGINT) + 0.5)
      |                / 4503599627370496.0) / w AS key
      |      FROM d)
      |SELECT doc_id, weight FROM k ORDER BY key DESC, doc_id LIMIT 200""".stripMargin) {
    (s, d) =>
      val docs = Tables.documents(s, d)
        .select(col("doc_id"), col("n_chars").as("w"))
      weightedSample(docs, "doc_id", "w", k = 200, seed = 42L)
        .select(col("doc_id"), col("w").cast("long").as("weight"))
  }

  /** Stratified weighted sampling: an exact k-per-GROUP
    * Efraimidis–Spirakis draw (the [[weightedSample]] key) selected
    * through [[graft.ops.TopKSmallestD]] — a bounded-buffer Aggregator
    * riding two-phase hash aggregation, so map-side partials hold ≤k
    * entries per group and the shuffle moves ≤k rows per (group, map
    * task). This is the c5 domain-cap shape with weights: one hot
    * group never serializes through one task, at ANY group size.
    * Rank = −ln(u)/w (positive; smallest wins), derived uniforms as in
    * [[weightedSample]] — deterministic, no RNG state. The
    * [[weightedSample]] CONTRACT applies here too: `idCol` must be
    * row-unique (duplicate ids draw identical uniforms → correlated
    * inclusion within a group).
    */
  def stratifiedWeightedSample(docs: DataFrame, groupCol: String,
      idCol: String, weightCol: String, k: Int, seed: Long): DataFrame = {
    require(k >= 1, s"k must be >= 1: $k")
    val u = (conv(substring(md5(
      concat(lit("es:"), col(idCol).cast("string"), lit(":"), lit(seed.toString))),
      1, 13), 16, 10).cast("long") + lit(0.5)) / lit(4503599627370496.0d)
    val topk = udaf(new graft.ops.TopKSmallestD(k),
      org.apache.spark.sql.Encoders.tuple(
        org.apache.spark.sql.Encoders.scalaDouble,
        org.apache.spark.sql.Encoders.scalaLong,
        org.apache.spark.sql.Encoders.scalaLong))
    docs.filter(col(weightCol).isNotNull && col(weightCol) > 0)
      .select(col(groupCol),
        (-log(u) / col(weightCol)).as("__nk"),
        col(idCol).cast("long").as("__id"),
        col(weightCol).cast("long").as("__w"))
      .groupBy(groupCol)
      .agg(topk(col("__nk"), col("__id"), col("__w")).as("__kept"))
      .select(col(groupCol), explode(col("__kept")).as("__e"))
      .select(col(groupCol), col("__e._2").as(idCol), col("__e._3").as(weightCol))
  }

  /** C13 — per-source weighted sample (20 docs per source ∝ n_chars):
    * the oracle replays the derived E–S key and selects with a
    * windowed row_number, so the hash match proves the bounded-buffer
    * aggregate equals window semantics group by group. Per-group
    * summary (count + id/weight checksums) — the float key never
    * leaves either plan; the c12 boundary-gap argument applies within
    * each group.
    */
  val stratifiedSampleQ = QueryDef.sql(
    "c13_stratified_sample",
    """WITH d AS (SELECT source, doc_id, CAST(n_chars AS BIGINT) AS w
      |           FROM documents WHERE n_chars IS NOT NULL AND n_chars > 0),
      |k AS (SELECT source, doc_id, w,
      |             -(ln((CAST('0x' || substr(md5('es:' || CAST(doc_id AS VARCHAR) || ':7'), 1, 13) AS BIGINT) + 0.5)
      |                  / 4503599627370496.0) / w) AS nk
      |      FROM d),
      |s AS (SELECT * FROM k
      |      QUALIFY row_number() OVER (PARTITION BY source
      |                                 ORDER BY nk, doc_id) <= 20)
      |SELECT source, count(*) AS n_kept,
      |       CAST(sum(doc_id) AS BIGINT) AS id_checksum,
      |       CAST(sum(w) AS BIGINT) AS w_sum
      |FROM s GROUP BY source""".stripMargin) { (s, d) =>
    val docs = Tables.documents(s, d)
      .select(col("source"), col("doc_id"), col("n_chars").as("w"))
    stratifiedWeightedSample(docs, "source", "doc_id", "w", k = 20, seed = 7L)
      .groupBy("source")
      .agg(count(lit(1)).as("n_kept"),
        sum(col("doc_id")).cast("long").as("id_checksum"),
        sum(col("w")).cast("long").as("w_sum"))
  }

  /** C2 — per-language token-budget sample: the oracle recomputes the
    * same hash-ordered cumulative window in DuckDB, so the kept-set
    * summary proves the two-pass prefix sum equals the windowed
    * semantics exactly (md5 of the id string is the shared
    * deterministic rank).
    */
  val budgetSample = QueryDef.sql(
    "c2_budget_sample",
    """WITH t AS (SELECT doc_id, lang,
      |                  len(string_split(text, ' ')) AS toks,
      |                  md5(CAST(doc_id AS VARCHAR)) AS rk
      |           FROM documents WHERE text IS NOT NULL),
      |c AS (SELECT *, SUM(toks) OVER (PARTITION BY lang
      |                                ORDER BY rk, doc_id) AS cum
      |      FROM t)
      |SELECT lang, count(*) AS n_docs, CAST(sum(toks) AS BIGINT) AS tok_sum
      |FROM c WHERE cum <= 2000 GROUP BY lang""".stripMargin) {
    (s, d) =>
      val t = Tables.documents(s, d).filter(col("text").isNotNull)
        .select(col("doc_id"), col("lang"),
          size(split(col("text"), " ")).cast("long").as("toks"),
          md5(col("doc_id").cast("string")).as("rk"))
      sampleToTokenBudget(t, "lang", "toks", "rk", "doc_id", budget = 2000L)
        .groupBy("lang")
        .agg(count(lit(1)).as("n_docs"),
          sum(col("toks")).cast("long").as("tok_sum"))
  }

  val pipeline = QueryDef.sql(
    "c1_corpus_curation",
    """WITH u AS (SELECT doc_id, text FROM documents
      |           UNION ALL
      |           SELECT doc_id + 1000000, text FROM documents),
      |k AS (SELECT min(doc_id) AS doc_id FROM u GROUP BY md5(text)),
      |d AS (SELECT u.doc_id, u.text FROM u JOIN k USING (doc_id)),
      |q AS (SELECT doc_id, text,
      |        len(string_split(lower(text), ' ')) AS n_tokens,
      |        length(regexp_replace(lower(text), '[^a-z]', '', 'g')) * 1.0
      |          / length(text) AS alpha_ratio,
      |        len(list_filter(string_split(lower(text), ' '),
      |            x -> x IN ('the','a','of','and','to'))) AS en_hits,
      |        len(list_filter(string_split(lower(text), ' '),
      |            x -> x IN ('el','la','de','y','que'))) AS es_hits,
      |        len(list_filter(string_split(lower(text), ' '),
      |            x -> x IN ('der','die','und','das','ist'))) AS de_hits
      |      FROM d),
      |s AS (SELECT *,
      |        least(1.0, alpha_ratio * 0.5
      |                   + en_hits * 1.0 / n_tokens * 2.0
      |                   + CASE WHEN n_tokens BETWEEN 20 AND 1000
      |                          THEN 0.3 ELSE 0 END) AS quality_score,
      |        CASE WHEN en_hits >= es_hits AND en_hits >= de_hits AND en_hits > 0 THEN 'en'
      |             WHEN es_hits >= de_hits AND es_hits > 0 THEN 'es'
      |             WHEN de_hits > 0 THEN 'de'
      |             ELSE 'und' END AS lang_pred
      |      FROM q)
      |SELECT count(*) AS n_kept,
      |       CAST(sum(n_tokens) AS BIGINT) AS ws_tokens,
      |       CAST(sum(len(regexp_extract_all(text,
      |              '[a-zA-Z]+|[0-9]+|[^a-zA-Z0-9\s]'))) AS BIGINT) AS bpe_tokens,
      |       round(avg(quality_score), 6) AS avg_quality
      |FROM s
      |WHERE quality_score >= 0.8 AND lang_pred <> 'und'""".stripMargin) {
    (s, d) =>
      val docs = Tables.documents(s, d).select(col("doc_id"), col("text"))
      // deterministic planted duplicates (same construction as d1) so
      // the dedup stage does real work at every scale factor
      val u = docs.unionByName(
        docs.select((col("doc_id") + 1000000).as("doc_id"), col("text")))
      // keeper row in ONE map-side-combinable aggregate: rows in an md5
      // group carry identical text, so max(text) IS the group's text and
      // the keeper (min doc_id, text) needs no join back — one shuffle
      // of the corpus instead of an agg plus a corpus-wide semi-join
      val deduped = u.groupBy(md5(col("text")).as("h"))
        .agg(min(col("doc_id")).as("doc_id"), max(col("text")).as("text"))
        .drop("h")
      val scored = TextAnalysis.langIdCols(
        TextAnalysis.qualityCols(deduped))
      scored
        .filter(col("quality_score") >= 0.8 && col("lang_pred") =!= "und")
        .agg(count(lit(1)).as("n_kept"),
          sum(col("n_tokens")).cast("long").as("ws_tokens"),
          sum(TextAnalysis.bpeTokenCount(col("text"))).cast("long").as("bpe_tokens"),
          round(avg(col("quality_score")), 6).as("avg_quality"))
  }

  /** Deterministic per-group sampling + repetition — the data-MIXING
    * primitive complementary to [[sampleToTokenBudget]]: each source
    * gets a sampling rate (downweight) and an epoch count (upweight by
    * integer repetition), and membership is decided by a content-
    * independent md5-derived hash of the id, so the mix is exactly
    * reproducible on any cluster, any partitioning — no `rand()`.
    * This is the "mixture weights" step of corpus assembly (sample
    * common-crawl down, repeat wikipedia 3 epochs).
    *
    * Scale: the per-group config is a handful of rows (broadcast
    * join), the keep-filter is a pure expression on the scan, and the
    * repetition is `explode(sequence(1, epochs))` — a narrow per-row
    * fan-out with no shuffle. One aggregate at the end.
    */
  def hashPct(idCol: org.apache.spark.sql.Column): org.apache.spark.sql.Column =
    conv(substring(md5(idCol.cast("string")), 1, 6), 16, 10).cast("long") % 100

  val sourceMix = QueryDef.sql(
    "c3_source_mix",
    """WITH cfg AS (
      |  SELECT source,
      |         ('0x' || substr(md5(source), 1, 6))::BIGINT % 50 + 25 AS rate_pct,
      |         1 + ('0x' || substr(md5(source), 1, 6))::BIGINT % 3 AS epochs
      |  FROM (SELECT DISTINCT source FROM documents)),
      |kept AS (
      |  SELECT d.doc_id, d.source, cfg.epochs,
      |         len(string_split(d.text, ' ')) AS toks
      |  FROM documents d JOIN cfg USING (source)
      |  WHERE d.text IS NOT NULL
      |    AND ('0x' || substr(md5(CAST(d.doc_id AS VARCHAR)), 1, 6))::BIGINT % 100
      |        < cfg.rate_pct),
      |mixed AS (SELECT kept.*, unnest(range(epochs)) AS epoch FROM kept)
      |SELECT source,
      |       CAST(min(epochs) AS BIGINT) AS epochs,
      |       count(DISTINCT doc_id) AS n_docs,
      |       count(*) AS n_rows,
      |       CAST(sum(toks) AS BIGINT) AS tok_sum
      |FROM mixed GROUP BY source""".stripMargin) {
    (s, d) =>
      val srcHash = conv(substring(md5(col("source")), 1, 6), 16, 10).cast("long")
      val cfg = Tables.documents(s, d).select("source").distinct()
        .select(col("source"),
          (srcHash % 50 + 25).as("rate_pct"),
          (srcHash % 3 + 1).as("epochs"))
      val kept = Tables.documents(s, d).filter(col("text").isNotNull)
        .join(broadcast(cfg), "source")
        .filter(hashPct(col("doc_id")) < col("rate_pct"))
        .select(col("doc_id"), col("source"), col("epochs"),
          size(split(col("text"), " ")).cast("long").as("toks"))
      kept.withColumn("epoch", explode(sequence(lit(1L), col("epochs"))))
        .groupBy("source")
        .agg(min(col("epochs")).cast("long").as("epochs"),
          countDistinct(col("doc_id")).as("n_docs"),
          count(lit(1)).as("n_rows"),
          sum(col("toks")).cast("long").as("tok_sum"))
  }

  /** C4 — per-source sequence packing at 512 tokens: the oracle
    * recomputes pack assignment from a windowed cumulative sum, so the
    * hash match proves the two-pass distributed prefix sum + integral
    * pack arithmetic equals the windowed definition on every doc.
    */
  val packing = QueryDef.sql(
    "c4_sequence_packing",
    """WITH t AS (SELECT doc_id, source,
      |                  len(string_split(text, ' ')) AS toks,
      |                  md5(CAST(doc_id AS VARCHAR)) AS rk
      |           FROM documents WHERE text IS NOT NULL),
      |c AS (SELECT *, SUM(toks) OVER (PARTITION BY source
      |                                ORDER BY rk, doc_id) AS cum
      |      FROM t),
      |p AS (SELECT source, doc_id, toks,
      |             (cum - toks) // 512 AS pack_id,
      |             CASE WHEN toks > 0 AND (cum - 1) // 512 <> (cum - toks) // 512
      |                  THEN 1 ELSE 0 END AS crosses
      |      FROM c)
      |SELECT source, count(*) AS n_docs,
      |       count(DISTINCT pack_id) AS n_packs,
      |       CAST(sum(crosses) AS BIGINT) AS n_crossers,
      |       CAST(sum(toks) AS BIGINT) AS tok_sum
      |FROM p GROUP BY source""".stripMargin) {
    (s, d) =>
      val t = Tables.documents(s, d).filter(col("text").isNotNull)
        .select(col("doc_id"), col("source"),
          size(split(col("text"), " ")).cast("long").as("toks"),
          md5(col("doc_id").cast("string")).as("rk"))
      packSequences(t, "source", "toks", "rk", "doc_id", seqLen = 512L)
        .groupBy("source")
        .agg(count(lit(1)).as("n_docs"),
          countDistinct(col("pack_id")).as("n_packs"),
          sum(when(col("crosses_boundary"), 1L).otherwise(0L)).cast("long")
            .as("n_crossers"),
          sum(col("toks")).cast("long").as("tok_sum"))
  }

  /** Canonical form of a crawl URL — the normalization URL-exact dedup
    * keys on (a crawl re-visits the same page through cosmetically
    * different URLs; deduping raw strings misses most of them):
    *  1. lowercase the scheme://host prefix (host case is
    *     insignificant; PATH case is significant and untouched);
    *  2. strip the fragment (never sent to the server);
    *  3. strip tracking query params (utm_*, fbclid, gclid) with their
    *     separators, then repair a dangling "?&" / trailing "?"/"&".
    * Pure regexp/string expressions — codegen'd, scan-local, and
    * exactly replayable in the oracle's SQL dialect.
    */
  def canonicalizeUrl(url: org.apache.spark.sql.Column): org.apache.spark.sql.Column = {
    val noFrag = regexp_replace(url, "#.*", "")
    val noTrack = regexp_replace(noFrag,
      "(utm_[a-z]+|fbclid|gclid)=[^&]*&?", "")
    val repaired = regexp_replace(
      regexp_replace(noTrack, "\\?&", "?"), "[?&]$", "")
    val prefix = regexp_extract(repaired, "^[a-zA-Z]+://[^/]+", 0)
    concat(lower(prefix),
      repaired.substr(length(prefix) + 1, length(repaired)))
  }

  /** C7 — URL canonicalization + URL-exact dedup: deterministic crawl
    * URLs are synthesized from (source, doc_id) with uppercase hosts,
    * tracking params in both positions, and fragments; both engines
    * canonicalize with the SAME rules, so the hash match pins every
    * regexp, the prefix lowering, and the min-id keeper choice.
    */
  val urlCanon = QueryDef.sql(
    "c7_url_canonicalize",
    """WITH u AS (
      |  SELECT doc_id, source,
      |         'HTTPS://WWW.' || source || '.COM/Docs/' ||
      |         CAST(doc_id % 97 AS VARCHAR) ||
      |         CASE CAST(doc_id % 4 AS INTEGER)
      |           WHEN 0 THEN '?utm_source=feed&id=' || CAST(doc_id % 50 AS VARCHAR)
      |           WHEN 1 THEN '?id=' || CAST(doc_id % 50 AS VARCHAR) || '&utm_campaign=x'
      |           WHEN 2 THEN '?id=' || CAST(doc_id % 50 AS VARCHAR) || '#frag'
      |           ELSE '' END AS url
      |  FROM documents),
      |c AS (
      |  SELECT doc_id, source, url,
      |         lower(regexp_extract(u2, '^[a-zA-Z]+://[^/]+')) ||
      |           substr(u2, len(regexp_extract(u2, '^[a-zA-Z]+://[^/]+')) + 1)
      |           AS canon
      |  FROM (SELECT doc_id, source, url,
      |               regexp_replace(
      |                 regexp_replace(
      |                   regexp_replace(
      |                     regexp_replace(url, '#.*', '', 'g'),
      |                     '(utm_[a-z]+|fbclid|gclid)=[^&]*&?', '', 'g'),
      |                   '\?&', '?', 'g'),
      |                 '[?&]$', '', 'g') AS u2
      |        FROM u)),
      |k AS (SELECT source, canon, min(doc_id) AS keeper FROM c GROUP BY 1, 2)
      |SELECT c.source,
      |       count(*) AS n_docs,
      |       count(DISTINCT c.url) AS n_raw_urls,
      |       count(DISTINCT c.canon) AS n_canonical,
      |       CAST(sum(DISTINCT k.keeper) AS BIGINT) AS keeper_checksum
      |FROM c JOIN k ON c.source = k.source AND c.canon = k.canon
      |GROUP BY c.source""".stripMargin) { (s, d) =>
    val u = Tables.documents(s, d).select(col("doc_id"), col("source"),
      concat(lit("HTTPS://WWW."), col("source"), lit(".COM/Docs/"),
        (col("doc_id") % 97).cast("string"),
        when(col("doc_id") % 4 === 0,
          concat(lit("?utm_source=feed&id="), (col("doc_id") % 50).cast("string")))
          .when(col("doc_id") % 4 === 1,
            concat(lit("?id="), (col("doc_id") % 50).cast("string"),
              lit("&utm_campaign=x")))
          .when(col("doc_id") % 4 === 2,
            concat(lit("?id="), (col("doc_id") % 50).cast("string"), lit("#frag")))
          .otherwise(lit(""))).as("url"))
    val c = u.withColumn("canon", canonicalizeUrl(col("url")))
    val keepers = c.groupBy("source", "canon")
      .agg(min(col("doc_id")).as("keeper"))
    c.join(keepers, Seq("source", "canon"))
      .groupBy("source")
      .agg(count(lit(1)).as("n_docs"),
        countDistinct(col("url")).as("n_raw_urls"),
        countDistinct(col("canon")).as("n_canonical"),
        sum_distinct(col("keeper")).cast("long").as("keeper_checksum"))
  }

  /** Per-domain document cap — the anti-domination curation rule (keep
    * at most `cap` docs per domain so one crawl host cannot dominate
    * the mix), selected in deterministic hash order so the kept set is
    * a reproducible unbiased sample.
    *
    * Scale: exact per-group top-K through [[graft.ops.TopKSmallest]] —
    * a bounded-buffer Aggregator riding two-phase hash aggregation, so
    * map-side partials hold ≤cap entries and the shuffle moves ≤cap
    * rows per (domain, map task). The `row_number` window the oracle
    * uses would serialize each domain through ONE task — domains are
    * few and huge at corpus scale, the exact shape windows break on.
    */
  def capPerDomain(docs: DataFrame, domainCol: String, idCol: String,
      payloadCol: String, cap: Int): DataFrame = {
    val topk = udaf(new graft.ops.TopKSmallest(cap),
      org.apache.spark.sql.Encoders.tuple(
        org.apache.spark.sql.Encoders.STRING,
        org.apache.spark.sql.Encoders.scalaLong,
        org.apache.spark.sql.Encoders.scalaLong))
    docs
      .select(col(domainCol),
        md5(col(idCol).cast("string")).as("__rk"),
        col(idCol).cast("long").as("__id"),
        col(payloadCol).cast("long").as("__pl"))
      .groupBy(domainCol)
      .agg(topk(col("__rk"), col("__id"), col("__pl")).as("__kept"))
      .select(col(domainCol), explode(col("__kept")).as("__e"))
      .select(col(domainCol), col("__e._2").as(idCol), col("__e._3").as(payloadCol))
  }

  /** C5 — cap each source at 10 docs; the oracle recomputes the kept
    * set with the windowed `row_number` definition, so the hash match
    * proves the bounded-buffer aggregate equals window semantics on
    * every (domain, doc).
    */
  val domainCap = QueryDef.sql(
    "c5_domain_cap",
    """WITH t AS (SELECT source, doc_id,
      |                  len(string_split(text, ' ')) AS toks,
      |                  md5(CAST(doc_id AS VARCHAR)) AS rk
      |           FROM documents WHERE text IS NOT NULL),
      |k AS (SELECT * FROM t
      |      QUALIFY row_number() OVER (PARTITION BY source
      |                                 ORDER BY rk, doc_id) <= 10)
      |SELECT source, count(*) AS n_kept,
      |       CAST(sum(doc_id) AS BIGINT) AS id_checksum,
      |       CAST(sum(toks) AS BIGINT) AS tok_sum
      |FROM k GROUP BY source""".stripMargin) {
    (s, d) =>
      val t = Tables.documents(s, d).filter(col("text").isNotNull)
        .select(col("source"), col("doc_id"),
          size(split(col("text"), " ")).cast("long").as("toks"))
      capPerDomain(t, "source", "doc_id", "toks", cap = 10)
        .groupBy("source")
        .agg(count(lit(1)).as("n_kept"),
          sum(col("doc_id")).cast("long").as("id_checksum"),
          sum(col("toks")).cast("long").as("tok_sum"))
  }

  /** Token-window chunking — cut each document into `chunkSize`-token
    * chunks overlapping by `overlap` tokens (context-window prep for
    * training / retrieval indexing). Chunk starts are 0, step, 2·step…
    * with step = chunkSize − overlap, generated while start ≤
    * n − overlap − 1 (so a doc shorter than one window still yields
    * exactly one chunk and no tail chunk is fully contained in its
    * predecessor). Pure scan-local expressions: `sequence` + `explode`
    * + array `slice` — no shuffle, no per-doc state; at 100 TB this is
    * scan-bound with a bounded ≤chunkSize/step-× row fan-out.
    */
  def chunkDocuments(docs: DataFrame, idCol: String, textCol: String,
      chunkSize: Int, overlap: Int): DataFrame = {
    require(chunkSize >= 1, s"chunkSize must be >= 1: $chunkSize")
    require(overlap >= 0 && overlap < chunkSize,
      s"overlap must be in [0, chunkSize): $overlap vs $chunkSize")
    val step = chunkSize - overlap
    val reserved = Seq("chunk_id", "chunk_toks", "chunk_text")
      .filter(docs.columns.contains)
    require(reserved.isEmpty,
      s"input already has ${reserved.mkString(", ")} — rename before chunking")
    docs
      .filter(col(textCol).isNotNull)
      .withColumn("__w", split(col(textCol), " "))
      .withColumn("__n", size(col("__w")))
      .withColumn("__st", explode(
        sequence(lit(0), greatest(lit(0), col("__n") - overlap - 1), lit(step))))
      .select(docs.columns.map(col) ++ Seq(
        expr(s"__st div $step").cast("long").as("chunk_id"),
        least(lit(chunkSize), col("__n") - col("__st")).cast("long")
          .as("chunk_toks"),
        concat_ws(" ", slice(col("__w"), col("__st") + 1, lit(chunkSize)))
          .as("chunk_text")): _*)
  }

  /** C6 — 64-token chunks, 16-token overlap, per-source roll-up. The
    * md5-prefix checksum over `chunk_text` pins the actual chunk
    * CONTENT (boundaries and word order), not just the counts, against
    * the oracle's list-slice recomputation.
    */
  val chunking = QueryDef.sql(
    "c6_chunking",
    """WITH t AS (SELECT doc_id, source, string_split(text, ' ') AS w,
      |                  len(string_split(text, ' ')) AS n
      |           FROM documents WHERE text IS NOT NULL),
      |s AS (SELECT doc_id, source, n, w,
      |             unnest(range(0, greatest(0, n - 16 - 1) + 1, 48)) AS st
      |      FROM t),
      |c AS (SELECT doc_id, source,
      |             least(64, n - st) AS chunk_toks,
      |             array_to_string(list_slice(w, st + 1, st + 64), ' ')
      |               AS chunk_text
      |      FROM s)
      |SELECT source, count(DISTINCT doc_id) AS n_docs, count(*) AS n_chunks,
      |       CAST(sum(chunk_toks) AS BIGINT) AS tok_sum,
      |       CAST(sum(('0x' || substr(md5(chunk_text), 1, 6))::BIGINT)
      |            AS BIGINT) AS chunk_checksum
      |FROM c GROUP BY source""".stripMargin) {
    (s, d) =>
      val docs = Tables.documents(s, d)
        .select(col("doc_id"), col("source"), col("text"))
      chunkDocuments(docs, "doc_id", "text", chunkSize = 64, overlap = 16)
        .groupBy("source")
        .agg(countDistinct(col("doc_id")).as("n_docs"),
          count(lit(1)).as("n_chunks"),
          sum(col("chunk_toks")).cast("long").as("tok_sum"),
          sum(conv(substring(md5(col("chunk_text")), 1, 6), 16, 10)
            .cast("long")).cast("long").as("chunk_checksum"))
  }

  /** C8 — curriculum phase assignment: bucket the corpus into ordered
    * training phases by a difficulty proxy (length here; quality score
    * in production — same shape). The WRONG plan at 100 TB is
    * `ntile(4) OVER (ORDER BY difficulty)` — a global-order window,
    * one task sorts the corpus. The scale plan: exact quartile
    * BOUNDARIES via the range-partitioned sort-select
    * ([[graft.ops.RelationalQueries.exactQuantilesSorted]] — 6 rows
    * reach the driver), then phase assignment is a scan-local CASE
    * against three broadcast literals. Boundaries are Catalyst-rounded
    * to 2 decimals on BOTH engines before comparison, so the
    * phase-edge tie policy (`<=`) is bit-identical cross-engine.
    * Unlike ntile, value ties land in ONE phase (no arbitrary split
    * of equal-difficulty docs across phases) — phase sizes are
    * near-equal, not forced-equal; the oracle checks the real sizes.
    */
  val curriculum = QueryDef.sql(
    "c8_curriculum_phases",
    """WITH b AS (SELECT round(quantile_cont(n_chars, 0.25), 2) AS b1,
      |                  round(quantile_cont(n_chars, 0.50), 2) AS b2,
      |                  round(quantile_cont(n_chars, 0.75), 2) AS b3
      |           FROM documents),
      |p AS (SELECT CAST(CASE WHEN n_chars <= b1 THEN 0
      |                       WHEN n_chars <= b2 THEN 1
      |                       WHEN n_chars <= b3 THEN 2
      |                       ELSE 3 END AS BIGINT) AS phase,
      |             n_chars, doc_id
      |      FROM documents, b)
      |SELECT phase, count(*) AS n_docs,
      |       CAST(sum(n_chars) AS BIGINT) AS chars,
      |       CAST(sum(doc_id) AS BIGINT) AS id_checksum
      |FROM p GROUP BY phase""".stripMargin) { (s, d) =>
    val docs = Tables.documents(s, d)
    val Seq(q1, q2, q3) = graft.ops.RelationalQueries
      .exactQuantilesSorted(docs, "n_chars", Seq(0.25, 0.50, 0.75))
    // Catalyst round for HALF_UP parity with the oracle's round()
    // (one local frame, one job — the a4 idiom)
    val spark = s; import spark.implicits._
    val bRow = Seq((q1, q2, q3)).toDF("q1", "q2", "q3")
      .select(round(col("q1"), 2), round(col("q2"), 2), round(col("q3"), 2))
      .head()
    val (b1, b2, b3) = (bRow.getDouble(0), bRow.getDouble(1), bRow.getDouble(2))
    docs.select(
        when(col("n_chars") <= b1, 0)
          .when(col("n_chars") <= b2, 1)
          .when(col("n_chars") <= b3, 2)
          .otherwise(3).cast("long").as("phase"),
        col("n_chars"), col("doc_id"))
      .groupBy("phase")
      .agg(count(lit(1)).as("n_docs"),
        sum(col("n_chars")).cast("long").as("chars"),
        sum(col("doc_id")).cast("long").as("id_checksum"))
  }

  // ------------------------------------------- model-based quality filter

  /** Numeric quality features as one ml Vector column `fv`: the t2
    * heuristics (token counts, token length, punctuation/alpha/stopword
    * ratios) plus the t6 repetition fractions — the feature set a
    * CCNet/GPT-3-style learned quality filter trains on. All features
    * are scan-local expressions except the repetition join (doc-keyed,
    * map-side combinable).
    */
  def qualityFeatures(docs: DataFrame, idCol: String = "doc_id",
      textCol: String = "text"): DataFrame = {
    val feats = Seq("n_tokens", "avg_token_len", "punct_ratio",
      "alpha_ratio", "stop_ratio", "dup2_frac", "top2_frac")
    val withQ = TextAnalysis.qualityCols(
      docs.filter(col(textCol).isNotNull && length(col(textCol)) > 0), textCol)
      .join(TextAnalysis.repetitionMetrics(docs, idCol, textCol),
        Seq(idCol), "left")
      .na.fill(0.0, Seq("dup2_frac", "top2_frac"))
    withQ.withColumn("fv",
      org.apache.spark.ml.functions.array_to_vector(
        array(feats.map(f => coalesce(col(f).cast("double"), lit(0.0))): _*)))
  }

  /** Train a GBT quality classifier on a labeled doc set (label 1 =
    * keep-worthy). Shallow trees over 7 features — the model is tiny;
    * the distributed cost is the feature scan.
    */
  def fitQualityClassifier(labeled: DataFrame, seed: Long = 7L,
      hp: graft.ml.HyperParams = graft.ml.HyperParams(eta = 0.3,
        subsample = 1.0, colsampleBytree = 1.0, maxDepth = 2, nRounds = 6))
      : org.apache.spark.ml.classification.GBTClassificationModel =
    graft.ml.Train.fitClassifier(labeled, hp, seed)

  /** Score + threshold-filter a featurized corpus with a trained quality
    * model: keeps rows whose P(keep) ≥ `threshold`. */
  def filterByQualityModel(
      model: org.apache.spark.ml.classification.GBTClassificationModel,
      featurized: DataFrame, threshold: Double): DataFrame =
    graft.ml.Train.predictClassifier(model, featurized)
      .filter(col("y_pred") >= threshold)

  /** C9 — learned quality filter end-to-end (rows-only; GBT internals
    * are not SQL-expressible). Fixture: corrupt every 3rd document into
    * single-token boilerplate (the degenerate shape the t6 repetition
    * rules target), label clean=1/corrupt=0, train on the ~80%
    * hash-split, evaluate on the rest. Golden gates: held-out AUC ≥
    * 0.95, ≥ 90% of clean held-out docs kept at the 0.5 threshold,
    * ≤ 5% of corrupted docs kept. Marked `fixture` (benchEligible =
    * false): the ~9 s cost is the fixture GBT fit, not data-scale
    * throughput — it runs in Verify but is excluded from Bench like
    * the other ML self-tests.
    */
  val qualityFilter = QueryDef(
    "c9_model_quality_filter",
    { (s, d) =>
    val docs = Tables.documents(s, d)
      .filter(col("text").isNotNull && length(col("text")) > 0)
      .select(col("doc_id"), col("text"))
    val corrupt = docs.filter(col("doc_id") % 3 === 0)
      .select((col("doc_id") + 10000000).as("doc_id"),
        array_join(array_repeat(split(col("text"), " ").getItem(0), 60), " ")
          .as("text"))
    val labeled = docs.withColumn("label", lit(1.0))
      .unionByName(corrupt.withColumn("label", lit(0.0)))
    // fixture-scale frame (tens of k rows): coalesce so the GBT's
    // per-iteration jobs don't schedule 32 near-empty tasks each
    val fz = qualityFeatures(labeled).coalesce(8)
      .localCheckpoint(eager = false)
    val isTest = abs(hash(col("doc_id"), lit(42))) % 5 === 0
    val train = fz.filter(!isTest)
    val test = fz.filter(isTest).localCheckpoint(eager = false)
    val model = fitQualityClassifier(train)
    val scored = graft.ml.Train.predictClassifier(model, test)
      .localCheckpoint(eager = false)
    val auc = graft.ml.Scoring.auc(scored, "label", "y_pred")
    val kept = scored.filter(col("y_pred") >= 0.5)
    val nCleanTest = test.filter(col("label") === 1.0).count()
    val nCorruptTest = test.filter(col("label") === 0.0).count()
    val keptClean = kept.filter(col("label") === 1.0).count()
    val keptCorrupt = kept.filter(col("label") === 0.0).count()
    import s.implicits._
    Seq((train.count(), nCleanTest + nCorruptTest,
      BigDecimal(auc).setScale(4, BigDecimal.RoundingMode.HALF_UP).toDouble,
      keptClean, keptCorrupt))
      .toDF("n_train", "n_test", "auc", "kept_clean", "kept_corrupt")
      .filter(col("auc") >= 0.95 && col("n_test") > 0 &&
        col("kept_clean") >= nCleanTest * 0.9 &&
        col("kept_corrupt") <= nCorruptTest * 0.05)
  },
    // NOT golden-pinnable (r12 lesson): unlike the Sim-fixture gates
    // (m1/m3/m4/m6/m8/m9/m10/m12) this query reads the sf-scaled
    // documents TABLE, so its counts change with the sf dir — a VALUES
    // pin green at sf0.01 would hash-mismatch the sf0.1 sweep. The
    // GBT-bound result stays rows-only behind its behavioral gates.
    oracle = None,
    benchEligible = false)

  // ------------------------------ closed-form learned quality filter (c17)


  /** Shared c17 fixture: the c9 corrupt-every-3rd construction, reduced
    * to ONE SQL-replayable feature — lexical diversity x =
    * |distinct tokens| / |tokens| (the t18 signal; boilerplate ≈ 1/60,
    * prose high). */
  private def c17Corpus(s: org.apache.spark.sql.SparkSession, d: String): DataFrame = {
    val docs = Tables.documents(s, d)
      .filter(col("text").isNotNull && length(col("text")) > 0)
      .select(col("doc_id"), col("text"))
    val corrupt = docs.filter(col("doc_id") % 3 === 0)
      .select((col("doc_id") + 10000000L).as("doc_id"),
        array_join(array_repeat(split(col("text"), " ").getItem(0), 60), " ")
          .as("text"))
    docs.withColumn("y", lit(1.0))
      .unionByName(corrupt.withColumn("y", lit(0.0)))
      .withColumn("toks", split(lower(col("text")), " "))
      .withColumn("x", size(array_distinct(col("toks"))).cast("double") /
        size(col("toks")))
      .select(col("doc_id"), col("y"), col("x"))
  }

  private val C17Iters = 8
  private val C17Lam = 0.01

  /** The DuckDB replay: the IDENTICAL ridge-IRLS recurrence unrolled
    * one (stats, beta) CTE pair per Newton step — the g1/o4 oracle
    * pattern applied to model FITTING. Every step is one aggregate
    * over the corpus; the 2×2 ridge system is solved in closed form
    * in both engines with the same expression tree. */
  private def c17OracleSql(iters: Int, lam: Double): String = {
    val base =
      s"""WITH src AS (SELECT doc_id, text FROM documents
         |            WHERE text IS NOT NULL AND len(text) > 0),
         |corpus AS (
         |  SELECT doc_id, 1.0 AS y, text FROM src
         |  UNION ALL
         |  SELECT doc_id + 10000000, 0.0,
         |         array_to_string(list_transform(range(60),
         |           i -> string_split(text, ' ')[1]), ' ')
         |  FROM src WHERE doc_id % 3 = 0),
         |f AS (SELECT doc_id, y,
         |        CAST(len(list_distinct(string_split(lower(text), ' ')))
         |          AS DOUBLE) / len(string_split(lower(text), ' ')) AS x
         |      FROM corpus),
         |b0 AS (SELECT CAST(0 AS DOUBLE) AS b0, CAST(0 AS DOUBLE) AS b1)""".stripMargin
    val steps = (1 to iters).map { k =>
      val p = k - 1
      s"""s$k AS (SELECT sum(y - mu) AS sg0, sum((y - mu) * x) AS sg1,
         |          sum(mu * (1 - mu)) AS sw00, sum(mu * (1 - mu) * x) AS sw01,
         |          sum(mu * (1 - mu) * x * x) AS sw11
         |        FROM (SELECT y, x, 1 / (1 + exp(-(b.b0 + b.b1 * x))) AS mu
         |              FROM f, b$p b)),
         |b$k AS (SELECT
         |  b.b0 + ((sw11 + $lam) * (sg0 - $lam * b.b0)
         |          - sw01 * (sg1 - $lam * b.b1)) /
         |         ((sw00 + $lam) * (sw11 + $lam) - sw01 * sw01) AS b0,
         |  b.b1 + ((sw00 + $lam) * (sg1 - $lam * b.b1)
         |          - sw01 * (sg0 - $lam * b.b0)) /
         |         ((sw00 + $lam) * (sw11 + $lam) - sw01 * sw01) AS b1
         |  FROM b$p b, s$k)""".stripMargin
    }
    val tail =
      s"""SELECT (SELECT count(*) FROM f) AS n_docs,
         |       round((SELECT b0 FROM b$iters), 4) AS b0,
         |       round((SELECT b1 FROM b$iters), 4) AS b1,
         |       (SELECT count(*) FROM f, b$iters b
         |        WHERE y = 1.0 AND b.b0 + b.b1 * x > 0) AS n_kept_clean,
         |       (SELECT count(*) FROM f, b$iters b
         |        WHERE y = 0.0 AND b.b0 + b.b1 * x > 0) AS n_kept_corrupt""".stripMargin
    (base +: steps).mkString(",\n") + "\n" + tail
  }

  /** C17 — LEARNED quality filter with a FULL DuckDB oracle: a ridge-
    * logistic classifier (λ = 0.01 on both coefficients — the fixture
    * is near-separable, so unpenalized IRLS would diverge; the ridge
    * pins a finite deterministic optimum) fit by 8 Newton steps from
    * (0,0) on lexical diversity, then threshold at P(keep) = 0.5
    * (⇔ η > 0). This is the CCNet-shape model filter c9 runs with a
    * GBT, re-expressed so the ENTIRE fit is cross-engine verifiable:
    * DuckDB replays every Newton step and must land on the same
    * rounded coefficients and the same kept counts. Engine-side gates
    * (sign, ≥90% clean kept, ≤5% corrupt kept) still guard emission.
    * Scale: each step is one map-side-combinable aggregate over the
    * corpus — 8 scans total, no shuffle wider than the 5-double
    * partial.
    */
  val logisticFilter = QueryDef.sql("c17_logistic_quality_filter",
      c17OracleSql(C17Iters, C17Lam)) { (s, d) =>
    val feats = c17Corpus(s, d).localCheckpoint(eager = false)
    val lam = C17Lam
    var b0 = 0.0; var b1 = 0.0
    for (_ <- 0 until C17Iters) {
      val mu = lit(1.0) / (lit(1.0) + exp(-(lit(b0) + lit(b1) * col("x"))))
      val w = mu * (lit(1.0) - mu)
      val r = feats.agg(
        sum(col("y") - mu).as("sg0"),
        sum((col("y") - mu) * col("x")).as("sg1"),
        sum(w).as("sw00"),
        sum(w * col("x")).as("sw01"),
        sum(w * col("x") * col("x")).as("sw11")).head()
      val (sg0, sg1) = (r.getDouble(0), r.getDouble(1))
      val (sw00, sw01, sw11) = (r.getDouble(2), r.getDouble(3), r.getDouble(4))
      val det = (sw00 + lam) * (sw11 + lam) - sw01 * sw01
      val nb0 = b0 + ((sw11 + lam) * (sg0 - lam * b0) -
        sw01 * (sg1 - lam * b1)) / det
      val nb1 = b1 + ((sw00 + lam) * (sg1 - lam * b1) -
        sw01 * (sg0 - lam * b0)) / det
      b0 = nb0; b1 = nb1
    }
    val eta = lit(b0) + lit(b1) * col("x")
    val r = feats.agg(
      count(lit(1)).as("n_docs"),
      sum(when(col("y") === 1.0 && eta > 0, 1L).otherwise(0L))
        .as("n_kept_clean"),
      sum(when(col("y") === 0.0 && eta > 0, 1L).otherwise(0L))
        .as("n_kept_corrupt"),
      sum(when(col("y") === 1.0, 1L).otherwise(0L)).as("n_clean"),
      sum(when(col("y") === 0.0, 1L).otherwise(0L)).as("n_corrupt")).head()
    val (nDocs, keptClean, keptCorrupt) =
      (r.getLong(0), r.getLong(1), r.getLong(2))
    val (nClean, nCorrupt) = (r.getLong(3), r.getLong(4))
    val spark = s; import spark.implicits._
    // 4dp, not 6: Spark's distributed sums combine in a layout-dependent
    // order, so the two engines' step-8 coefficients agree only to ~1e-9;
    // a coefficient landing within 5e-7 of a 6dp boundary could flip the
    // hash compare run-to-run. 4dp puts the boundary 100x further away
    // while still pinning 4 significant digits of the fit (dq6 precedent).
    def r4(v: Double) =
      BigDecimal(v).setScale(4, BigDecimal.RoundingMode.HALF_UP).toDouble
    Seq((nDocs, r4(b0), r4(b1), keptClean, keptCorrupt))
      .toDF("n_docs", "b0", "b1", "n_kept_clean", "n_kept_corrupt")
      .filter(lit(b1 > 0 && nDocs > 0 &&
        keptClean >= nClean * 0.9 && keptCorrupt <= nCorrupt * 0.05))
  }

  // ----------------------------------- DSIR importance-weighted selection

  /** DSIR importance weights (Xie et al. 2023, arXiv:2302.03169 — "Data
    * Selection for Language Models via Importance Resampling"): score
    * each raw document by its mean per-token log-likelihood ratio
    * between a TARGET corpus' unigram model and the raw corpus' own,
    * add-1 smoothed over the joint vocabulary. The published method
    * hashes n-gram features and Gumbel-samples; the unigram + exact
    * counts + deterministic ordering here is the reproducible
    * relational variant of the same estimator.
    *
    * Scale: two tokenize scans, two term-keyed count aggregates, two
    * term-keyed joins of the raw tokens (AQE broadcasts small vocabs),
    * one doc-keyed avg — the t13 shape, twice. Output: (idCol, n_tok,
    * dsir_weight) per raw document; higher = more target-like.
    */
  def dsirWeights(raw: DataFrame, target: DataFrame,
      idCol: String = "doc_id", textCol: String = "text"): DataFrame = {
    def toks(df: DataFrame, cols: org.apache.spark.sql.Column*) = df
      .filter(col(textCol).isNotNull)
      .select(cols :+ explode(split(lower(col(textCol)), " ")).as("term"): _*)
    val rawToks = toks(raw, col(idCol))
    val tgtToks = toks(target)
    val rc = rawToks.groupBy("term").agg(count(lit(1)).as("cr"))
    val tc = tgtToks.groupBy("term").agg(count(lit(1)).as("ct"))
    val nR = rc.agg(sum("cr")).head().getLong(0)
    val nT = tc.agg(sum("ct")).head().getLong(0)
    require(nR > 0 && nT > 0, "dsirWeights: empty raw or target corpus")
    val v = rc.select("term").unionByName(tc.select("term"))
      .distinct().count()
    rawToks
      .join(tc, Seq("term"), "left")
      .join(rc, Seq("term"))
      .groupBy(idCol)
      .agg(count(lit(1)).as("n_tok"),
        round(avg(
          log((coalesce(col("ct"), lit(0L)).cast("double") + 1.0) /
            (nT + v).toDouble) -
            log((col("cr").cast("double") + 1.0) / (nR + v).toDouble)), 4)
          .as("dsir_weight"))
  }

  /** Threshold-based DSIR selection: keep raw docs whose weight reaches
    * the (1 − frac) exact quantile — tie-INCLUSIVE (like a HAVING), so
    * the kept count can exceed frac·n by the tie group. Quantile via
    * the a4 sort-select machinery: no global top-k window, no
    * driver-side k-row collect.
    */
  def dsirSelect(raw: DataFrame, target: DataFrame, frac: Double,
      idCol: String = "doc_id", textCol: String = "text"): DataFrame = {
    require(frac > 0 && frac <= 1, s"frac=$frac out of (0, 1]")
    val w = dsirWeights(raw, target, idCol, textCol)
      .localCheckpoint(eager = false)
    val thr = graft.ops.RelationalQueries.exactQuantilesSorted(
      w, "dsir_weight", Seq(1.0 - frac)).head
    raw.join(w.filter(col("dsir_weight") >= thr).select(idCol),
      Seq(idCol), "left_semi")
  }

  /** C10 — DSIR weights, FULL per-doc oracle: target = the table's
    * `en` slice, raw = everything else; DuckDB replays the smoothed
    * ratio exactly. */
  val dsir = QueryDef.sql(
    "c10_dsir_weights",
    """WITH raw AS (SELECT doc_id, text FROM documents
      |             WHERE lang != 'en' AND text IS NOT NULL),
      |tgt AS (SELECT text FROM documents WHERE lang = 'en' AND text IS NOT NULL),
      |rt AS (SELECT doc_id, unnest(string_split(lower(text), ' ')) AS term FROM raw),
      |tt AS (SELECT unnest(string_split(lower(text), ' ')) AS term FROM tgt),
      |rc AS (SELECT term, count(*) AS cr FROM rt GROUP BY 1),
      |tc AS (SELECT term, count(*) AS ct FROM tt GROUP BY 1),
      |nn AS (SELECT (SELECT count(*) FROM rt) AS nr,
      |              (SELECT count(*) FROM tt) AS nt,
      |              (SELECT count(*) FROM
      |                 (SELECT term FROM rc UNION SELECT term FROM tc)) AS v)
      |SELECT doc_id, count(*) AS n_tok,
      |       round(avg(ln((coalesce(ct, 0) + 1.0) / (nt + v))
      |               - ln((cr + 1.0) / (nr + v))), 4) AS dsir_weight
      |FROM rt LEFT JOIN tc USING (term) JOIN rc USING (term), nn
      |GROUP BY doc_id""".stripMargin) { (s, d) =>
    val docs = Tables.documents(s, d)
    dsirWeights(docs.filter(col("lang") =!= "en"),
      docs.filter(col("lang") === "en"))
  }

  /** Leakage-safe (group-aware) train/test split: EVERY row of a group
    * lands in the same split, because the assignment is a pure hash of
    * the group key — near-duplicates clustered within a domain can
    * never straddle train/test and leak eval signal (the GroupKFold /
    * group_split contract every serious corpus split needs; a row-wise
    * random split at 100 TB guarantees cross-split near-dup leakage).
    * Deterministic (seeded md5, no rand()), scan-local (no shuffle, no
    * group table), and stable under re-runs and repartitioning.
    */
  def groupSplit(df: DataFrame, groupCol: Column, testPct: Int,
      seed: Long = 42L): DataFrame = {
    require(testPct > 0 && testPct < 100, s"testPct in (0,100): $testPct")
    val pct = conv(substring(md5(concat_ws("#", lit(seed.toString),
      groupCol.cast("string"))), 1, 6), 16, 10).cast("long") % 100
    df.withColumn("split", when(pct < testPct, "test").otherwise("train"))
  }

  /** C11 — group-aware split over a derived pseudo-domain (source +
    * doc_id mod 97 → ~500 groups at sf0.01; the real key would be the
    * URL domain). The oracle replays the seeded md5 arithmetic in
    * DuckDB and aggregates per split, so the hash match proves every
    * row of every group received the same deterministic assignment.
    * Disjointness is structural (split is a function of the group),
    * so per-split group counts must sum to the global distinct-group
    * count — pinned by the oracle's n_groups column.
    */
  val groupSplitQ = QueryDef.sql(
    "c11_group_split",
    """WITH d AS (
      |  SELECT doc_id, n_chars,
      |         source || '/' || CAST(doc_id % 97 AS VARCHAR) AS grp
      |  FROM documents),
      |s AS (SELECT doc_id, n_chars, grp,
      |             CASE WHEN ('0x' || substr(md5('42#' || grp), 1, 6))::BIGINT
      |                       % 100 < 20
      |                  THEN 'test' ELSE 'train' END AS split
      |      FROM d)
      |SELECT split, count(*) AS n_docs,
      |       count(DISTINCT grp) AS n_groups,
      |       CAST(sum(n_chars) AS BIGINT) AS char_sum
      |FROM s GROUP BY split""".stripMargin) { (s, d) =>
    val docs = Tables.documents(s, d)
      .withColumn("grp", concat_ws("/", col("source"),
        (col("doc_id") % 97).cast("string")))
    groupSplit(docs, col("grp"), testPct = 20, seed = 42L)
      .groupBy("split")
      .agg(count(lit(1)).as("n_docs"),
        countDistinct(col("grp")).as("n_groups"),
        sum(col("n_chars")).cast("long").as("char_sum"))
  }

  /** Priority-aware exact dedup with duplication-count weights: among
    * documents sharing identical content, keep the copy from the
    * HIGHEST-priority source (curated wiki over raw crawl — the
    * standard multi-source corpus rule), ties to the smallest id, and
    * carry `dup_count`/`weight` (=1/dup_count) so downstream sampling
    * can soft-downweight instead of believing each survivor is unique.
    *
    * Scale: one content-hash groupBy (map-side combinable `max_by`
    * over an integral rank + count) + one keeper join — d1's exact-
    * dedup shape plus a priority rule; no window, no driver state.
    * The rank packs (priority, -id) into ONE long so max_by stays a
    * primitive aggregate: priority·10¹⁰ − id (ids below 10¹⁰ by the
    * corpus id contract; a priority beyond ~10⁸ would overflow first
    * and is rejected).
    */
  def priorityDedup(docs: DataFrame, idCol: String = "doc_id",
      textCol: String = "text",
      priorityCol: String = "priority"): DataFrame = {
    val rank = col(priorityCol).cast("long") * 10000000000L - col(idCol)
    val groups = docs
      .groupBy(md5(col(textCol)).as("__h"))
      .agg(max_by(col(idCol), rank).as("__keeper"),
        count(lit(1)).as("dup_count"))
    docs.join(groups, docs(idCol) === groups("__keeper"))
      .drop("__h", "__keeper")
      .withColumn("weight",
        round(lit(1.0d) / col("dup_count").cast("double"), 6))
  }

  /** C14 — priority dedup under a FULL DuckDB oracle: copies of every
    * third document are planted under a rotated source name, source
    * priority derives from the source's numeric suffix (% 3), and the
    * oracle replays hash-group → packed-rank max_by → keeper join
    * identically. Output is every kept row (id, source, priority,
    * dup_count, weight) — at sf0.01, 95 of the 167 duplicate groups
    * elect the planted copy over the original, so the priority rule
    * (not just dedup) is what the hash pins.
    */
  val priorityDedupQ = QueryDef.sql(
    "c14_priority_dedup",
    """WITH u AS (
      |  SELECT doc_id, text, source FROM documents
      |  UNION ALL
      |  SELECT doc_id + 1000000, text,
      |         'src' || CAST((doc_id + 7) % 20 AS VARCHAR)
      |  FROM documents WHERE doc_id % 3 = 0
      |),
      |p AS (SELECT doc_id, text, source,
      |             CAST(regexp_extract(source, '[0-9]+') AS BIGINT) % 3
      |               AS priority
      |      FROM u),
      |k AS (SELECT md5(text) AS h,
      |             max_by(doc_id, priority * 10000000000 - doc_id) AS keeper,
      |             count(*) AS dup_count
      |      FROM p GROUP BY md5(text))
      |SELECT p.doc_id, p.source, p.priority, k.dup_count,
      |       round(CAST(1.0 AS DOUBLE) / k.dup_count, 6) AS weight
      |FROM k JOIN p ON p.doc_id = k.keeper""".stripMargin) { (s, d) =>
    val docs = Tables.documents(s, d).select("doc_id", "text", "source")
    val planted = docs.filter(col("doc_id") % 3 === 0)
      .select((col("doc_id") + 1000000L).as("doc_id"), col("text"),
        concat(lit("src"), ((col("doc_id") + 7) % 20).cast("string"))
          .as("source"))
    val u = docs.unionByName(planted)
      .withColumn("priority",
        regexp_extract(col("source"), "[0-9]+", 0).cast("long") % 3)
    priorityDedup(u)
      .select("doc_id", "source", "priority", "dup_count", "weight")
  }

  /** Temperature-flattened mixture sampling (the multilingual-LM
    * upsampling rule, q_s ∝ p_s^α with α=1/2 — Conneau et al. 2020,
    * XLM-R; Raffel et al. 2020 use the same trick for C4 mixtures):
    * keep each doc of source s with probability q_s = min(1, C/√n_s),
    * so the kept count scales as √n_s — rare sources keep a LARGER
    * fraction, flattening the mixture toward uniform. Survivors carry
    * the 1/q_s importance weight that unbiases any downstream
    * statistic.
    *
    * Scale shape: per-source counts are a map-side-combinable agg on a
    * |sources|-sized frame, broadcast-joined back; selection is then a
    * pure scan-local Bernoulli filter on the c12 derived uniform — no
    * window, no top-k state, no shuffle of the corpus. Determinism:
    * q_s = C/√n_s is one correctly-rounded IEEE sqrt + one division of
    * exact doubles — bit-identical cross-engine; u<q boundary
    * coincidence needs q to land within 2⁻⁵² of a 52-bit md5 uniform.
    */
  def temperatureSample(docs: DataFrame, idCol: String, srcCol: String,
      c: Double, seed: Long): DataFrame = {
    val counts = docs.groupBy(srcCol).agg(count(lit(1)).as("__n"))
    val u = (conv(substring(md5(
      concat(lit("tmix:"), col(idCol).cast("string"), lit(":"),
        lit(seed.toString))),
      1, 13), 16, 10).cast("long") + lit(0.5)) / lit(4503599627370496.0d)
    docs.join(broadcast(counts), srcCol)
      .withColumn("__q", least(lit(1.0), lit(c) / sqrt(col("__n"))))
      .filter(u < col("__q"))
      .withColumn("weight", round(lit(1.0) / col("__q"), 6))
      .drop("__n", "__q")
  }

  /** C15 — temperature mixture over a deterministic 60/30/10 source
    * skew (the shipped sources are uniform — flattening uniform data
    * gates nothing). FULL DuckDB oracle: same tiering, same md5
    * uniform, same √-rule arithmetic; the kept row SET and weights
    * hash-match.
    */
  val temperatureQ = QueryDef.sql(
    "c15_temperature_mix",
    """WITH t AS (SELECT doc_id,
      |             CASE WHEN doc_id % 100 < 60 THEN 'common'
      |                  WHEN doc_id % 100 < 90 THEN 'medium'
      |                  ELSE 'rare' END AS mix_source
      |           FROM documents),
      |n AS (SELECT mix_source, count(*) AS nn FROM t GROUP BY 1),
      |s AS (SELECT doc_id, t.mix_source,
      |             least(1.0, 4.0 / sqrt(nn)) AS q,
      |             (CAST('0x' || substr(md5('tmix:' || CAST(doc_id AS VARCHAR) || ':42'), 1, 13) AS BIGINT) + 0.5)
      |               / 4503599627370496.0 AS u
      |      FROM t JOIN n ON t.mix_source = n.mix_source)
      |SELECT doc_id, mix_source, round(1.0 / q, 6) AS weight
      |FROM s WHERE u < q""".stripMargin) { (s, d) =>
    val tiers = Tables.documents(s, d).select(col("doc_id"),
      when(col("doc_id") % 100 < 60, "common")
        .when(col("doc_id") % 100 < 90, "medium")
        .otherwise("rare").as("mix_source"))
    temperatureSample(tiers, "doc_id", "mix_source", c = 4.0, seed = 42L)
      .select("doc_id", "mix_source", "weight")
  }

  /** C16 — the dataset card: the one-page statistics bundle every
    * corpus release ships (HuggingFace dataset cards / "datasheets
    * for datasets", Gebru et al. 2021). One long-format (metric,
    * value) frame covering volume (docs, chars, whitespace tokens),
    * composition (languages, sources, top-language share), and
    * integrity (exact-dup fraction by content hash, empty/short-doc
    * counts). Every metric is a map-side-combinable aggregate over at
    * most two scans (raw + content-hash); values are integral or
    * round-6 fixed expressions. FULL DuckDB oracle.
    */
  val datasetCard = QueryDef.sql(
    "c16_dataset_card",
    """WITH d AS (SELECT doc_id, text, lang, source,
      |             length(text) AS n_chars,
      |             len(list_filter(string_split(text, ' '), t -> t <> ''))
      |               AS n_toks
      |           FROM documents),
      |h AS (SELECT md5(text) AS ch, count(*) AS c FROM d GROUP BY 1),
      |lt AS (SELECT lang, count(*) AS c FROM d GROUP BY 1)
      |SELECT 'n_docs' AS metric, CAST(count(*) AS DOUBLE) AS value FROM d
      |UNION ALL SELECT 'n_chars_total', CAST(sum(n_chars) AS DOUBLE) FROM d
      |UNION ALL SELECT 'n_tokens_total', CAST(sum(n_toks) AS DOUBLE) FROM d
      |UNION ALL SELECT 'mean_doc_tokens',
      |  round(CAST(sum(n_toks) AS DOUBLE) / count(*), 6) FROM d
      |UNION ALL SELECT 'n_languages', CAST(count(*) AS DOUBLE) FROM lt
      |UNION ALL SELECT 'top_lang_share',
      |  round(CAST(max(c) AS DOUBLE) / (SELECT count(*) FROM d), 6) FROM lt
      |UNION ALL SELECT 'n_sources',
      |  CAST(count(DISTINCT source) AS DOUBLE) FROM d
      |UNION ALL SELECT 'exact_dup_fraction',
      |  round(CAST((SELECT count(*) FROM d)
      |        - (SELECT count(*) FROM h) AS DOUBLE)
      |        / (SELECT count(*) FROM d), 6)
      |UNION ALL SELECT 'n_short_docs',
      |  CAST(COALESCE(sum(CASE WHEN n_toks < 5 THEN 1 END), 0) AS DOUBLE)
      |  FROM d""".stripMargin) { (s, d) =>
    val docs = Tables.documents(s, d)
      .select(col("doc_id"), col("text"), col("lang"), col("source"),
        length(col("text")).as("n_chars"),
        size(filter(split(col("text"), " "), t => t =!= "")).as("n_toks"))
    val nDocs = docs.count()
    val nHashes = docs.groupBy(md5(col("text"))).count().count()
    val base = docs.agg(
      sum(col("n_chars")).cast("double").as("n_chars_total"),
      sum(col("n_toks")).cast("double").as("n_tokens_total"),
      round(sum(col("n_toks")).cast("double") / count(lit(1)), 6)
        .as("mean_doc_tokens"),
      countDistinct(col("source")).cast("double").as("n_sources"),
      coalesce(sum(when(col("n_toks") < 5, 1L)), lit(0L)).cast("double")
        .as("n_short_docs")).head()
    val langs = docs.groupBy("lang").agg(count(lit(1)).as("c"))
      .agg(count(lit(1)), max(col("c"))).head()
    val spark = s; import spark.implicits._
    Seq(
      ("n_docs", nDocs.toDouble),
      ("n_chars_total", base.getDouble(0)),
      ("n_tokens_total", base.getDouble(1)),
      ("mean_doc_tokens", base.getDouble(2)),
      ("n_languages", langs.getLong(0).toDouble),
      ("top_lang_share", 0.0), // replaced below via Catalyst round
      ("n_sources", base.getDouble(3)),
      ("exact_dup_fraction", 0.0),
      ("n_short_docs", base.getDouble(4)))
      .toDF("metric", "value")
      .withColumn("value",
        when(col("metric") === "top_lang_share",
          round(lit(langs.getLong(1).toDouble) / lit(nDocs.toDouble), 6))
        .when(col("metric") === "exact_dup_fraction",
          round(lit((nDocs - nHashes).toDouble) / lit(nDocs.toDouble), 6))
        .otherwise(col("value")))
  }

  def all: Seq[QueryDef] =
    Seq(pipeline, budgetSample, sourceMix, packing, domainCap, chunking,
      urlCanon, curriculum, qualityFilter, logisticFilter, dsir,
      groupSplitQ, weightedSampleQ,
      stratifiedSampleQ, priorityDedupQ, temperatureQ, datasetCard)
}
