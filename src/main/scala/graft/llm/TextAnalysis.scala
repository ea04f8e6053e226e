package graft.llm

import graft.{QueryDef, Tables}
import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Text-analysis operators for LLM training-data pipelines over the
  * `documents` table: language-ID (stopword-hit heuristic), quality
  * scoring (length/punct/stopword ratios), token counting (whitespace +
  * regex word tokens), and document fingerprinting (min-hash-1 over
  * token 3-gram shingles).
  *
  * All four are pure column expressions — whole-stage codegen, no
  * shuffle, no UDFs — so at 100 TB they run at parquet-scan speed and
  * the only cost is the scan itself. Every operator has a DuckDB oracle
  * computing the SAME deterministic definition, so the hash match
  * proves computation parity (the synthetic corpus's `lang` labels are
  * unrelated to its text, so linguistic accuracy is not testable here).
  */
object TextAnalysis {

  /** Stopword sets for the hit-count heuristic (tiny on purpose: the
    * operator contract is the scoring pipeline, not lexicon size). */
  val stops: Map[String, Seq[String]] = Map(
    "en" -> Seq("the", "a", "of", "and", "to"),
    "es" -> Seq("el", "la", "de", "y", "que"),
    "de" -> Seq("der", "die", "und", "das", "ist"))

  def tokensCol(text: Column): Column = split(lower(text), " ")

  /** Occurrences of `words` as whole space-delimited tokens of the
    * LOWERCASED text. Counted with a codegen'd `regexp_count` — the
    * equivalent `size(filter(tokens, ...))` HOF is interpreted
    * (CodegenFallback) and re-evaluates the split per language after
    * project collapse, which made stopword counting the dominant cost
    * of t1/t2/c1. The `(^| )word(?=$| )` shape consumes the LEFT
    * separator only, so adjacent stopwords ("a a the") all count;
    * token-equality parity with the HOF form is pinned by the DuckDB
    * list_filter oracles (t1/t2/c1 hash gates) and TextDedupSpec.
    */
  private def hitCount(lowerText: Column, words: Seq[String]): Column =
    regexp_count(lowerText, lit(s"(^| )(${words.mkString("|")})(?=$$| )"))

  /** Language-ID: argmax of stopword hits with deterministic tiebreak
    * en > es > de > und(etermined). */
  def langIdCols(df: DataFrame, textCol: String = "text"): DataFrame = {
    val lt = lower(col(textCol))
    df.withColumn("en_hits", hitCount(lt, stops("en")))
      .withColumn("es_hits", hitCount(lt, stops("es")))
      .withColumn("de_hits", hitCount(lt, stops("de")))
      .withColumn("lang_pred",
        when(col("en_hits") >= col("es_hits") && col("en_hits") >= col("de_hits") &&
          col("en_hits") > 0, "en")
          .when(col("es_hits") >= col("de_hits") && col("es_hits") > 0, "es")
          .when(col("de_hits") > 0, "de")
          .otherwise("und"))
  }

  /** Quality metrics + a fixed-weight score in [0,1]-ish range:
    * length, token stats, punctuation / alpha / stopword ratios. */
  def qualityCols(df: DataFrame, textCol: String = "text"): DataFrame = {
    val t = col(textCol)
    val toks = tokensCol(t)
    df.withColumn("n_tokens", size(toks).cast("long"))
      .withColumn("n_word_tokens", regexp_count(lower(t), lit("[a-z]+")).cast("long"))
      .withColumn("avg_token_len",
        (length(t) - (col("n_tokens") - 1)).cast("double") / col("n_tokens"))
      .withColumn("punct_ratio",
        length(regexp_replace(t, "[^.!?,;:]", "")).cast("double") / length(t))
      .withColumn("alpha_ratio",
        length(regexp_replace(lower(t), "[^a-z]", "")).cast("double") / length(t))
      .withColumn("stop_ratio",
        hitCount(lower(t), stops("en")).cast("double") / col("n_tokens"))
      .withColumn("quality_score",
        least(lit(1.0),
          col("alpha_ratio") * 0.5 + col("stop_ratio") * 2.0 +
            when(col("n_tokens") >= 20 && col("n_tokens") <= 1000, 0.3)
              .otherwise(0.0)))
  }

  /** Gopher-style rule filter (Rae et al. 2021, "Scaling Language
    * Models: Methods, Analysis & Insights from Training Gopher",
    * Appendix A — public method): per-document boolean rules over
    * cheap scan-local features, AND-ed into a `keep` verdict. Distinct
    * from [[qualityCols]]' soft score — this is the hard rule-set
    * production filters apply before any learned scoring.
    *
    * Rules (bounds from the paper, simplified to the features the
    * corpus schema supports): word count in [minWords, 100k]; mean
    * word length in [3, 10]; symbol-to-word ratio ('#' or '...')
    * < 0.1; < 90% of lines bullet-started; < 30% of lines
    * ellipsis-ended; > 80% of words contain an alphabetic char; at
    * least 2 distinct stopwords present. The stopword set and word
    * floor are parameters (paper defaults: the/be/to/of/and/that/
    * have/with, 50) — defaulted here to the engine's `stops("en")`
    * list so the rule discriminates on this synthetic corpus too.
    *
    * Scale shape: every feature is codegen'd scan arithmetic over the
    * document itself (per-row bounded arrays) — the filter is a pure
    * map over the corpus scan, no shuffle, no state.
    */
  def gopherRuleCols(df: DataFrame, textCol: String = "text",
      stopWords: Seq[String] = stops("en"),
      minWords: Long = 50L): DataFrame = {
    val t = col(textCol)
    val toks = split(t, " ")
    val lines = split(t, "\n")
    df.withColumn("n_words", size(toks).cast("long"))
      .withColumn("mean_word_len",
        aggregate(toks, lit(0L), (acc, x) => acc + length(x)).cast("double") /
          col("n_words"))
      .withColumn("alpha_word_ratio",
        size(filter(toks, x => x.rlike("[a-zA-Z]"))).cast("double") /
          col("n_words"))
      .withColumn("symbol_word_ratio",
        regexp_count(t, lit("#|\\.\\.\\.")).cast("double") / col("n_words"))
      .withColumn("bullet_line_ratio",
        size(filter(lines, l =>
          trim(l).startsWith("-") || trim(l).startsWith("*")))
          .cast("double") / size(lines))
      .withColumn("ellipsis_line_ratio",
        size(filter(lines, l => l.endsWith("...")))
          .cast("double") / size(lines))
      .withColumn("stop_distinct",
        stopWords.map(w => when(array_contains(toks, w), 1L).otherwise(0L))
          .reduce(_ + _))
      .withColumn("keep",
        col("n_words").between(minWords, 100000L) &&
          col("mean_word_len").between(3.0, 10.0) &&
          col("symbol_word_ratio") < 0.1 &&
          col("bullet_line_ratio") < 0.9 &&
          col("ellipsis_line_ratio") < 0.3 &&
          col("alpha_word_ratio") > 0.8 &&
          col("stop_distinct") >= 2L)
  }

  /** T17 — Gopher rule filter over the corpus: per-rule violation
    * counts plus the surviving-document count, DuckDB-oracled with the
    * identical feature arithmetic (same IEEE divisions, inclusive
    * BETWEEN bounds both engines).
    */
  val gopherQ = QueryDef.sql(
    "t17_gopher_rules",
    """WITH q AS (
      |  SELECT doc_id, text,
      |         string_split(text, ' ') AS toks,
      |         string_split(text, chr(10)) AS lns
      |  FROM documents WHERE text IS NOT NULL AND length(text) > 0),
      |f AS (
      |  SELECT len(toks) AS n_words,
      |         list_sum(list_transform(toks, x -> length(x))) * 1.0
      |           / len(toks) AS mwl,
      |         len(list_filter(toks, x -> regexp_matches(x, '[a-zA-Z]'))) * 1.0
      |           / len(toks) AS awr,
      |         len(regexp_extract_all(text, '#|\.\.\.')) * 1.0
      |           / len(toks) AS swr,
      |         len(list_filter(lns, l -> trim(l) LIKE '-%' OR trim(l) LIKE '*%')) * 1.0
      |           / len(lns) AS blr,
      |         len(list_filter(lns, l -> l LIKE '%...')) * 1.0
      |           / len(lns) AS elr,
      |         (CASE WHEN list_contains(toks, 'the') THEN 1 ELSE 0 END +
      |          CASE WHEN list_contains(toks, 'a') THEN 1 ELSE 0 END +
      |          CASE WHEN list_contains(toks, 'of') THEN 1 ELSE 0 END +
      |          CASE WHEN list_contains(toks, 'and') THEN 1 ELSE 0 END +
      |          CASE WHEN list_contains(toks, 'to') THEN 1 ELSE 0 END) AS sd
      |  FROM q)
      |SELECT count(*) AS n_docs,
      |       CAST(sum(CASE WHEN NOT (n_words BETWEEN 50 AND 100000) THEN 1 ELSE 0 END) AS BIGINT) AS v_words,
      |       CAST(sum(CASE WHEN NOT (mwl BETWEEN 3.0 AND 10.0) THEN 1 ELSE 0 END) AS BIGINT) AS v_word_len,
      |       CAST(sum(CASE WHEN swr >= 0.1 THEN 1 ELSE 0 END) AS BIGINT) AS v_symbol,
      |       CAST(sum(CASE WHEN blr >= 0.9 THEN 1 ELSE 0 END) AS BIGINT) AS v_bullet,
      |       CAST(sum(CASE WHEN elr >= 0.3 THEN 1 ELSE 0 END) AS BIGINT) AS v_ellipsis,
      |       CAST(sum(CASE WHEN awr <= 0.8 THEN 1 ELSE 0 END) AS BIGINT) AS v_alpha,
      |       CAST(sum(CASE WHEN sd < 2 THEN 1 ELSE 0 END) AS BIGINT) AS v_stop,
      |       CAST(sum(CASE WHEN (n_words BETWEEN 50 AND 100000)
      |                      AND (mwl BETWEEN 3.0 AND 10.0)
      |                      AND swr < 0.1 AND blr < 0.9 AND elr < 0.3
      |                      AND awr > 0.8 AND sd >= 2
      |                 THEN 1 ELSE 0 END) AS BIGINT) AS n_kept
      |FROM f""".stripMargin) { (s, d) =>
    val docs = Tables.documents(s, d)
      .filter(col("text").isNotNull && length(col("text")) > 0)
    gopherRuleCols(docs)
      .agg(count(lit(1)).as("n_docs"),
        sum(when(!col("n_words").between(50L, 100000L), 1L).otherwise(0L))
          .cast("long").as("v_words"),
        sum(when(!col("mean_word_len").between(3.0, 10.0), 1L).otherwise(0L))
          .cast("long").as("v_word_len"),
        sum(when(col("symbol_word_ratio") >= 0.1, 1L).otherwise(0L))
          .cast("long").as("v_symbol"),
        sum(when(col("bullet_line_ratio") >= 0.9, 1L).otherwise(0L))
          .cast("long").as("v_bullet"),
        sum(when(col("ellipsis_line_ratio") >= 0.3, 1L).otherwise(0L))
          .cast("long").as("v_ellipsis"),
        sum(when(col("alpha_word_ratio") <= 0.8, 1L).otherwise(0L))
          .cast("long").as("v_alpha"),
        sum(when(col("stop_distinct") < 2L, 1L).otherwise(0L))
          .cast("long").as("v_stop"),
        sum(when(col("keep"), 1L).otherwise(0L)).cast("long").as("n_kept"))
  }

  /** Fingerprint: lexicographic min of md5 over token 3-gram shingles —
    * a 1-permutation MinHash usable as a cheap near-dup prefilter key.
    * Falls back to md5(text) for <3-token documents.
    */
  def fingerprintCol(textCol: Column): Column = {
    val toks = split(textCol, " ")
    when(size(toks) < 3, md5(textCol)).otherwise(
      array_min(transform(sequence(lit(1), size(toks) - 2),
        i => md5(concat_ws(" ", slice(toks, i, lit(3)))))))
  }

  /** Corpus-scale fingerprints as a partition-local byte-slice kernel
    * (same shape as Dedup.minhashSignatures, see [[ByteSliceText]]):
    * every 3-token shingle string is a contiguous UTF-8 slice of the
    * text, so MD5 runs over raw byte ranges in place — no shingle
    * strings, no interpreted higher-order transform (HOF lambdas never
    * whole-stage-codegen, so [[fingerprintCol]] pays per-element
    * interpretation + string building in the scan hot path). The min
    * is taken over the 16 digest BYTES unsigned-lexicographically,
    * which equals the hex-string ordering (byte→two-hex-chars is
    * monotone), then hex-encoded once per doc. Bit-identical to
    * [[fingerprintCol]]; asserted in TextDedupSpec.
    */
  def fingerprints(docs: DataFrame, idCol: String, textCol: String): DataFrame = {
    graft.util.Ids.requireLongCompatible(docs, idCol, "fingerprints")
    val spark = docs.sparkSession
    import spark.implicits._
    docs.filter(col(textCol).isNotNull)
      .select(col(idCol).cast("long"), encode(col(textCol), "UTF-8"))
      .as[(Long, Array[Byte])]
      .mapPartitions { it =>
        val md = java.security.MessageDigest.getInstance("MD5")
        val hexFmt = java.util.HexFormat.of()
        var starts = new Array[Int](256)
        def less(a: Array[Byte], b: Array[Byte]): Boolean = {
          var i = 0
          while (i < 16) {
            val d = (a(i) & 0xff) - (b(i) & 0xff)
            if (d != 0) return d < 0
            i += 1
          }
          false
        }
        it.map { case (id, bytes) =>
          val len = bytes.length
          val (st, nToks) = ByteSliceText.tokenStarts(bytes, starts)
          starts = st
          var min: Array[Byte] = null
          def consider(off: Int, sliceLen: Int): Unit = {
            md.reset(); md.update(bytes, off, sliceLen)
            val d = md.digest()
            if (min == null || less(d, min)) min = d
          }
          if (nToks < 3) consider(0, len)
          else {
            var w = 0
            while (w <= nToks - 3) {
              val s0 = starts(w)
              val end = if (w + 3 < nToks) starts(w + 3) - 2 else len - 1
              consider(s0, end - s0 + 1)
              w += 1
            }
          }
          (id, hexFmt.formatHex(min))
        }
      }.toDF(idCol, "fp")
  }

  /** Rabin–Karp ROLLING-hash fingerprint: polynomial hash of every
    * 16-codepoint window, maintained with the O(1) update
    * h ← (h·B + c_in − c_out·B^K) mod M, so a document of n codepoints
    * costs O(n) regardless of window count — the rolling-hash
    * construction the content-defined-chunking / dedup literature uses
    * (vs [[fingerprintCol]]'s per-shingle md5, which re-hashes every
    * window from scratch). Fingerprint = min window hash (1-permutation
    * MinHash over windows). M = 2³¹−1, B = 131: every intermediate fits
    * long arithmetic in both engines, and the t5 oracle recomputes each
    * window NON-rolling (Σ c_j·B^{K−1−j} mod M over codepoints via
    * DuckDB `unicode(substr)`), so the hash match proves the rolling
    * update equals the windowed definition on every document.
    * Documents shorter than the window hash their full codepoint
    * sequence.
    */
  val rollM: Long = (1L << 31) - 1
  val rollB: Long = 131L
  val rollWindow: Int = 16

  def rollingFingerprints(docs: DataFrame, idCol: String, textCol: String): DataFrame = {
    graft.util.Ids.requireLongCompatible(docs, idCol, "rollingFingerprints")
    val spark = docs.sparkSession
    import spark.implicits._
    val K = rollWindow
    docs.filter(col(textCol).isNotNull)
      .select(col(idCol).cast("long"), col(textCol))
      .as[(Long, String)]
      .mapPartitions { it =>
        // B^K mod M — the removal factor for the codepoint leaving the window
        val bK = { var p = 1L; var i = 0; while (i < K) { p = p * rollB % rollM; i += 1 }; p }
        it.map { case (id, text) =>
          val cps = text.codePoints().toArray
          val n = cps.length
          var h = 0L
          var best = Long.MaxValue
          var j = 0
          while (j < n) {
            h = (h * rollB + cps(j) % rollM) % rollM
            if (j >= K) h = ((h - cps(j - K) % rollM * bK % rollM) % rollM + rollM) % rollM
            if (j >= K - 1) { if (h < best) best = h }
            j += 1
          }
          if (n < K) best = h // short doc: hash of the whole sequence
          (id, best)
        }
      }.toDF(idCol, "fp")
  }

  // ---------------------------------------------------------------- queries

  val langId = QueryDef.sql(
    "t1_lang_id",
    """WITH t AS (SELECT lang, string_split(lower(text), ' ') AS toks FROM documents),
      |h AS (SELECT lang,
      |        len(list_filter(toks, x -> x IN ('the','a','of','and','to'))) AS en_hits,
      |        len(list_filter(toks, x -> x IN ('el','la','de','y','que'))) AS es_hits,
      |        len(list_filter(toks, x -> x IN ('der','die','und','das','ist'))) AS de_hits
      |      FROM t),
      |p AS (SELECT lang,
      |        CASE WHEN en_hits >= es_hits AND en_hits >= de_hits AND en_hits > 0 THEN 'en'
      |             WHEN es_hits >= de_hits AND es_hits > 0 THEN 'es'
      |             WHEN de_hits > 0 THEN 'de'
      |             ELSE 'und' END AS lang_pred
      |      FROM h)
      |SELECT lang_pred, count(*) AS n,
      |       CAST(sum(CASE WHEN lang_pred = lang THEN 1 ELSE 0 END) AS BIGINT) AS n_label_match
      |FROM p GROUP BY 1""".stripMargin) {
    (s, d) =>
      langIdCols(Tables.documents(s, d))
        .groupBy("lang_pred")
        .agg(count(lit(1)).as("n"),
          sum(when(col("lang_pred") === col("lang"), 1L).otherwise(0L))
            .cast("long").as("n_label_match"))
  }

  val quality = QueryDef.sql(
    "t2_quality_score",
    """WITH q AS (
      |  SELECT doc_id, length(text) AS n_chars,
      |         len(string_split(lower(text), ' ')) AS n_tokens,
      |         len(regexp_extract_all(lower(text), '[a-z]+')) AS n_word_tokens,
      |         length(regexp_replace(text, '[^.!?,;:]', '', 'g')) * 1.0 / length(text) AS punct_ratio,
      |         length(regexp_replace(lower(text), '[^a-z]', '', 'g')) * 1.0 / length(text) AS alpha_ratio,
      |         len(list_filter(string_split(lower(text), ' '),
      |             x -> x IN ('the','a','of','and','to'))) * 1.0
      |           / len(string_split(lower(text), ' ')) AS stop_ratio
      |  FROM documents)
      |SELECT count(*) AS n,
      |       CAST(sum(n_tokens) AS BIGINT) AS tok_sum,
      |       CAST(sum(n_word_tokens) AS BIGINT) AS word_tok_sum,
      |       round(avg(punct_ratio), 6) AS avg_punct,
      |       round(avg(alpha_ratio), 6) AS avg_alpha,
      |       round(avg(least(1.0, alpha_ratio * 0.5 + stop_ratio * 2.0 +
      |             CASE WHEN n_tokens BETWEEN 20 AND 1000 THEN 0.3 ELSE 0 END)), 6)
      |         AS avg_quality
      |FROM q""".stripMargin) {
    (s, d) =>
      qualityCols(Tables.documents(s, d))
        .agg(count(lit(1)).as("n"),
          sum(col("n_tokens")).cast("long").as("tok_sum"),
          sum(col("n_word_tokens")).cast("long").as("word_tok_sum"),
          round(avg(col("punct_ratio")), 6).as("avg_punct"),
          round(avg(col("alpha_ratio")), 6).as("avg_alpha"),
          round(avg(col("quality_score")), 6).as("avg_quality"))
  }

  val fingerprint = QueryDef.sql(
    "t3_fingerprint",
    """WITH f AS (
      |  SELECT doc_id,
      |    CASE WHEN len(string_split(text, ' ')) < 3 THEN md5(text)
      |         ELSE list_min(list_transform(
      |                range(1, len(string_split(text, ' ')) - 1),
      |                i -> md5(string_split(text, ' ')[i] || ' ' ||
      |                         string_split(text, ' ')[i+1] || ' ' ||
      |                         string_split(text, ' ')[i+2])))
      |    END AS fp
      |  FROM documents)
      |SELECT count(DISTINCT fp) AS n_distinct_fp, count(*) AS n,
      |       min(fp) AS min_fp, max(fp) AS max_fp
      |FROM f""".stripMargin) {
    (s, d) =>
      fingerprints(Tables.documents(s, d), "doc_id", "text")
        .agg(countDistinct(col("fp")).as("n_distinct_fp"),
          count(lit(1)).as("n"),
          min(col("fp")).as("min_fp"), max(col("fp")).as("max_fp"))
  }

  /** BPE-ish pre-tokenizer pattern (GPT-2-style classes, simplified to
    * a dialect-neutral regex both Java and RE2 read identically):
    * letter runs | digit runs | single non-alnum non-space symbols.
    * Counting these approximates a subword tokenizer's input segmenting
    * — the "token budget" number a training-data pipeline reports —
    * without a vocab. */
  val bpeTokenPattern = "[a-zA-Z]+|[0-9]+|[^a-zA-Z0-9\\s]"

  def bpeTokenCount(textCol: Column): Column =
    regexp_count(textCol, lit(bpeTokenPattern)).cast("long")

  /** T4 — corpus token budget: whitespace tokens vs BPE-ish tokens,
    * per-doc mean and max. Pure codegen'd regexp over the scan — the
    * canonical "how many training tokens is this corpus" pass.
    */
  val tokenBudget = QueryDef.sql(
    "t4_token_budget",
    """WITH t AS (
      |  SELECT len(string_split(text, ' ')) AS ws,
      |         len(regexp_extract_all(text, '[a-zA-Z]+|[0-9]+|[^a-zA-Z0-9\s]')) AS bpe
      |  FROM documents)
      |SELECT count(*) AS n_docs,
      |       CAST(sum(ws) AS BIGINT) AS ws_tok_sum,
      |       CAST(sum(bpe) AS BIGINT) AS bpe_tok_sum,
      |       round(avg(bpe), 6) AS avg_bpe_per_doc,
      |       CAST(max(bpe) AS BIGINT) AS max_bpe
      |FROM t""".stripMargin) {
    (s, d) =>
      Tables.documents(s, d)
        .select(size(split(col("text"), " ")).cast("long").as("ws"),
          bpeTokenCount(col("text")).as("bpe"))
        .agg(count(lit(1)).as("n_docs"),
          sum(col("ws")).cast("long").as("ws_tok_sum"),
          sum(col("bpe")).cast("long").as("bpe_tok_sum"),
          round(avg(col("bpe")), 6).as("avg_bpe_per_doc"),
          max(col("bpe")).cast("long").as("max_bpe"))
  }

  /** T5 — per-doc rolling-hash fingerprint, full-table oracle: DuckDB
    * recomputes every window hash from its closed-form definition (no
    * rolling update), so the match proves the O(1)-update recurrence
    * correct on every document, short-text fallback included.
    */
  val rollingFp: QueryDef = {
    // pows(j) = B^(K-1-j) mod M, folded into the oracle SQL as a literal
    val pows = new Array[Long](rollWindow)
    pows(rollWindow - 1) = 1
    var j = rollWindow - 2
    while (j >= 0) { pows(j) = pows(j + 1) * rollB % rollM; j -= 1 }
    val pl = pows.mkString("[", ",", "]")
    val (m, k) = (rollM, rollWindow)
    QueryDef.sql(
      "t5_rolling_fingerprint",
      s"""WITH t AS (SELECT doc_id, text, length(text) AS n
         |           FROM documents WHERE text IS NOT NULL),
         |w AS (SELECT doc_id,
         |        CASE WHEN n < $k THEN
         |          [coalesce(list_sum(list_transform(range(1, n + 1),
         |             i -> CAST(unicode(substr(text, CAST(i AS INT), 1)) AS BIGINT) % $m
         |                  * ($pl)[$k - (n - i)] % $m)), 0) % $m]
         |        ELSE
         |          list_transform(range(1, n - ${k - 2}),
         |            s -> list_sum(list_transform(range(0, $k),
         |                   j -> CAST(unicode(substr(text, CAST(s + j AS INT), 1)) AS BIGINT) % $m
         |                        * ($pl)[j + 1] % $m)) % $m)
         |        END AS hs
         |      FROM t)
         |SELECT doc_id, CAST(list_min(hs) AS BIGINT) AS fp FROM w""".stripMargin) {
      (s, d) => rollingFingerprints(Tables.documents(s, d), "doc_id", "text")
    }
  }

  /** T6 — repetition metrics (the Gopher-rules quality family): per-doc
    * duplicate-2-gram fraction (1 − distinct/total) and most-frequent-
    * 2-gram fraction (mode count / total). Repetitive boilerplate and
    * degenerate generations score high on both; real pipelines drop
    * docs above a threshold.
    *
    * Plan shape: explode 2-grams WITH duplicates → groupBy (doc, gram)
    * count (map-side combinable) → per-doc max/sum/count → corpus
    * aggregate. Every shuffle is keyed by doc or (doc, gram) — linear,
    * no windows, no driver state; the same explode+agg shape that beat
    * HOF lambdas 13× in the minhash path.
    */
  /** Per-doc repetition metrics: (id, dup2_frac, top2_frac) for every
    * doc with ≥ 2 tokens. dup2_frac = 1 − distinct/total 2-grams;
    * top2_frac = mode-2-gram count / total. */
  def repetitionMetrics(docs: DataFrame, idCol: String,
      textCol: String): DataFrame = {
    val toks = split(col(textCol), " ")
    val grams = docs
      .filter(col(textCol).isNotNull && size(toks) >= 2)
      .select(col(idCol),
        explode(transform(sequence(lit(1), size(toks) - 1),
          i => concat_ws(" ", slice(toks, i, lit(2))))).as("gram"))
    grams.groupBy(idCol, "gram").agg(count(lit(1)).as("cnt"))
      .groupBy(idCol)
      .agg((lit(1.0) - count(lit(1)).cast("double") / sum(col("cnt")))
        .as("dup2_frac"),
        (max(col("cnt")).cast("double") / sum(col("cnt"))).as("top2_frac"))
  }

  val repetition = QueryDef.sql(
    "t6_repetition",
    """WITH t AS (SELECT doc_id, string_split(text, ' ') AS toks
      |           FROM documents WHERE text IS NOT NULL),
      |g AS (SELECT doc_id,
      |             unnest(list_transform(range(1, len(toks)),
      |                    i -> toks[i] || ' ' || toks[i+1])) AS gram
      |      FROM t WHERE len(toks) >= 2),
      |c AS (SELECT doc_id, gram, count(*) AS cnt FROM g GROUP BY 1, 2),
      |p AS (SELECT doc_id,
      |             1.0 - CAST(count(*) AS DOUBLE) / sum(cnt) AS dup2_frac,
      |             CAST(max(cnt) AS DOUBLE) / sum(cnt) AS top2_frac
      |      FROM c GROUP BY doc_id)
      |SELECT count(*) AS n_docs,
      |       round(avg(dup2_frac), 6) AS avg_dup2,
      |       round(max(dup2_frac), 6) AS max_dup2,
      |       round(avg(top2_frac), 6) AS avg_top2,
      |       CAST(sum(CASE WHEN dup2_frac > 0.05 THEN 1 ELSE 0 END) AS BIGINT)
      |         AS n_flagged
      |FROM p""".stripMargin) {
    (s, d) =>
      repetitionMetrics(Tables.documents(s, d), "doc_id", "text")
        .agg(count(lit(1)).as("n_docs"),
        round(avg(col("dup2_frac")), 6).as("avg_dup2"),
        round(max(col("dup2_frac")), 6).as("max_dup2"),
        round(avg(col("top2_frac")), 6).as("avg_top2"),
        sum(when(col("dup2_frac") > 0.05, 1L).otherwise(0L)).cast("long")
          .as("n_flagged"))
  }

  // PII patterns — ASCII-only constructs (\b, \d, literal classes) that
  // Java regex (Spark) and RE2 (DuckDB) read identically.
  val emailRe = "[a-zA-Z0-9._%+-]+@[a-zA-Z0-9.-]+\\.[a-zA-Z]{2,}"
  val phoneRe = "\\b\\d{3}-\\d{4}\\b"
  val ipRe = "\\b\\d{1,3}\\.\\d{1,3}\\.\\d{1,3}\\.\\d{1,3}\\b"

  /** Redact emails → phones → IPs in that order (order matters: an IP
    * inside an already-redacted span must not double-fire). */
  def redactPii(textCol: Column): Column =
    regexp_replace(
      regexp_replace(
        regexp_replace(textCol, emailRe, "<EMAIL>"),
        phoneRe, "<PHONE>"),
      ipRe, "<IP>")

  /** T7 — PII detection + redaction: regex find/replace for emails,
    * phone-shaped numbers and IPv4s — the scrubbing pass every
    * training-data pipeline runs. Pure codegen'd regexp expressions
    * over the scan (no shuffle until the final aggregate). The corpus
    * has no organic PII, so the query PLANTS deterministic PII derived
    * from doc_id with the same expression in both engines — the oracle
    * then proves detection counts and the redacted-text checksum match
    * cross-engine on every row.
    */
  val piiRedact = QueryDef.sql(
    "t7_pii_redact",
    s"""WITH t AS (
      |  SELECT doc_id,
      |    CASE WHEN doc_id % 3 = 0 THEN
      |           text || ' contact u' || doc_id || '@mail.example.com now'
      |         WHEN doc_id % 3 = 1 THEN
      |           text || ' call 555-' ||
      |           lpad(CAST(doc_id % 10000 AS VARCHAR), 4, '0') ||
      |           ' from 10.1.' || (doc_id % 256) || '.' || ((doc_id * 7) % 256)
      |         ELSE text END AS pii_text
      |  FROM documents WHERE text IS NOT NULL),
      |r AS (SELECT doc_id, pii_text,
      |        len(regexp_extract_all(pii_text, '$emailRe')) AS emails,
      |        len(regexp_extract_all(pii_text, '$phoneRe')) AS phones,
      |        len(regexp_extract_all(pii_text, '$ipRe')) AS ips,
      |        regexp_replace(regexp_replace(regexp_replace(pii_text,
      |          '$emailRe', '<EMAIL>', 'g'),
      |          '$phoneRe', '<PHONE>', 'g'),
      |          '$ipRe', '<IP>', 'g') AS redacted
      |      FROM t)
      |SELECT count(*) AS n_docs,
      |       CAST(sum(emails) AS BIGINT) AS n_emails,
      |       CAST(sum(phones) AS BIGINT) AS n_phones,
      |       CAST(sum(ips) AS BIGINT) AS n_ips,
      |       CAST(sum(CASE WHEN emails + phones + ips > 0 THEN 1 ELSE 0 END)
      |            AS BIGINT) AS n_pii_docs,
      |       CAST(sum(length(redacted)) AS BIGINT) AS redacted_len,
      |       CAST(sum(CASE WHEN contains(redacted, '@')
      |                       OR len(regexp_extract_all(redacted, '$phoneRe')) > 0
      |                     THEN 1 ELSE 0 END) AS BIGINT) AS n_residual
      |FROM r""".stripMargin) {
    (s, d) =>
      val pii = when(col("doc_id") % 3 === 0,
        concat(col("text"), lit(" contact u"), col("doc_id").cast("string"),
          lit("@mail.example.com now")))
        .when(col("doc_id") % 3 === 1,
          concat(col("text"), lit(" call 555-"),
            lpad((col("doc_id") % 10000).cast("string"), 4, "0"),
            lit(" from 10.1."), (col("doc_id") % 256).cast("string"),
            lit("."), ((col("doc_id") * 7) % 256).cast("string"))
        )
        .otherwise(col("text"))
      val r = Tables.documents(s, d).filter(col("text").isNotNull)
        .select(col("doc_id"), pii.as("pii_text"))
        .withColumn("emails", regexp_count(col("pii_text"), lit(emailRe)))
        .withColumn("phones", regexp_count(col("pii_text"), lit(phoneRe)))
        .withColumn("ips", regexp_count(col("pii_text"), lit(ipRe)))
        .withColumn("redacted", redactPii(col("pii_text")))
      r.agg(count(lit(1)).as("n_docs"),
        sum(col("emails")).cast("long").as("n_emails"),
        sum(col("phones")).cast("long").as("n_phones"),
        sum(col("ips")).cast("long").as("n_ips"),
        sum(when(col("emails") + col("phones") + col("ips") > 0, 1L)
          .otherwise(0L)).cast("long").as("n_pii_docs"),
        sum(length(col("redacted"))).cast("long").as("redacted_len"),
        sum(when(col("redacted").contains("@") ||
          regexp_count(col("redacted"), lit(phoneRe)) > 0, 1L).otherwise(0L))
          .cast("long").as("n_residual"))
  }

  /** T8 — TF-IDF corpus statistics + per-doc characteristic term: the
    * vocabulary/document-frequency pass every corpus analysis starts
    * with. The per-doc "top term" is ranked by (tf DESC, df ASC, term
    * ASC) — an all-integer ordering (most frequent, then rarest, then
    * lexicographic) chosen over ranking by the float tf·idf product,
    * whose 1-ulp ln() differences across engines could flip near-ties;
    * avg idf is float but aggregate-rounded. Plan: explode terms →
    * (doc, term) tf agg → term df agg (both map-side combinable) → a
    * per-doc window (bounded groups: tokens per doc) for the argmax.
    * The md5-derived checksum over every doc's top term pins per-doc
    * argmax parity cross-engine, not just the corpus totals.
    */
  val tfidf = QueryDef.sql(
    "t8_tfidf_top_terms",
    """WITH toks AS (SELECT doc_id, unnest(string_split(lower(text), ' ')) AS term
      |             FROM documents WHERE text IS NOT NULL),
      |tf AS (SELECT doc_id, term, count(*) AS tf FROM toks GROUP BY 1, 2),
      |df AS (SELECT term, count(*) AS df FROM tf GROUP BY 1),
      |n AS (SELECT count(*) AS n_docs FROM documents WHERE text IS NOT NULL),
      |top AS (SELECT doc_id, term,
      |               row_number() OVER (PARTITION BY doc_id
      |                                  ORDER BY tf.tf DESC, df.df ASC, term ASC)
      |                 AS rn
      |        FROM tf JOIN df USING (term)),
      |vocab AS (SELECT count(*) AS vocab_size, max(df) AS max_df,
      |                 min(term) FILTER (WHERE df = (SELECT max(df) FROM df))
      |                   AS top_df_term,
      |                 round(avg(ln((SELECT n_docs FROM n) * 1.0 / df)), 6)
      |                   AS avg_idf
      |          FROM df)
      |SELECT (SELECT n_docs FROM n) AS n_docs,
      |       CAST(vocab_size AS BIGINT) AS vocab_size,
      |       CAST(max_df AS BIGINT) AS max_df,
      |       top_df_term,
      |       avg_idf,
      |       (SELECT CAST(bit_xor(('0x' || substr(md5(term), 1, 12))::BIGINT)
      |               AS BIGINT) FROM top WHERE rn = 1) AS top_term_checksum
      |FROM vocab""".stripMargin) {
    (s, d) =>
      val spark = s; import spark.implicits._
      val docs = Tables.documents(s, d).filter(col("text").isNotNull)
      val nDocs = docs.count()
      val tf = docs
        .select(col("doc_id"), explode(split(lower(col("text")), " ")).as("term"))
        .groupBy("doc_id", "term").agg(count(lit(1)).as("tf"))
      // df is vocab-sized — cache it so the checksum join and the two
      // vocab aggregates below don't each re-run the corpus explode +
      // double groupBy (the only corpus-sized pass left is the tf
      // lineage feeding the checksum join).
      val df = tf.groupBy("term").agg(count(lit(1)).as("df"))
        .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
      try {
        val w = org.apache.spark.sql.expressions.Window.partitionBy("doc_id")
          .orderBy(col("tf").desc, col("df").asc, col("term").asc)
        // XOR fold, not sum: the per-doc value is a 48-bit hash, so a
        // SUM overflows Long past ~2^15 docs' worth of headroom — the
        // r12 100x scale run crashed here with ARITHMETIC_OVERFLOW at
        // 500k docs. bit_xor is order-independent and cannot overflow
        // at ANY corpus size.
        val topChecksum = tf.join(df, "term")
          .withColumn("rn", row_number().over(w))
          .filter(col("rn") === 1)
          .agg(expr("bit_xor(cast(conv(substring(md5(term), 1, 12), 16, 10)" +
            " as bigint))")).head().getLong(0)
        val maxDf = df.agg(max(col("df"))).head().getLong(0)
        val v = df.agg(
          count(lit(1)).as("vocab_size"),
          min(when(col("df") === maxDf, col("term"))).as("top_df_term"),
          round(avg(log(lit(nDocs.toDouble) / col("df"))), 6).as("avg_idf"))
          .head()
        Seq((nDocs, v.getLong(0), maxDf, v.getString(1), v.getDouble(2),
          topChecksum))
          .toDF("n_docs", "vocab_size", "max_df", "top_df_term", "avg_idf",
            "top_term_checksum")
      } finally df.unpersist()
  }

  /** Per-doc DEFLATE compression ratio — the model-free redundancy
    * signal several curation recipes filter on (degenerate/boilerplate
    * text compresses far better than natural prose; near-random text
    * barely compresses). Partition-local kernel with ONE reused
    * `Deflater` per task (level 6, zlib defaults — deterministic for a
    * given input, so the ratio is reproducible across runs/partitioning);
    * allocating a fresh deflater per row would dominate the cost.
    * Carries `carryCol` through so the caller can group without a
    * corpus-sized join back.
    */
  def compressionRatios(docs: DataFrame, idCol: String, textCol: String,
      carryCol: String): DataFrame = {
    graft.util.Ids.requireLongCompatible(docs, idCol, "compressionRatios")
    val spark = docs.sparkSession
    import spark.implicits._
    docs.filter(col(textCol).isNotNull)
      .select(col(idCol).cast("long"), col(carryCol).cast("string"),
        encode(col(textCol), "UTF-8"))
      .as[(Long, String, Array[Byte])]
      .mapPartitions { it =>
        val deflater = new java.util.zip.Deflater(6)
        var out = new Array[Byte](1 << 16)
        it.map { case (id, carry, bytes) =>
          deflater.reset()
          deflater.setInput(bytes)
          deflater.finish()
          var n = 0
          while (!deflater.finished()) {
            if (n == out.length) out = java.util.Arrays.copyOf(out, out.length * 2)
            n += deflater.deflate(out, n, out.length - n)
          }
          val ratio =
            if (bytes.length == 0) 1.0 else n.toDouble / bytes.length
          (id, carry, bytes.length.toLong, n.toLong, ratio)
        }
      }.toDF(idCol, carryCol, "raw_len", "comp_len", "ratio")
  }

  /** T10 — rows-only golden gate with a PLANTED separation invariant:
    * a degenerate doc (one word repeated) must compress strictly better
    * than every natural corpus doc, and corpus ratios must sit inside
    * (0, 1.2) (tiny stored-block overhead can exceed 1.0 on
    * incompressible inputs, never 1.2 at these lengths).
    */
  val compression = QueryDef.rowsOnly("t10_compression_ratio") { (s, d) =>
    val spark = s; import spark.implicits._
    val docs = Tables.documents(s, d).select(col("doc_id"), col("source"),
      col("text"))
    val planted = Seq((-1L, "__planted", ("spam " * 400).trim))
      .toDF("doc_id", "source", "text")
    val r = compressionRatios(docs.unionByName(planted),
      "doc_id", "text", "source").cache()
    try {
      val corpus = r.filter(col("doc_id") >= 0)
        .agg(count(lit(1)).as("n_docs"),
          round(avg(col("ratio")), 6).as("avg_ratio"),
          round(min(col("ratio")), 6).as("min_ratio"),
          round(max(col("ratio")), 6).as("max_ratio")).head()
      val plantedRatio = r.filter(col("doc_id") === -1L)
        .head().getDouble(4)
      Seq((corpus.getLong(0), corpus.getDouble(1), corpus.getDouble(2),
          corpus.getDouble(3), math.rint(plantedRatio * 1e6) / 1e6))
        .toDF("n_docs", "avg_ratio", "min_ratio", "max_ratio", "planted_ratio")
        .filter(col("n_docs") > 0 &&
          col("planted_ratio") < col("min_ratio") &&
          col("min_ratio") > 0.0 && col("max_ratio") < 1.2)
    } finally r.unpersist()
  }

  /** T9 — inverted index (term → posting stats): the retrieval-side
    * build a corpus engine owes its users. `posexplode` keeps token
    * positions (0-based; the oracle's `generate_subscripts` is 1-based,
    * aligned with −1), and every aggregate is a map-side-combinable
    * (term)-keyed hash agg — vocabulary is the key space, so no window,
    * no skewed single task. The position checksum pins posting-list
    * CONTENT (doc, position) exactly, not just counts.
    */
  val postings = QueryDef.sql(
    "t9_inverted_index",
    """WITH t AS (SELECT doc_id, string_split(lower(text), ' ') AS w
      |           FROM documents WHERE text IS NOT NULL),
      |p AS (SELECT doc_id, unnest(w) AS term,
      |             generate_subscripts(w, 1) - 1 AS pos
      |      FROM t)
      |SELECT term,
      |       count(DISTINCT doc_id) AS df,
      |       count(*) AS tf,
      |       CAST(min(doc_id) AS BIGINT) AS min_doc,
      |       CAST(max(doc_id) AS BIGINT) AS max_doc,
      |       CAST(sum(doc_id * 131 + pos) AS BIGINT) AS posting_checksum
      |FROM p GROUP BY term HAVING count(DISTINCT doc_id) >= 2""".stripMargin) {
    (s, d) =>
      Tables.documents(s, d).filter(col("text").isNotNull)
        .select(col("doc_id"), posexplode(tokensCol(col("text")))
          .as(Seq("pos", "term")))
        .groupBy("term")
        .agg(countDistinct(col("doc_id")).as("df"),
          count(lit(1)).as("tf"),
          min(col("doc_id")).cast("long").as("min_doc"),
          max(col("doc_id")).cast("long").as("max_doc"),
          sum(col("doc_id") * 131 + col("pos")).cast("long")
            .as("posting_checksum"))
        .filter(col("df") >= 2)
  }

  /** T11 — heavy hitters: exact top-20 tokens (oracle-compared), with
    * the mergeable Count-Min-Sketch path validated against them as the
    * in-query golden gate. At 100 TB the exact token aggregate
    * shuffles the whole vocabulary; the CMS is the scale path — a
    * fixed-width mergeable summary built map-side (partial→final
    * `count_min_sketch` aggregate, ONE small binary crosses the
    * shuffle) that answers point frequencies within ±ε·N. The gate
    * enforces the sketch's one-sided guarantee on every returned
    * hitter: est ≥ exact (never undercounts) and est ≤ exact + ε·N
    * (ε = 0.01; deterministic seed, so this is stable, not flaky).
    */
  val heavyHitters = QueryDef.sql(
    "t11_heavy_hitters",
    """WITH tok AS (SELECT unnest(string_split(text, ' ')) AS token
      |            FROM documents WHERE text IS NOT NULL),
      |c AS (SELECT token, count(*) AS cnt FROM tok
      |      WHERE token <> '' GROUP BY token)
      |SELECT token, cnt FROM c
      |ORDER BY cnt DESC, token LIMIT 20""".stripMargin) { (s, d) =>
    val toks = Tables.documents(s, d)
      .filter(col("text").isNotNull)
      .select(explode(split(col("text"), " ")).as("token"))
      .filter(col("token") =!= "")
    val exact = toks.groupBy("token").agg(count(lit(1)).as("cnt"))
      .orderBy(col("cnt").desc, col("token")).limit(20)
    val eps = 0.01
    val sketchRow = toks.agg(
      count_min_sketch(col("token"), lit(eps), lit(0.99), lit(42))
        .as("cms"), count(lit(1)).as("n")).head()
    val cms = org.apache.spark.util.sketch.CountMinSketch.readFrom(
      new java.io.ByteArrayInputStream(sketchRow.getAs[Array[Byte]]("cms")))
    val n = sketchRow.getAs[Long]("n")
    val top = exact.collect()
    val bound = eps * n
    val ok = top.nonEmpty && top.forall { r =>
      val est = cms.estimateCount(r.getAs[String]("token"))
      val cnt = r.getAs[Long]("cnt")
      est >= cnt && est <= cnt + bound
    }
    // the 20-row result is already in driver memory — returning the
    // `exact` plan would re-scan and re-aggregate the whole corpus
    val spark = s; import spark.implicits._
    top.toSeq.map(r => (r.getAs[String]("token"), r.getAs[Long]("cnt")))
      .toDF("token", "cnt").filter(lit(ok))
  }

  /** T12 — per-source top terms: the GROUPED heavy-hitters problem.
    * Global top-k (t11) has a sketch answer; per-group top-k at 100 TB
    * must avoid the row_number window (one task per source — sources
    * are few and huge). Two map-side-combinable aggregates instead:
    * (source, token) → cnt (vocabulary-keyed, no skew pin), then
    * per-source TOP-k through the bounded-buffer [[graft.ops
    * .TopKSmallest]] aggregate — ≤k entries per (source, map task)
    * cross the shuffle, independent of source size. Count-descending
    * order rides the aggregator's ascending (rank, id) contract by
    * embedding (10¹⁸ − cnt, token) in the rank string (a count above
    * 10¹⁸ would overflow long arithmetic well before breaking the
    * pad); ties break on token, same as the oracle's ORDER BY cnt
    * DESC, token.
    */
  val perSourceTopTerms = QueryDef.sql(
    "t12_per_source_top_terms",
    """WITH tok AS (SELECT source, unnest(string_split(text, ' ')) AS token
      |             FROM documents WHERE text IS NOT NULL),
      |c AS (SELECT source, token, count(*) AS cnt FROM tok
      |      WHERE token <> '' GROUP BY source, token),
      |k AS (SELECT * FROM c
      |      QUALIFY row_number() OVER (PARTITION BY source
      |                                 ORDER BY cnt DESC, token) <= 5)
      |SELECT source, token, cnt FROM k""".stripMargin) { (s, d) =>
    val counts = Tables.documents(s, d)
      .filter(col("text").isNotNull)
      .select(col("source"), explode(split(col("text"), " ")).as("token"))
      .filter(col("token") =!= "")
      .groupBy("source", "token").agg(count(lit(1)).as("cnt"))
    val topk = udaf(new graft.ops.TopKSmallest(5),
      org.apache.spark.sql.Encoders.tuple(
        org.apache.spark.sql.Encoders.STRING,
        org.apache.spark.sql.Encoders.scalaLong,
        org.apache.spark.sql.Encoders.scalaLong))
    counts
      .select(col("source"),
        concat(lpad((lit(1000000000000000000L) - col("cnt")).cast("string"), 19, "0"),
          lit("|"), col("token")).as("__rk"),
        lit(0L).as("__id"), col("cnt").as("__pl"))
      .groupBy("source")
      .agg(topk(col("__rk"), col("__id"), col("__pl")).as("__kept"))
      .select(col("source"), explode(col("__kept")).as("__e"))
      .select(col("source"),
        // token = everything after the 19-digit pad + '|' (position 21;
        // substring_index would mis-split tokens containing '|')
        col("__e._1").substr(lit(21), length(col("__e._1"))).as("token"),
        col("__e._3").as("cnt"))
  }

  /** Per-document mean unigram log-probability under the corpus' own
    * token distribution — the perplexity-filter shape (CCNet/Gopher
    * filter on LM perplexity; a unigram model is the relational,
    * exactly-reproducible stand-in). Degenerate/boilerplate docs made
    * of very common tokens score HIGH, rare-gibberish docs score LOW —
    * curation trims both tails.
    *
    * Scale: tokenize once, term-keyed count aggregate (map-side
    * combinable), one term-keyed join of tokens against the vocab
    * (AQE broadcasts when the vocab is small), then a doc-keyed avg.
    * No driver state beyond the scalar total.
    */
  def unigramLogProbs(docs: DataFrame, idCol: String = "doc_id",
      textCol: String = "text"): DataFrame = {
    val toks = docs.filter(col(textCol).isNotNull)
      .select(col(idCol), explode(split(lower(col(textCol)), " ")).as("term"))
    val counts = toks.groupBy("term").agg(count(lit(1)).as("cnt"))
    val total = counts.agg(sum("cnt")).head().getLong(0)
    require(total > 0, "unigramLogProbs: empty corpus")
    toks.join(counts, "term")
      .groupBy(idCol)
      .agg(count(lit(1)).as("n_tok"),
        round(avg(log(col("cnt").cast("double") / total.toDouble)), 4)
          .as("logprob"))
  }

  /** T13 — unigram log-prob scoring, full per-doc oracle. */
  val unigramLp = QueryDef.sql(
    "t13_unigram_logprob",
    """WITH toks AS (SELECT doc_id, unnest(string_split(lower(text), ' ')) AS term
      |              FROM documents WHERE text IS NOT NULL),
      |c AS (SELECT term, count(*) AS cnt FROM toks GROUP BY 1),
      |n AS (SELECT count(*) AS total FROM toks)
      |SELECT doc_id, count(*) AS n_tok,
      |       round(avg(ln(cnt * 1.0 / (SELECT total FROM n))), 4) AS logprob
      |FROM toks JOIN c USING (term)
      |GROUP BY doc_id""".stripMargin) { (s, d) =>
    unigramLogProbs(Tables.documents(s, d))
  }

  /** Interpolated bigram log-prob scoring — the next step up from
    * [[unigramLogProbs]] toward the KenLM-style perplexity filters
    * production corpus pipelines use (CCNet/RedPajama shape):
    * score(doc) = mean over positions i≥2 of
    * ln(λ·c(w_{i-1},w_i)/c(w_{i-1}) + (1−λ)·c(w_i)/N).
    *
    * Scale shape: bigrams are derived SCAN-LOCALLY per doc with
    * `zip_with(slice,slice)` — no per-doc window, no positional
    * self-join. Bigram and unigram count tables are term-keyed
    * map-side-combinable aggregates; the three count joins are
    * vocab-sized (AQE broadcasts them when small). Docs with < 2
    * tokens have no bigrams and drop out, same as the oracle.
    */
  def bigramLogProbs(docs: DataFrame, idCol: String = "doc_id",
      textCol: String = "text", lambda: Double = 0.75): DataFrame = {
    val toks = docs.filter(col(textCol).isNotNull)
      .select(col(idCol), split(lower(col(textCol)), " ").as("a"))
    val uni = toks.select(explode(col("a")).as("u"))
      .groupBy("u").agg(count(lit(1)).as("ucnt"))
    val total = uni.agg(sum("ucnt")).head().getLong(0)
    require(total > 0, "bigramLogProbs: empty corpus")
    val bi = toks
      .select(col(idCol), explode(expr(
        """zip_with(slice(a, 1, size(a) - 1), slice(a, 2, size(a) - 1),
          |         (x, y) -> named_struct('v', x, 'w', y))""".stripMargin))
        .as("p"))
      .select(col(idCol), col("p.v").as("v"), col("p.w").as("w"))
    val bc = bi.groupBy("v", "w").agg(count(lit(1)).as("bcnt"))
    bi.join(bc, Seq("v", "w"))
      .join(uni.withColumnRenamed("u", "v").withColumnRenamed("ucnt", "vcnt"),
        Seq("v"))
      .join(uni.withColumnRenamed("u", "w").withColumnRenamed("ucnt", "wcnt"),
        Seq("w"))
      .groupBy(idCol)
      .agg(count(lit(1)).as("n_bigrams"),
        round(avg(log(
          lit(lambda) * col("bcnt").cast("double") / col("vcnt") +
            lit(1 - lambda) * col("wcnt").cast("double") / total.toDouble)), 4)
          .as("logprob"))
  }

  /** T15 — interpolated bigram LM scoring, full per-doc oracle. */
  val bigramLp = QueryDef.sql(
    "t15_bigram_logprob",
    """WITH t AS (SELECT doc_id, string_split(lower(text), ' ') AS toks
      |           FROM documents WHERE text IS NOT NULL),
      |tok AS (SELECT doc_id, unnest(toks) AS u,
      |               generate_subscripts(toks, 1) AS pos FROM t),
      |lagged AS (SELECT doc_id,
      |                  lag(u) OVER (PARTITION BY doc_id ORDER BY pos) AS v,
      |                  u AS w
      |           FROM tok),
      |big AS (SELECT doc_id, v, w FROM lagged WHERE v IS NOT NULL),
      |bc AS (SELECT v, w, count(*) AS bcnt FROM big GROUP BY 1, 2),
      |uc AS (SELECT u, count(*) AS ucnt FROM tok GROUP BY 1),
      |n AS (SELECT count(*) AS total FROM tok)
      |SELECT big.doc_id, count(*) AS n_bigrams,
      |       round(avg(ln(0.75 * bcnt / uv.ucnt
      |                    + 0.25 * uw.ucnt / (SELECT total FROM n))), 4)
      |         AS logprob
      |FROM big
      |JOIN bc USING (v, w)
      |JOIN uc uv ON big.v = uv.u
      |JOIN uc uw ON big.w = uw.u
      |GROUP BY big.doc_id""".stripMargin) { (s, d) =>
    bigramLogProbs(Tables.documents(s, d))
  }

  /** T16 — Unicode normalization (native codegen'd expressions,
    * expressions/NormalizeText.scala): the canonicalization pass that
    * must run before any hash-keyed dedup on scraped text — the same
    * page arrives NFC-composed from one crawl and NFD-decomposed from
    * another, and md5-keyed operators (d1, t3) would treat them as
    * distinct documents. The fixture is pure ASCII, so the query
    * DERIVES both variants deterministically: a composed accent layer
    * (translate a→á …) and a decomposed layer (a → a+U+0301), then
    * gates:
    *   - NFC(decomposed) == composed (real composition fired),
    *   - strip_accents of BOTH layers recovers the original ASCII
    *     text exactly (round-trip),
    *   - NFC is idempotent on the composed layer,
    *   - the layers actually differ where an 'a' exists (the gate is
    *     not vacuous).
    * All four run as scan-local codegen'd expressions — zero shuffle
    * until the single gate aggregate.
    */
  val normalizeQ = QueryDef.rowsOnly("t16_normalize_text") { (s, d) =>
    import graft.expressions.NormalizeText.{stripAccents, unicodeNormalize}
    val spark = s; import spark.implicits._
    val layered = Tables.documents(s, d).filter(col("text").isNotNull)
      .select(col("doc_id"), col("text"),
        translate(col("text"), "aeiou",
          "áéíöü").as("composed"),
        regexp_replace(
          regexp_replace(col("text"), "a", "á"),
          "o", "ö").as("decomposed"))
    val gates = layered.agg(
      count(lit(1)).as("n_docs"),
      sum(when(unicodeNormalize(col("decomposed"), "NFC") ===
        translate(col("text"), "ao", "áö"), 1L).otherwise(0L))
        .as("n_compose_ok"),
      sum(when(stripAccents(col("composed")) === col("text"), 1L).otherwise(0L))
        .as("n_strip_ok"),
      sum(when(stripAccents(col("decomposed")) === col("text"), 1L).otherwise(0L))
        .as("n_strip_decomp_ok"),
      sum(when(unicodeNormalize(unicodeNormalize(col("composed"), "NFC"), "NFC") ===
        unicodeNormalize(col("composed"), "NFC"), 1L).otherwise(0L))
        .as("n_idempotent"),
      sum(when(col("decomposed") =!= col("composed"), 1L).otherwise(0L))
        .as("n_changed")).head()
    val n = gates.getLong(0)
    Seq((n, gates.getLong(1), gates.getLong(2), gates.getLong(3),
        gates.getLong(4), gates.getLong(5)))
      .toDF("n_docs", "n_compose_ok", "n_strip_ok", "n_strip_decomp_ok",
        "n_idempotent", "n_changed")
      .filter(col("n_docs") > 0 &&
        col("n_compose_ok") === col("n_docs") &&
        col("n_strip_ok") === col("n_docs") &&
        col("n_strip_decomp_ok") === col("n_docs") &&
        col("n_idempotent") === col("n_docs") &&
        col("n_changed") > 0)
  }

  /** T16-NFC — the NFC arm of t16 under a FULL DuckDB oracle: DuckDB
    * ships `nfc_normalize()`, so the composed output can hash-match
    * per document instead of relying on the golden gate alone. Both
    * engines derive a decomposed layer from the ASCII fixture
    * ('a' → a+U+0301, 'o' → o+U+0308) and NFC-compose it; the JDK's
    * `java.text.Normalizer` and DuckDB's utf8proc implement the same
    * public Unicode normalization spec, so the composed strings are
    * byte-identical. NFD/NFKC/NFKD stay under t16's golden gate
    * (DuckDB exposes only the NFC function). Scan-local codegen'd
    * expressions — zero shuffle.
    */
  val normalizeNfcQ = QueryDef.sql(
    "t16_nfc",
    """SELECT doc_id,
      |       nfc_normalize(replace(replace(text, 'a', 'a' || chr(769)),
      |                             'o', 'o' || chr(776))) AS nfc_text
      |FROM documents WHERE text IS NOT NULL""".stripMargin) { (s, d) =>
    import graft.expressions.NormalizeText.unicodeNormalize
    Tables.documents(s, d).filter(col("text").isNotNull)
      .select(col("doc_id"),
        unicodeNormalize(
          regexp_replace(regexp_replace(col("text"), "a", "á"),
            "o", "ö"),
          "NFC").as("nfc_text"))
  }

  /** Per-document lexical-diversity profile: type-token ratio, hapax
    * fraction, and distinct-bigram ratio — the "vocabulary richness"
    * quality signals (low TTR ⇒ templated/repetitive text; Gopher-style
    * pipelines threshold on exactly these). Adds `n_tokens`,
    * `n_distinct`, `ttr`, `hapax_ratio`, `bigram_ttr`.
    *
    * Scale: ZERO shuffle — every statistic is a scan-local array HOF
    * over the token list. Hapax counting needs no per-term aggregate:
    * sort the doc's tokens once (`sort_array`), then a token is a
    * hapax iff it differs from BOTH sorted neighbors (`try_element_at`
    * is null at the array edges; `<=>` makes the comparison total).
    * Bigram distinctness reuses t15's zip-of-shifted-slices shape.
    * At 100 TB this is one narrow projection, partition-parallel.
    */
  def lexicalDiversity(docs: DataFrame, textCol: String = "text"): DataFrame = {
    val toks = tokensCol(col(textCol))
    val sw = sort_array(toks)
    val n = size(toks)
    // hapax: sorted tokens group equal elements adjacently under ANY
    // total order, so sort-order parity with the oracle is irrelevant.
    // FORMULATION MATTERS: an index-lambda (`filter(sequence(1,n),
    // i -> element_at(sw, i) ...)`) would inline `sw`'s sort+split
    // INTO the lambda body and re-evaluate it per ELEMENT (the same
    // trap as the stopword HOF above — measured 9 s at sf0.1). The
    // shifted-array zip_with below keeps every lambda body on lambda
    // variables only: sw evaluates per ROW, lambdas are O(1). `<=>`
    // against the null edge sentinel matches DuckDB's null-on-OOB
    // list indexing.
    val nullStr = array(lit(null).cast("string"))
    val prevArr = concat(nullStr, slice(sw, lit(1), n - 1))
    val nextArr = concat(slice(sw, lit(2), n - 1), nullStr)
    val hapax = size(filter(
      zip_with(zip_with(sw, prevArr, (a, p) => a <=> p),
        zip_with(sw, nextArr, (a, q) => a <=> q),
        (ep, eq) => !ep && !eq),
      x => x))
    // bigrams join on ' ' — tokens are space-split, so the joiner
    // cannot collide (no token contains a space)
    val bigrams = zip_with(slice(toks, lit(1), n - 1), slice(toks, lit(2), n - 1),
      (a, b) => concat(a, lit(" "), b))
    docs.select(col("*") +: Seq(
      n.cast("long").as("n_tokens"),
      size(array_distinct(toks)).cast("long").as("n_distinct"),
      round(size(array_distinct(toks)).cast("double") / n, 6).as("ttr"),
      round(hapax.cast("double") / n, 6).as("hapax_ratio"),
      when(n > 1,
        round(size(array_distinct(bigrams)).cast("double") / (n - 1), 6))
        .as("bigram_ttr")): _*)
  }

  /** T18 — lexical diversity under a FULL DuckDB oracle: DuckDB
    * replays the sorted-neighbor hapax rule with list lambdas (list
    * OOB indexing is NULL there, mirroring `try_element_at`), the
    * bigram construction with `list_transform(generate_series(...))`,
    * and the same explicit double divisions rounded at 6 (HALF_UP in
    * both engines). All-rows output — one hash row per document.
    */
  val lexDiversityQ = QueryDef.sql(
    "t18_lexical_diversity",
    """WITH t AS (SELECT doc_id, string_split(lower(text), ' ') AS w
      |           FROM documents WHERE text IS NOT NULL),
      |s AS (SELECT doc_id, w, list_sort(w) AS sw, len(w) AS n FROM t),
      |h AS (SELECT doc_id, n,
      |             len(list_distinct(w)) AS dn,
      |             len(list_filter(generate_series(1, n), i ->
      |                 NOT (sw[i] IS NOT DISTINCT FROM sw[i-1])
      |             AND NOT (sw[i] IS NOT DISTINCT FROM sw[i+1]))) AS hapax,
      |             CASE WHEN n > 1 THEN
      |               len(list_distinct(list_transform(generate_series(1, n-1),
      |                 i -> w[i] || ' ' || w[i+1]))) END AS db
      |      FROM s)
      |SELECT doc_id, CAST(n AS BIGINT) AS n_tokens,
      |       CAST(dn AS BIGINT) AS n_distinct,
      |       round(CAST(dn AS DOUBLE) / n, 6) AS ttr,
      |       round(CAST(hapax AS DOUBLE) / n, 6) AS hapax_ratio,
      |       CASE WHEN n > 1 THEN round(CAST(db AS DOUBLE) / (n - 1), 6)
      |       END AS bigram_ttr
      |FROM h""".stripMargin) { (s, d) =>
    lexicalDiversity(Tables.documents(s, d).filter(col("text").isNotNull))
      .select("doc_id", "n_tokens", "n_distinct", "ttr", "hapax_ratio",
        "bigram_ttr")
  }

  /** T19 — Zipf slope of the corpus vocabulary: OLS fit of ln(freq)
    * on ln(rank) over the FREQUENCY HISTOGRAM (rank of a frequency
    * class = cumulative #terms with count ≥ c). A natural corpus sits
    * near slope −1 (Zipf 1949); strong deviation flags synthetic/
    * boilerplate-heavy text, which makes this a cheap corpus-level
    * quality prior next to t2's per-doc scores.
    *
    * Scale: term counts are one map-side-combinable agg; everything
    * after runs on the (count → #terms) HISTOGRAM — hundreds of rows
    * regardless of corpus size — so the cumulative window and the
    * OLS sums are aggregate-sized, never vocab- or corpus-sized.
    * FULL DuckDB oracle (identical point set and normal-equation
    * arithmetic, round 6).
    */
  val zipfQ = QueryDef.sql(
    "t19_zipf_slope",
    """WITH tok AS (SELECT unnest(string_split(lower(text), ' ')) AS t
      |             FROM documents WHERE text IS NOT NULL),
      |tc AS (SELECT t, count(*) AS c FROM tok WHERE t <> '' GROUP BY 1),
      |h AS (SELECT c, count(*) AS m FROM tc GROUP BY 1),
      |r AS (SELECT c, m, CAST(sum(m) OVER (ORDER BY c DESC) AS BIGINT) AS rk
      |      FROM h),
      |p AS (SELECT ln(CAST(rk AS DOUBLE)) AS x, ln(CAST(c AS DOUBLE)) AS y
      |      FROM r),
      |f AS (SELECT count(*) AS k, sum(x) AS sx, sum(y) AS sy,
      |             sum(x * y) AS sxy, sum(x * x) AS sxx
      |      FROM p)
      |SELECT (SELECT CAST(sum(m) AS BIGINT) FROM h) AS n_terms,
      |       CAST(k AS BIGINT) AS n_freqs,
      |       round((sxy - sx * sy / k) / (sxx - sx * sx / k), 6) AS zipf_slope,
      |       round(sy / k - (sxy - sx * sy / k) / (sxx - sx * sx / k) * sx / k, 6)
      |         AS zipf_intercept
      |FROM f""".stripMargin) { (s, d) =>
    val tc = Tables.documents(s, d).filter(col("text").isNotNull)
      .select(explode(split(lower(col("text")), " ")).as("t"))
      .filter(col("t") =!= "")
      .groupBy("t").agg(count(lit(1)).as("c"))
    val h = tc.groupBy("c").agg(count(lit(1)).as("m"))
    val w = org.apache.spark.sql.expressions.Window.orderBy(col("c").desc)
    val r = h.withColumn("rk", sum(col("m")).over(w))
    val p = r.select(log(col("rk").cast("double")).as("x"),
      log(col("c").cast("double")).as("y"))
    val f = p.agg(count(lit(1)).as("k"), sum(col("x")).as("sx"),
      sum(col("y")).as("sy"), sum(col("x") * col("y")).as("sxy"),
      sum(col("x") * col("x")).as("sxx"))
    val nTerms = h.agg(sum(col("m"))).head().getLong(0)
    val slope = (col("sxy") - col("sx") * col("sy") / col("k")) /
      (col("sxx") - col("sx") * col("sx") / col("k"))
    f.select(lit(nTerms).as("n_terms"), col("k").cast("long").as("n_freqs"),
      round(slope, 6).as("zipf_slope"),
      round(col("sy") / col("k") - slope * col("sx") / col("k"), 6)
        .as("zipf_intercept"))
  }

  /** T20 — per-document keyword extraction: top-3 terms by
    * tf·ln(N/df) per doc (the metadata-enrichment step search/tagging
    * pipelines run at ingest; t8 ranks terms corpus-wide, this ranks
    * them per doc). Shapes: one explode + (doc, term) tf aggregate,
    * one term-keyed df aggregate broadcast back, then a row_number
    * window partitioned BY DOC — per-doc groups are bounded by the
    * doc's distinct-term count, never corpus size. Total order
    * (score desc, term asc) is cross-engine reproducible: exact ln
    * collisions are impossible for distinct (tf, df) (ln is
    * irrational on rationals), equal (tf, df) tie-breaks on term.
    * FULL DuckDB oracle.
    */
  val keywordsQ = QueryDef.sql(
    "t20_doc_keywords",
    """WITH tok AS (SELECT doc_id, unnest(string_split(lower(text), ' ')) AS t
      |             FROM documents WHERE text IS NOT NULL),
      |tf AS (SELECT doc_id, t, count(*) AS tf FROM tok WHERE t <> ''
      |       GROUP BY 1, 2),
      |df AS (SELECT t, count(*) AS df FROM tf GROUP BY 1),
      |n AS (SELECT count(DISTINCT doc_id) AS n FROM tf),
      |sc AS (SELECT doc_id, t, tf.tf,
      |              tf.tf * ln(CAST((SELECT n FROM n) AS DOUBLE) / df.df) AS score
      |       FROM tf JOIN df USING (t)),
      |r AS (SELECT doc_id, t, tf, score,
      |             row_number() OVER (PARTITION BY doc_id
      |               ORDER BY score DESC, t) AS rk
      |      FROM sc)
      |SELECT doc_id, CAST(rk AS INT) AS rank, t AS term,
      |       CAST(tf AS BIGINT) AS tf, round(score, 6) AS score
      |FROM r WHERE rk <= 3""".stripMargin) { (s, d) =>
    val tf = Tables.documents(s, d).filter(col("text").isNotNull)
      .select(col("doc_id"), explode(split(lower(col("text")), " ")).as("t"))
      .filter(col("t") =!= "")
      .groupBy("doc_id", "t").agg(count(lit(1)).as("tf"))
    val df = tf.groupBy("t").agg(count(lit(1)).as("df"))
    val n = tf.select("doc_id").distinct().count()
    val sc = tf.join(broadcast(df), "t")
      .withColumn("score",
        col("tf") * log(lit(n.toDouble) / col("df")))
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy("doc_id").orderBy(col("score").desc, col("t"))
    sc.withColumn("rank", row_number().over(w)).filter(col("rank") <= 3)
      .select(col("doc_id"), col("rank"), col("t").as("term"),
        col("tf"), round(col("score"), 6).as("score"))
  }

  /** HTML → main-content extraction: the first step of every web-crawl
    * curation pipeline (WET-style text extraction; cf. the jusText /
    * trafilatura line-classification approach, Pomikálek 2011).
    * Four deterministic stages, all scan-local column expressions:
    *   1. drop `<script>`/`<style>` blocks wholesale;
    *   2. turn block-level closers (`</p> </div> </h1> </h2> </li>
    *      </nav>`, `<br>`) into newlines — the line segmentation;
    *   3. per line: strip remaining tags, then classify BOILERPLATE by
    *      (a) link density — 2·(chars inside `<a>` anchors) ≥ visible
    *      chars drops nav/pager lines, (b) length < 15 drops headers/
    *      crumbs, (c) no stopword hit AND length < 80 drops footer
    *      chrome (the jusText "short + low stop-density = bad" rule);
    *   4. decode the six common HTML entities on kept lines and
    *      re-join with newlines.
    *
    * Scale: ZERO shuffle — one projection per row. The per-line
    * features (stripped text, anchor chars, stopword hits) are built
    * ONCE into a struct array (`transform`), so the keep-predicate and
    * every audit metric are O(1) field reads per line; the withColumn
    * boundaries keep CollapseProject from duplicating the non-cheap
    * array exprs into each consumer. At 100 TB this runs at parquet
    * scan speed, partition-parallel, nothing on the driver.
    */
  private val entityPairs = Seq(
    "&lt;" -> "<", "&gt;" -> ">", "&quot;" -> "\"", "&#39;" -> "'",
    "&nbsp;" -> " ", "&amp;" -> "&") // &amp; LAST: no double-decode

  def htmlExtract(df: DataFrame, htmlCol: String = "html"): DataFrame = {
    val noScript = regexp_replace(col(htmlCol),
      "(?s)<(script|style)[^>]*>.*?</(script|style)>", "")
    val lined = regexp_replace(noScript,
      "</(p|div|h1|h2|li|nav)>|<br/?>", "\n")
    val lineFeats = transform(split(lined, "\n"), l => {
      val st = trim(regexp_replace(l, "<[^>]*>", ""))
      struct(
        st.as("st"),
        aggregate(regexp_extract_all(l, lit("<a[^>]*>([^<]*)</a>"), lit(1)),
          lit(0), (acc, x) => acc + length(x)).as("alen"),
        size(filter(split(lower(st), " "),
          w => w.isin(stops("en"): _*))).as("stops"))
    })
    val decoded = (c: Column) => entityPairs.foldLeft(c) {
      case (acc, (e, v)) => replace(acc, lit(e), lit(v))
    }
    val keepP = (p: Column) =>
      length(p.getField("st")) >= 15 &&
        p.getField("alen") * 2 < length(p.getField("st")) &&
        (p.getField("stops") >= 1 || length(p.getField("st")) >= 80)
    df.withColumn("__lines", lineFeats)
      .withColumn("__kept", filter(col("__lines"), keepP))
      .withColumn("extracted_text",
        array_join(transform(col("__kept"), p => decoded(p.getField("st"))),
          "\n"))
  }

  /** T22 — HTML main-content extraction under a FULL DuckDB oracle.
    * Each document is wrapped in a deterministic page shell (head with
    * script+style, a nav bar, an entity-bearing h1, the text as `<p>`,
    * a pager div, an entity-bearing footer) so the extractor must
    * remove script/style/nav/pager/footer by the CONTENT-AGNOSTIC
    * rules alone — DuckDB replays synthesis AND extraction with the
    * same regexes and list lambdas, and the md5-prefix hash of the
    * extracted text pins byte-exact parity. Emitted audit columns
    * (line/kept counts, anchor vs visible chars) are integer-exact.
    */
  val htmlExtractQ = QueryDef.sql(
    "t22_html_extract",
    """WITH h AS (
      |  SELECT doc_id,
      |         concat('<html><head><title>Doc ', doc_id,
      |           '</title><style>p{margin:0}</style>',
      |           '<script>var t=1;track(t);</script></head><body>',
      |           '<nav><a href="/">Home</a> <a href="/s">',
      |           coalesce(source, ''), '</a></nav><h1>',
      |           coalesce(source, ''), ' &amp; ', coalesce(lang, ''),
      |           '</h1><p>',
      |           text, '</p>',
      |           '<div><a href="/p">Previous page</a> | ',
      |           '<a href="/n">Next page</a></div>',
      |           '<div>Copyright &#39;operator&#39; &amp; co - ',
      |           'rights reserved</div></body></html>') AS html
      |  FROM documents WHERE text IS NOT NULL),
      |l1 AS (SELECT doc_id,
      |         regexp_replace(regexp_replace(html,
      |           '(?s)<(script|style)[^>]*>.*?</(script|style)>', '', 'g'),
      |           '</(p|div|h1|h2|li|nav)>|<br/?>', chr(10), 'g') AS lined
      |       FROM h),
      |l2 AS (SELECT doc_id,
      |         list_transform(string_split(lined, chr(10)), l -> struct_pack(
      |           st := trim(regexp_replace(l, '<[^>]*>', '', 'g')),
      |           alen := CAST(coalesce(list_sum(list_transform(
      |             regexp_extract_all(l, '<a[^>]*>([^<]*)</a>', 1),
      |             x -> length(x))), 0) AS INTEGER),
      |           stops := CAST(len(list_filter(string_split(lower(
      |             trim(regexp_replace(l, '<[^>]*>', '', 'g'))), ' '),
      |             w -> w IN ('the', 'a', 'of', 'and', 'to'))) AS INTEGER)))
      |           AS ps
      |       FROM l1),
      |k AS (SELECT doc_id, ps,
      |        list_filter(ps, p ->
      |          length(struct_extract(p, 'st')) >= 15
      |          AND struct_extract(p, 'alen') * 2
      |              < length(struct_extract(p, 'st'))
      |          AND (struct_extract(p, 'stops') >= 1
      |               OR length(struct_extract(p, 'st')) >= 80)) AS kept
      |      FROM l2),
      |e AS (SELECT doc_id, ps, kept,
      |        -- array_to_string of an EMPTY list is NULL in DuckDB but
      |        -- '' under Spark's array_join: coalesce for parity
      |        coalesce(array_to_string(list_transform(kept, p ->
      |          replace(replace(replace(replace(replace(replace(
      |            struct_extract(p, 'st'),
      |            '&lt;', '<'), '&gt;', '>'), '&quot;', '"'),
      |            '&#39;', chr(39)), '&nbsp;', ' '), '&amp;', '&')),
      |          chr(10)), '') AS extracted
      |      FROM k)
      |SELECT doc_id,
      |       CAST(len(list_filter(ps, p ->
      |           length(struct_extract(p, 'st')) > 0)) AS BIGINT) AS n_lines,
      |       CAST(len(kept) AS BIGINT) AS n_kept,
      |       CAST(coalesce(list_sum(list_transform(ps, p ->
      |           struct_extract(p, 'alen'))), 0) AS BIGINT) AS anchor_chars,
      |       CAST(coalesce(list_sum(list_transform(ps, p ->
      |           length(struct_extract(p, 'st')))), 0) AS BIGINT) AS text_chars,
      |       CAST(length(extracted) AS BIGINT) AS extract_len,
      |       CAST(('0x' || substr(md5(extracted), 1, 8))::BIGINT AS BIGINT)
      |         AS extract_hash
      |FROM e""".stripMargin) { (s, d) =>
    val docs = Tables.documents(s, d).filter(col("text").isNotNull)
    val page = docs.withColumn("html", concat(
      lit("<html><head><title>Doc "), col("doc_id").cast("string"),
      lit("</title><style>p{margin:0}</style>"),
      lit("<script>var t=1;track(t);</script></head><body>"),
      // coalesce: DuckDB's concat SKIPS null args while Spark's concat
      // nulls the whole row — null lang/source must not diverge engines
      lit("<nav><a href=\"/\">Home</a> <a href=\"/s\">"),
      coalesce(col("source"), lit("")),
      lit("</a></nav><h1>"), coalesce(col("source"), lit("")),
      lit(" &amp; "), coalesce(col("lang"), lit("")),
      lit("</h1><p>"), col("text"), lit("</p>"),
      lit("<div><a href=\"/p\">Previous page</a> | "),
      lit("<a href=\"/n\">Next page</a></div>"),
      lit("<div>Copyright &#39;operator&#39; &amp; co - "),
      lit("rights reserved</div></body></html>")))
    htmlExtract(page)
      .select(col("doc_id"),
        size(filter(col("__lines"), p => length(p.getField("st")) > 0))
          .cast("long").as("n_lines"),
        size(col("__kept")).cast("long").as("n_kept"),
        aggregate(col("__lines"), lit(0L),
          (a, p) => a + p.getField("alen").cast("long")).as("anchor_chars"),
        aggregate(col("__lines"), lit(0L),
          (a, p) => a + length(p.getField("st")).cast("long"))
          .as("text_chars"),
        length(col("extracted_text")).cast("long").as("extract_len"),
        conv(substring(md5(col("extracted_text")), 1, 8), 16, 10)
          .cast("long").as("extract_hash"))
  }

  /** Hashing-trick linear classifier inference (the fastText shape,
    * Joulin 2016; how FineWeb/DCLM-style learned quality filters run
    * over a full crawl): each word unigram and bigram maps THROUGH A
    * HASH to a weight — no vocabulary table, so inference needs no
    * join, no broadcast, no OOV path, and memory is O(1) per row. The
    * doc score is the mean feature weight; the label its sign.
    *
    * Weights here are derived arithmetically from the md5 of the gram
    * (a fixed random projection), standing in for a trained weight
    * array indexed by the same hash — the DATA PATH (gram extraction,
    * hash, lookup-free weight, mean, threshold) is exactly production
    * inference. Scale: ZERO shuffle, one scan-local projection; the
    * score accumulates in INTEGER milli-units so the DuckDB replay is
    * bit-exact (no float-order divergence).
    */
  def hashedNgramScore(df: DataFrame, textCol: String = "text"): DataFrame = {
    val toks = tokensCol(col(textCol))
    val n = size(toks)
    // word bigrams via the shifted-slice zip (t15's shape); joiner ' '
    // cannot collide with in-token characters (tokens are space-split)
    val bigrams = zip_with(slice(toks, lit(1), n - 1), slice(toks, lit(2), n - 1),
      (a, b) => concat(a, lit(" "), b))
    val grams = concat(toks, bigrams)
    // weight(gram) in [-500, 499] milli-units: md5-prefix mod 1000 - 500
    val wExpr = (g: Column) =>
      conv(substring(md5(g), 1, 6), 16, 10).cast("long") % 1000 - 500
    // n unigrams + (n-1) bigrams, WITHOUT re-materializing the gram
    // array (HOFs are interpreted; size(grams) would re-evaluate the
    // whole split+slice+zip tree a second time per row)
    df.withColumn("n_grams", (size(toks) * 2 - 1).cast("long"))
      .withColumn("score_units",
        aggregate(grams, lit(0L), (acc, g) => acc + wExpr(g)))
      .withColumn("ngram_score",
        round(col("score_units").cast("double") / (col("n_grams") * 1000), 6))
      .withColumn("ngram_keep", col("score_units") > 0)
  }

  /** T23 — hashed-n-gram classifier inference under a FULL DuckDB
    * oracle: list lambdas replay gram extraction and the md5-derived
    * weights; `score_units`/`n_grams` are integer-exact, the mean is
    * one rounded division. */
  val hashedNgramQ = QueryDef.sql(
    "t23_hashed_ngram_score",
    """WITH t AS (SELECT doc_id, string_split(lower(text), ' ') AS w
      |           FROM documents WHERE text IS NOT NULL),
      |g AS (SELECT doc_id,
      |        list_concat(w, list_transform(generate_series(1, len(w) - 1),
      |          i -> w[i] || ' ' || w[i + 1])) AS gs
      |      FROM t),
      |s AS (SELECT doc_id, CAST(len(gs) AS BIGINT) AS n_grams,
      |        CAST(coalesce(list_sum(list_transform(gs, x ->
      |          ('0x' || substr(md5(x), 1, 6))::BIGINT % 1000 - 500)), 0)
      |          AS BIGINT) AS score_units
      |      FROM g)
      |SELECT doc_id, n_grams, score_units,
      |       round(CAST(score_units AS DOUBLE) / (n_grams * 1000), 6)
      |         AS ngram_score,
      |       score_units > 0 AS ngram_keep
      |FROM s""".stripMargin) { (s, d) =>
    hashedNgramScore(Tables.documents(s, d).filter(col("text").isNotNull))
      .select("doc_id", "n_grams", "score_units", "ngram_score", "ngram_keep")
  }

  def all: Seq[QueryDef] =
    Seq(langId, quality, gopherQ, fingerprint, tokenBudget, rollingFp,
      repetition, piiRedact, tfidf, postings, compression, heavyHitters,
      perSourceTopTerms, unigramLp, bigramLp, normalizeQ, normalizeNfcQ,
      lexDiversityQ, zipfQ, keywordsQ, htmlExtractQ, hashedNgramQ)
}
