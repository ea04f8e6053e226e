package graft.llm

import graft.{QueryDef, Tables}
import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Byte-pair-encoding tokenizer training + application — the "train a
  * tokenizer on the corpus" step of an LLM data pipeline (Sennrich et
  * al. 2016; the `tokenizers` BPE trainer shape).
  *
  * Scale design: BPE training NEVER touches the corpus row-by-row.
  * 1. ONE distributed pass builds the word histogram — pre-tokenize
  *    with [[TextAnalysis.bpeTokenPattern]], explode, hash-aggregate
  *    counts (map-side combinable), keep the top `maxWords` by
  *    (count, word). At 100 TB the distinct-word histogram is the
  *    heavy-tailed bounded object every production trainer (HF
  *    `tokenizers`, SentencePiece) trains on; the top-N cut is the
  *    standard practice, not a shortcut.
  * 2. Merge training runs DRIVER-SIDE over that bounded histogram —
  *    O(maxWords · avgLen) per merge, independent of corpus size.
  *    Tie-breaks are (count desc, pair lexicographic), so training is
  *    bit-deterministic for a fixed histogram.
  * 3. Encoding is one distributed scan with the ranked merge table
  *    broadcast; a per-partition memo caches encodings of repeated
  *    words (Zipf makes the hit-rate high), so the greedy merge loop
  *    runs once per distinct word per partition, not once per token.
  */
object Tokenizer {

  /** Ranked merge list: merges(i) joins the pair with rank i. */
  final case class BpeModel(merges: Seq[(String, String)]) {
    /** rank lookup: (left, right) -> priority (lower merges first). */
    lazy val ranks: Map[(String, String), Int] =
      merges.zipWithIndex.toMap
  }

  private val tokenRe = TextAnalysis.bpeTokenPattern.r

  /** Split a word into single-codepoint symbols (surrogate-safe). */
  private def symbols(word: String): Array[String] = {
    val out = new scala.collection.mutable.ArrayBuffer[String](word.length)
    var i = 0
    while (i < word.length) {
      val cp = word.codePointAt(i)
      val n = Character.charCount(cp)
      out += word.substring(i, i + n)
      i += n
    }
    out.toArray
  }

  /** One distributed pass: (word, count) histogram of the pre-tokenized
    * corpus, top `maxWords` by (count desc, word asc) for determinism.
    */
  def wordHistogram(docs: DataFrame, textCol: String, maxWords: Int): Array[(String, Long)] = {
    docs.filter(col(textCol).isNotNull)
      .select(explode(regexp_extract_all(col(textCol),
        lit(TextAnalysis.bpeTokenPattern), lit(0))).as("w"))
      .groupBy("w").agg(count(lit(1)).as("c"))
      .orderBy(col("c").desc, col("w"))
      .limit(maxWords)
      .collect()
      .map(r => (r.getString(0), r.getLong(1)))
  }

  /** Classic BPE merge training over a word histogram. Each round
    * counts adjacent symbol pairs weighted by word count (overlapping
    * positions each count, the standard convention), merges the argmax
    * pair everywhere left-to-right non-overlapping, and stops early
    * when no pair occurs at least `minPairCount` times.
    */
  def trainBpe(hist: Array[(String, Long)], numMerges: Int,
      minPairCount: Long = 2L): BpeModel = {
    // mutable working set: each word as its current symbol sequence
    val words = hist.map { case (w, c) => (symbols(w), c) }
    val merges = scala.collection.mutable.ArrayBuffer.empty[(String, String)]
    var round = 0
    while (round < numMerges) {
      val pairCounts = scala.collection.mutable.HashMap.empty[(String, String), Long]
      var wi = 0
      while (wi < words.length) {
        val (syms, c) = words(wi)
        var i = 0
        while (i < syms.length - 1) {
          val k = (syms(i), syms(i + 1))
          pairCounts.update(k, pairCounts.getOrElse(k, 0L) + c)
          i += 1
        }
        wi += 1
      }
      if (pairCounts.isEmpty) { round = numMerges }
      else {
        // argmax by (count desc, pair asc) — deterministic
        val best = pairCounts.toSeq.minBy { case ((l, r), c) => (-c, l, r) }
        if (best._2 < minPairCount) { round = numMerges }
        else {
          val (l, r) = best._1
          val joined = l + r
          wi = 0
          while (wi < words.length) {
            val (syms, c) = words(wi)
            if (syms.length > 1) {
              val out = new scala.collection.mutable.ArrayBuffer[String](syms.length)
              var i = 0
              while (i < syms.length) {
                if (i < syms.length - 1 && syms(i) == l && syms(i + 1) == r) {
                  out += joined; i += 2 // left-to-right, non-overlapping
                } else { out += syms(i); i += 1 }
              }
              words(wi) = (out.toArray, c)
            }
            wi += 1
          }
          merges += ((l, r))
          round += 1
        }
      }
    }
    BpeModel(merges.toSeq)
  }

  /** Greedy BPE encode of one word: repeatedly merge the present pair
    * with the LOWEST rank (the order it was learned), left-to-right
    * non-overlapping within a round — the standard BPE apply rule, so
    * unseen words segment exactly as the trainer would have.
    */
  def encodeWord(word: String, ranks: Map[(String, String), Int]): Array[String] = {
    var syms = symbols(word)
    var done = syms.length <= 1
    while (!done) {
      var bestRank = Int.MaxValue
      var bestPair: (String, String) = null
      var i = 0
      while (i < syms.length - 1) {
        val r = ranks.getOrElse((syms(i), syms(i + 1)), Int.MaxValue)
        if (r < bestRank) { bestRank = r; bestPair = (syms(i), syms(i + 1)) }
        i += 1
      }
      if (bestPair == null) done = true
      else {
        val joined = bestPair._1 + bestPair._2
        val out = new scala.collection.mutable.ArrayBuffer[String](syms.length)
        i = 0
        while (i < syms.length) {
          if (i < syms.length - 1 && syms(i) == bestPair._1 && syms(i + 1) == bestPair._2) {
            out += joined; i += 2
          } else { out += syms(i); i += 1 }
        }
        syms = out.toArray
        if (syms.length <= 1) done = true
      }
    }
    syms
  }

  /** Distributed encode: one scan, merge table broadcast, per-partition
    * word→tokens memo (Zipf repetition makes this the hot-path saver).
    * Output: (idCol, tokens array<string>) — token order preserved, so
    * `concat_ws("", tokens)` reproduces the pre-tokenized text exactly.
    */
  def encodeDocs(docs: DataFrame, idCol: String, textCol: String,
      model: BpeModel): DataFrame = {
    graft.util.Ids.requireLongCompatible(docs, idCol, "encodeDocs")
    val spark = docs.sparkSession
    import spark.implicits._
    val bcRanks = spark.sparkContext.broadcast(model.ranks)
    docs.filter(col(textCol).isNotNull)
      .select(col(idCol).cast("long"), col(textCol))
      .as[(Long, String)]
      .mapPartitions { it =>
        val ranks = bcRanks.value
        val memo = new java.util.HashMap[String, Array[String]](1 << 12)
        it.map { case (id, text) =>
          val toks = scala.collection.mutable.ArrayBuffer.empty[String]
          val m = tokenRe.findAllIn(text)
          while (m.hasNext) {
            val w = m.next()
            var enc = memo.get(w)
            if (enc == null) {
              enc = encodeWord(w, ranks)
              if (memo.size < (1 << 16)) memo.put(w, enc)
            }
            toks ++= enc
          }
          (id, toks.toArray)
        }
      }
      .toDF(idCol, "tokens")
  }

  /** Persist a trained model as a (rank, left, right) parquet — the
    * merges ARE the model (HF `merges.txt` semantics); rank order is
    * the apply priority, so load must restore it exactly.
    */
  def save(model: BpeModel, spark: org.apache.spark.sql.SparkSession,
      path: String): Unit = {
    import spark.implicits._
    model.merges.zipWithIndex
      .map { case ((l, r), i) => (i, l, r) }
      .toDF("rank", "left", "right")
      .repartition(1)
      .write.mode("overwrite").parquet(path)
  }

  def load(spark: org.apache.spark.sql.SparkSession, path: String): BpeModel = {
    val rows = spark.read.parquet(path)
      .select("rank", "left", "right")
      .collect()
      .sortBy(_.getInt(0))
    val merges = rows.map(r => (r.getString(1), r.getString(2))).toSeq
    require(rows.map(_.getInt(0)).toSeq == rows.indices,
      s"corrupt BPE model at $path: ranks not a dense 0..n-1 sequence")
    BpeModel(merges)
  }

  /** T14 — train a BPE tokenizer on the corpus, encode the corpus with
    * it, and gate the invariants that define a correct BPE:
    * - lossless: per doc, concat(tokens) == concat(pre-tokenized words);
    * - compressive: total tokens after merging < total single-codepoint
    *   symbols (the merges actually fired);
    * - vocab-bounded: distinct tokens used ≤ distinct base codepoints +
    *   numMerges (each merge mints at most one new symbol).
    * Rows-only: the merge loop is iterative/driver-seeded, not
    * SQL-expressible; the gates above are the correctness contract.
    */
  val t14 = QueryDef.rowsOnly("t14_bpe_tokenizer") { (s, d) =>
    val docs = Tables.documents(s, d)
    val numMerges = 200
    val hist = wordHistogram(docs, "text", maxWords = 20000)
    val model = trainBpe(hist, numMerges)
    val enc = encodeDocs(docs, "doc_id", "text", model)

    val joinedWords = docs.filter(col("text").isNotNull)
      .select(col("doc_id").cast("long").as("doc_id"),
        concat_ws("", regexp_extract_all(col("text"),
          lit(TextAnalysis.bpeTokenPattern), lit(0))).as("joined"),
        length(concat_ws("", regexp_extract_all(col("text"),
          lit(TextAnalysis.bpeTokenPattern), lit(0)))).cast("long").as("n_sym"))
    val perDoc = enc.join(joinedWords, "doc_id")
      .select(col("doc_id"),
        (concat_ws("", col("tokens")) === col("joined")).as("lossless"),
        size(col("tokens")).cast("long").as("n_tok"),
        col("n_sym"))
    val nBase = docs.filter(col("text").isNotNull)
      .select(explode(split(concat_ws("", regexp_extract_all(col("text"),
        lit(TextAnalysis.bpeTokenPattern), lit(0))), "")).as("ch"))
      .filter(col("ch") =!= "")
      .agg(count_distinct(col("ch"))).head().getLong(0)
    val agg = perDoc.agg(
      count(lit(1)).as("n_docs"),
      min(col("lossless").cast("int")).as("all_lossless"),
      sum(col("n_tok")).as("total_tokens"),
      sum(col("n_sym")).as("total_symbols")).head()
    val nVocab = enc.select(explode(col("tokens")).as("t"))
      .agg(count_distinct(col("t"))).head().getLong(0)
    val spark = s; import spark.implicits._
    Seq((agg.getLong(0), agg.getLong(2), agg.getLong(3), nVocab,
      model.merges.length.toLong,
      agg.getInt(1) == 1 && agg.getLong(2) < agg.getLong(3) &&
        nVocab <= nBase + numMerges && model.merges.nonEmpty))
      .toDF("n_docs", "total_tokens", "total_symbols", "n_vocab",
        "n_merges", "ok")
      .filter(col("ok") && col("n_docs") > 0)
  }

  def all: Seq[QueryDef] = Seq(t14)
}
