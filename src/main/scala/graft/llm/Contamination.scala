package graft.llm

import graft.{QueryDef, Tables}
import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Benchmark decontamination — the training-data hygiene operator every
  * LLM pipeline runs before training: drop (or flag) any training
  * document sharing an n-token gram with a held-out evaluation set, so
  * benchmark answers cannot leak into the corpus (the published GPT-3 /
  * PaLM appendix procedure; n = 8–13 in practice, 4 here because the
  * synthetic corpus's tiny vocabulary makes longer grams unique).
  *
  * Scale design: the benchmark side is SMALL by definition (eval sets
  * are thousands of docs, not billions), so its distinct gram set is
  * broadcast and the corpus side never shuffles — one scan computing
  * grams per doc + a broadcast semi-join, linear in corpus size. If the
  * benchmark gram set ever outgrew broadcast range, the same plan runs
  * as a shuffle semi-join keyed on gram (drop the hint) — still linear,
  * never all-pairs.
  */
object Contamination {

  /** Distinct n-token grams of `textCol`; documents shorter than n
    * tokens contribute their whole text as one gram (so a short doc
    * exactly equal to a short benchmark doc still matches). */
  def tokenGrams(textCol: Column, n: Int): Column = {
    val toks = split(textCol, " ")
    when(size(toks) < n, array(textCol)).otherwise(
      array_distinct(transform(sequence(lit(1), size(toks) - (n - 1)),
        i => concat_ws(" ", slice(toks, i, lit(n))))))
  }

  /** Ids of `docs` rows sharing at least one n-gram with `benchmark`.
    * Both frames need (idCol, textCol). The benchmark gram set is
    * deduplicated and broadcast; the corpus explode is the only
    * corpus-sized stage. */
  def contaminatedIds(docs: DataFrame, benchmark: DataFrame,
      idCol: String, textCol: String, n: Int): DataFrame = {
    val benchGrams = benchmark.filter(col(textCol).isNotNull)
      .select(explode(tokenGrams(col(textCol), n)).as("gram")).distinct()
    docs.filter(col(textCol).isNotNull)
      .select(col(idCol), explode(tokenGrams(col(textCol), n)).as("gram"))
      .join(broadcast(benchGrams), "gram")
      .select(col(idCol)).distinct()
  }

  /** Drop contaminated rows from `docs` (left-anti on the flagged ids). */
  def decontaminate(docs: DataFrame, benchmark: DataFrame,
      idCol: String, textCol: String, n: Int): DataFrame =
    docs.join(contaminatedIds(docs, benchmark, idCol, textCol, n),
      Seq(idCol), "left_anti")

  /** D8 — decontamination gate: benchmark = every 23rd doc; the oracle
    * recomputes gram overlap from first principles in DuckDB, so the
    * count/checksum hash match proves the broadcast semi-join equals
    * the set-overlap definition (31 of 478 candidate docs collide at
    * n=4 on this corpus — a nontrivial split both ways).
    */
  val d8 = QueryDef.sql(
    "d8_decontaminate",
    """WITH t AS (SELECT doc_id, string_split(text, ' ') AS toks, text
      |           FROM documents WHERE text IS NOT NULL),
      |g AS (SELECT doc_id,
      |             unnest(CASE WHEN len(toks) < 4 THEN [text]
      |                    ELSE list_distinct(list_transform(range(1, len(toks) - 2),
      |                           i -> list_aggregate(toks[i:i+3], 'string_agg', ' ')))
      |                    END) AS gram
      |      FROM t),
      |bench AS (SELECT DISTINCT gram FROM g WHERE doc_id % 23 = 0),
      |cont AS (SELECT DISTINCT g.doc_id FROM g JOIN bench USING (gram)
      |         WHERE g.doc_id % 23 <> 0)
      |SELECT (SELECT count(*) FROM t WHERE doc_id % 23 = 0) AS n_bench,
      |       (SELECT count(*) FROM cont) AS n_contaminated,
      |       (SELECT count(*) FROM t WHERE doc_id % 23 <> 0)
      |         - (SELECT count(*) FROM cont) AS n_clean,
      |       (SELECT CAST(coalesce(sum(doc_id), 0) AS BIGINT) FROM cont)
      |         AS cont_checksum""".stripMargin) {
    (s, d) =>
      val docs = Tables.documents(s, d).filter(col("text").isNotNull)
      val bench = docs.filter(col("doc_id") % 23 === 0)
      val corpus = docs.filter(col("doc_id") % 23 =!= 0)
      val cont = contaminatedIds(corpus, bench, "doc_id", "text", n = 4)
      // both side counts in one conditional aggregate — not two scans
      val counts = docs.agg(
        sum(when(col("doc_id") % 23 === 0, 1L).otherwise(0L)),
        sum(when(col("doc_id") % 23 =!= 0, 1L).otherwise(0L))).head()
      val (nBench, nCorpus) = (counts.getLong(0), counts.getLong(1))
      cont.agg(
        lit(nBench).as("n_bench"),
        count(lit(1)).as("n_contaminated"),
        (lit(nCorpus) - count(lit(1))).as("n_clean"),
        coalesce(sum(col("doc_id")), lit(0L)).cast("long").as("cont_checksum"))
  }

  // ------------------------------------------ semantic decontamination

  /** Embedding-space contamination pairs: corpus vectors whose cosine to
    * ANY eval vector reaches `threshold` — the fuzzy complement of the
    * n-gram pass above (catches paraphrases/translations that share no
    * exact gram). Same scale contract as [[contaminatedIds]]: the eval
    * side is small by definition and broadcast; the corpus side is one
    * scan with the codegen'd cosine — linear, never corpus×corpus.
    * Returns (idCol, eval_id, sim) one row per flagged pair.
    */
  def semanticContaminationPairs(corpus: DataFrame, evalSet: DataFrame,
      threshold: Double, idCol: String = "vec_id",
      vecCol: String = "embedding"): DataFrame = {
    require(threshold > 0 && threshold <= 1, s"threshold=$threshold")
    val ev = evalSet.filter(col(vecCol).isNotNull)
      .select(col(idCol).as("eval_id"), col(vecCol).as("ev"))
    corpus.filter(col(vecCol).isNotNull)
      .select(col(idCol), col(vecCol))
      .crossJoin(broadcast(ev))
      .withColumn("sim",
        round(graft.llm.Similarity.cosine(col(vecCol), col("ev")), 6))
      .filter(col("sim") >= threshold)
      .select(col(idCol), col("eval_id"), col("sim"))
  }

  /** Drop semantically contaminated rows (left-anti on flagged ids). */
  def semanticDecontaminate(corpus: DataFrame, evalSet: DataFrame,
      threshold: Double, idCol: String = "vec_id",
      vecCol: String = "embedding"): DataFrame =
    corpus.join(
      semanticContaminationPairs(corpus, evalSet, threshold, idCol, vecCol)
        .select(col(idCol)).distinct(),
      Seq(idCol), "left_anti")

  /** D13 — semantic decontamination, FULL oracle: eval = every 100th
    * vector; corpus = the rest PLUS planted exact copies of the eval
    * set (+3 000 000). DuckDB replays the whole operator (brute-force
    * cosine against the same constructed corpus). On this
    * near-isotropic corpus (natural top-1 cosine ≈ 0.4) threshold 0.99
    * flags exactly the planted copies.
    */
  val d13 = QueryDef.sql(
    "d13_semantic_decontaminate",
    """WITH ev AS (SELECT vec_id AS eval_id, CAST(embedding AS DOUBLE[]) AS ev
      |            FROM embeddings WHERE vec_id % 100 = 0),
      |corpus AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v
      |           FROM embeddings WHERE vec_id % 100 != 0
      |           UNION ALL
      |           SELECT vec_id + 3000000, CAST(embedding AS DOUBLE[])
      |           FROM embeddings WHERE vec_id % 100 = 0)
      |SELECT c.vec_id, ev.eval_id,
      |       round(list_cosine_similarity(c.v, ev.ev), 6) AS sim
      |FROM corpus c, ev
      |WHERE round(list_cosine_similarity(c.v, ev.ev), 6) >= 0.99""".stripMargin) {
    (s, d) =>
      val emb = Tables.embeddings(s, d).select(col("vec_id"), col("embedding"))
      val ev = emb.filter(col("vec_id") % 100 === 0)
      val corpus = emb.filter(col("vec_id") % 100 =!= 0)
        .unionByName(ev.select((col("vec_id") + 3000000).as("vec_id"),
          col("embedding")))
      semanticContaminationPairs(corpus, ev, threshold = 0.99)
  }

  def all: Seq[QueryDef] = Seq(d8, d13)
}
