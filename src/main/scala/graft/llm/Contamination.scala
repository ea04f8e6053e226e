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

  def all: Seq[QueryDef] = Seq(d8)
}
