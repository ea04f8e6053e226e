package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Driver contract — see /root/repo/SURVEY.md §7 + the builder prompt.
  *
  * `queries` aggregates every module's declared QueryDefs; `oracleSql`
  * carries the DuckDB-equivalent SQL for the SQL-expressible subset
  * (driver correctness gate). Non-SQL-expressible ops (ML pipelines,
  * seeded randomized internals) register rows-only queries.
  */
object SparkEntry {

  def registry: Seq[QueryDef] =
    graft.ops.RelationalQueries.all ++
      graft.ops.AsofJoin.all ++
      graft.plans.AsofJoinNative.all ++
      graft.plans.RangeJoinNative.all ++
      graft.ops.RangeJoin.all ++
      graft.ops.Splits.all ++
      graft.ops.Skew.all ++
      graft.ops.Cdc.all ++
      graft.ops.BloomJoin.all ++
      graft.ops.GraphOps.all ++
      graft.ops.Quality.all ++
      graft.ops.Sketches.all ++
      graft.stats.FDR.all ++
      graft.ml.Scoring.all ++
      graft.ml.Train.all ++
      graft.ml.Deconfound.all ++
      graft.ml.Explain.all ++
      graft.ml.Pipeline.all ++
      graft.ml.Boruta.all ++
      graft.ml.LdClump.all ++
      graft.ml.XgbImport.all ++
      graft.ml.Prs.all ++
      graft.io.IoQueries.all ++
      graft.llm.TextAnalysis.all ++
      graft.llm.Tokenizer.all ++
      graft.llm.Curation.all ++
      graft.llm.Dedup.all ++
      graft.llm.DedupIndex.all ++
      graft.llm.Contamination.all ++
      graft.llm.Similarity.all ++
      graft.llm.VectorIndex.all ++
      graft.llm.GraphAnn.all ++
      graft.llm.HybridRetrieval.all ++
      graft.llm.TextIndex.all ++
      graft.llm.BinaryQuant.all ++
      graft.llm.EmbeddingOps.all ++
      graft.llm.Multimodal.all ++
      graft.streaming.Streams.all

  /** Flagship query on /root/testdata/sf0.001; driver smoke-checks rows>0.
    * TPC-H-Q1-shaped grouped aggregate (SURVEY.md A1).
    */
  def entry(spark: SparkSession): DataFrame =
    graft.ops.RelationalQueries.a1.fn(spark, "/root/testdata/sf0.001")

  /** One entry per implemented operator from SURVEY.md §2. */
  def queries: Map[String, (SparkSession, String) => DataFrame] =
    registry.map(q => q.name -> q.fn).toMap

  /** The bench subset: queries whose cost scales with the sf directory.
    * Fixture-bound ML self-tests (constant-size simulated inputs) run in
    * Verify only — benchmarking them would measure the fixture, not the
    * engine's data-scale throughput.
    */
  def benchQueries: Map[String, (SparkSession, String) => DataFrame] =
    registry.filter(_.benchEligible)
      .map(q => q.name -> q.benchFn.getOrElse(q.fn)).toMap

  /** Queries whose BENCH timing is the store-ops-only variant (gate
    * choreography stripped; Verify still runs the full-gate form) —
    * surfaced in the bench artifact so readers know what was timed. */
  def benchVariantNames: Seq[String] =
    registry.filter(q => q.benchEligible && q.benchFn.isDefined)
      .map(_.name).sorted

  /** For each key in queries, equivalent ANSI SQL runnable by DuckDB on
    * the same parquet tables. Omitted for non-SQL-expressible ops.
    */
  def oracleSql: Map[String, String] =
    registry.flatMap(q => q.oracle.map(sql => q.name -> sql)).toMap
}
