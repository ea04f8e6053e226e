package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Loaders for the driver-provided test tables (TESTDATA.md).
  *
  * Every table is one parquet file under an sf directory. Reads are plain
  * `spark.read.parquet` so Catalyst owns predicate pushdown / column
  * pruning; callers never cache here (caching decisions belong to the
  * pipeline layer, where reuse is known).
  */
object Tables {
  val names: Seq[String] = Seq(
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings")

  def path(sfDir: String, name: String): String = s"$sfDir/$name.parquet"

  def load(spark: SparkSession, sfDir: String, name: String): DataFrame =
    spark.read.parquet(path(sfDir, name))

  def lineitem(s: SparkSession, d: String): DataFrame = load(s, d, "lineitem")
  def orders(s: SparkSession, d: String): DataFrame = load(s, d, "orders")
  def customer(s: SparkSession, d: String): DataFrame = load(s, d, "customer")
  def supplier(s: SparkSession, d: String): DataFrame = load(s, d, "supplier")
  def part(s: SparkSession, d: String): DataFrame = load(s, d, "part")
  def nation(s: SparkSession, d: String): DataFrame = load(s, d, "nation")
  def region(s: SparkSession, d: String): DataFrame = load(s, d, "region")
  /** events.parquet has shipped `ts` under several physical encodings;
    * normalize all of them to a session-TZ TimestampType so downstream
    * `unix_micros(ts)` (which rejects TIMESTAMP_NTZ) always works:
    *
    *  - TIMESTAMP(NANOS): Spark reads it only as LongType (nanos since
    *    epoch) under `spark.sql.legacy.parquet.nanosAsLong=true` (set in
    *    every session builder here). `div` is integral long division —
    *    `/` would go through double, which cannot represent 2026-epoch
    *    nanos (~1.8e18 > 2^53) exactly.
    *  - timestamp[us] with isAdjustedToUTC=false (pandas/pyarrow default):
    *    Spark 4 surfaces it as TIMESTAMP_NTZ. Every session here pins
    *    `spark.sql.session.timeZone=UTC`, so casting NTZ→TIMESTAMP is
    *    value-preserving and `unix_micros` equals DuckDB's `epoch_us`.
    */
  def events(s: SparkSession, d: String): DataFrame = {
    val raw = load(s, d, "events")
    raw.schema("ts").dataType match {
      case org.apache.spark.sql.types.LongType =>
        raw.withColumn("ts",
          org.apache.spark.sql.functions.timestamp_micros(
            org.apache.spark.sql.functions.expr("ts div 1000")))
      case _: org.apache.spark.sql.types.TimestampNTZType =>
        raw.withColumn("ts",
          org.apache.spark.sql.functions.col("ts")
            .cast(org.apache.spark.sql.types.TimestampType))
      case _ => raw
    }
  }
  /** Drift guards for the other driver tables, same policy as `events`:
    * normalize physical-encoding drift to the canonical engine schema
    * so a regenerated testdata file degrades to a cast, not a crashed
    * query family. Integral ids widen to long (always lossless);
    * embedding elements cast to float — lossless when the stored
    * doubles are float-valued (the generator's values), and the only
    * type every vector kernel (native cosine included) accepts.
    */
  private def integralToLong(df: DataFrame, c: String): DataFrame =
    df.schema(c).dataType match {
      case org.apache.spark.sql.types.LongType => df
      case _: org.apache.spark.sql.types.IntegerType |
           _: org.apache.spark.sql.types.ShortType =>
        df.withColumn(c, org.apache.spark.sql.functions.col(c).cast("long"))
      case _ => df
    }

  def documents(s: SparkSession, d: String): DataFrame = {
    val raw = load(s, d, "documents")
    Seq("doc_id", "n_chars").filter(raw.columns.contains)
      .foldLeft(raw)(integralToLong)
  }

  def embeddings(s: SparkSession, d: String): DataFrame = {
    val raw = integralToLong(load(s, d, "embeddings"), "vec_id")
    raw.schema("embedding").dataType match {
      case org.apache.spark.sql.types.ArrayType(
        org.apache.spark.sql.types.FloatType, _) => raw
      case org.apache.spark.sql.types.ArrayType(
        _: org.apache.spark.sql.types.NumericType, _) =>
        raw.withColumn("embedding",
          org.apache.spark.sql.functions.col("embedding").cast("array<float>"))
      case _ => raw
    }
  }
}

/** One declared engine query: the Spark plan plus (when SQL-expressible)
  * the DuckDB oracle SQL the driver runs on the same parquet tables.
  * Column names/aliases MUST match between the two (driver sorts columns
  * by name before hashing).
  */
final case class QueryDef(
    name: String,
    fn: (SparkSession, String) => DataFrame,
    oracle: Option[String] = None,
    /** false for fixture-bound self-tests whose cost does not scale with
      * sfDir — they run in Verify but are excluded from Bench so the
      * bench measures data-scale throughput, not fixture ML fits. */
    benchEligible: Boolean = true,
    /** When present, BENCH times this variant instead of `fn` (Verify
      * always runs `fn`). For the store-lifecycle queries, `fn` carries
      * heavyweight TRUTH-side gates — brute-force oracle sides,
      * pair-graph reconciliations, rebuild-compare loops — that are
      * correctness machinery, not engine throughput; the bench variant
      * runs the SAME store operations (build/append/probe/search/
      * delete/compact) with the gate choreography stripped, so the
      * bench measures the store ops (r15 verdict item 3). Gate coverage
      * is unchanged: Verify runs the full-gate `fn` against its DuckDB
      * oracle every round. */
    benchFn: Option[(SparkSession, String) => DataFrame] = None)

object QueryDef {
  def sql(name: String, oracle: String)(fn: (SparkSession, String) => DataFrame): QueryDef =
    QueryDef(name, fn, Some(oracle))
  def rowsOnly(name: String)(fn: (SparkSession, String) => DataFrame): QueryDef =
    QueryDef(name, fn, None)
  def fixture(name: String)(fn: (SparkSession, String) => DataFrame): QueryDef =
    QueryDef(name, fn, None, benchEligible = false)
}
