package graft.ops

import graft.{QueryDef, Tables}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** The reference's signature sampling/splitting semantics (SURVEY.md §2.7).
  *
  * daxos's core trick (crossvalidate.py:350-395): the dataset is globally
  * shuffled ONCE on disk at ingest, after which every split — train/test,
  * k-fold, CV subsample — is a *chunk-aligned, shuffle-free* selection of
  * whole blocks. We reproduce that exactly: `materializedShuffle` writes a
  * seeded random order with a persisted `block_id`, and all splitters
  * filter on `block_id` — a narrow, codegen'd predicate that never moves a
  * row between partitions. At 100 TB this is the difference between a
  * free split and a full-dataset shuffle per fold.
  */
object Splits {

  /** R1 — one-time materialized global shuffle (Snakefile:228-244 `shuf`).
    * Emits a stable `row_id` (position in the shuffled order) and
    * `block_id` (= row_id / chunkRows, the dask-chunk analog). This is the
    * ONLY global sort in the pipeline; everything downstream splits on
    * block_id without shuffling.
    */
  def materializedShuffle(df: DataFrame, seed: Long, chunkRows: Long): DataFrame = {
    val shuffled = df.orderBy(rand(seed))
    // zipWithIndex gives a stable, gap-free global position without a
    // second sort (monotonically_increasing_id has gaps between partitions
    // which would break exact chunk arithmetic).
    val schema = shuffled.schema
    val withId = shuffled.rdd.zipWithIndex.map { case (r, i) =>
      org.apache.spark.sql.Row.fromSeq(r.toSeq :+ i)
    }
    val spark = df.sparkSession
    spark.createDataFrame(withId,
        schema.add("row_id", org.apache.spark.sql.types.LongType, nullable = false))
      .withColumn("block_id", (col("row_id") / chunkRows).cast("long"))
  }

  /** R3 — chunk-aligned k-fold (crossvalidate.py:364-395): fold i = a
    * contiguous range of whole blocks; the last fold absorbs the
    * remainder. Returns (train, test) per fold. Pure block_id predicates —
    * zero shuffle, reproducible independent of partitioning.
    */
  def chunkedKFold(df: DataFrame, k: Int, nBlocks: Long): Seq[(DataFrame, DataFrame)] = {
    require(k >= 2, s"k must be >= 2, got $k")
    require(nBlocks >= k,
      s"need at least one block per fold: nBlocks=$nBlocks < k=$k")
    val perFold = math.max(1L, nBlocks / k)
    (0 until k).map { i =>
      val lo = i * perFold
      val hi = if (i == k - 1) Long.MaxValue else (i + 1) * perFold
      val test = col("block_id") >= lo && col("block_id") < hi
      (df.filter(!test), df.filter(test))
    }
  }

  /** R4 — chunk-aligned train/test split: a seeded choice of whole blocks
    * at `trainFrac` (crossvalidate.py:350-361 `np.random.choice` of
    * chunks). Two regimes:
    *   - nBlocks small (≤ 2^20): exact driver-side sample of block ids,
    *     pushed as an `isInCollection` predicate — exact-count reference
    *     parity; the collection is at most ~8 MB of longs.
    *   - nBlocks large (the 100 TB case, ~10^9 blocks): a seeded hash
    *     predicate `pmod(hash(block_id, seed), K) < trainFrac·K` —
    *     nothing materializes on the driver, the fraction is exact in
    *     expectation and concentrates tightly at that count. Never
    *     serialize 10^9 literals into a plan.
    * Both are pure narrow block_id predicates: zero shuffle.
    */
  def chunkedTrainTest(df: DataFrame, trainFrac: Double, seed: Long, nBlocks: Long)
      : (DataFrame, DataFrame) = {
    require(trainFrac > 0.0 && trainFrac < 1.0, s"trainFrac in (0,1), got $trainFrac")
    val inTrain =
      if (nBlocks <= (1L << 20)) {
        require(nBlocks >= 2, s"need >= 2 blocks to split, got $nBlocks")
        val rng = new scala.util.Random(seed)
        // clamp to [1, nBlocks-1]: round() at extreme fractions would
        // otherwise leave one side silently empty
        val nTrain = math.min(nBlocks - 1,
          math.max(1L, math.round(nBlocks * trainFrac)))
        val picked = rng.shuffle((0L until nBlocks).toVector)
          .take(nTrain.toInt).toSet
        col("block_id").isInCollection(picked)
      } else {
        val buckets = 1000000L
        pmod(hash(col("block_id"), lit(seed)), lit(buckets)) <
          lit(math.round(trainFrac * buckets))
      }
    (df.filter(inTrain), df.filter(!inTrain))
  }

  /** R5 — CV head-subsample (crossvalidate.py:398-404): first n rows,
    * random BECAUSE the store is pre-shuffled. block_id predicate, not
    * limit(), so it stays parallel and partition-prunable.
    */
  def headSubsample(df: DataFrame, nRows: Long, chunkRows: Long): DataFrame =
    df.filter(col("block_id") < math.max(1L, nRows / chunkRows))

  // ---------------------------------------------------------------- queries

  /** R1 as an oracle query: a seeded shuffle is a permutation, so every
    * order-insensitive aggregate is invariant. The oracle checks the
    * checksum; determinism of the permutation itself is asserted in
    * ShuffleSpec (same seed ⇒ same order, twice).
    */
  val r1 = QueryDef.sql(
    "r1_shuffle_invariant",
    """SELECT count(*) AS n, round(sum(l_quantity), 2) AS qty_checksum,
      |       CAST(sum(l_orderkey) AS BIGINT) AS key_checksum
      |FROM lineitem""".stripMargin) {
    (s, d) =>
      val shuffled = Tables.lineitem(s, d).orderBy(rand(42L))
      shuffled.agg(
        count(lit(1)).as("n"),
        round(sum(col("l_quantity")), 2).as("qty_checksum"),
        sum(col("l_orderkey")).cast("long").as("key_checksum"))
  }

  /** R2 — randomSplit disjointness + coverage: the two halves union back
    * to the full table and overlap nowhere. Seeded; the invariants (not
    * the engine-specific membership) are the oracle contract.
    */
  val r2 = QueryDef.sql(
    "r2_split_coverage",
    """SELECT count(*) AS n_total, CAST(0 AS BIGINT) AS n_overlap
      |FROM customer""".stripMargin) {
    (s, d) =>
      // Single job: tag both halves, count totals + both-sides keys in one
      // aggregation (round 1 ran three actions, each recomputing the split).
      val c = Tables.customer(s, d)
      val Array(tr, te) = c.randomSplit(Array(0.7, 0.3), seed = 42L)
      val tagged = tr.select(col("c_custkey"), lit("tr").as("side"))
        .unionByName(te.select(col("c_custkey"), lit("te").as("side")))
      tagged.groupBy("c_custkey")
        .agg(count(lit(1)).as("k"), countDistinct(col("side")).as("s"))
        .agg(sum(col("k")).cast("long").as("n_total"),
          sum(when(col("s") === 2, 1L).otherwise(0L)).cast("long").as("n_overlap"))
  }

  /** R3 — chunk-aligned k-fold invariants: folds are disjoint and
    * exhaustive, so test-fold counts sum to the table size; each of the
    * k train sets is the complement of its test fold.
    */
  val r3 = QueryDef.sql(
    "r3_kfold_coverage",
    """SELECT CAST(5 AS BIGINT) AS n_folds, count(*) AS n_rows,
      |       CAST(4 * count(*) AS BIGINT) AS train_rows_total
      |FROM lineitem""".stripMargin) {
    (s, d) =>
      // Disjointness/exhaustiveness of the real chunkedKFold predicates,
      // in ONE job: union all 5×(train,test) branches with labels and run a
      // single aggregate (round 1 ran 11 serial count() jobs — 10× wasted
      // scans). Chunk ALIGNMENT of the true materializedShuffle path is
      // asserted in ShuffleSpec, not here (pmod blocks are residue classes).
      val chunkRows = 100L
      val li = Tables.lineitem(s, d)
      val n = li.count()
      val nBlocks = (n + chunkRows - 1) / chunkRows
      val withBlocks = li
        .withColumn("row_id", monotonically_increasing_id())
        .withColumn("block_id", pmod(col("row_id"), lit(nBlocks)))
      val folds = chunkedKFold(withBlocks, 5, nBlocks)
      val tagged = folds.zipWithIndex.map { case ((tr, te), i) =>
        tr.select(lit(i.toLong).as("fold"), lit("train").as("side"))
          .unionByName(te.select(lit(i.toLong).as("fold"), lit("test").as("side")))
      }.reduce(_ unionByName _)
      tagged.agg(
        countDistinct(col("fold")).cast("long").as("n_folds"),
        sum(when(col("side") === "test", 1L).otherwise(0L)).cast("long").as("n_rows"),
        sum(when(col("side") === "train", 1L).otherwise(0L)).cast("long")
          .as("train_rows_total"))
  }

  def all: Seq[QueryDef] = Seq(r1, r2, r3)
}
