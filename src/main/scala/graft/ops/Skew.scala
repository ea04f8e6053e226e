package graft.ops

import graft.QueryDef
import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Skew-mitigation utilities: salted joins for hot keys. AQE's skew-join
  * handles sort-merge skew at runtime; explicit salting is the tool for
  * (a) broadcast-ineligible dimension joins with a handful of mega-keys
  * and (b) deterministic plans where runtime re-planning is off.
  */
object Skew {

  /** Salted equi-join: the big (skewed) side gets a salt in
    * [0, factor); the small side is exploded `factor`× so every
    * (key, salt) pair exists. The hot key's rows spread over `factor`
    * reducers instead of one. Inner join only (outer variants need
    * null-side handling — add when needed).
    *
    * Salt assignment: when `stableIdCols` names a row-unique identity
    * (a primary key), the salt is `pmod(hash(ids…, seed), factor)` —
    * fully deterministic under repartitioning, task retries, and store
    * rewrites. Without one, it falls back to `rand(seed)`, which is
    * per-row deterministic only for a pinned partition layout. The id
    * columns must vary WITHIN a join key (salting by hash(key) alone
    * would put the whole hot key in one salt bucket again).
    */
  def saltedJoin(big: DataFrame, small: DataFrame, key: String,
      factor: Int, seed: Long = 42L,
      stableIdCols: Seq[String] = Nil): DataFrame = {
    require(factor >= 2, s"salt factor must be >= 2, got $factor")
    val salt =
      if (stableIdCols.nonEmpty)
        pmod(hash((stableIdCols.map(col) :+ lit(seed)): _*), lit(factor))
      else (rand(seed) * factor).cast("int")
    val saltedBig = big.withColumn("_salt", salt)
    val saltedSmall = small.withColumn("_salt",
      explode(sequence(lit(0), lit(factor - 1))))
    saltedBig.join(saltedSmall, Seq(key, "_salt"), "inner").drop("_salt")
  }

  // ---------------------------------------------------------------- queries

  /** Salted vs plain join equivalence on a deliberately skewed key
    * distribution (one key holds ~25% of rows): same row count, same
    * aggregate checksum. The oracle computes the plain join in SQL.
    */
  val sk1 = QueryDef.sql(
    "sk1_salted_join",
    """WITH b AS (SELECT CASE WHEN l_orderkey % 4 = 0 THEN 0
      |                       ELSE l_orderkey % 25 END AS k,
      |                  l_quantity FROM lineitem),
      |s AS (SELECT DISTINCT CASE WHEN o_orderkey % 4 = 0 THEN 0
      |                           ELSE o_orderkey % 25 END AS k
      |      FROM orders),
      |j AS (SELECT b.k, b.l_quantity FROM b JOIN s ON b.k = s.k)
      |SELECT count(*) AS n, round(sum(l_quantity), 2) AS qty_sum,
      |       CAST(count(DISTINCT k) AS BIGINT) AS n_keys
      |FROM j""".stripMargin) {
    (s, d) =>
      val skewKey = (c: Column) => when(c % 4 === 0, 0L).otherwise(c % 25)
      val big = graft.Tables.lineitem(s, d)
        .select(skewKey(col("l_orderkey")).as("k"), col("l_quantity"))
      val small = graft.Tables.orders(s, d)
        .select(skewKey(col("o_orderkey")).as("k")).distinct()
      saltedJoin(big, small, "k", factor = 8)
        .agg(count(lit(1)).as("n"), round(sum(col("l_quantity")), 2).as("qty_sum"),
          countDistinct(col("k")).cast("long").as("n_keys"))
  }

  def all: Seq[QueryDef] = Seq(sk1)
}
