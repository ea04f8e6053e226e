package graft.ops

import graft.{QueryDef, Tables}
import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Bloom-filter semi-join reduction: probe a compact dim-side key
  * sketch on the fact scan BEFORE the join's exchange, so fact rows
  * that cannot match never enter the shuffle.
  *
  * At 100 TB this is the difference between shuffling the whole fact
  * table into a semi-join and shuffling only the ~selectivity fraction
  * that can match: the bloom filter is a few MB for tens of millions
  * of dim keys (built with one dim-side aggregate), ships to every
  * executor once, and is consulted per-row inside the scan stage —
  * whole-stage-codegen'd around the UDF call, no exchange added.
  * False positives (rate `fpp`) are removed by the real join that
  * follows, so the RESULT is exactly the semi-join — the bloom only
  * prunes, never decides. (Spark's own runtime bloom-filter join
  * inserts the same shape automatically when statistics allow; this
  * operator is the explicit form for when they don't — e.g. a dim
  * side produced by an opaque upstream stage.)
  */
object BloomJoin {

  /** Fact rows whose `factKey` passes a bloom built from `dimKey`,
    * then exactly semi-joined. `fpp` trades sketch size for prune
    * precision. The dim side is scanned twice for the sketch (a cheap
    * exchange-free sizing pass + the build aggregate — or ONCE with an
    * `expectedItems` hint) plus once for the exact join — dim is the
    * SMALL side by contract, the win is never scanning excess FACT
    * rows into the exchange.
    */
  /** Build the dim-side key sketch plus its broadcast probe predicate
    * (shared by [[bloomSemiJoin]] and callers that want to audit the
    * prune with the SAME sketch instead of building a second one).
    * Long keys only — the probe is `mightContainLong`; a non-bigint
    * key would be silently null-coerced by the UDF boundary and prune
    * EVERYTHING, so the type is required loudly.
    *
    * Sizing: pass `expectedItems` when the caller knows the dim key
    * cardinality (skips the sizing scan entirely); otherwise one
    * `approx_count_distinct` aggregate — partial-agg sketches only,
    * no full `distinct()` exchange — estimates it, padded 10% so the
    * HLL's ±5% rsd cannot push the realized fpp above the ask.
    */
  def bloomProbe(dim: DataFrame, dimKey: String, fpp: Double,
      expectedItems: Option[Long] = None)
      : org.apache.spark.sql.Column => org.apache.spark.sql.Column = {
    require(dim.schema(dimKey).dataType ==
      org.apache.spark.sql.types.LongType,
      s"bloomProbe needs a bigint key, got " +
        s"${dim.schema(dimKey).dataType.simpleString} for $dimKey")
    expectedItems.foreach(n => require(n > 0,
      s"bloomProbe: expectedItems must be positive, got $n"))
    val nDim = expectedItems.getOrElse {
      val est = dim.agg(approx_count_distinct(col(dimKey))).head().getLong(0)
      require(est > 0, "bloomSemiJoin: empty dim side")
      math.max(1L, (est * 1.1).toLong)
    }
    val bloom = dim.stat.bloomFilter(dimKey, nDim, fpp)
    val bc = dim.sparkSession.sparkContext.broadcast(bloom)
    val mightContain = udf((k: java.lang.Long) =>
      k != null && bc.value.mightContainLong(k))
    (c: org.apache.spark.sql.Column) => mightContain(c)
  }

  def bloomSemiJoin(fact: DataFrame, dim: DataFrame, factKey: String,
      dimKey: String, fpp: Double = 0.01,
      expectedItems: Option[Long] = None): DataFrame = {
    require(factKey != dimKey,
      s"fact and dim key columns must have distinct names (both '$factKey')" +
        " — alias one side")
    require(fact.schema(factKey).dataType ==
      org.apache.spark.sql.types.LongType,
      s"bloomSemiJoin needs a bigint fact key, got " +
        s"${fact.schema(factKey).dataType.simpleString} for $factKey")
    val probe = bloomProbe(dim, dimKey, fpp, expectedItems)
    // no distinct() on the semi-join's right side: left_semi results
    // are unaffected by duplicate right keys, the exchange would be
    // pure cost
    fact.filter(probe(col(factKey)))
      .join(dim.select(col(dimKey)), col(factKey) === col(dimKey),
        "left_semi")
  }

  /** Oracle: plain semi-join aggregate — the bloom must be invisible
    * in the result. The in-query gate asserts the prune is REAL: the
    * bloom passes at most (match-fraction + 2·fpp) of fact rows, i.e.
    * materially fewer than all of them for a selective dim.
    */
  val p6 = QueryDef.sql(
    "p6_bloom_semi_join",
    """SELECT l_returnflag,
      |       count(*) AS n_rows,
      |       round(sum(l_quantity), 2) AS sum_qty
      |FROM lineitem
      |WHERE l_orderkey IN (
      |  SELECT o_orderkey FROM orders WHERE o_orderpriority = '1-URGENT')
      |GROUP BY l_returnflag""".stripMargin) { (s, d) =>
    val fact = Tables.load(s, d, "lineitem")
    val dim = Tables.load(s, d, "orders")
      .filter(col("o_orderpriority") === "1-URGENT")
    // ONE sketch serves both the join and the gate; the gate's
    // key-column-only scan computes total and pass counts together.
    val probe = bloomProbe(dim, "o_orderkey", fpp = 0.01)
    val joined = fact.filter(probe(col("l_orderkey")))
      .join(dim.select(col("o_orderkey")),
        col("l_orderkey") === col("o_orderkey"), "left_semi")
    val gateRow = fact.select("l_orderkey")
      .agg(count(lit(1)).as("n"),
        sum(when(probe(col("l_orderkey")), 1L).otherwise(0L)).as("p")).head()
    val (nFact, nPass) = (gateRow.getLong(0), gateRow.getLong(1))
    val nMatch = joined.count()
    require(nPass <= nMatch + (0.02 * nFact).toLong && nPass < nFact,
      s"bloom prune ineffective: $nPass of $nFact passed, $nMatch true matches")
    joined.groupBy("l_returnflag")
      .agg(count(lit(1)).as("n_rows"),
        round(sum(col("l_quantity")), 2).as("sum_qty"))
  }

  def all: Seq[QueryDef] = Seq(p6)
}
