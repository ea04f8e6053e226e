package graft.ops

import graft.{QueryDef, Tables}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window

/** The declared relational query corpus (SURVEY.md §2.12): one query per
  * relational inventory row, each with a DuckDB oracle. Conventions for
  * cross-engine hash parity:
  *   - integer outputs cast to BIGINT on both sides,
  *   - double aggregates `round(x, 2..6)` on both sides,
  *   - every ORDER BY / LIMIT / window has a full deterministic tiebreak,
  *   - timestamps never returned raw (formatted or reduced to year).
  *
  * Scale notes are inline per query: what shuffles, what broadcasts, what
  * the plan looks like at 100 TB.
  */
object RelationalQueries {

  /** P1 — row filter by ID set as a left-semi join (daxos read.py:201-207
    * boolean-mask subsetting). At scale the id set is a table, not an
    * in-memory collection: semi-join lets AQE pick broadcast when the ids
    * are small and shuffled-hash otherwise; an `isin` literal list would
    * serialize the ids into the plan.
    */
  val p1 = QueryDef.sql(
    "p1_semi_join_filter",
    """SELECT c_custkey, c_name
      |FROM customer
      |WHERE EXISTS (SELECT 1 FROM orders
      |              WHERE o_custkey = c_custkey AND o_totalprice > 150000)""".stripMargin) {
    (s, d) =>
      val ids = Tables.orders(s, d).filter(col("o_totalprice") > 150000)
        .select(col("o_custkey").as("c_custkey"))
      Tables.customer(s, d)
        .join(ids, Seq("c_custkey"), "left_semi")
        .select(col("c_custkey"), col("c_name"))
  }

  /** P3 — SNP-name-style normalization: take the token before the first
    * separator (daxos read.py:211 `split('_')[0]`). Pure projection —
    * stays in whole-stage codegen, no shuffle.
    */
  val p3 = QueryDef.sql(
    "p3_string_split",
    """SELECT CAST(p_partkey AS BIGINT) AS p_partkey,
      |       split_part(p_type, ' ', 1) AS type_head
      |FROM part""".stripMargin) {
    (s, d) =>
      Tables.part(s, d).select(
        col("p_partkey").cast("long").as("p_partkey"),
        split(col("p_type"), " ").getItem(0).as("type_head"))
  }

  /** P4 — conditional recode driven by a global max (daxos read.py:91-96:
    * PLINK 1/2 phenotype → 0/1 iff max==2). The max is a scalar aggregate
    * collected to the driver (k=1 value — legal driver collect), then
    * folded into the plan as a literal so the recode itself is codegen'd.
    */
  val p4 = QueryDef.sql(
    "p4_conditional_recode",
    """SELECT CAST(CASE WHEN (SELECT max(l_linenumber) FROM lineitem) = 2
      |            THEN l_linenumber - 1 ELSE l_linenumber END AS BIGINT) AS code,
      |       count(*) AS n
      |FROM lineitem GROUP BY 1""".stripMargin) {
    (s, d) =>
      val li = Tables.lineitem(s, d)
      // Null-safe + width-agnostic: max over an empty table is NULL, and
      // the column may be int32 or int64 depending on the writer.
      val mx = Option(li.agg(max(col("l_linenumber"))).head().get(0))
        .map(_.asInstanceOf[Number].longValue)
      val recoded =
        if (mx.contains(2L)) col("l_linenumber") - 1 else col("l_linenumber")
      li.select(recoded.cast("long").as("code"))
        .groupBy("code").agg(count(lit(1)).as("n"))
  }

  /** P5 — NaN-aware aggregation (daxos crossvalidate.py:133-139 drops NaN
    * labels before scoring). Filter reaches the parquet scan as an IsNotNull
    * pushed filter; isnan stays in the codegen'd filter stage.
    */
  val p5 = QueryDef.sql(
    "p5_nan_aware_agg",
    """SELECT count(*) AS n_valid, round(avg(value), 2) AS avg_value
      |FROM events WHERE value IS NOT NULL AND NOT isnan(value)""".stripMargin) {
    (s, d) =>
      Tables.events(s, d)
        .filter(col("value").isNotNull && !isnan(col("value")))
        .agg(count(lit(1)).as("n_valid"), round(avg(col("value")), 2).as("avg_value"))
  }

  /** J1/J2 — inner equi-join + grouped rollup (daxos scoring.py:182
    * predictions⋈covariates). The dimension side is explicitly
    * `broadcast()`: at 100 TB the fact (orders) streams map-side against a
    * broadcast customer hash — zero shuffle for the join; only the final
    * 5-group aggregate shuffles (partial agg map-side first).
    */
  val j1 = QueryDef.sql(
    "j1_broadcast_inner_join",
    """SELECT c_mktsegment, count(*) AS n_orders,
      |       round(sum(o_totalprice), 2) AS revenue
      |FROM orders JOIN customer ON o_custkey = c_custkey
      |GROUP BY 1""".stripMargin) {
    (s, d) =>
      Tables.orders(s, d)
        .join(broadcast(Tables.customer(s, d)),
          col("o_custkey") === col("c_custkey"), "inner")
        .groupBy("c_mktsegment")
        .agg(count(lit(1)).as("n_orders"), round(sum(col("o_totalprice")), 2).as("revenue"))
  }

  /** J3 — anti-join split (daxos split_ids.py:50-51: test = IIDs not in
    * train). Same broadcast-ability as J1; left-anti preserves the left
    * schema untouched.
    */
  val j3 = QueryDef.sql(
    "j3_anti_join_split",
    """SELECT c_custkey FROM customer
      |WHERE NOT EXISTS (SELECT 1 FROM orders WHERE o_custkey = c_custkey)""".stripMargin) {
    (s, d) =>
      Tables.customer(s, d)
        .join(Tables.orders(s, d).select(col("o_custkey").as("c_custkey")),
          Seq("c_custkey"), "left_anti")
        .select("c_custkey")
  }

  /** J5 — positional zip via row_number (daxos cv.py:135 attaches IIDs to a
    * positional prediction vector). Top-k first (TakeOrderedAndProject — no
    * global sort), then the window runs over k rows only. Never rank an
    * unbounded table with an empty-partition window.
    */
  val j5 = QueryDef.sql(
    "j5_positional_zip",
    """WITH c AS (SELECT CAST(row_number() OVER (ORDER BY c_acctbal DESC, c_custkey) AS BIGINT) AS pos,
      |                  c_custkey
      |           FROM (SELECT * FROM customer ORDER BY c_acctbal DESC, c_custkey LIMIT 10)),
      |     p AS (SELECT CAST(row_number() OVER (ORDER BY s_acctbal DESC, s_suppkey) AS BIGINT) AS pos,
      |                  s_suppkey
      |           FROM (SELECT * FROM supplier ORDER BY s_acctbal DESC, s_suppkey LIMIT 10))
      |SELECT c.pos AS pos, c.c_custkey, p.s_suppkey
      |FROM c JOIN p ON c.pos = p.pos""".stripMargin) {
    (s, d) =>
      def ranked(df: DataFrame, ord: Seq[String], key: String): DataFrame = {
        // top-k first (TakeOrderedAndProject — no global sort), then
        // positions via zipWithIndex over the already-sorted result:
        // the same pattern as Splits.materializedShuffle (R1), with no
        // empty-partition window anywhere in the plan. zipWithIndex
        // numbers rows in partition order, which for a sorted frame IS
        // the sort order.
        val sorted = df.orderBy(col(ord.head).desc, col(ord(1)).asc)
          .limit(10).select(col(key))
        val spark = df.sparkSession
        val out = org.apache.spark.sql.types.StructType(Seq(
          org.apache.spark.sql.types.StructField("pos",
            org.apache.spark.sql.types.LongType, nullable = false),
          sorted.schema.head))
        spark.createDataFrame(
          sorted.rdd.zipWithIndex.map { case (r, i) =>
            org.apache.spark.sql.Row(i + 1L, r.get(0)) },
          out)
      }
      val c = ranked(Tables.customer(s, d), Seq("c_acctbal", "c_custkey"), "c_custkey")
      val p = ranked(Tables.supplier(s, d), Seq("s_acctbal", "s_suppkey"), "s_suppkey")
      c.join(p, Seq("pos"), "inner").select("pos", "c_custkey", "s_suppkey")
  }

  /** U1 — vertical concat round-trip (daxos read.py:62 chunk concatenate):
    * split orders by predicate, re-union, aggregate. Union is a no-shuffle
    * plan node; both branches scan the same parquet with disjoint pushed
    * filters.
    */
  val u1 = QueryDef.sql(
    "u1_union_roundtrip",
    """SELECT CAST(year(o_orderdate) AS BIGINT) AS yr, count(*) AS n,
      |       round(sum(o_totalprice), 2) AS total
      |FROM orders GROUP BY 1""".stripMargin) {
    (s, d) =>
      val o = Tables.orders(s, d)
      val cut = "1995-01-01"
      val early = o.filter(col("o_orderdate") < lit(cut).cast("timestamp"))
      val late = o.filter(col("o_orderdate") >= lit(cut).cast("timestamp"))
      early.unionByName(late)
        .groupBy(year(col("o_orderdate")).cast("long").as("yr"))
        .agg(count(lit(1)).as("n"), round(sum(col("o_totalprice")), 2).as("total"))
  }

  /** U4 — set difference (daxos boruta.py:58 setdiff1d on feature ids):
    * brands that never ship large sizes. EXCEPT = Spark's ExceptDistinct;
    * on the small distinct sets this broadcasts.
    */
  val u4 = QueryDef.sql(
    "u4_except_difference",
    """SELECT p_brand FROM part
      |EXCEPT
      |SELECT p_brand FROM part WHERE p_size > 40""".stripMargin) {
    (s, d) =>
      val p = Tables.part(s, d)
      p.select("p_brand").except(p.filter(col("p_size") > 40).select("p_brand"))
  }

  /** U7 — INTERSECT (distinct semantics): the remaining set operation
    * next to u1's UNION and u4's EXCEPT. Spark plans `.intersect` as a
    * distinct + left-semi hash join — on small distinct key sets both
    * sides broadcast, like u4.
    */
  val u7 = QueryDef.sql(
    "u7_intersect",
    """SELECT p_brand FROM part WHERE p_size <= 25
      |INTERSECT
      |SELECT p_brand FROM part WHERE p_size > 15""".stripMargin) {
    (s, d) =>
      val p = Tables.part(s, d)
      p.filter(col("p_size") <= 25).select("p_brand")
        .intersect(p.filter(col("p_size") > 15).select("p_brand"))
  }

  /** A1/O1 — the TPC-H-Q1-shaped grouped aggregate (daxos
    * crossvalidate.py:289-292 grouped mean over the CV grid). Headline
    * bench query: single scan, map-side partial agg, 4-row result. At
    * 100 TB this is scan-bound — the filter and the 7 needed columns are
    * pushed to parquet (verify via PushedFilters/ReadSchema in explain).
    */
  val a1 = QueryDef.sql(
    "a1_grouped_agg",
    """SELECT l_returnflag, l_linestatus,
      |       round(sum(l_quantity), 2)        AS sum_qty,
      |       round(sum(l_extendedprice), 2)   AS sum_base,
      |       round(sum(l_extendedprice * (1 - l_discount)), 2) AS sum_disc,
      |       round(avg(l_quantity), 2)        AS avg_qty,
      |       round(avg(l_extendedprice), 2)   AS avg_price,
      |       count(*) AS n
      |FROM lineitem
      |WHERE l_shipdate <= TIMESTAMP '1998-09-02 00:00:00'
      |GROUP BY 1, 2""".stripMargin) {
    (s, d) =>
      Tables.lineitem(s, d)
        .filter(col("l_shipdate") <= lit("1998-09-02 00:00:00").cast("timestamp"))
        .groupBy("l_returnflag", "l_linestatus")
        .agg(
          round(sum(col("l_quantity")), 2).as("sum_qty"),
          round(sum(col("l_extendedprice")), 2).as("sum_base"),
          round(sum(col("l_extendedprice") * (lit(1) - col("l_discount"))), 2).as("sum_disc"),
          round(avg(col("l_quantity")), 2).as("avg_qty"),
          round(avg(col("l_extendedprice")), 2).as("avg_price"),
          count(lit(1)).as("n"))
  }

  /** O1/O2 — sort + top-1 (daxos crossvalidate.py:308-316 best HP combo).
    * orderBy().limit(1) plans as TakeOrderedAndProject — a per-partition
    * top-k + driver merge, not a global sort.
    */
  val o2 = QueryDef.sql(
    "o2_best_group_top1",
    """SELECT l_returnflag, l_linestatus, round(avg(l_extendedprice), 2) AS avg_price
      |FROM lineitem GROUP BY 1, 2
      |ORDER BY avg_price DESC, l_returnflag, l_linestatus LIMIT 1""".stripMargin) {
    (s, d) =>
      Tables.lineitem(s, d)
        .groupBy("l_returnflag", "l_linestatus")
        .agg(round(avg(col("l_extendedprice")), 2).as("avg_price"))
        .orderBy(col("avg_price").desc, col("l_returnflag").asc, col("l_linestatus").asc)
        .limit(1)
  }

  /** Exact continuous quantiles via distributed sort + positional
    * select: range-partitioned sort (parallel), zipWithIndex for global
    * positions, then only the 2·|qs| boundary rows ever reach the
    * driver. Interpolation is the quantile_cont formula
    * v_lo + frac·(v_hi − v_lo) at rank (n−1)·q. Spark's builtin exact
    * `percentile` funnels per-partition value→count maps into one
    * merger (6.4 s at sf0.1 vs ~1.5 s for this plan, and worse at
    * 100×); this is the scale path for exact quantiles.
    */
  def exactQuantilesSorted(df: DataFrame, c: String, qs: Seq[Double]): Seq[Double] = {
    val sorted = df.select(col(c).cast("double")).na.drop().orderBy(col(c))
    val indexed = sorted.rdd.zipWithIndex()
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    try {
      val n = indexed.count()
      require(n > 0, s"no rows for quantiles of $c")
      val ranks = qs.map(q => (n - 1) * q)
      val need = ranks.flatMap(r =>
        Seq(math.floor(r).toLong, math.min(n - 1, math.floor(r).toLong + 1))).toSet
      val vals = indexed.filter { case (_, i) => need.contains(i) }
        .map { case (row, i) => (i, row.getDouble(0)) }.collect().toMap
      ranks.map { r =>
        val lo = math.floor(r).toLong
        val hi = math.min(n - 1, lo + 1)
        val frac = r - lo
        vals(lo) + frac * (vals(hi) - vals(lo))
      }
    } finally { indexed.unpersist() }
  }

  /** A4 — exact percentiles (daxos boruta.py:34 shadow-importance
    * percentile), via the sort-based exact plan above.
    */
  val a4 = QueryDef.sql(
    "a4_percentile",
    """SELECT round(quantile_cont(l_extendedprice, 0.25), 2) AS p25,
      |       round(quantile_cont(l_extendedprice, 0.50), 2) AS p50,
      |       round(quantile_cont(l_extendedprice, 0.75), 2) AS p75
      |FROM lineitem""".stripMargin) {
    (s, d) =>
      val Seq(p25, p50, p75) = exactQuantilesSorted(
        Tables.lineitem(s, d), "l_extendedprice", Seq(0.25, 0.50, 0.75))
      val spark = s; import spark.implicits._
      // round via Catalyst so HALF_UP semantics match the oracle exactly
      Seq((p25, p50, p75)).toDF("p25_raw", "p50_raw", "p75_raw")
        .select(round(col("p25_raw"), 2).as("p25"),
          round(col("p50_raw"), 2).as("p50"),
          round(col("p75_raw"), 2).as("p75"))
  }

  /** Scale path for grouped discrete order statistics: range-partition
    * the (group, value, tiebreak…) sort across ALL cores (a
    * `Window.partitionBy(group)` collapses parallelism to one task per
    * group — with ~4 groups that is 4 tasks sorting a quarter of the
    * table each, the round-1 verdict's flagged plan). Two passes:
    *   1. per-partition per-group counts → driver prefix sums (tiny:
    *      partitions × groups records) → target global rank per group;
    *   2. per-partition scan emits exactly the rank-(n+1)/2 element of
    *      each group (the discrete lower-middle — raw stored values,
    *      bit-identical across engines).
    */
  def groupedDiscreteMedian(df: DataFrame, groupCol: String, valueCol: String,
      tiebreaks: Seq[String]): DataFrame = {
    val spark = df.sparkSession
    val ordCols = (groupCol +: valueCol +: tiebreaks).map(col)
    val sorted = df.select(ordCols: _*)
      .repartitionByRange(df.sparkSession.sessionState.conf.numShufflePartitions,
        ordCols: _*)
      .sortWithinPartitions(ordCols: _*)
    // no persist: the sort is deterministic and the shuffle files of the
    // range exchange are reused by both passes (recomputing the narrow
    // post-shuffle sort is cheaper than ser/de-ing every row to storage)
    val rdd = sorted.rdd
    locally {
      // group keys are tracked internally as String.valueOf images (so
      // int/date/… keys work); output rows carry the ORIGINAL value
      // with the input's native type
      def keyOf(r: org.apache.spark.sql.Row): String = String.valueOf(r.get(0))
      // pass 1: (partition, group) → count
      val segCounts = rdd.mapPartitionsWithIndex { (pid, it) =>
        val m = scala.collection.mutable.LinkedHashMap[String, Long]()
        it.foreach { r => val g = keyOf(r); m(g) = m.getOrElse(g, 0L) + 1 }
        m.iterator.map { case (g, c) => (pid, g, c) }
      }.collect()
      val totals = segCounts.groupBy(_._2).view.mapValues(_.map(_._3).sum).toMap
      val targetRank = totals.map { case (g, n) => g -> ((n + 1) / 2) } // 1-based
      // offset of each (pid, group) segment in its group's global order
      val offsets = scala.collection.mutable.HashMap[(Int, String), Long]()
      val running = scala.collection.mutable.HashMap[String, Long]()
      segCounts.sortBy(_._1).foreach { case (pid, g, c) =>
        offsets((pid, g)) = running.getOrElse(g, 0L)
        running(g) = running.getOrElse(g, 0L) + c
      }
      val bcOff = spark.sparkContext.broadcast(offsets.toMap)
      val bcTarget = spark.sparkContext.broadcast(targetRank)
      val bcTotals = spark.sparkContext.broadcast(totals)
      val hits = rdd.mapPartitionsWithIndex { (pid, it) =>
        val off = bcOff.value; val tgt = bcTarget.value; val tot = bcTotals.value
        val pos = scala.collection.mutable.HashMap[String, Long]()
        it.flatMap { r =>
          val g = keyOf(r)
          val p = pos.getOrElse(g, off((pid, g))) + 1
          pos(g) = p
          if (p == tgt(g))
            Some(org.apache.spark.sql.Row(r.get(0), r.getDouble(1), tot(g)))
          else None
        }
      }
      import org.apache.spark.sql.types._
      spark.createDataFrame(hits, StructType(Seq(
        StructField(groupCol, df.schema(groupCol).dataType),
        StructField("med", DoubleType),
        StructField("n", LongType))))
    }
  }

  /** A5 — grouped median (daxos boruta.py:45-46 median over iteration
    * history), via the two-pass range-partitioned plan above. DISCRETE
    * lower-middle value rather than interpolating `median()`: Spark's
    * `a+(b-a)*0.5` vs DuckDB's `(a+b)/2` differ in the last double bit,
    * and averaged middles can land exactly on a `round` half-boundary.
    */
  val a5 = QueryDef.sql(
    "a5_grouped_median",
    """WITH r AS (
      |  SELECT l_returnflag, l_extendedprice,
      |         CAST(row_number() OVER (PARTITION BY l_returnflag
      |           ORDER BY l_extendedprice, l_orderkey, l_linenumber) AS BIGINT) AS rn,
      |         count(*) OVER (PARTITION BY l_returnflag) AS cnt
      |  FROM lineitem)
      |SELECT l_returnflag, l_extendedprice AS med_price, cnt AS n
      |FROM r
      |WHERE rn = floor((cnt + 1) / 2.0)""".stripMargin) {
    (s, d) =>
      groupedDiscreteMedian(Tables.lineitem(s, d), "l_returnflag",
        "l_extendedprice", Seq("l_orderkey", "l_linenumber"))
        .select(col("l_returnflag"), col("med").as("med_price"), col("n"))
  }

  /** A13 — frequency/QC aggregate with a HAVING gate (plink2 `--maf 0.05`
    * delegated QC, Snakefile:73-104): avg(dosage)/2-style per-key frequency
    * + threshold filter. Partial agg map-side; HAVING is a post-agg filter.
    */
  val a13 = QueryDef.sql(
    "a13_freq_having",
    """SELECT CAST(l_partkey AS BIGINT) AS l_partkey,
      |       round(sum(l_quantity), 2) AS sum_qty, count(*) AS n
      |FROM lineitem GROUP BY 1
      |HAVING sum(l_quantity) >= 25 * count(*) AND count(*) >= 3""".stripMargin) {
    (s, d) =>
      // HAVING in multiply form (sum >= 25*n, not avg >= 25): the sum of
      // integral quantities is exact in double, so the comparison — and
      // the returned checksum — is bit-identical across engines, where a
      // rounded avg can land on a round-half boundary.
      Tables.lineitem(s, d)
        .groupBy(col("l_partkey").cast("long").as("l_partkey"))
        .agg(round(sum(col("l_quantity")), 2).as("sum_qty"),
          count(lit(1)).as("n"))
        .filter(col("sum_qty") >= lit(25) * col("n") && col("n") >= 3)
  }

  /** O5 — ranking within groups (daxos boruta.py:122-125 per-iteration
    * rankdata). Window partitioned by nation — shuffles once on the
    * partition key, sorts within partitions; no global sort.
    */
  val o5 = QueryDef.sql(
    "o5_window_rank",
    """SELECT * FROM (
      |  SELECT CAST(c_nationkey AS BIGINT) AS nationkey, c_custkey,
      |         CAST(rank() OVER (PARTITION BY c_nationkey
      |                           ORDER BY c_acctbal DESC, c_custkey) AS BIGINT) AS rnk
      |  FROM customer) t
      |WHERE rnk <= 3""".stripMargin) {
    (s, d) =>
      val w = Window.partitionBy(col("c_nationkey"))
        .orderBy(col("c_acctbal").desc, col("c_custkey").asc)
      Tables.customer(s, d)
        .select(col("c_nationkey").cast("long").as("nationkey"), col("c_custkey"),
          rank().over(w).cast("long").as("rnk"))
        .filter(col("rnk") <= 3)
  }

  /** 2.10 — the scalar-function surface (abs/exp/sqrt/isclose analog) in
    * one deterministic row. */
  val scalars = QueryDef.sql(
    "scalar_functions",
    """SELECT round(sqrt(avg(l_quantity)), 6) AS sqrt_avg_qty,
      |       round(abs(min(l_discount) - 0.05), 6) AS abs_probe,
      |       round(exp(max(l_discount)), 6) AS exp_probe,
      |       CAST(max(CASE WHEN abs(l_tax - 0.04) < 1e-9 THEN 1 ELSE 0 END) AS BIGINT) AS isclose_hit
      |FROM lineitem""".stripMargin) {
    (s, d) =>
      Tables.lineitem(s, d).agg(
        round(sqrt(avg(col("l_quantity"))), 6).as("sqrt_avg_qty"),
        round(abs(min(col("l_discount")) - 0.05), 6).as("abs_probe"),
        round(exp(max(col("l_discount"))), 6).as("exp_probe"),
        max(when(abs(col("l_tax") - 0.04) < 1e-9, 1).otherwise(0)).cast("long").as("isclose_hit"))
  }

  /** O3 — top-n display (daxos explain.py:58-59 head of sorted
    * importances): TakeOrderedAndProject, full deterministic tiebreak.
    */
  val o3 = QueryDef.sql(
    "o3_top_n",
    """SELECT CAST(p_partkey AS BIGINT) AS p_partkey, p_brand,
      |       round(p_retailprice, 2) AS price
      |FROM part ORDER BY p_retailprice DESC, p_partkey LIMIT 5""".stripMargin) {
    (s, d) =>
      Tables.part(s, d)
        .select(col("p_partkey").cast("long").as("p_partkey"), col("p_brand"),
          round(col("p_retailprice"), 2).as("price"))
        .orderBy(col("price").desc, col("p_partkey").asc)
        .limit(5)
  }

  /** U3 — horizontal concat (daxos boruta.py:193 shadow hstack,
    * scoring.py:201-203 adjusted-column append): array concat is a
    * per-row codegen op, never a join — the right mapping of hstack
    * onto the row-bundle layout.
    */
  val u3 = QueryDef.sql(
    "u3_horizontal_concat",
    """WITH h AS (SELECT [l_quantity, l_discount] || [l_tax] AS v FROM lineitem)
      |SELECT count(*) AS n, CAST(min(len(v)) AS BIGINT) AS min_w,
      |       CAST(max(len(v)) AS BIGINT) AS max_w,
      |       round(sum(v[1] + v[2] + v[3]), 2) AS checksum
      |FROM h""".stripMargin) {
    (s, d) =>
      Tables.lineitem(s, d)
        .select(concat(array(col("l_quantity"), col("l_discount")),
          array(col("l_tax"))).as("v"))
        .agg(count(lit(1)).as("n"),
          min(size(col("v"))).cast("long").as("min_w"),
          max(size(col("v"))).cast("long").as("max_w"),
          round(sum(col("v").getItem(0) + col("v").getItem(1) +
            col("v").getItem(2)), 2).as("checksum"))
  }

  /** E1 — event-time hourly bucketing over the nanos-backed events
    * table: end-to-end proof of the ts nanos→micros integral-division
    * normalization (Tables.events). Buckets formatted as strings so the
    * cross-engine hash never touches raw timestamp encodings.
    */
  val e1 = QueryDef.sql(
    "e1_event_time_buckets",
    """SELECT event_type,
      |       strftime(date_trunc('hour', ts), '%Y-%m-%d %H:%M:%S') AS bucket,
      |       count(*) AS n,
      |       round(sum(CASE WHEN NOT isnan(value) THEN value END), 2) AS val_sum
      |FROM events GROUP BY 1, 2""".stripMargin) {
    (s, d) =>
      Tables.events(s, d)
        .groupBy(col("event_type"),
          date_format(date_trunc("hour", col("ts")), "yyyy-MM-dd HH:mm:ss")
            .as("bucket"))
        .agg(count(lit(1)).as("n"),
          round(sum(when(!isnan(col("value")), col("value"))), 2).as("val_sum"))
  }

  /** E2 — sessionization: split each user's event stream into sessions
    * at >30-minute gaps (lag → new-session flag → running sum as the
    * session index), then aggregate per-session and corpus-wide. The
    * windows partition by user_id — bounded per-user groups, the same
    * scale shape as o5's grouped rank; nothing global. All-integer
    * output (micros arithmetic) so the cross-engine hash is exact:
    * `unix_micros(timestamp_micros(ns div 1000))` here equals DuckDB's
    * `epoch_us` of the same parquet (both truncate nanos → micros).
    */
  val e2 = QueryDef.sql(
    "e2_sessionize",
    """WITH e AS (SELECT user_id, event_id, epoch_us(ts) AS us
      |           FROM events WHERE ts IS NOT NULL),
      |x AS (SELECT user_id, event_id, us,
      |             CASE WHEN lag(us) OVER w IS NULL
      |                    OR us - lag(us) OVER w > 1800000000 THEN 1
      |                  ELSE 0 END AS new_sess
      |      FROM e WINDOW w AS (PARTITION BY user_id ORDER BY us, event_id)),
      |y AS (SELECT user_id, us,
      |             SUM(new_sess) OVER (PARTITION BY user_id
      |                                 ORDER BY us, event_id) AS sess_idx
      |      FROM x),
      |s AS (SELECT user_id, sess_idx, count(*) AS n_events,
      |             max(us) - min(us) AS dur_us
      |      FROM y GROUP BY 1, 2)
      |SELECT count(*) AS n_sessions,
      |       CAST(sum(n_events) AS BIGINT) AS n_events,
      |       CAST(sum(dur_us) AS BIGINT) AS total_dur_us,
      |       CAST(max(n_events) AS BIGINT) AS max_sess_events
      |FROM s""".stripMargin) {
    (s, d) =>
      val w = Window.partitionBy("user_id").orderBy(col("us"), col("event_id"))
      val e = Tables.events(s, d).filter(col("ts").isNotNull)
        .select(col("user_id"), col("event_id"), unix_micros(col("ts")).as("us"))
      val flagged = e.withColumn("new_sess",
        when(lag(col("us"), 1).over(w).isNull ||
          col("us") - lag(col("us"), 1).over(w) > 1800000000L, 1L).otherwise(0L))
      val indexed = flagged.withColumn("sess_idx",
        sum(col("new_sess")).over(w))
      indexed.groupBy("user_id", "sess_idx")
        .agg(count(lit(1)).as("n_events"),
          (max(col("us")) - min(col("us"))).as("dur_us"))
        .agg(count(lit(1)).as("n_sessions"),
          sum(col("n_events")).cast("long").as("n_events"),
          sum(col("dur_us")).cast("long").as("total_dur_us"),
          max(col("n_events")).cast("long").as("max_sess_events"))
  }

  /** E5 — semi-structured JSON extraction: pull typed fields out of the
    * events `props` JSON column and aggregate — the "schema-on-read"
    * path every event pipeline needs. `get_json_object` is a codegen'd
    * expression evaluated in the scan (for a fixed wide schema,
    * `from_json` with an explicit StructType amortizes the parse across
    * fields); no shuffle until the group-by.
    */
  val e5 = QueryDef.sql(
    "e5_json_extract",
    """SELECT event_type, count(*) AS n,
      |       CAST(sum(CAST(props->>'k' AS INT)) AS BIGINT) AS k_sum,
      |       round(avg(CAST(props->>'k' AS INT)), 6) AS k_avg,
      |       CAST(max(CAST(props->>'k' AS INT)) AS BIGINT) AS k_max
      |FROM events WHERE props IS NOT NULL
      |GROUP BY event_type""".stripMargin) {
    (s, d) =>
      Tables.events(s, d).filter(col("props").isNotNull)
        .select(col("event_type"),
          get_json_object(col("props"), "$.k").cast("int").as("k"))
        .groupBy("event_type")
        .agg(count(lit(1)).as("n"),
          sum(col("k")).cast("long").as("k_sum"),
          round(avg(col("k")), 6).as("k_avg"),
          max(col("k")).cast("long").as("k_max"))
  }

  /** K1 — sketch accuracy gate: HyperLogLog++ distinct count and the
    * approximate-percentile sketch against their exact counterparts,
    * self-gated on relative error. At 100 TB the sketches ARE the
    * answer (exact distinct/percentile need a full shuffle or sort;
    * HLL and the quantile sketch are one-pass, map-side mergeable,
    * constant memory) — this query pins their error inside the bound
    * the pipeline relies on (the bounds are emission filters: a
    * failure drops the row and the driver flags it). The exact
    * percentile here uses the same distributed-sort operator a4 gates.
    */
  val k1 = QueryDef(
    "k1_sketch_accuracy",
    { (s, d) =>
    val li = Tables.lineitem(s, d)
    // The sketches run in ONE scan with no distinct aggregate alongside:
    // mixing countDistinct in forces an Expand (row duplication per agg
    // group) under every aggregate including the ObjectHashAggregate the
    // sketches run in, which measured ~7× slower than two clean passes.
    val sk = li.agg(
      approx_count_distinct(col("l_orderkey"), 0.02).as("hll_distinct"),
      percentile_approx(col("l_extendedprice"), lit(0.5), lit(1000))
        .as("approx_p50")).head()
    val ed = li.agg(countDistinct(col("l_orderkey"))).head().getLong(0)
    val exactP50 = exactQuantilesSorted(
      li.select(col("l_extendedprice").as("v")), "v", Seq(0.5)).head
    val (hd, ap) = (sk.getLong(0), sk.getDouble(1))
    val distinctErr = math.abs(hd - ed).toDouble / ed
    val p50Err = math.abs(ap - exactP50) / math.max(math.abs(exactP50), 1e-9)
    val spark = s; import spark.implicits._
    // FULL oracle on the EXACT side since round 11: the hashed columns
    // are the distinct count and the interpolated median, both DuckDB-
    // replayable. The sketch values (Spark's HLL++/GK internals) stay
    // OUT of the hash but GATE emission — a bound failure empties the
    // output and the driver flags the row-count mismatch loudly.
    Seq((ed, exactP50, round6(distinctErr), round6(p50Err)))
      .toDF("exact_distinct", "p50_raw", "derr", "perr")
      .filter(col("derr") < 0.05 && col("perr") < 0.01)
      // round via Catalyst so HALF_UP matches the oracle (a4's recipe)
      .select(col("exact_distinct"), round(col("p50_raw"), 2).as("exact_p50"))
  },
    oracle = Some(
      """SELECT CAST(count(DISTINCT l_orderkey) AS BIGINT) AS exact_distinct,
        |       round(quantile_cont(l_extendedprice, 0.5), 2) AS exact_p50
        |FROM lineitem""".stripMargin))

  private def round6(x: Double): Double = math.floor(x * 1e6 + 0.5) / 1e6

  /** P2 — column projection by NAME set through the cols side table
    * (daxos read.py:210-215, explain.py:21-31): names → positions
    * (tiny driver collect of the cols table), then one codegen'd array
    * slice; cols metadata re-derived to match.
    *
    * TWO guards in one query. (1) The Sim-bundle fixture check from
    * rounds 1-7 — projected dosage checksum equals the direct
    * per-position sum — now gates the output as a filter: if the bundle
    * projection path breaks, the output empties and the oracle compare
    * fails on row count. (2) The OUTPUT replays the same name→position
    * slice semantics on the driver's `embeddings` table (dim_<i> names,
    * a deterministic cols side table built from the embedding width),
    * which DuckDB reproduces with 1-based list indexing — upgrading P2
    * from a rows-only gate to a full hash match.
    */
  val p2 = QueryDef.sql(
    "p2_project_by_name",
    """SELECT vec_id,
      |       CAST(embedding[4] AS DOUBLE) AS v_a,
      |       CAST(embedding[8] AS DOUBLE) AS v_b
      |FROM embeddings""".stripMargin) { (s, d) =>
    // guard 1: the original bundle fixture checksum
    val cfg = graft.ml.Sim.Config(n = 400L, p = 12, seed = 99L, chunkRows = 100L)
    val bundle = graft.ml.Sim.bundle(s, cfg)
    val colsDf = graft.ml.Sim.cols(s, cfg)
    val keepNames = Seq("rs7412_T", "rs429358_C") // planted pair, by NAME
    val bpos = colsDf.filter(col("snp").isInCollection(keepNames))
      .orderBy("pos").collect().map(_.getInt(0))
    val projected = bundle.withColumn("features",
      array(bpos.map(i => col("features").getItem(i)): _*))
    val direct = bundle.agg(
      sum(col("features").getItem(bpos(0)) + col("features").getItem(bpos(1))))
      .head().getDouble(0)
    val viaProj = projected
      .agg(sum(col("features").getItem(0) + col("features").getItem(1)))
      .head().getDouble(0)
    val widthOk = projected.select(max(size(col("features")))).head().getInt(0) == 2
    val bundleOk = viaProj == direct && widthOk && bpos.length == 2
    // guard 2 / output: the same semantics on a driver table the oracle
    // can see. Cols side table is (pos i, name "dim_i") over the
    // embedding width; resolve the NAME set to positions with the same
    // tiny driver collect the bundle path uses, then one array slice.
    val emb = Tables.embeddings(s, d)
    val width = emb.select(max(size(col("embedding")))).head().getInt(0)
    val eCols = s.range(width.toLong)
      .select(col("id").cast("int").as("pos"),
        concat(lit("dim_"), col("id")).as("name"))
    val wantNames = Seq("dim_3", "dim_7")
    val epos = eCols.filter(col("name").isInCollection(wantNames))
      .orderBy("pos").collect().map(_.getInt(0))
    emb.select(col("vec_id"),
      col("embedding").getItem(epos(0)).cast("double").as("v_a"),
      col("embedding").getItem(epos(1)).cast("double").as("v_b"))
      .filter(lit(bundleOk))
  }

  /** Robust per-group outlier detection: median/MAD (median absolute
    * deviation), the heavy-tail-safe alternative to mean/stddev z-scores
    * — one extreme value moves a mean but not a median, so MAD flags
    * outliers without being dragged by them (the quality-filter shape a
    * curation pipeline wants for doc-length / score distributions).
    *
    * Two passes of the scale-safe [[groupedDiscreteMedian]] (value
    * median, then deviation median) — parallelism stays at shuffle
    * partitions for both, never one-task-per-group; the k-group median
    * frames broadcast back. Deviations and the k·MAD fence are exact
    * IEEE arithmetic on both engines, so the counts are oracle-exact.
    */
  def groupedMadOutliers(df: DataFrame, groupCol: String, valueCol: String,
      tiebreaks: Seq[String], k: Double): DataFrame = {
    val sp = df.sparkSession
    import sp.implicits._
    // Each median result is k-groups rows — collect it and re-enter the
    // plan as a LITERAL local frame. Left as a lineage-bearing
    // DataFrame, every downstream action (the second median's two
    // passes, the final aggregate) would re-run the full
    // sort-both-passes median job: measured 46 s → ~9 s at sf0.1.
    // Driver state is O(groups), the same bound the two-pass medians
    // already carry.
    // createDataFrame over the collected rows' own schema, not a
    // typed .toDF: the group key keeps its native type (string, int,
    // date…) so the re-entry join needs no casts and non-string keys
    // don't ClassCastException.
    def materialize(medDf: DataFrame, as: String): DataFrame = {
      val sel = medDf.select(col(groupCol), col("med").as(as))
      sp.createDataFrame(java.util.Arrays.asList(sel.collect(): _*), sel.schema)
    }
    val med = materialize(
      groupedDiscreteMedian(df, groupCol, valueCol, tiebreaks), "med")
    val dev = df.join(broadcast(med), groupCol)
      .withColumn("dev", abs(col(valueCol) - col("med")))
    val mad = materialize(groupedDiscreteMedian(
      dev.select((groupCol +: "dev" +: tiebreaks).map(col): _*),
      groupCol, "dev", tiebreaks), "mad")
    dev.join(broadcast(mad), groupCol)
      .groupBy(groupCol)
      .agg(min(col("med")).as("med"), min(col("mad")).as("mad"),
        count(lit(1)).as("n"),
        sum(when(col("dev") > col("mad") * k, 1L).otherwise(0L))
          .cast("long").as("n_outliers"))
  }

  /** A14 — the oracle recomputes both discrete medians with the a5
    * row_number construction and the same tiebreaks, so the hash match
    * pins median selection, the deviation join, AND the fence counts.
    */
  val a14 = QueryDef.sql(
    "a14_mad_outliers",
    """WITH r AS (SELECT l_returnflag AS g, l_extendedprice AS v,
      |                  l_orderkey, l_linenumber,
      |                  row_number() OVER (PARTITION BY l_returnflag
      |                    ORDER BY l_extendedprice, l_orderkey, l_linenumber) AS rn,
      |                  count(*) OVER (PARTITION BY l_returnflag) AS cnt
      |           FROM lineitem),
      |m AS (SELECT g, v AS med FROM r WHERE rn = floor((cnt + 1) / 2.0)),
      |d AS (SELECT r.g, abs(r.v - m.med) AS dev, r.l_orderkey,
      |             r.l_linenumber, m.med
      |      FROM r JOIN m USING (g)),
      |r2 AS (SELECT g, med, dev,
      |              row_number() OVER (PARTITION BY g
      |                ORDER BY dev, l_orderkey, l_linenumber) AS rn,
      |              count(*) OVER (PARTITION BY g) AS cnt
      |       FROM d),
      |mad AS (SELECT g, dev AS mad FROM r2 WHERE rn = floor((cnt + 1) / 2.0))
      |SELECT d.g AS l_returnflag, any_value(d.med) AS med,
      |       any_value(mad.mad) AS mad, count(*) AS n,
      |       CAST(sum(CASE WHEN d.dev > 1.5 * mad.mad THEN 1 ELSE 0 END)
      |            AS BIGINT) AS n_outliers
      |FROM d JOIN mad USING (g) GROUP BY d.g""".stripMargin) {
    (s, d) =>
      groupedMadOutliers(
        Tables.lineitem(s, d).select(col("l_returnflag"),
          col("l_extendedprice"), col("l_orderkey"), col("l_linenumber")),
        "l_returnflag", "l_extendedprice",
        Seq("l_orderkey", "l_linenumber"), k = 1.5)
  }

  /** A15 — pivot/unpivot round-trip. Pivot with an EXPLICIT value list
    * (`pivot(col, values)`): at 100 TB letting Spark discover pivot
    * values costs a full distinct scan before planning AND risks
    * blowing the column limit on a high-cardinality key; pinning the
    * values keeps it one pass (a single partial→final aggregate with
    * `count(CASE WHEN …)` legs — exactly the oracle's conditional-agg
    * plan, no extra shuffle vs a plain groupBy). The unpivot (`stack`)
    * restores long form scan-locally; the query returns the round-trip
    * so the oracle checks pivot AND unpivot in one comparison.
    */
  val a15 = QueryDef.sql(
    "a15_pivot_unpivot",
    """WITH piv AS (
      |  SELECT lang,
      |         count(CASE WHEN source = 'src0' THEN 1 END) AS src0,
      |         count(CASE WHEN source = 'src1' THEN 1 END) AS src1,
      |         count(CASE WHEN source = 'src2' THEN 1 END) AS src2,
      |         count(CASE WHEN source = 'src3' THEN 1 END) AS src3
      |  FROM documents WHERE lang IS NOT NULL GROUP BY lang)
      |SELECT lang, src AS source, n_docs FROM (
      |  SELECT lang, 'src0' AS src, src0 AS n_docs FROM piv
      |  UNION ALL SELECT lang, 'src1', src1 FROM piv
      |  UNION ALL SELECT lang, 'src2', src2 FROM piv
      |  UNION ALL SELECT lang, 'src3', src3 FROM piv) u
      |WHERE n_docs > 0""".stripMargin) { (s, d) =>
    val srcs = Seq("src0", "src1", "src2", "src3")
    val piv = Tables.documents(s, d).filter(col("lang").isNotNull)
      .groupBy("lang").pivot("source", srcs).agg(count(lit(1)))
    piv.select(col("lang"), expr(
        s"stack(${srcs.size}, " +
          srcs.map(v => s"'$v', `$v`").mkString(", ") + ") as (source, n_docs)"))
      .filter(col("n_docs") > 0)
  }

  /** A16 — ROLLUP hierarchy aggregate: detail + per-flag subtotal +
    * grand total in ONE pass. Spark expands rollup grouping sets
    * inside a single partial→final aggregate (an Expand node feeding
    * one exchange) — at 100 TB that is one shuffle instead of the
    * three a UNION-of-aggregates would pay, and the Expand multiplies
    * rows AFTER map-side partial aggregation has collapsed them.
    * grouping_id disambiguates subtotal rows from genuine nulls;
    * null grouping keys are coalesced to 'ALL' on both sides so the
    * driver's column-sorted hash sees identical values.
    */
  val a16 = QueryDef.sql(
    "a16_rollup",
    """SELECT coalesce(l_returnflag, 'ALL') AS flag,
      |       coalesce(l_linestatus, 'ALL') AS status,
      |       GROUPING(l_returnflag, l_linestatus) AS gid,
      |       count(*) AS n,
      |       round(sum(l_quantity), 2) AS sum_qty
      |FROM lineitem
      |GROUP BY ROLLUP(l_returnflag, l_linestatus)""".stripMargin) { (s, d) =>
    Tables.lineitem(s, d)
      .rollup("l_returnflag", "l_linestatus")
      .agg(grouping_id().as("gid"), count(lit(1)).as("n"),
        round(sum(col("l_quantity")), 2).as("sum_qty"))
      .select(coalesce(col("l_returnflag"), lit("ALL")).as("flag"),
        coalesce(col("l_linestatus"), lit("ALL")).as("status"),
        col("gid").cast("long").as("gid"), col("n"), col("sum_qty"))
  }

  /** J9 — TPC-H-Q3-shaped star join: selective dim (one mktsegment of
    * customer) BROADCAST into orders, the result broadcast again into
    * the lineitem scan — the fact table never shuffles. At 100 TB the
    * fact side dominates; the explicit broadcast() hints pin the plan
    * even when dim statistics are missing (fresh tables, no ANALYZE).
    * The only exchange left is the final few-group aggregate's —
    * after map-side partial aggregation has collapsed the fact rows
    * to (groups × tasks) partials.
    */
  val j9 = QueryDef.sql(
    "j9_star_join",
    """SELECT o_orderpriority,
      |       count(*) AS n,
      |       round(sum(l_extendedprice * (1 - l_discount)), 2) AS revenue
      |FROM customer
      |JOIN orders ON c_custkey = o_custkey
      |JOIN lineitem ON l_orderkey = o_orderkey
      |WHERE c_mktsegment = 'BUILDING'
      |GROUP BY o_orderpriority""".stripMargin) { (s, d) =>
    val cust = Tables.load(s, d, "customer")
      .filter(col("c_mktsegment") === "BUILDING")
      .select("c_custkey")
    val ord = Tables.load(s, d, "orders")
      .select("o_orderkey", "o_custkey", "o_orderpriority")
    val li = Tables.lineitem(s, d)
      .select("l_orderkey", "l_extendedprice", "l_discount")
    val dim = broadcast(ord.join(broadcast(cust),
      col("o_custkey") === col("c_custkey")))
    li.join(dim, col("l_orderkey") === col("o_orderkey"))
      .groupBy("o_orderpriority")
      .agg(count(lit(1)).as("n"),
        round(sum(col("l_extendedprice") * (lit(1) - col("l_discount"))), 2)
          .as("revenue"))
  }

  /** E6 — rolling time-range window: per-user trailing-1-hour event
    * count and value sum (`RANGE BETWEEN 1h PRECEDING AND CURRENT
    * ROW` over event time). The window partitions by user_id — state
    * is one user's in-range frame, parallelism is the user count, no
    * global ordering anywhere; this is the bounded-memory shape that
    * survives 100 TB of events (a global ORDER BY ts window would
    * single-task). All-integer rolling stats (floor(value) with an
    * explicit NaN guard) so the per-row values hash identically
    * cross-engine; the query then rolls 60k per-event results into
    * one checksum row so the comparison is O(1) regardless of sf.
    */
  val e6 = QueryDef.sql(
    "e6_rolling_window",
    """WITH e AS (
      |  SELECT user_id, epoch_us(ts) AS t,
      |         CASE WHEN NOT isnan(value) THEN CAST(floor(value) AS BIGINT)
      |              ELSE 0 END AS v
      |  FROM events WHERE ts IS NOT NULL),
      |r AS (
      |  SELECT user_id,
      |         count(*) OVER w AS roll_n,
      |         sum(v) OVER w AS roll_v
      |  FROM e
      |  WINDOW w AS (PARTITION BY user_id ORDER BY t
      |               RANGE BETWEEN 3600000000 PRECEDING AND CURRENT ROW))
      |SELECT count(*) AS n_events,
      |       CAST(sum(roll_n) AS BIGINT) AS sum_roll_n,
      |       CAST(max(roll_n) AS BIGINT) AS max_roll_n,
      |       CAST(sum(roll_v) AS BIGINT) AS sum_roll_v
      |FROM r""".stripMargin) { (s, d) =>
    val e = Tables.events(s, d).filter(col("ts").isNotNull)
      .select(col("user_id"), unix_micros(col("ts")).as("t"),
        when(!isnan(col("value")), floor(col("value")).cast("long"))
          .otherwise(0L).as("v"))
    val w = Window.partitionBy(col("user_id")).orderBy(col("t"))
      .rangeBetween(-3600000000L, Window.currentRow)
    e.select(count(lit(1)).over(w).as("roll_n"), sum(col("v")).over(w).as("roll_v"))
      .agg(count(lit(1)).as("n_events"),
        sum(col("roll_n")).cast("long").as("sum_roll_n"),
        max(col("roll_n")).cast("long").as("max_roll_n"),
        sum(col("roll_v")).cast("long").as("sum_roll_v"))
  }

  /** J10 — null-safe equality join (`<=>` / IS NOT DISTINCT FROM):
    * null keys MATCH each other instead of silently dropping, the
    * semantics every "join on a derived, possibly-null key" pipeline
    * step needs (a plain equi-join makes null-keyed rows vanish — a
    * data-loss bug that only shows at scale when someone audits
    * counts). Derived key: event_type with 'click' nulled out, so the
    * null group genuinely exists in both inputs. `<=>` keys still
    * hash-partition normally (nulls co-locate in one partition — a
    * null-heavy corpus would salt them like any hot key).
    */
  val j10 = QueryDef.sql(
    "j10_null_safe_join",
    """WITH a AS (SELECT nullif(event_type, 'click') AS k, count(*) AS n_a
      |           FROM events GROUP BY 1),
      |b AS (SELECT nullif(event_type, 'click') AS k,
      |             CAST(sum(user_id % 97) AS BIGINT) AS chk_b
      |      FROM events GROUP BY 1)
      |SELECT coalesce(a.k, '<null>') AS k, n_a, chk_b
      |FROM a JOIN b ON a.k IS NOT DISTINCT FROM b.k""".stripMargin) { (s, d) =>
    val ev = Tables.events(s, d)
      .select(nullif(col("event_type"), lit("click")).as("k"),
        col("user_id"))
    val a = ev.groupBy("k").agg(count(lit(1)).as("n_a"))
    val b = ev.groupBy("k")
      .agg(sum(col("user_id") % 97).cast("long").as("chk_b"))
      .withColumnRenamed("k", "kb")
    a.join(b, col("k") <=> col("kb"))
      .select(coalesce(col("k"), lit("<null>")).as("k"),
        col("n_a"), col("chk_b"))
  }

  /** E7 — ordered funnel analysis (signup → click → purchase): how many
    * users completed each stage IN ORDER, and total conversion time.
    * Stage k matches the FIRST stage-k event strictly after the
    * matched stage-(k-1) event (min qualifying timestamp).
    *
    * Spark shape: ONE shuffle (groupBy user), then a scan-local
    * `sort_array` + `aggregate` fold over each user's timeline — per-
    * user state is one (stage, t1, tlast) struct, parallelism is the
    * user count. The window-free shape funnels need at 100 TB of
    * events: no per-stage self-joins (the staged-CTE oracle below
    * re-scans events once per stage — fine for DuckDB at sf, quadratic
    * pain at scale), no global ordering anywhere. Per-user timelines
    * are the bounded object (activity per user, not corpus size).
    */
  val e7 = QueryDef.sql(
    "e7_funnel",
    """WITH e AS (SELECT user_id, event_type, epoch_us(ts) AS us
      |           FROM events
      |           WHERE ts IS NOT NULL
      |             AND event_type IN ('signup', 'click', 'purchase')),
      |s1 AS (SELECT user_id, min(us) AS t1 FROM e
      |       WHERE event_type = 'signup' GROUP BY 1),
      |s2 AS (SELECT e.user_id, min(us) AS t2 FROM e JOIN s1 USING (user_id)
      |       WHERE event_type = 'click' AND us > t1 GROUP BY 1),
      |s3 AS (SELECT e.user_id, min(us) AS t3 FROM e JOIN s2 USING (user_id)
      |       WHERE event_type = 'purchase' AND us > t2 GROUP BY 1)
      |SELECT (SELECT count(*) FROM s1) AS n_signup,
      |       (SELECT count(*) FROM s2) AS n_click_after,
      |       (SELECT count(*) FROM s3) AS n_purchase_after,
      |       (SELECT CAST(coalesce(sum(t3 - t1), 0) AS BIGINT)
      |        FROM s3 JOIN s1 USING (user_id)) AS conv_us_sum""".stripMargin) {
    (s, d) =>
      val e = Tables.events(s, d)
        .filter(col("ts").isNotNull &&
          col("event_type").isin("signup", "click", "purchase"))
        .select(col("user_id"), unix_micros(col("ts")).as("us"),
          col("event_type"))
      e.groupBy("user_id")
        .agg(sort_array(collect_list(struct(col("us"), col("event_type"))))
          .as("evs"))
        .select(expr(
          """aggregate(evs,
            |  named_struct('stage', 0, 't1', CAST(0 AS BIGINT),
            |               'tl', CAST(0 AS BIGINT)),
            |  (acc, e) -> CASE
            |    WHEN acc.stage = 0 AND e.event_type = 'signup'
            |      THEN named_struct('stage', 1, 't1', e.us, 'tl', e.us)
            |    WHEN acc.stage = 1 AND e.event_type = 'click' AND e.us > acc.tl
            |      THEN named_struct('stage', 2, 't1', acc.t1, 'tl', e.us)
            |    WHEN acc.stage = 2 AND e.event_type = 'purchase' AND e.us > acc.tl
            |      THEN named_struct('stage', 3, 't1', acc.t1, 'tl', e.us)
            |    ELSE acc END)""".stripMargin).as("f"))
        .agg(
          sum(when(col("f.stage") >= 1, 1L).otherwise(0L)).as("n_signup"),
          sum(when(col("f.stage") >= 2, 1L).otherwise(0L)).as("n_click_after"),
          sum(when(col("f.stage") >= 3, 1L).otherwise(0L)).as("n_purchase_after"),
          sum(when(col("f.stage") === 3, col("f.tl") - col("f.t1"))
            .otherwise(0L)).cast("long").as("conv_us_sum"))
  }

  /** E8 — retention cohorts: the "week-N retention" matrix every event
    * pipeline reports. Cohort = each user's first active week; a cell
    * (cohort_wk, week_offset) counts the users of that cohort active
    * `offset` weeks later. Weeks are integer micros-epoch division
    * (us div week_us) so the bucketing is identical integer arithmetic
    * in both engines — no calendar/locale week-truncation semantics to
    * disagree on (the `us >= 0` guard pins floor==truncate parity).
    *
    * Spark shape: distinct (user, wk) activity + a per-user min — both
    * map-side-combinable hash aggregates keyed by user — then a join
    * on user_id (AQE broadcasts the per-user cohort side when it is
    * small; co-partitioned shuffle otherwise) and a final (cohort,
    * offset) aggregate. No windows, no per-user serialization: at
    * 100 TB each stage is a linear key-partitioned aggregate.
    */
  val e8 = QueryDef.sql(
    "e8_retention_cohorts",
    """WITH e AS (SELECT user_id, epoch_us(ts) // 604800000000 AS wk
      |           FROM events WHERE ts IS NOT NULL AND epoch_us(ts) >= 0),
      |c AS (SELECT user_id, min(wk) AS cohort_wk FROM e GROUP BY 1),
      |a AS (SELECT DISTINCT user_id, wk FROM e)
      |SELECT cohort_wk, a.wk - cohort_wk AS week_offset,
      |       count(*) AS n_users
      |FROM a JOIN c USING (user_id) GROUP BY 1, 2""".stripMargin) {
    (s, d) =>
      val e = Tables.events(s, d).filter(col("ts").isNotNull)
        .select(col("user_id"), unix_micros(col("ts")).as("us"))
        .filter(col("us") >= 0)
        .select(col("user_id"), expr("us div 604800000000").as("wk"))
      val cohorts = e.groupBy("user_id").agg(min(col("wk")).as("cohort_wk"))
      val active = e.distinct()
      active.join(cohorts, Seq("user_id"))
        .groupBy(col("cohort_wk"),
          (col("wk") - col("cohort_wk")).as("week_offset"))
        .agg(count(lit(1)).as("n_users"))
  }

  /** E9 — event-type transition matrix (first-order Markov counts):
    * for each user's time-ordered stream, count (event_type → next
    * event_type) pairs and total gap time. The per-user `lead` window
    * is the e2 scale shape — partitioned by user_id, bounded by
    * per-user activity, nothing global; the transition aggregate is a
    * 25-cell hash aggregate. (us, event_id) is a unique total order,
    * so lead() is deterministic in both engines.
    */
  val e9 = QueryDef.sql(
    "e9_event_transitions",
    """WITH e AS (SELECT user_id, event_id, event_type, epoch_us(ts) AS us
      |           FROM events WHERE ts IS NOT NULL),
      |x AS (SELECT event_type AS from_type, lead(event_type) OVER w AS to_type,
      |             lead(us) OVER w - us AS gap_us
      |      FROM e WINDOW w AS (PARTITION BY user_id ORDER BY us, event_id))
      |SELECT from_type, to_type, count(*) AS n,
      |       CAST(sum(gap_us) AS BIGINT) AS gap_us_sum
      |FROM x WHERE to_type IS NOT NULL GROUP BY 1, 2""".stripMargin) {
    (s, d) =>
      val w = Window.partitionBy("user_id").orderBy(col("us"), col("event_id"))
      Tables.events(s, d).filter(col("ts").isNotNull)
        .select(col("user_id"), col("event_id"), col("event_type"),
          unix_micros(col("ts")).as("us"))
        .select(col("event_type").as("from_type"),
          lead(col("event_type"), 1).over(w).as("to_type"),
          (lead(col("us"), 1).over(w) - col("us")).as("gap_us"))
        .filter(col("to_type").isNotNull)
        .groupBy("from_type", "to_type")
        .agg(count(lit(1)).as("n"),
          sum(col("gap_us")).cast("long").as("gap_us_sum"))
  }

  /** E10 — rolling 7-day active users (DAU/WAU): the windowed DISTINCT
    * aggregate naive SQL writes as `count(DISTINCT) OVER (RANGE 6
    * PRECEDING)` — which no engine executes scalably (distinct is not
    * subtractable, so the frame re-scans per row). The scale rewrite:
    * dedup to (user, day) once, then EXPLODE each activity day onto
    * the ≤7 window days it serves (`sequence(day, day+6)`) and count
    * distinct per day — a fixed ×7 fan-out plus two hash aggregates
    * (countDistinct plans as partial-on-(day,user) → final-on-day),
    * no window, no per-day rescan. Days beyond the observed range are
    * pruned by the inner join with the DAU side. Integer epoch-day
    * bucketing (us div day_us, us >= 0) — same floor arithmetic both
    * engines.
    *
    * GAP-DAY SEMANTICS (deliberate): the final inner join emits only
    * days with activity (DAU > 0). A calendar day with zero events but
    * a nonzero trailing-7-day WAU (its window reaches back to active
    * days) is NOT emitted. That matches the "active users" dashboard
    * convention (rows keyed by observed activity days) and the oracle's
    * identical inner join; switch to `dau.join(wau, Seq("day"), "right")`
    * + `coalesce(dau, 0)` if gap-day WAU rows are ever wanted — the
    * oracle would change in lockstep.
    */
  val e10 = QueryDef.sql(
    "e10_rolling_active_users",
    """WITH e AS (SELECT DISTINCT user_id, epoch_us(ts) // 86400000000 AS day
      |           FROM events WHERE ts IS NOT NULL AND epoch_us(ts) >= 0),
      |dau AS (SELECT day, count(*) AS dau FROM e GROUP BY 1),
      |w AS (SELECT e.day + o AS day, user_id
      |      FROM e CROSS JOIN unnest(range(0, 7)) t(o)),
      |wau AS (SELECT day, count(DISTINCT user_id) AS wau FROM w GROUP BY 1)
      |SELECT day, dau, wau FROM dau JOIN wau USING (day)""".stripMargin) {
    (s, d) =>
      val e = Tables.events(s, d).filter(col("ts").isNotNull)
        .select(col("user_id"), unix_micros(col("ts")).as("us"))
        .filter(col("us") >= 0)
        .select(col("user_id"), expr("us div 86400000000").as("day"))
        .distinct()
      val dau = e.groupBy("day").agg(count(lit(1)).as("dau"))
      val wau = e.select(col("user_id"),
          explode(sequence(col("day"), col("day") + 6)).as("day"))
        .groupBy("day").agg(countDistinct(col("user_id")).as("wau"))
      dau.join(wau, Seq("day"))
        .select(col("day"), col("dau"), col("wau"))
  }

  /** A19 — equi-width histogram: the profiling aggregate behind every
    * "distribution of X" dashboard. Buckets are scan-local integer
    * arithmetic over fixed bounds (floor((v - lo) / w), clamped) — one
    * map-side-combinable hash aggregate, bucket-count output rows, no
    * pre-scan for bounds (fixed bounds are the production shape: at
    * 100 TB you profile against known envelopes, not a min/max pass;
    * s14's clustering and a4's exact percentiles cover the adaptive
    * cases). Bucket arithmetic is identical IEEE ops in both engines,
    * so the per-bucket count AND sum hash-match exactly.
    */
  val a19 = QueryDef.sql(
    "a19_histogram",
    """SELECT CAST(least(greatest(floor((l_extendedprice - 900.0) / 5000.0),
      |                           0), 20) AS BIGINT) AS bucket,
      |       count(*) AS n,
      |       round(sum(l_extendedprice), 2) AS price_sum
      |FROM lineitem GROUP BY 1""".stripMargin) { (s, d) =>
    Tables.lineitem(s, d)
      .select(least(greatest(floor((col("l_extendedprice") - 900.0d) / 5000.0d),
        lit(0)), lit(20)).cast("long").as("bucket"),
        col("l_extendedprice"))
      .groupBy("bucket")
      .agg(count(lit(1)).as("n"),
        round(sum(col("l_extendedprice")), 2).as("price_sum"))
  }

  /** E11 — trailing-window anomaly flags: per event type, z-score each
    * day's event count against the PRECEDING 7 days (monitoring's
    * "is today's volume off-trend?" detector). The heavy work is the
    * (type, day) count — one map-side-combinable hash aggregate over
    * the raw events. The window then runs on the AGGREGATED frame
    * (|types| × |days| rows — thousands, not billions), partitioned by
    * event_type, so no single-task global window at any scale.
    *
    * Cross-engine determinism: the windowed sums stay INTEGRAL
    * (sum(n), sum(n²) over bigint counts — exact under any
    * accumulation order, immune to Spark's add/remove sliding-frame
    * evaluation vs DuckDB's segment-tree order). Mean/variance/z are
    * then derived with the same explicit double expressions in both
    * engines (sample variance, rounded at 6), so the hash is exact.
    */
  val e11 = QueryDef.sql(
    "e11_daily_anomaly",
    """WITH e AS (SELECT event_type, epoch_us(ts) // 86400000000 AS day
      |           FROM events WHERE ts IS NOT NULL AND epoch_us(ts) >= 0),
      |d AS (SELECT event_type, day, count(*) AS n FROM e GROUP BY 1, 2),
      |w AS (SELECT event_type, day, n,
      |             count(n) OVER tw AS cnt,
      |             CAST(sum(n) OVER tw AS BIGINT) AS s,
      |             CAST(sum(n * n) OVER tw AS BIGINT) AS ss
      |      FROM d WINDOW tw AS (PARTITION BY event_type ORDER BY day
      |                           ROWS BETWEEN 7 PRECEDING AND 1 PRECEDING)),
      |z AS (SELECT event_type, day, n, cnt,
      |             CAST(s AS DOUBLE) AS sd, CAST(ss AS DOUBLE) AS ssd,
      |             CAST(cnt AS DOUBLE) AS cd
      |      FROM w)
      |SELECT event_type, day, CAST(n AS BIGINT) AS n,
      |       CASE WHEN cnt >= 2 AND (ssd - sd * sd / cd) > 0.0 THEN
      |         round((CAST(n AS DOUBLE) - sd / cd)
      |               / sqrt((ssd - sd * sd / cd) / (cd - 1.0)), 6)
      |       END AS z,
      |       CASE WHEN cnt >= 2 AND (ssd - sd * sd / cd) > 0.0 THEN
      |         (CAST(n AS DOUBLE) - sd / cd)
      |           / sqrt((ssd - sd * sd / cd) / (cd - 1.0)) > 3.0
      |       ELSE FALSE END AS is_anomaly
      |FROM z""".stripMargin) { (s, d) =>
    val daily = Tables.events(s, d).filter(col("ts").isNotNull)
      .select(col("event_type"), unix_micros(col("ts")).as("us"))
      .filter(col("us") >= 0)
      .select(col("event_type"), expr("us div 86400000000").as("day"))
      .groupBy("event_type", "day").agg(count(lit(1)).as("n"))
    dailyAnomaly(daily)
  }

  /** The e11 z-scan over an already-aggregated (event_type, day, n)
    * frame — shared with the streaming twin (st12), which maintains
    * the daily counts incrementally and runs this same scan on the
    * |types|×|days|-sized aggregate. Windowed sums stay INTEGRAL
    * (exact under both engines' sliding frames); z derives from them
    * with fixed double expressions.
    */
  def dailyAnomaly(daily: DataFrame): DataFrame = {
    val tw = Window.partitionBy("event_type").orderBy("day")
      .rowsBetween(-7, -1)
    val w = daily.select(col("event_type"), col("day"), col("n"),
      count(col("n")).over(tw).as("cnt"),
      sum(col("n")).over(tw).cast("long").as("s"),
      sum(col("n") * col("n")).over(tw).cast("long").as("ss"))
    val sd = col("s").cast("double"); val ssd = col("ss").cast("double")
    val cd = col("cnt").cast("double")
    val varS = (ssd - sd * sd / cd) / (cd - 1.0d)
    val zExpr = (col("n").cast("double") - sd / cd) / sqrt(varS)
    val valid = col("cnt") >= 2 && (ssd - sd * sd / cd) > 0.0d
    w.select(col("event_type"), col("day"), col("n").cast("long").as("n"),
      when(valid, round(zExpr, 6)).as("z"),
      when(valid, zExpr > 3.0d).otherwise(lit(false)).as("is_anomaly"))
  }

  /** A20 — grouped winsorized mean (robust-stats companion to a14's
    * MAD): clamp each value into its group's discrete [p10, p90] then
    * average. Everything stays INTEGRAL until the final division:
    * prices become exact cents, quantile ranks are ceil via integer
    * arithmetic ((n+9) div 10 — never a float ceil boundary), and the
    * winsorized sum is a long. Quantiles come from a (group, value)
    * cumulative HISTOGRAM, not a raw-row window: the per-group window
    * runs over distinct cents values (bounded by the value DOMAIN, not
    * row count — the right trade for currency-like columns at 100 TB;
    * unbounded domains use a4's distributed sort or k1's sketch
    * instead). FULL DuckDB oracle replaying the identical definition.
    */
  val a20 = QueryDef.sql(
    "a20_winsorized_mean",
    """WITH h AS (SELECT l_returnflag AS f,
      |             CAST(round(l_extendedprice * 100, 0) AS BIGINT) AS v,
      |             count(*) AS c
      |           FROM lineitem GROUP BY 1, 2),
      |t AS (SELECT f, CAST(sum(c) AS BIGINT) AS n FROM h GROUP BY 1),
      |cum AS (SELECT f, v, c,
      |               CAST(sum(c) OVER (PARTITION BY f ORDER BY v) AS BIGINT) AS cc
      |        FROM h),
      |q AS (SELECT cum.f,
      |             min(CASE WHEN cc >= (n + 9) // 10 THEN v END) AS lo,
      |             min(CASE WHEN cc >= (9 * n + 9) // 10 THEN v END) AS hi
      |      FROM cum JOIN t ON cum.f = t.f GROUP BY cum.f)
      |SELECT h.f AS l_returnflag, t.n,
      |       q.lo AS p10_cents, q.hi AS p90_cents,
      |       round(CAST(sum(least(greatest(v, lo), hi) * c) AS DOUBLE)
      |             / (100.0 * t.n), 6) AS winsorized_mean
      |FROM h JOIN q ON h.f = q.f JOIN t ON h.f = t.f
      |GROUP BY h.f, t.n, q.lo, q.hi""".stripMargin) { (s, d) =>
    val h = Tables.lineitem(s, d)
      .select(col("l_returnflag").as("f"),
        round(col("l_extendedprice") * 100, 0).cast("long").as("v"))
      .groupBy("f", "v").agg(count(lit(1)).as("c"))
    val t = h.groupBy("f").agg(sum(col("c")).as("n"))
    val cw = Window.partitionBy("f").orderBy("v")
    val cum = h.withColumn("cc", sum(col("c")).over(cw))
    val q = cum.join(t, "f")
      .groupBy("f")
      .agg(min(when(col("cc") >= expr("(n + 9) div 10"), col("v")))
        .as("lo"),
        min(when(col("cc") >= expr("(9 * n + 9) div 10"), col("v")))
          .as("hi"))
    h.join(q, "f").join(t, "f")
      .groupBy(col("f").as("l_returnflag"), col("n"), col("lo").as("p10_cents"),
        col("hi").as("p90_cents"))
      .agg(round(
        sum(least(greatest(col("v"), col("lo")), col("hi")) * col("c"))
          .cast("double") / (lit(100.0) * col("n")), 6)
        .as("winsorized_mean"))
      .select("l_returnflag", "n", "p10_cents", "p90_cents", "winsorized_mean")
  }

  /** U8 — MULTISET set operations (EXCEPT ALL / INTERSECT ALL): the
    * bag semantics u4/u7's distinct variants erase — per-occurrence
    * accounting matters when rows are events, not keys (how many
    * shipments survive after cancelling per-occurrence against
    * returns, not whether a key exists). Spark plans both as a
    * count-diff hash aggregate (Generate + HashAggregate, no join):
    * map-side combinable, one shuffle on the value. The output
    * re-aggregates to (key, multiplicity) so the gate pins exact
    * per-key multiplicities cross-engine.
    */
  val u8 = QueryDef.sql(
    "u8_multiset_ops",
    """WITH ea AS (SELECT l_partkey FROM lineitem WHERE l_quantity > 25
      |            EXCEPT ALL
      |            SELECT l_partkey FROM lineitem WHERE l_discount > 0.05),
      |ia AS (SELECT l_partkey FROM lineitem WHERE l_quantity > 25
      |       INTERSECT ALL
      |       SELECT l_partkey FROM lineitem WHERE l_discount > 0.05)
      |SELECT 'except_all' AS op, l_partkey, count(*) AS multiplicity
      |FROM ea GROUP BY 2
      |UNION ALL
      |SELECT 'intersect_all', l_partkey, count(*) FROM ia GROUP BY 2""".stripMargin) {
    (s, d) =>
      val li = Tables.lineitem(s, d)
      val a = li.filter(col("l_quantity") > 25).select("l_partkey")
      val b = li.filter(col("l_discount") > 0.05).select("l_partkey")
      val ea = a.exceptAll(b).groupBy("l_partkey")
        .agg(count(lit(1)).as("multiplicity"))
        .select(lit("except_all").as("op"), col("l_partkey"),
          col("multiplicity"))
      val ia = a.intersectAll(b).groupBy("l_partkey")
        .agg(count(lit(1)).as("multiplicity"))
        .select(lit("intersect_all").as("op"), col("l_partkey"),
          col("multiplicity"))
      ea.unionByName(ia)
  }

  /** E12 — top session paths (the product-analytics "common journeys"
    * query): e2's 30-minute sessionization, each session's ordered
    * event-type sequence joined into a path string, path frequencies
    * hash-counted, top 10 under the total order (n desc, path asc).
    * Scale shape: per-session assembly is a bounded collect (session
    * length, not history) sorted in-row by (us, event_id) — no second
    * window pass; path counting is a map-side-combinable hash agg on
    * the path string; top-10 plans as TakeOrderedAndProject (per-
    * partition heaps, no global sort). FULL DuckDB oracle via
    * string_agg with the identical ordering and tie-break.
    */
  val e12 = QueryDef.sql(
    "e12_session_top_paths",
    """WITH e AS (SELECT user_id, event_id, event_type, epoch_us(ts) AS us
      |           FROM events WHERE ts IS NOT NULL),
      |x AS (SELECT user_id, event_id, event_type, us,
      |             CASE WHEN lag(us) OVER w IS NULL
      |                    OR us - lag(us) OVER w > 1800000000 THEN 1
      |                  ELSE 0 END AS new_sess
      |      FROM e WINDOW w AS (PARTITION BY user_id ORDER BY us, event_id)),
      |y AS (SELECT user_id, event_id, event_type, us,
      |             SUM(new_sess) OVER (PARTITION BY user_id
      |                                 ORDER BY us, event_id) AS sess_idx
      |      FROM x),
      |p AS (SELECT user_id, sess_idx,
      |             string_agg(event_type, '>' ORDER BY us, event_id) AS path
      |      FROM y GROUP BY 1, 2)
      |SELECT path, count(*) AS n FROM p GROUP BY 1
      |ORDER BY n DESC, path LIMIT 10""".stripMargin) {
    (s, d) =>
      val w = Window.partitionBy("user_id").orderBy(col("us"), col("event_id"))
      val e = Tables.events(s, d).filter(col("ts").isNotNull)
        .select(col("user_id"), col("event_id"), col("event_type"),
          unix_micros(col("ts")).as("us"))
      val indexed = e
        .withColumn("new_sess",
          when(lag(col("us"), 1).over(w).isNull ||
            col("us") - lag(col("us"), 1).over(w) > 1800000000L, 1L)
            .otherwise(0L))
        .withColumn("sess_idx", sum(col("new_sess")).over(w))
      val paths = indexed.groupBy("user_id", "sess_idx")
        .agg(array_join(
          transform(
            array_sort(collect_list(
              struct(col("us"), col("event_id"), col("event_type")))),
            x => x.getField("event_type")), ">").as("path"))
      paths.groupBy("path").agg(count(lit(1)).as("n"))
        .orderBy(col("n").desc, col("path").asc).limit(10)
  }

  /** E13 — gap-windowed funnel (each stage within 24 h of the previous
    * one — the Amplitude-style conversion window e7's unconstrained
    * funnel can't express). Semantics are EXISTENCE: a user converts
    * stage k if SOME in-order chain with every gap ≤ W exists. The
    * scan-local fold tracks, per stage, the LATEST valid completion
    * time — the correct DP for gap-constrained existence (the earliest-
    * completion greedy is WRONG here: signup@0, signup@100, click@150,
    * W=60 converts via the second signup, which a min-tracking fold
    * misses). One groupBy(user) + bounded in-row fold, zero self-joins;
    * the DuckDB oracle replays existence via staged joins — provably
    * the same predicate, quadratic-per-user but fine at oracle scale.
    */
  val e13 = QueryDef.sql(
    "e13_windowed_funnel",
    """WITH e AS (SELECT user_id, event_type, epoch_us(ts) AS us
      |           FROM events
      |           WHERE ts IS NOT NULL
      |             AND event_type IN ('signup', 'click', 'purchase')),
      |s1 AS (SELECT DISTINCT user_id FROM e WHERE event_type = 'signup'),
      |c2 AS (SELECT DISTINCT c.user_id, c.us
      |       FROM e c JOIN e s ON c.user_id = s.user_id
      |       WHERE c.event_type = 'click' AND s.event_type = 'signup'
      |         AND c.us > s.us AND c.us - s.us <= 86400000000),
      |p3 AS (SELECT DISTINCT p.user_id
      |       FROM e p JOIN c2 ON p.user_id = c2.user_id
      |       WHERE p.event_type = 'purchase'
      |         AND p.us > c2.us AND p.us - c2.us <= 86400000000)
      |SELECT (SELECT count(*) FROM s1) AS n_signup_users,
      |       (SELECT count(DISTINCT user_id) FROM c2) AS n_click_within,
      |       (SELECT count(*) FROM p3) AS n_purchase_within""".stripMargin) {
    (s, d) =>
      val w = 86400000000L
      val e = Tables.events(s, d)
        .filter(col("ts").isNotNull &&
          col("event_type").isin("signup", "click", "purchase"))
        .select(col("user_id"), unix_micros(col("ts")).as("us"),
          col("event_type"))
      e.groupBy("user_id")
        .agg(sort_array(collect_list(struct(col("us"), col("event_type"))))
          .as("evs"))
        .select(expr(
          s"""aggregate(evs,
             |  named_struct('l1', CAST(-1 AS BIGINT), 'l2', CAST(-1 AS BIGINT),
             |               'hit3', false),
             |  (acc, e) -> CASE
             |    WHEN e.event_type = 'signup'
             |      THEN named_struct('l1', e.us, 'l2', acc.l2, 'hit3', acc.hit3)
             |    WHEN e.event_type = 'click' AND acc.l1 >= 0
             |         AND e.us > acc.l1 AND e.us - acc.l1 <= ${w}L
             |      THEN named_struct('l1', acc.l1, 'l2', e.us, 'hit3', acc.hit3)
             |    WHEN e.event_type = 'purchase' AND acc.l2 >= 0
             |         AND e.us > acc.l2 AND e.us - acc.l2 <= ${w}L
             |      THEN named_struct('l1', acc.l1, 'l2', acc.l2, 'hit3', true)
             |    ELSE acc END)""".stripMargin).as("f"))
        .agg(
          sum(when(col("f.l1") >= 0, 1L).otherwise(0L)).as("n_signup_users"),
          sum(when(col("f.l2") >= 0, 1L).otherwise(0L)).as("n_click_within"),
          sum(when(col("f.hit3"), 1L).otherwise(0L)).as("n_purchase_within"))
  }

  /** E15 — Kaplan–Meier time-to-conversion with right censoring (the
    * survival estimator — Kaplan & Meier 1958 — applied to
    * signup→first-purchase latency; users who never purchase are
    * censored at the observation horizon). Per cohort (signup week):
    * S(t) = Π_{t_i ≤ t} (1 − d_i / n_i) over distinct event DAYS,
    * with n_i = at-risk just before t_i.
    *
    * Scale shape: per-user first-event times are one
    * map-side-combinable min-aggregate over raw events; everything
    * after runs on the (cohort, day) LIFE TABLE — |cohorts|×|days|
    * rows — so the ordered window is partitioned by cohort and sized
    * by the time granularity, never by user count. The survival
    * product is exp(Σ ln(1 − d/n)) with the same expression text in
    * both engines, rounded at 6 (ln/exp agree to ulps; the cumsum is
    * over ≤|days| terms). FULL DuckDB oracle.
    */
  val e15 = QueryDef.sql(
    "e15_kaplan_meier",
    """WITH u AS (
      |  SELECT user_id,
      |         min(CASE WHEN event_type = 'signup' THEN epoch_us(ts) END) AS s_us,
      |         min(CASE WHEN event_type = 'purchase' THEN epoch_us(ts) END) AS p_us,
      |         (SELECT max(epoch_us(ts)) FROM events WHERE ts IS NOT NULL) AS horizon
      |  FROM events WHERE ts IS NOT NULL GROUP BY user_id),
      |t AS (
      |  SELECT user_id,
      |         (s_us // 604800000000) AS cohort,
      |         CASE WHEN p_us IS NOT NULL AND p_us > s_us
      |              THEN (p_us - s_us) // 86400000000 END AS event_day,
      |         CASE WHEN p_us IS NULL OR p_us <= s_us
      |              THEN (horizon - s_us) // 86400000000 END AS censor_day
      |  FROM u WHERE s_us IS NOT NULL),
      |lt AS (
      |  SELECT cohort, COALESCE(event_day, censor_day) AS day,
      |         CAST(COALESCE(sum(CASE WHEN event_day IS NOT NULL THEN 1 END), 0) AS BIGINT) AS d,
      |         CAST(COALESCE(sum(CASE WHEN censor_day IS NOT NULL THEN 1 END), 0) AS BIGINT) AS c
      |  FROM t GROUP BY 1, 2),
      |r AS (
      |  SELECT cohort, day, d, c,
      |         (sum(d + c) OVER (PARTITION BY cohort))
      |         - COALESCE(sum(d + c) OVER (PARTITION BY cohort ORDER BY day
      |             ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
      |           AS n_risk
      |  FROM lt)
      |SELECT cohort, day, d, c, CAST(n_risk AS BIGINT) AS n_risk,
      |       round(exp(sum(CASE WHEN d > 0 THEN ln(1.0 - CAST(d AS DOUBLE) / n_risk)
      |                          ELSE 0.0 END)
      |             OVER (PARTITION BY cohort ORDER BY day
      |               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)), 6)
      |         AS survival
      |FROM r WHERE d > 0""".stripMargin) { (s, d) =>
    val ev = Tables.events(s, d).filter(col("ts").isNotNull)
      .select(col("user_id"), col("event_type"), unix_micros(col("ts")).as("us"))
    val horizon = ev.agg(max(col("us"))).head().getLong(0)
    val u = ev.groupBy("user_id")
      .agg(min(when(col("event_type") === "signup", col("us"))).as("s_us"),
        min(when(col("event_type") === "purchase", col("us"))).as("p_us"))
      .filter(col("s_us").isNotNull)
    val t = u.select(
      expr("s_us div 604800000000").as("cohort"),
      when(col("p_us").isNotNull && col("p_us") > col("s_us"),
        expr("(p_us - s_us) div 86400000000")).as("event_day"),
      when(col("p_us").isNull || col("p_us") <= col("s_us"),
        expr(s"(${horizon}L - s_us) div 86400000000")).as("censor_day"))
    val lt = t.groupBy(col("cohort"),
        coalesce(col("event_day"), col("censor_day")).as("day"))
      .agg(coalesce(sum(when(col("event_day").isNotNull, 1L)), lit(0L)).as("d"),
        coalesce(sum(when(col("censor_day").isNotNull, 1L)), lit(0L)).as("c"))
    val wAll = Window.partitionBy("cohort")
    val wPrev = Window.partitionBy("cohort").orderBy("day")
      .rowsBetween(Window.unboundedPreceding, -1)
    val wCum = Window.partitionBy("cohort").orderBy("day")
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    lt.withColumn("n_risk",
        sum(col("d") + col("c")).over(wAll) -
          coalesce(sum(col("d") + col("c")).over(wPrev), lit(0L)))
      .withColumn("survival",
        round(exp(sum(when(col("d") > 0,
          log(lit(1.0) - col("d").cast("double") / col("n_risk")))
          .otherwise(lit(0.0))).over(wCum)), 6))
      .filter(col("d") > 0)
      .select(col("cohort"), col("day"), col("d"), col("c"),
        col("n_risk").cast("long").as("n_risk"), col("survival"))
  }

  /** A22 — Welch two-sample t-test (unequal variances) between the
    * R-returned and N-kept price populations, with a normal-approx
    * two-sided p (df ≈ 40k ⇒ the t and normal tails agree far past
    * 6dp; p via the shared erfc text of m20). DETERMINISM: moments
    * accumulate as INTEGRAL cent sums (Σv and Σv² both fit long —
    * Σv² ≈ 1.7e18 < 2⁶³ — so they are exact under any order); t and p
    * derive from exact integers through fixed double expressions. A
    * float Σv² would carry ~ulp·60k ≈ 2.6e-6 noise into t — exactly
    * round-6 granularity, i.e. a coin-flip hash. One
    * map-side-combinable aggregate per group; O(1) output.
    */
  val a22 = QueryDef.sql(
    "a22_welch_ttest",
    s"""WITH g AS (
       |  SELECT l_returnflag AS f,
       |         CAST(count(*) AS BIGINT) AS n,
       |         CAST(sum(CAST(round(l_extendedprice * 100, 0) AS BIGINT)) AS BIGINT) AS s1,
       |         CAST(sum(CAST(round(l_extendedprice * 100, 0) AS BIGINT)
       |              * CAST(round(l_extendedprice * 100, 0) AS BIGINT)) AS BIGINT) AS s2
       |  FROM lineitem WHERE l_returnflag IN ('R', 'N') GROUP BY 1),
       |m AS (
       |  SELECT
       |    max(CASE WHEN f = 'R' THEN n END) AS n1,
       |    max(CASE WHEN f = 'N' THEN n END) AS n2,
       |    max(CASE WHEN f = 'R' THEN CAST(s1 AS DOUBLE) / n END) AS m1,
       |    max(CASE WHEN f = 'N' THEN CAST(s1 AS DOUBLE) / n END) AS m2,
       |    max(CASE WHEN f = 'R' THEN
       |      (CAST(s2 AS DOUBLE) - CAST(s1 AS DOUBLE) * s1 / n) / (n - 1) END) AS v1,
       |    max(CASE WHEN f = 'N' THEN
       |      (CAST(s2 AS DOUBLE) - CAST(s1 AS DOUBLE) * s1 / n) / (n - 1) END) AS v2
       |  FROM g),
       |t AS (SELECT n1, n2, m1, m2, v1, v2,
       |             (m1 - m2) / sqrt(v1 / n1 + v2 / n2) AS tstat
       |      FROM m)
       |SELECT n1, n2, round(m1 / 100.0, 6) AS mean_r, round(m2 / 100.0, 6) AS mean_n,
       |       round(tstat, 6) AS t_stat,
       |       round(${graft.ml.Prs.erfcSql("(abs(tstat) / sqrt(2.0))")}, 6) AS p_two
       |FROM t""".stripMargin) { (s, d) =>
    val cents = round(col("l_extendedprice") * 100, 0).cast("long")
    val g = Tables.lineitem(s, d)
      .filter(col("l_returnflag").isin("R", "N"))
      .groupBy(col("l_returnflag").as("f"))
      .agg(count(lit(1)).as("n"), sum(cents).as("s1"),
        sum(cents * cents).as("s2"))
    val m = g.agg(
      max(when(col("f") === "R", col("n"))).as("n1"),
      max(when(col("f") === "N", col("n"))).as("n2"),
      max(when(col("f") === "R", col("s1").cast("double") / col("n"))).as("m1"),
      max(when(col("f") === "N", col("s1").cast("double") / col("n"))).as("m2"),
      max(when(col("f") === "R",
        (col("s2").cast("double") - col("s1").cast("double") * col("s1") / col("n")) /
          (col("n") - 1))).as("v1"),
      max(when(col("f") === "N",
        (col("s2").cast("double") - col("s1").cast("double") * col("s1") / col("n")) /
          (col("n") - 1))).as("v2"))
    val t = m.withColumn("tstat",
      (col("m1") - col("m2")) / sqrt(col("v1") / col("n1") + col("v2") / col("n2")))
    t.select(col("n1"), col("n2"),
      round(col("m1") / 100.0, 6).as("mean_r"),
      round(col("m2") / 100.0, 6).as("mean_n"),
      round(col("tstat"), 6).as("t_stat"),
      round(expr(graft.ml.Prs.erfcSql("(abs(tstat) / sqrt(2.0))")), 6)
        .as("p_two"))
  }

  /** E16 — time-series resampling with forward fill: per user, an
    * HOURLY grid spanning that user's observed activity, each grid
    * cell carrying the last-observed `value` (gap cells inherit it).
    * This is the canonical regularization step before any windowed
    * model over irregular event streams ("as-of state at every hour").
    *
    * Scale shape: the raw scan collapses FIRST to one row per
    * (user, hour) — a map-side-combinable max(struct) aggregate that
    * picks the in-hour last event by (ts, event_id) — so the grid
    * explode and the forward-fill window run on the AGGREGATED frame
    * (users × active-hours), never on raw events; the fill window is
    * partitioned per user (bounded spans), no global ordering
    * anywhere. The grid itself is scan-local `sequence`/`explode` —
    * the same shape as c6's chunking.
    *
    * Determinism: filled values are COPIED doubles (no arithmetic),
    * hour ids are integral `div`s, and the in-hour winner is pinned by
    * the unique (us, event_id) pair — so the FULL oracle hash-matches
    * bit-for-bit: DuckDB rebuilds the grid with `range()` and replays
    * the fill with `last_value(... IGNORE NULLS)`.
    */
  val e16 = QueryDef.sql(
    "e16_resample_gapfill",
    """WITH e AS (
      |  SELECT user_id, epoch_us(ts) AS us, event_id, value,
      |         epoch_us(ts) // 3600000000 AS hour
      |  FROM events WHERE ts IS NOT NULL AND epoch_us(ts) >= 0),
      |r AS (
      |  SELECT user_id, hour, value,
      |         row_number() OVER (PARTITION BY user_id, hour
      |                            ORDER BY us DESC, event_id DESC) AS rn
      |  FROM e),
      |ph AS (SELECT user_id, hour, value AS v FROM r WHERE rn = 1),
      |span AS (SELECT user_id, min(hour) AS h0, max(hour) AS h1
      |         FROM ph GROUP BY 1),
      |grid AS (SELECT user_id, unnest(range(h0, h1 + 1)) AS hour FROM span),
      |j AS (SELECT g.user_id, g.hour, ph.v
      |      FROM grid g LEFT JOIN ph USING (user_id, hour))
      |SELECT user_id, CAST(hour AS BIGINT) AS hour,
      |       last_value(v IGNORE NULLS) OVER (
      |         PARTITION BY user_id ORDER BY hour
      |         ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
      |         AS value_filled,
      |       v IS NULL AS is_gap
      |FROM j""".stripMargin) { (s, d) =>
    val ev = Tables.events(s, d).filter(col("ts").isNotNull)
      .select(col("user_id"), unix_micros(col("ts")).as("us"),
        col("event_id"), col("value"))
      .filter(col("us") >= 0)
      .withColumn("hour", expr("us div 3600000000"))
    // one row per (user, hour): the in-hour last event's value —
    // (us, event_id) is unique, so the struct max is total
    val perHour = ev.groupBy("user_id", "hour")
      .agg(max(struct(col("us"), col("event_id"), col("value"))).as("w"))
      .select(col("user_id"), col("hour"), col("w.value").as("v"))
    val grid = perHour.groupBy("user_id")
      .agg(min(col("hour")).as("h0"), max(col("hour")).as("h1"))
      .select(col("user_id"),
        explode(sequence(col("h0"), col("h1"))).as("hour"))
    val wFill = Window.partitionBy("user_id").orderBy("hour")
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    grid.join(perHour, Seq("user_id", "hour"), "left")
      .select(col("user_id"), col("hour").cast("long").as("hour"),
        last(col("v"), ignoreNulls = true).over(wFill).as("value_filled"),
        col("v").isNull.as("is_gap"))
  }

  /** E17 — cohort retention matrix: users cohorted by first-activity
    * week, then (cohort, weeks-since) cells count how many of the
    * cohort were active that week — the growth-analytics staple. Two
    * hash aggregates (first-touch per user; distinct (user, week)) and
    * one broadcast-sized join of cohort sizes; all arithmetic integral
    * except the final rate, derived from exact integer ratios and
    * rounded at 6, so the FULL oracle hash-matches. Weeks are integral
    * `div`s of epoch-days (no calendar/timezone semantics to diverge
    * between engines).
    */
  val e17 = QueryDef.sql(
    "e17_cohort_retention",
    """WITH e AS (
      |  SELECT DISTINCT user_id, epoch_us(ts) // 604800000000 AS week
      |  FROM events WHERE ts IS NOT NULL AND epoch_us(ts) >= 0),
      |first_w AS (SELECT user_id, min(week) AS cohort_week
      |            FROM e GROUP BY 1),
      |size_w AS (SELECT cohort_week, count(*) AS n_cohort
      |           FROM first_w GROUP BY 1),
      |act AS (
      |  SELECT f.cohort_week, e.week - f.cohort_week AS week_offset,
      |         count(*) AS n_active
      |  FROM e JOIN first_w f USING (user_id) GROUP BY 1, 2)
      |SELECT a.cohort_week, CAST(a.week_offset AS BIGINT) AS week_offset,
      |       CAST(a.n_active AS BIGINT) AS n_active,
      |       CAST(s.n_cohort AS BIGINT) AS n_cohort,
      |       round(CAST(a.n_active AS DOUBLE) / s.n_cohort, 6) AS retention
      |FROM act a JOIN size_w s USING (cohort_week)""".stripMargin) { (s, d) =>
    val e = Tables.events(s, d).filter(col("ts").isNotNull)
      .select(col("user_id"), unix_micros(col("ts")).as("us"))
      .filter(col("us") >= 0)
      .select(col("user_id"), expr("us div 604800000000").as("week"))
      .distinct()
    val firstW = e.groupBy("user_id").agg(min(col("week")).as("cohort_week"))
    val sizeW = firstW.groupBy("cohort_week").agg(count(lit(1)).as("n_cohort"))
    e.join(firstW, "user_id")
      .groupBy(col("cohort_week"),
        (col("week") - col("cohort_week")).as("week_offset"))
      .agg(count(lit(1)).as("n_active"))
      .join(broadcast(sizeW), "cohort_week")
      .select(col("cohort_week"), col("week_offset"), col("n_active"),
        col("n_cohort"),
        round(col("n_active").cast("double") / col("n_cohort"), 6)
          .as("retention"))
  }

  def all: Seq[QueryDef] = Seq(
    p1, p2, p3, p4, p5, j1, j3, j5, u1, u3, u4, u7, u8, a1, o2, o3, a4, a5,
    a13, o5, e1, e2, e5, e6, e7, e8, e9, e10, e11, e12, e13, e15, e16, e17,
    k1, a14, a15, a16, a19, a20, a22, j9, j10, scalars)
}
