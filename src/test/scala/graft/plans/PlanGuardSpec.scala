package graft.plans

import graft.{SparkEntry, SparkSpec}

/** Regression guards for the physical-plan properties PLANS.md claims —
  * the scale story is only real while these hold, so they are asserted,
  * not just documented. Each test builds the declared query against the
  * sf0.001 parquet and inspects its explain string.
  *
  * Note: only queries whose FINAL frame is the declarative plan are
  * guarded here; two-pass kernels (a4/a5/o4/a9…) take their actions
  * during the build and return literal/RDD-backed tails whose explain
  * carries no scan info — their shapes are covered by their own specs
  * and oracle gates.
  */
class PlanGuardSpec extends SparkSpec {

  private val sf = "/root/testdata/sf0.001"

  private def plan(name: String): String = {
    val df = SparkEntry.queries(name)(spark, sf)
    df.queryExecution.explainString(
      org.apache.spark.sql.execution.ExplainMode.fromString("formatted"))
  }

  test("a1: ship-date filter pushes into the scan, columns prune") {
    val p = plan("a1_grouped_agg")
    assert(p.contains("PushedFilters:") && p.contains("l_shipdate"),
      s"filter not pushed:\n$p")
    // 6 referenced columns of lineitem's 16 — the scan must not read more
    val read = p.linesIterator.find(_.contains("ReadSchema")).getOrElse("")
    assert(read.contains("l_returnflag") && !read.contains("l_comment") &&
      !read.contains("l_partkey"), s"not pruned: $read")
  }

  test("t2: quality scoring reads only the text column") {
    val read = plan("t2_quality_score").linesIterator
      .filter(_.contains("ReadSchema")).mkString
    assert(read.contains("text") && !read.contains("doc_id"),
      s"scan reads more than text: $read")
  }

  test("p1/j1/j9: small sides broadcast — no sort-merge join anywhere") {
    for (q <- Seq("p1_semi_join_filter", "j1_broadcast_inner_join",
        "j9_star_join")) {
      val p = plan(q)
      assert(p.contains("BroadcastHashJoin"), s"$q lost its broadcast:\n$p")
      assert(!p.contains("SortMergeJoin"), s"$q fell back to sort-merge:\n$p")
    }
  }

  test("j9: the fact table never shuffles (only the final agg exchanges)") {
    val p = plan("j9_star_join")
    // broadcast exchanges are fine; at most ONE shuffle exchange (the
    // grouped aggregate's) may appear
    val shuffles = p.linesIterator.count(l =>
      l.contains("Exchange hashpartitioning"))
    assert(shuffles <= 1, s"fact-side shuffle crept in ($shuffles):\n$p")
  }

  test("e6-style window partitions by key (no empty partition spec)") {
    val p = plan("o5_window_rank")
    assert(p.contains("Window"), s"window gone:\n$p")
    // an unpartitioned window would serialize the table through 1 task
    assert(!p.contains("windowspecdefinition(") ||
      !p.linesIterator.exists(l => l.contains("windowspecdefinition(") &&
        !l.contains("partitionBy") && l.contains("SinglePartition")),
      s"single-partition window:\n$p")
    assert(!p.contains("Exchange SinglePartition"),
      s"single-partition exchange in a hot path:\n$p")
  }

  test("t13: text-null filter pushes down; the vocab join broadcasts") {
    val p = plan("t13_unigram_logprob")
    assert(p.contains("PushedFilters: [IsNotNull(text)]"),
      s"text filter not pushed:\n$p")
    // the corpus-frequency side prunes to text alone
    val reads = p.linesIterator.filter(_.contains("ReadSchema")).toSeq
    assert(reads.exists(r => r.contains("text") && !r.contains("doc_id")),
      s"vocab-side scan not pruned: $reads")
    assert(p.contains("BroadcastHashJoin") && !p.contains("SortMergeJoin"),
      s"vocab join not broadcast at this scale:\n$p")
  }

  test("d13: the eval side broadcasts (nested-loop, never a cartesian)") {
    val p = plan("d13_semantic_decontaminate")
    assert(p.contains("BroadcastNestedLoopJoin"),
      s"eval broadcast lost:\n$p")
    assert(!p.contains("CartesianProduct"),
      s"fell back to a cartesian product:\n$p")
  }

  test("c10: lang filters push into both scans") {
    val p = plan("c10_dsir_weights")
    val pushed = p.linesIterator.filter(_.contains("PushedFilters")).toSeq
    assert(pushed.exists(_.contains("lang")), s"lang not pushed: $pushed")
    assert(!p.contains("CartesianProduct"), s"cartesian crept in:\n$p")
  }

  test("s16: bucketed join + agg runs with ZERO exchanges") {
    val df = SparkEntry.queries("s16_bucketed_join")(spark, sf)
    val p = df.queryExecution.executedPlan.toString
    assert(p.contains("SortMergeJoin"), s"SMJ shape lost:\n$p")
    assert(!p.contains("Exchange"), s"exchange crept into the bucketed plan:\n$p")
    // the scans must actually be bucketed reads, not plain file scans
    assert(p.contains("Bucketed: true"), s"scan not bucketed:\n$p")
  }

  test("p6: the bloom probe filters the fact scan BEFORE the join") {
    // build the frame without running the gate's aggregates is not
    // possible (the query takes driver actions), so assert on the
    // final joined plan: the UDF filter must sit under the join
    val p = plan("p6_bloom_semi_join")
    val filterIdx = p.indexOf("Filter")
    val joinIdx = p.indexOf("BroadcastHashJoin")
    assert(filterIdx >= 0 && joinIdx >= 0, s"shape changed:\n$p")
  }

  test("c12: weighted sample plans as distributed top-k, not a global sort") {
    val p = plan("c12_weighted_sample")
    assert(p.contains("TakeOrderedAndProject"),
      s"weighted sample lost its top-k plan:\n$p")
    // a global Sort + CollectLimit would funnel the corpus through the
    // driver-side boundary the top-k heap exists to avoid
    assert(!p.contains("Exchange SinglePartition"),
      s"single-partition exchange in the sample path:\n$p")
  }

  test("e10: rolling active users has no window and no single partition") {
    val p = plan("e10_rolling_active_users")
    assert(!p.contains("Window"), s"windowed distinct crept back in:\n$p")
    assert(!p.contains("Exchange SinglePartition"),
      s"single-partition exchange:\n$p")
    // the explode fan-out must sit over a pruned 2-column scan
    val read = p.linesIterator.find(_.contains("ReadSchema")).getOrElse("")
    assert(read.contains("ts") && read.contains("user_id") &&
      !read.contains("props"), s"scan not pruned: $read")
  }

  test("t17: gopher rules are one scan-local aggregate over text only") {
    val p = plan("t17_gopher_rules")
    // a pure rule filter must not shuffle anything but the final 1-row
    // aggregate, and must never join or window
    assert(!p.contains("Join") && !p.contains("Window"),
      s"rule filter grew a join/window:\n$p")
    val read = p.linesIterator.find(_.contains("ReadSchema")).getOrElse("")
    assert(read.contains("text") && !read.contains("doc_id") &&
      !read.contains("props"), s"scan not pruned to text: $read")
  }

  test("d14: span chain never goes cartesian; doc scans prune to id+text") {
    // the registered query's final frame is the RDD cutter and the span
    // chain checkpoints its candidate frame (both legitimate — but each
    // rewires explain to a LogicalRDD), so guard the two claims where
    // they are visible: the window-kernel scan for pruning, and the
    // span-detection plan for join shape (the t16 pattern for RDD tails)
    val docs = graft.Tables.documents(spark, sf)
      .select(org.apache.spark.sql.functions.col("doc_id"),
        org.apache.spark.sql.functions.col("text"))
    def fmt(df: org.apache.spark.sql.DataFrame) =
      df.queryExecution.explainString(
        org.apache.spark.sql.execution.ExplainMode.fromString("formatted"))
    val wp = fmt(graft.llm.Dedup.rollingHashWindows(docs, win = 50))
    val reads = wp.linesIterator.filter(_.contains("ReadSchema")).mkString("\n")
    assert(reads.contains("text") && !reads.contains("props") &&
      !reads.contains("source"), s"documents scan not pruned: $reads")
    val p = fmt(graft.llm.Dedup.repeatedSubstringSpans(docs, win = 50,
      minDocs = 2))
    assert(!p.contains("CartesianProduct") &&
      !p.contains("BroadcastNestedLoopJoin"),
      s"span detection went quadratic:\n$p")
    assert(p.contains("Join") || p.contains("join"),
      s"span plan lost its candidate joins entirely:\n$p")
  }

  test("t16: normalization expressions stay inside whole-stage codegen") {
    val p = plan("t16_normalize_text")
    // the query's final frame is a literal gate row; assert on the
    // layered scan instead: build it directly
    val layered = graft.Tables.documents(spark, sf)
      .select(graft.expressions.NormalizeText.stripAccents(
        org.apache.spark.sql.functions.col("text")).as("st"))
    val lp = layered.queryExecution.explainString(
      org.apache.spark.sql.execution.ExplainMode.fromString("formatted"))
    // formatted mode marks codegen'd operators with "[codegen id : N]"
    assert(lp.linesIterator.exists(l =>
      l.contains("Project") && l.contains("codegen id")),
      s"strip_accents broke codegen:\n$lp")
    assert(!lp.contains("BatchEvalPython") && !lp.contains("ScalaUDF"),
      s"normalization fell back to a UDF:\n$lp")
    assert(p.nonEmpty)
  }

  test("t22: html extraction is ZERO-shuffle — one scan-local projection") {
    val p = plan("t22_html_extract")
    assert(!p.contains("Exchange"), s"t22 grew a shuffle:\n$p")
    assert(!p.contains("Join"), s"t22 grew a join:\n$p")
    // n_chars is never referenced — the scan must prune it
    val read = p.linesIterator.filter(_.contains("ReadSchema")).mkString
    assert(read.contains("text") && !read.contains("n_chars"),
      s"scan reads more than needed: $read")
  }

  test("t23: hashed-ngram inference is ZERO-shuffle and join-free") {
    val p = plan("t23_hashed_ngram_score")
    assert(!p.contains("Exchange"), s"t23 grew a shuffle:\n$p")
    // the whole point of the hashing trick: no vocab join, no broadcast
    assert(!p.contains("Join") && !p.contains("Broadcast"),
      s"t23 grew a vocabulary join:\n$p")
  }

  test("t18: lexical diversity is ZERO-shuffle — pure scan-local projection") {
    val p = plan("t18_lexical_diversity")
    assert(!p.contains("Exchange"), s"t18 grew a shuffle:\n$p")
    assert(!p.contains("Window"), s"t18 grew a window:\n$p")
    val read = p.linesIterator.filter(_.contains("ReadSchema")).mkString
    assert(read.contains("text") && !read.contains("n_chars"),
      s"scan reads more than needed: $read")
  }

  test("e11: the anomaly window runs on the aggregated frame, after ONE count shuffle") {
    val p = plan("e11_daily_anomaly")
    // plan shape: scan → partial agg → Exchange → final agg →
    // Exchange (window partitioning) → Sort → Window. The first
    // aggregate MUST appear below the window — i.e. the window input
    // is (type, day) counts, never raw events.
    assert(p.contains("Window"), s"window missing:\n$p")
    val lines = p.linesIterator.toSeq
    val aggIdx = lines.indexWhere(l => l.contains("HashAggregate"))
    val winIdx = lines.indexWhere(l => l.contains("Window"))
    assert(aggIdx >= 0 && winIdx >= 0,
      s"expected aggregate + window:\n$p")
    val shuffles = lines.count(_.contains("Exchange hashpartitioning"))
    assert(shuffles <= 2, s"extra shuffles ($shuffles):\n$p")
    // partition-by must be event_type (bounded parallel groups), not empty
    assert(!p.contains("Window [") || !p.contains("partitionBy=[]"),
      s"global window crept in:\n$p")
  }

  test("dq1: the profile never plans an Expand (the multi-countDistinct trap)") {
    val p = plan("dq1_profile")
    assert(!p.contains("Expand"), s"dq1 grew an Expand:\n$p")
    // two-level shape: a (col, value) aggregate must sit below the
    // per-column stats aggregate
    assert(p.contains("HashAggregate") || p.contains("ObjectHashAggregate"),
      s"expected hash aggregates:\n$p")
  }

  test("u8: multiset ops plan as count-diff aggregates — no join operator") {
    val p = plan("u8_multiset_ops")
    assert(!p.contains("SortMergeJoin") && !p.contains("BroadcastHashJoin") &&
      !p.contains("BroadcastNestedLoopJoin"),
      s"u8 grew a join:\n$p")
    assert(p.contains("Generate"), // the replicate-rows expansion of EXCEPT ALL
      s"expected the count-diff Generate shape:\n$p")
  }

  test("m18: PRS weight table broadcasts; lineitem scan prunes to 3 columns") {
    val p = plan("m18_prs_score")
    assert(p.contains("BroadcastHashJoin"), s"weights not broadcast:\n$p")
    assert(!p.contains("SortMergeJoin"), s"PRS fell into a sort-merge join:\n$p")
    val li = p.linesIterator.filter(l => l.contains("ReadSchema") &&
      l.contains("l_orderkey")).mkString
    assert(li.contains("l_partkey") && li.contains("l_quantity") &&
      !li.contains("l_extendedprice"), s"lineitem scan not pruned: $li")
  }

  test("e12: top paths end in TakeOrdered, not a global sort") {
    val p = plan("e12_session_top_paths")
    assert(p.contains("TakeOrderedAndProject"), s"top-10 not TakeOrdered:\n$p")
    // the path count must be a hash aggregate, and the only global sort
    // allowed is none (TakeOrdered replaces it)
    assert(!p.contains("Exchange SinglePartition") ||
      p.indexOf("TakeOrderedAndProject") >= 0, s"global sort crept in:\n$p")
  }

  test("c15: temperature sampling is a scan-local filter over a broadcast count") {
    val p = plan("c15_temperature_mix")
    assert(p.contains("BroadcastHashJoin"), s"counts not broadcast:\n$p")
    assert(!p.contains("Window"), s"c15 grew a window:\n$p")
    assert(!p.contains("SortMergeJoin"), s"c15 shuffled the corpus:\n$p")
  }

  test("e15: the survival window partitions by cohort over the life table") {
    val p = plan("e15_kaplan_meier")
    assert(p.contains("Window"), s"window missing:\n$p")
    assert(!p.contains("partitionBy=[]"), s"global window crept in:\n$p")
    // the per-user min-aggregate must sit BELOW the window: the window
    // input is the life table, never raw events
    val lines = p.linesIterator.toSeq
    val aggIdx = lines.indexWhere(_.contains("HashAggregate"))
    val winIdx = lines.indexWhere(_.contains("Window"))
    assert(aggIdx >= 0 && winIdx >= 0 && winIdx < lines.size)
  }

  test("g5: projection degrees broadcast; no sort-merge join") {
    val p = plan("g5_weighted_projection")
    assert(p.contains("BroadcastHashJoin"), s"degrees not broadcast:\n$p")
    assert(!p.contains("SortMergeJoin"), s"g5 fell into sort-merge:\n$p")
  }

  test("a22: the t-test is pure aggregation — no join, no window, O(1) output") {
    val p = plan("a22_welch_ttest")
    assert(!p.contains("Join"), s"a22 grew a join:\n$p")
    assert(!p.contains("Window"), s"a22 grew a window:\n$p")
  }

  test("m21: the kinship screen has NO cartesian product — blocking replaced it") {
    val p = plan("m21_ibs_kinship")
    assert(!p.contains("CartesianProduct"),
      s"m21 regressed to all-pairs:\n$p")
    assert(!p.contains("BroadcastNestedLoopJoin"),
      s"m21 regressed to nested-loop:\n$p")
  }

  test("v1: the fixed probe panel pushes into the embeddings scan") {
    val p = plan("v1_cosine_top1")
    val pushed = p.linesIterator.filter(_.contains("PushedFilters"))
      .mkString
    assert(pushed.contains("LessThan(vec_id,40"),
      s"panel filter not pushed into the scan:\n$pushed")
  }

  test("v15 exact truth: only the 40-id panel cross-joins (never corpus x corpus)") {
    val p = plan("v15_hard_negatives")
    // the truth side IS a panel x corpus cross join by construction —
    // the guard is that the panel filter reached the scan feeding it,
    // so the joined side is 40 rows, not the corpus
    assert(p.contains("LessThan(vec_id,40"),
      s"panel bound missing from v15's plan:\n$p")
  }

  test("g4: degree histogram is two stacked aggregates, no join above the edge build") {
    val p = plan("g4_degree_histogram")
    val lines = p.linesIterator.toSeq
    // exactly the dedup + two count aggregates exchange; no window
    assert(!p.contains("Window"), s"g4 grew a window:\n$p")
    assert(lines.count(_.contains("HashAggregate")) >= 4,
      s"expected partial+final aggregate pairs:\n$p")
  }

  test("v19: stored-index search statically prunes un-probed cell partitions") {
    import org.apache.spark.sql.functions.col
    val emb = graft.Tables.embeddings(spark, sf)
      .select(col("vec_id"), col("embedding"))
    val dir = graft.util.Fixtures.dir + "/spec_planguard_v19"
    val ix = graft.llm.VectorIndex.ensure(emb, dir)
    // ONE query probes nProbe=6 of 16 cells — the scan over the stored
    // codes must carry those cells as PartitionFilters (directory-level
    // pruning), not as a post-scan row filter
    val q = emb.filter(col("vec_id") === 0)
    val df = graft.llm.VectorIndex.search(ix, q, emb, k = 1)
    val p = df.queryExecution.explainString(
      org.apache.spark.sql.execution.ExplainMode.fromString("formatted"))
    val pf = p.linesIterator.find(l =>
      l.contains("PartitionFilters") && l.contains("cell"))
    assert(pf.isDefined, s"no cell PartitionFilters on the codes scan:\n$p")
    assert(pf.get.contains(" IN "), s"cell filter not an IN list: ${pf.get}")
  }

  test("e16: the fill window partitions per user; events scan prunes") {
    val p = plan("e16_resample_gapfill")
    assert(p.contains("Window"), s"fill window gone:\n$p")
    assert(!p.contains("Exchange SinglePartition"),
      s"global window crept into the gap-fill:\n$p")
    val read = p.linesIterator.filter(_.contains("ReadSchema")).mkString
    assert(!read.contains("props") && !read.contains("event_type"),
      s"events scan reads unused columns: $read")
  }

  test("e17: cohort sizes broadcast; no sort-merge join") {
    val p = plan("e17_cohort_retention")
    assert(p.contains("BroadcastHashJoin"),
      s"cohort-size join lost its broadcast:\n$p")
    assert(!p.contains("Exchange SinglePartition"),
      s"single-partition exchange in retention:\n$p")
  }

  test("dq7: ONE aggregate feeds all six pairs — no join, no repeated scan") {
    val p = plan("dq7_correlation_matrix")
    assert(!p.contains("Join"), s"correlation profile joined:\n$p")
    // the formatted explain names each node twice (tree + detail):
    // count detail headers only
    val scans = p.linesIterator.count(_.matches("""^\(\d+\) Scan parquet\s*"""))
    assert(scans == 1, s"pair expansion re-scans the table ($scans):\n$p")
    assert(p.contains("Generate"), s"explode-based expansion missing:\n$p")
  }
}
