package graft

import org.apache.spark.sql.execution.SparkPlan

/** Physical-plan assertions: the scale properties the queries claim
  * (predicate pushdown reaching the scan, broadcast joins for dimensions,
  * no cartesian products, pruned scan schemas) must be visible in the plan,
  * not just hoped for.
  */
class PlanSpec extends SparkSpec {

  private val sf = "/root/testdata/sf0.001"

  private def plan(name: String): String = {
    val df = SparkEntry.queries(name)(spark, sf)
    df.queryExecution.executedPlan.toString
  }

  test("q7 filter reaches the parquet scan as pushed filters") {
    val p = plan("q7_filter_agg")
    assert(p.contains("PushedFilters") &&
      (p.contains("GreaterThanOrEqual(l_shipdate") || p.contains("l_shipdate")),
      s"no pushed filter on l_shipdate:\n${p.take(2000)}")
  }

  test("q3 joins dimensions by broadcast, facts by shuffle") {
    val p = plan("q3_join")
    assert(p.contains("BroadcastHashJoin"), "expected broadcast joins for customer/nation")
    assert(!p.contains("CartesianProduct"))
  }

  test("q2 top-k gets a map-side group limit before the exchange") {
    val p = plan("q2_topk")
    // Spark 4's WindowGroupLimit partial phase must cap the shuffle at
    // k rows per group per input partition (replaces the r1-r9 hand-salted
    // _pid pre-rank)
    assert(p.contains("WindowGroupLimit"), s"no group limit:\n${p.take(2000)}")
    assert(p.contains("Partial"), s"group limit is not two-phase:\n${p.take(2000)}")
  }

  test("scan schemas are pruned to referenced columns") {
    val p = plan("q1_agg")
    assert(!p.contains("l_comment"), "q1 should not read l_comment")
    val p2 = plan("text_tokens")
    assert(!p2.contains("lang,") && !p2.contains("source,"),
      "text_tokens should only read doc_id and text")
  }

  test("no cartesian products anywhere in the catalog") {
    val offenders = SparkEntry.queries.keys.toSeq.sorted.filter { name =>
      plan(name).contains("CartesianProduct")
    }
    assert(offenders.isEmpty, s"cartesian products in: $offenders")
  }

  test("ann_ivf probes the inverted lists via broadcast join") {
    val p = plan("ann_ivf")
    // the probe side is broadcast onto the corpus assignment: the corpus
    // itself must not shuffle for candidate generation
    assert(p.contains("BroadcastHashJoin"),
      s"expected a broadcast probe join:\n${p.take(2000)}")
    assert(!p.contains("CartesianProduct"))
  }

  test("dedup_ngram prunes the documents scan to doc_id and text") {
    val p = plan("dedup_ngram")
    assert(!p.contains("lang,") && !p.contains("source,"),
      "dedup_ngram should only read doc_id and text")
  }

  test("stratified sampling is a pure narrow filter — zero exchanges") {
    val p = plan("sample_stratified")
    assert(!p.contains("Exchange"),
      s"sample_stratified must not shuffle:\n${p.take(2000)}")
  }

  test("sequence packing shuffles once, on the shard key") {
    val p = plan("pack_sequences")
    val exchanges = "Exchange hashpartitioning".r.findAllIn(p).length
    assert(exchanges == 1, s"pack_sequences shuffles $exchanges times:\n${p.take(2000)}")
    assert(p.contains("shard"), "window must partition by the shard column")
  }

  test("decontaminate probes the eval grams via broadcast — corpus never shuffles for the join") {
    val p = plan("decontaminate")
    assert(p.contains("BroadcastHashJoin"),
      s"expected a broadcast gram join:\n${p.take(2000)}")
    assert(!p.contains("SortMergeJoin"),
      "the corpus side must not shuffle into a sort-merge join")
  }

  test("text_repetition is a pure narrow map — zero exchanges") {
    val p = plan("text_repetition")
    assert(!p.contains("Exchange"),
      s"text_repetition must not shuffle:\n${p.take(2000)}")
  }

  test("text_boilerplate takes top-k without a global sort") {
    val p = plan("text_boilerplate")
    assert(p.contains("TakeOrderedAndProject"),
      s"expected TakeOrderedAndProject for the top-k:\n${p.take(2000)}")
  }

  test("text_gopher is a pure narrow map — zero exchanges, native kernel") {
    val p = plan("text_gopher")
    assert(!p.contains("Exchange"),
      s"text_gopher must not shuffle:\n${p.take(2000)}")
    // r15: the interpreted-HOF stack (2 splits, array_sort + folds, filter
    // lambdas, per-element bigram transform) collapsed into ONE native
    // gopher_stats call per row (graft.functions.GopherStats) — the plan
    // must carry the kernel and none of the HOF machinery
    assert(p.contains("gopher_stats"), "native gopher_stats kernel missing")
    assert(!p.contains("array_sort"), "HOF bigram sort must be gone")
    assert(!p.contains("aggregate("), "HOF folds must be gone")
  }

  test("text_fingerprint is a pure narrow map — zero exchanges") {
    val p = plan("text_fingerprint")
    assert(!p.contains("Exchange"),
      s"text_fingerprint must not shuffle:\n${p.take(2000)}")
  }

  test("boilerplate minOccurrences pre-filter adds a candidate join; default does not") {
    import org.apache.spark.sql.functions.col
    val docs = Tables.documents(spark, sf)
    val dflt = operators.TextAnalysis.boilerplateNgrams(docs, "doc_id", "text")
      .queryExecution.executedPlan.toString
    assert(!dflt.contains("Join"),
      s"default path must not join:\n${dflt.take(2000)}")
    val pre = operators.TextAnalysis.boilerplateNgrams(docs, "doc_id", "text",
        minOccurrences = 2L)
      .queryExecution.executedPlan.toString
    assert(pre.contains("Join"),
      s"pre-filter path must join grams to candidates:\n${pre.take(2000)}")
    // the candidate pre-pass is a pure count keyed by gram — doc_id must
    // not appear in its aggregate keys (that's the whole point)
    assert(pre.contains("TakeOrderedAndProject"),
      "pre-filter path must keep the top-k shape")
  }

  test("fingerprint/repetition collapse barriers hold — the split runs once per row") {
    // regression guard for the O(words²) shape: if the staged projections
    // ever collapse, the regex split gets inlined into the window lambda
    // (re-split per window position) and shows up more than once in the
    // executed plan. The mechanism keeping the stages apart is
    // CollapseProject's non-cheap/multi-reference rule — this test is the
    // guard that a future single-reference edit can't silently undo it.
    val fp = plan("text_fingerprint")
    val fpSplits = "split\\(".r.findAllIn(fp).length
    assert(fpSplits == 1,
      s"text_fingerprint must materialize the split once, found $fpSplits:\n${fp.take(3000)}")
    val rep = plan("text_repetition")
    val repSplits = "split\\(".r.findAllIn(rep).length
    assert(repSplits == 1,
      s"text_repetition must materialize the split once, found $repSplits:\n${rep.take(3000)}")
    // stage 2 pins the gram array so array_distinct runs once, not per use
    val repDistinct = "array_distinct\\(".r.findAllIn(rep).length
    assert(repDistinct == 1,
      s"text_repetition must compute array_distinct once, found $repDistinct:\n${rep.take(3000)}")
  }

  test("dsl pattern plans reuse one exchange for the window pipeline") {
    val p = plan("dsl_timer")
    val exchanges = "Exchange hashpartitioning".r.findAllIn(p).length
    // one exchange for gap assignment + one finer (key, gap_run) exchange
    // for the window pipeline + at most two for the segment/session chain
    assert(exchanges <= 4, s"dsl_timer shuffles $exchanges times:\n${p.take(3000)}")
  }

  test("dsl pattern scans prune unreferenced event columns") {
    // the pattern pipeline carries the frame through two exchanges; unused
    // wide columns (props is a JSON string) must be pruned at the scan or
    // every shuffle pays for them at 100 TB
    val p = plan("dsl_simple")
    assert(!p.contains("props"),
      s"dsl_simple must not read/carry props:\n${p.take(2000)}")
  }

  test("dsl window stages exchange on (key, gap_run) — hot keys sub-partition at gaps") {
    // hashpartitioning(keys) SATISFIES ClusteredDistribution(keys, gap_run),
    // so without the compiler's explicit repartition Spark never plans the
    // finer exchange and a hot key serializes every window stage into one
    // task. Assert the finer-grained exchange is present by default and
    // absent when the knob is off.
    val p = plan("dsl_timer")
    assert("Exchange hashpartitioning\\(user_id#\\d+L?, _p_gap".r.findFirstIn(p).isDefined,
      s"expected a (user_id, _p_gap) exchange in dsl_timer:\n${p.take(3000)}")
    val cfg = dsl.PatternConfig(Seq("user_id"), "ts",
      eventsMaxGapMs = 604800000L, sessionGapMs = 86400000L,
      gapSubPartition = false)
    val off = dsl.TspEngine.incidents(Tables.events(spark, sf),
      "value > 50 for 24 hr", cfg)
      .queryExecution.executedPlan.toString
    assert("Exchange hashpartitioning\\(user_id#\\d+L?, _p_gap".r.findFirstIn(off).isEmpty,
      s"gapSubPartition=false must not add the finer exchange:\n${off.take(3000)}")
  }

  test("shuffle_shards shuffles once, on the shard key, ids only") {
    val p = plan("shuffle_shards")
    val exchanges = "Exchange hashpartitioning".r.findAllIn(p).length
    assert(exchanges == 1, s"shuffle_shards shuffles $exchanges times:\n${p.take(2000)}")
    assert(p.contains("hashpartitioning(shard"),
      "the one exchange must key on the shard column")
    // the scan feeding the index is pruned to the id column (the relation
    // node itself may list every table column when the table is cached)
    assert("InMemoryTableScan \\[doc_id#\\d+L\\]".r.findFirstIn(p).isDefined ||
      p.contains("ReadSchema: struct<doc_id:bigint>"),
      s"the index scan must read doc_id only:\n${p.take(2000)}")
  }

  test("mix_weights broadcasts the one-row normalizer") {
    val p = plan("mix_weights")
    assert(p.contains("BroadcastNestedLoopJoin") || p.contains("BroadcastHashJoin"),
      s"expected a broadcast of the normalizer aggregate:\n${p.take(2000)}")
    assert(!p.contains("SortMergeJoin"),
      "the per-stratum frame must not shuffle to meet the normalizer")
  }

  test("text_pii is a pure narrow map — zero exchanges") {
    val p = plan("text_pii")
    assert(!p.contains("Exchange"),
      s"text_pii must not shuffle:\n${p.take(2000)}")
  }

  test("dedup_substring shuffles hashes, never text") {
    val p = plan("dedup_substring")
    assert(!p.contains("CartesianProduct"))
    // every exchange is keyed on the md5 gram hash or the doc id — the gram
    // STRING itself (the only wide payload) must not be a shuffle key
    val keys = "hashpartitioning\\(([a-zA-Z_]+)".r.findAllMatchIn(p)
      .map(_.group(1)).toSet
    assert(keys.subsetOf(Set("_gh", "doc_id")),
      s"unexpected shuffle keys $keys:\n${p.take(3000)}")
  }

  test("affinity_weights broadcasts the feature table and the totals row") {
    val p = plan("affinity_weights")
    // the corpus gram stream must meet the 1024-row feature table by
    // broadcast — never by shuffling the grams into a sort-merge join
    assert(p.contains("BroadcastHashJoin"),
      s"expected a broadcast feature-table join:\n${p.take(3000)}")
    assert(!p.contains("SortMergeJoin [_bucket"),
      "the gram stream must not sort-merge against the feature table")
    assert(!p.contains("CartesianProduct"))
  }

  test("split_assign is a pure narrow projection — zero exchanges") {
    val p = plan("split_assign")
    assert(!p.contains("Exchange"),
      s"split_assign must not shuffle:\n${p.take(2000)}")
  }

  test("dedup_incremental probes the index without cartesian products or text shuffles") {
    val p = plan("dedup_incremental")
    assert(!p.contains("CartesianProduct"))
    // candidate generation joins on the band-bucket struct / signature key /
    // ids; the raw text column must never be a shuffle key
    val keys = "hashpartitioning\\(([a-zA-Z_]+)".r.findAllMatchIn(p)
      .map(_.group(1)).toSet
    assert(!keys.contains("text"), s"text in shuffle keys $keys")
  }

  test("dedup_semantic pairs ids inside cells; vectors stay out of the cell shuffle") {
    val p = plan("dedup_semantic")
    assert(!p.contains("CartesianProduct"))
    // the cell self-join shuffles (id, cid, sub) triples only: some
    // exchange must key on the cell id, and no exchange may carry the
    // embedding array into the pair expansion
    assert(p.contains("hashpartitioning(cid"),
      s"expected the candidate self-join keyed on the cell id:\n${p.take(3000)}")
  }

  test("span_corrupt is a pure narrow map — zero exchanges") {
    val p = plan("span_corrupt")
    assert(!p.contains("Exchange"),
      s"span_corrupt must not shuffle:\n${p.take(2000)}")
  }

  test("text_bpe_encode shuffles nothing but the final digest rows") {
    val p = plan("text_bpe_encode")
    // the encode itself is a narrow broadcast-rank pass; no exchange may
    // appear below it (the only permissible shuffle would come from a
    // caller's downstream agg — the catalog query has none)
    assert(!p.contains("Exchange"),
      s"text_bpe_encode must not shuffle:\n${p.take(2000)}")
  }

  test("dedup_url aggregates on the canonical string with map-side partials") {
    val p = plan("dedup_url")
    assert(!p.contains("CartesianProduct"))
    // exchanges keyed on the canonical-url grouping expression (Spark
    // aliases a computed group key `_groupingexpression`); partial
    // aggregation must run before the exchange
    assert("hashpartitioning\\((canon_url|_groupingexpression)".r
      .findFirstIn(p).nonEmpty,
      s"expected the group-by keyed on the canonical url:\n${p.take(3000)}")
    assert(p.contains("partial_count") || p.contains("partial count"),
      "expected map-side partial aggregation")
  }

  test("asof_join is union + one keyed window — no range join, no cartesian") {
    val p = plan("asof_join")
    assert(!p.contains("CartesianProduct"))
    assert(!p.contains("SortMergeJoin") && !p.contains("BroadcastNestedLoopJoin"),
      s"asof must not plan as a join:\n${p.take(2000)}")
    assert(p.contains("hashpartitioning(user_id"),
      s"expected the window exchange keyed on user_id:\n${p.take(2000)}")
    assert(p.contains("Window"), "expected the ordered-window carry")
  }

  test("quality_nb never shuffles text — only word/doc keys") {
    val p = plan("quality_nb")
    assert(!p.contains("CartesianProduct"))
    val keys = "hashpartitioning\\(([a-zA-Z_]+)".r.findAllMatchIn(p)
      .map(_.group(1)).toSet
    assert(!keys.contains("text"), s"text in shuffle keys $keys")
    assert(keys.subsetOf(Set("word", "doc_id")),
      s"unexpected shuffle keys $keys")
  }

  test("topk_group runs on the custom heap operator: partial+final, one exchange, no sort") {
    val p = plan("topk_group")
    assert("GroupTopK \\[".r.findAllIn(p).size == 2,
      s"expected the partial+final GroupTopK pair:\n${p.take(2000)}")
    val exchanges = "Exchange hashpartitioning".r.findAllIn(p).length
    assert(exchanges == 1, s"topk_group shuffles $exchanges times:\n${p.take(2000)}")
    // the whole point vs the window spelling: no full-group sort, no Window
    assert(!p.contains("Window"), "heap plan must not fall back to a rank window")
    assert(!p.contains("Sort "), s"heap plan must not sort the input:\n${p.take(2000)}")
  }

  test("frequent_terms combines counts map-side and selects winners on the heap") {
    val p = plan("frequent_terms")
    assert(p.contains("partial_count"), s"word counts must combine map-side:\n${p.take(2000)}")
    assert("GroupTopK \\[".r.findAllIn(p).size == 2,
      s"winner selection must run on the heap operator:\n${p.take(2000)}")
    assert(!p.contains("Window"), "no rank window anywhere in the plan")
  }

  test("cluster_assign rolls up with one exchange on the cell id") {
    val p = plan("cluster_assign")
    assert(!p.contains("CartesianProduct"))
    assert(p.contains("hashpartitioning(cid"),
      s"expected the rollup keyed on cid:\n${p.take(3000)}")
    // the embedding array must not ride through the rollup exchange
    assert(!p.contains("hashpartitioning(nv") && !p.contains("hashpartitioning(embedding"),
      "vectors must not be shuffle keys")
  }
}
