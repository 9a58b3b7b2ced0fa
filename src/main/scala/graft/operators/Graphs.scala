package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Link-graph algorithms for crawl curation — the quality/prioritization
  * signal a web-corpus funnel derives from structure rather than content
  * (PageRank per Brin & Page 1998; the link-based quality weighting used
  * over CommonCrawl-scale link graphs).
  *
  * INTEGER fixed-point throughout: ranks live as `scale`-denominated
  * BIGINTs and every step is integer multiply/divide, so the result is
  * (a) order-independent — BIGINT sums commute where double sums do not,
  * making the output hash-stable under any partitioning — and (b)
  * replayable bit-for-bit by an external SQL engine (the text_lm /
  * quantile_group stance). Division truncation loses a bounded trickle of
  * mass per iteration (< 1 unit per contributing edge at ppb scale) —
  * deterministic on both engines, irrelevant at ranking granularity.
  *
  * Per-iteration update (all integer, `div` = truncating division):
  *   inflow(n)  = Σ_{s→n} rank(s) div deg(s)
  *   rank'(n)   = ((100 - d)·(scale div N)
  *                 + d·(inflow(n) + dangling div N)) div 100
  * where `dangling` is the summed rank of nodes with no outlinks (their
  * mass redistributes uniformly, the standard correction).
  *
  * Scale shape: each iteration is one join of the rank relation against
  * the edge list plus one map-side-combinable sum — the canonical
  * distributed-PageRank plan. Every iteration's rank relation goes
  * through an EAGER `localCheckpoint`: without the barrier, K iterations
  * compound into a 2^K lineage and the driver re-plans the whole history
  * each step; checkpoint blocks from earlier iterations are reclaimed by
  * the ContextCleaner as their references drop, so nothing leaks across
  * calls (the clusterAssign persist-scope stance). localCheckpoint is not
  * executor-loss-tolerant — a production run on a lossy cluster should
  * set a reliable checkpoint dir and swap in `checkpoint()`. The one-row
  * dangling aggregate rides a broadcast crossJoin (the one-row-aggregate
  * pattern), never a driver collect.
  */
object Graphs {

  /** `edges` must expose BIGINT (src, dst) columns; self-loops and
    * duplicate edges are honored as given (dedup upstream if unwanted).
    * Nodes = distinct src ∪ dst. Returns (node, rank) with Σ rank ≈ scale.
    */
  def pageRank(edges: DataFrame, iters: Int, dampingPct: Int = 85,
               scale: Long = 1000000000L): DataFrame = {
    require(iters >= 1 && iters <= 100, s"need 1 <= iters <= 100, got $iters")
    require(dampingPct >= 0 && dampingPct <= 100,
      s"need 0 <= dampingPct <= 100, got $dampingPct")
    val e = edges.select(col("src").cast("long").as("src"),
      col("dst").cast("long").as("dst"))
    val nodes = e.select(col("src").as("node"))
      .union(e.select(col("dst").as("node"))).distinct()
      .localCheckpoint()
    val n = math.max(nodes.count(), 1L)
    val init = scale / n
    val withDeg = e.join(e.groupBy(col("src")).agg(count(lit(1)).as("deg")),
      "src").localCheckpoint()
    val degNodes = withDeg.select(col("src").as("node")).distinct()
      .localCheckpoint()
    var ranks = nodes.select(col("node"), lit(init).as("rank"))
      .localCheckpoint()
    (1 to iters).foreach { _ =>
      val contrib = withDeg
        .join(ranks.withColumnRenamed("node", "src"), "src")
        .groupBy(col("dst").as("node"))
        .agg(sum(expr("rank div deg")).as("inflow"))
      val dangling = ranks.join(degNodes, Seq("node"), "left_anti")
        .agg(coalesce(sum(col("rank")), lit(0L)).as("_dang"))
      ranks = nodes
        .join(contrib, Seq("node"), "left")
        .crossJoin(broadcast(dangling))
        // BIGINT casts on every literal: ANSI mode overflows INT at
        // `(100-d) * init` once N is small enough that init > ~2e7
        .select(col("node"), expr(
          s"((cast(${100L - dampingPct} as bigint) * cast($init as bigint)) + " +
            s"cast($dampingPct as bigint) * (coalesce(inflow, cast(0 as bigint)) + " +
            s"_dang div cast($n as bigint))) div 100").as("rank"))
        .localCheckpoint()
    }
    ranks
  }
}
