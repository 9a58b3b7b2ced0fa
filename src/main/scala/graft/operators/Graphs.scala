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
  * through an EAGER barrier: without it, K iterations compound into a 2^K
  * lineage and the driver re-plans the whole history each step. The
  * barrier is `localCheckpoint` by default (fast, blocks reclaimed by the
  * ContextCleaner as references drop — the clusterAssign persist-scope
  * stance) but NOT executor-loss-tolerant; a production run on a lossy
  * cluster passes `checkpointDir` to swap in reliable `checkpoint()`
  * against that fault-tolerant path. The one-row dangling aggregate rides
  * a broadcast crossJoin (the one-row-aggregate pattern), never a driver
  * collect.
  */
object Graphs {

  /** `edges` must expose BIGINT (src, dst) columns; self-loops and
    * duplicate edges are honored as given (dedup upstream if unwanted).
    * Nodes = distinct src ∪ dst. Returns (node, rank) with Σ rank ≈ scale.
    *
    * Knobs beyond the update rule:
    *  - `tol` > 0 enables convergence early-exit: iteration stops once
    *    max |Δrank| ≤ tol (integer compare in `scale` units, so the
    *    stopping rule is as engine-portable as the ranks; costs one extra
    *    map-side-combinable aggregate per iteration). The default 0 runs
    *    exactly `iters` passes — the oracle-replayed configuration.
    *  - `checkpointDir`: when set, per-iteration barriers use reliable
    *    `checkpoint()` into that directory (executor-loss-tolerant)
    *    instead of `localCheckpoint`.
    */
  def pageRank(edges: DataFrame, iters: Int, dampingPct: Int = 85,
               scale: Long = 1000000000L, tol: Long = 0L,
               checkpointDir: Option[String] = None): DataFrame =
    pageRankRun(edges, iters, dampingPct, scale, tol, checkpointDir)._1

  /** [[pageRank]] returning (ranks, iterations actually run) — the count
    * an operator logs/emits when the `tol` early-exit fires.
    */
  def pageRankRun(edges: DataFrame, iters: Int, dampingPct: Int = 85,
                  scale: Long = 1000000000L, tol: Long = 0L,
                  checkpointDir: Option[String] = None): (DataFrame, Int) = {
    require(iters >= 1 && iters <= 100, s"need 1 <= iters <= 100, got $iters")
    require(dampingPct >= 0 && dampingPct <= 100,
      s"need 0 <= dampingPct <= 100, got $dampingPct")
    require(tol >= 0L, s"need tol >= 0, got $tol")
    checkpointDir.foreach(edges.sparkSession.sparkContext.setCheckpointDir)
    def barrier(df: DataFrame): DataFrame =
      if (checkpointDir.isDefined) df.checkpoint() else df.localCheckpoint()
    val e = edges.select(col("src").cast("long").as("src"),
      col("dst").cast("long").as("dst"))
    // `_dang` (node has NO outlinks) is a static property — computed once
    // here and carried on the rank relation, so each iteration's dangling
    // mass is one filtered sum over the barriered ranks instead of a
    // per-iteration anti-join (r14: the anti-join re-paid two exchanges
    // per iteration for a set that never changes).
    val nodes = barrier(e.select(col("src").as("node"), lit(false).as("_dang"))
      .union(e.select(col("dst").as("node"), lit(true).as("_dang")))
      .groupBy(col("node")).agg(min(col("_dang")).as("_dang")))
    val n = math.max(nodes.count(), 1L)
    val init = scale / n
    val withDeg = barrier(
      e.join(e.groupBy(col("src")).agg(count(lit(1)).as("deg")), "src"))
    var ranks = barrier(nodes.select(col("node"), lit(init).as("rank"),
      col("_dang")))
    var it = 0
    var converged = false
    // r15 measured-and-reverted (recorded so the experiment is not re-run
    // below cluster scale): folding the dangling total into the contrib
    // aggregate — as NULL-dst union rows, then as static virtual
    // (dangling, NULL, deg=1) edges so `ranks` kept one consumer — with
    // the barrier moved onto the aggregate saved one aggregate + exchange
    // per iteration on paper but measured 2.9 -> 3.6-4.0 s at sf0.1 twice
    // (Scratch listener: 88 -> 96 jobs/run): the then-lazy `next` join
    // re-enters AQE planning inside every iteration's barrier job, and
    // each extra adaptive stage is one more driver round-trip. Re-test
    // only where the aggregate's exchange carries real bytes.
    while (it < iters && !converged) {
      val contrib = withDeg
        .join(ranks.select(col("node").as("src"), col("rank")), "src")
        .groupBy(col("dst").as("node"))
        .agg(sum(expr("rank div deg")).as("inflow"))
      val dangling = ranks.filter(col("_dang"))
        .agg(coalesce(sum(col("rank")), lit(0L)).as("_dang_sum"))
      val next = barrier(nodes
        .join(contrib, Seq("node"), "left")
        .crossJoin(broadcast(dangling))
        // BIGINT casts on every literal: ANSI mode overflows INT at
        // `(100-d) * init` once N is small enough that init > ~2e7
        .select(col("node"), expr(
          s"((cast(${100L - dampingPct} as bigint) * cast($init as bigint)) + " +
            s"cast($dampingPct as bigint) * (coalesce(inflow, cast(0 as bigint)) + " +
            s"_dang_sum div cast($n as bigint))) div 100").as("rank"),
          col("_dang")))
      if (tol > 0L) {
        // max |Δrank|: one join on the barriered relations + one aggregate;
        // both sides cover the same node set, so an inner join is total.
        // coalesce guards the empty-graph case — max over zero rows is a
        // single NULL row, which must read as converged (delta 0), not NPE.
        val delta = next.join(ranks.withColumnRenamed("rank", "_prev"), "node")
          .agg(coalesce(max(abs(col("rank") - col("_prev"))), lit(0L)).as("d"))
          .head().getLong(0)
        converged = delta <= tol
      }
      ranks = next
      it += 1
    }
    (ranks.select(col("node"), col("rank")), it)
  }

  /** HITS hubs & authorities (Kleinberg, "Authoritative sources in a
    * hyperlinked environment", JACM 46(5), 1999) — the second classic
    * link-structure signal: authorities are pages good hubs point TO,
    * hubs are pages pointing to good authorities. A crawl funnel reads
    * the authority side as a content-quality prior complementing
    * [[pageRank]]'s random-surfer model (directory/listing pages surface
    * as hubs, content pages as authorities).
    *
    * Integer fixed-point with L1 re-normalization each half-step:
    * {{{
    *   araw(n) = Σ_{s→n} hub(s);   auth(n) = araw(n)·scale div Σ araw
    *   hraw(n) = Σ_{n→d} auth(d);  hub(n)  = hraw(n)·scale div Σ hraw
    * }}}
    * Power iteration converges to the principal eigenvectors of AᵀA/AAᵀ
    * whatever norm rescales each step — L1 keeps every intermediate in
    * BIGINT (per-node araw ≤ Σ hub = scale, so araw·scale ≤ 10^18;
    * the totals stay inside BIGINT while scale·max-outdegree < 2^63)
    * and engine-replayable bit-for-bit (the [[pageRank]] stance: BIGINT
    * sums commute, so the output is hash-stable under any partitioning).
    * An edgeless graph (or one side empty) normalizes to all-zero scores
    * via the zero-total guard instead of dividing by zero.
    *
    * Scale shape: per iteration, two edge-relation joins + two
    * map-side-combinable sums + two one-row broadcast totals (the
    * crossJoin one-row-aggregate pattern); each half-step's RAW sum
    * relation passes the same eager barrier as [[pageRank]]
    * (`localCheckpoint`, or reliable `checkpoint()` when `checkpointDir`
    * is set) — barriering raw rather than the normalized output keeps the
    * total's broadcast branch from re-running the edge join. Score
    * relations stay sparse (absent node = 0) until one final densifying
    * join against the node set.
    *
    * Returns (node, hub, auth) over nodes = distinct src ∪ dst.
    */
  /** r15 measured-and-reverted (recorded so the experiment is not
    * re-run): fusing the L1 total into the half-step aggregate via
    * ROLLUP (grouping sets ((node),()) — one exchange instead of the
    * second two-stage total aggregate in the broadcast branch) read
    * slightly BETTER warm (interleaved Scratch reps, sf0.1 2.06-2.26 vs
    * 2.45; sf1 4.20-4.27 vs 4.33-4.43) but 15-25% WORSE in the driver's
    * cold bench shape (alternated ONLY-mode runs: old 2.51/2.34 s vs
    * rollup 3.11/2.70 s at sf0.1) — the Expand doubling plus the
    * grouping-path codegen lands on first execution, which is what the
    * bench measures. Same lesson as pageRank's dangling fold below:
    * at the small-scale cold floor, a saved exchange over a cached tiny
    * relation does not pay for extra first-execution machinery.
    */
  def hits(edges: DataFrame, iters: Int, scale: Long = 1000000000L,
           checkpointDir: Option[String] = None): DataFrame = {
    require(iters >= 1 && iters <= 100, s"need 1 <= iters <= 100, got $iters")
    require(scale >= 1L, s"need scale >= 1, got $scale")
    checkpointDir.foreach(edges.sparkSession.sparkContext.setCheckpointDir)
    def barrier(df: DataFrame): DataFrame =
      if (checkpointDir.isDefined) df.checkpoint() else df.localCheckpoint()
    val e = barrier(edges.select(col("src").cast("long").as("src"),
      col("dst").cast("long").as("dst")))
    val nodes = barrier(e.select(col("src").as("node"))
      .union(e.select(col("dst").as("node"))).distinct())
    val n = math.max(nodes.count(), 1L)
    val init = scale / n
    /** raw = Σ over `joinKey` edges of the counterpart score; then
      * L1-normalize to Σ ≈ scale (zero-total guard → all zeros).
      *
      * The score relations stay SPARSE through the iteration (r14): a node
      * absent from `scores` has score 0 and contributes nothing to any sum,
      * and a node absent from `raw` normalizes to 0 — so the per-half-step
      * `nodes` left-join (one exchange + join per half-step) is deferred to
      * the single densifying join at the very end. The barrier moved from
      * the normalized output onto `raw`: `raw` feeds BOTH the broadcast
      * total and the normalization, and without the barrier the two
      * branches each re-ran the edge join + sum; normalization itself is a
      * narrow projection the next half-step's job absorbs. Per-node values
      * are unchanged — Σ and `div` see the same integers.
      */
    def halfStep(scores: DataFrame, scoreCol: String, joinKey: String,
                 groupKey: String, outCol: String): DataFrame = {
      val raw = barrier(e
        .join(scores.withColumnRenamed("node", joinKey), joinKey)
        .groupBy(col(groupKey).as("node"))
        .agg(sum(col(scoreCol)).as("_raw")))
      val tot = raw.agg(coalesce(sum(col("_raw")), lit(0L)).as("_tot"))
      raw
        .crossJoin(broadcast(tot))
        .select(col("node"), expr(
          s"CASE WHEN _tot = 0 THEN cast(0 as bigint) " +
            s"ELSE (_raw * cast($scale as bigint))" +
            s" div _tot END").as(outCol))
    }
    var hubs = barrier(nodes.select(col("node"), lit(init).as("hub")))
    var auths = hubs.select(col("node"), lit(0L).as("auth"))
    var it = 0
    while (it < iters) {
      auths = halfStep(hubs, "hub", "src", "dst", "auth")
      hubs = halfStep(auths, "auth", "dst", "src", "hub")
      it += 1
    }
    // densify once: absent = zero score (identical to the per-step dense
    // left join the loop used to carry)
    nodes
      .join(hubs, Seq("node"), "left")
      .join(auths, Seq("node"), "left")
      .select(col("node"), coalesce(col("hub"), lit(0L)).as("hub"),
        coalesce(col("auth"), lit(0L)).as("auth"))
  }
}
