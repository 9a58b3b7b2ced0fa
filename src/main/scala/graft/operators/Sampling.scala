package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Training-mix construction: deterministic stratified sampling and
  * sequence packing — the last-mile operators between a deduplicated corpus
  * and a training run.
  *
  * Both are designed around determinism (a re-run of the pipeline selects
  * the same documents — no `rand()`, whose per-task seeding also breaks
  * under retries/speculation) and shuffle economy (sampling is a narrow
  * filter; packing shuffles once on a bounded shard key).
  */
object Sampling {

  /** Deterministic per-id bucket in [0, 100): the first 4 hex digits of
    * `md5(id)` read as an integer, mod 100. Portable — any SQL engine with
    * `md5` reproduces it — and uniform enough for percentage sampling (the
    * 16-bit space is unbiased across 100 buckets to within 0.04%).
    */
  def hashBucket(id: Column): Column =
    conv(substring(md5(id.cast("string")), 1, 4), 16, 10).cast("long") % 100

  /** Keep each row iff its hash bucket falls below its stratum's percentage
    * — per-stratum downsampling for training-mix rebalancing (e.g. cap
    * boilerplate-heavy languages, upsample is the complement at a higher
    * rate). A stratum absent from `rates` keeps `defaultPct`%.
    *
    * Scale shape: one narrow codegen'd filter — no shuffle, no sampling
    * state, stable under partition count and task retries. The rate lookup
    * is a map literal (`element_at`), NOT a chain of `when(stratum === k)`
    * branches: the chain references `stratum` once per stratum, and when
    * the caller's stratum is an expensive derived expression (e.g. a
    * language id over word-list HOFs) projection collapse inlines a full
    * copy into every branch — observed 10x on the sampling query.
    */
  def stratifiedSample(df: DataFrame, idCol: String, stratum: Column,
                       rates: Map[String, Int], defaultPct: Int = 100): DataFrame = {
    val rateMap = map(rates.toSeq.flatMap { case (k, pct) =>
      Seq(lit(k), lit(pct))
    }: _*)
    // `_nd` is a collapse/pushdown barrier: without it the filter predicate
    // is pushed into the stratum projection and evaluates the (possibly
    // expensive, interpreted) stratum expression a second time per row,
    // outside whole-stage codegen
    val staged = df
      .withColumn("_stratum", stratum)
      .withColumn("_bucket", hashBucket(col(idCol)))
      .withColumn("_nd", monotonically_increasing_id())
    val rate = coalesce(element_at(rateMap, col("_stratum")), lit(defaultPct))
    staged.filter(col("_bucket") < rate)
      .drop("_stratum", "_bucket", "_nd")
  }

  /** Greedy contiguous sequence packing: within each shard, documents in id
    * order fill context windows of `budgetTokens`; a document starts a new
    * bin when the tokens before it have consumed the current one. Output
    * adds (shard, bin) — (shard, bin) is the packed-sequence key a training
    * loader concatenates.
    *
    * Bin-size contract — SPLIT-ACROSS-WINDOWS packing: a document whose
    * tokens cross the budget boundary stays in the bin it started in, so a
    * bin may exceed `budgetTokens` by up to its last document's tokens (and
    * dropping that last document always brings it strictly under budget —
    * asserted non-circularly in `LlmOpsSpec`). The loader is expected to
    * split the boundary document across adjacent context windows, the
    * standard packed-pretraining layout — token position `i` of a shard
    * maps to window `i / budgetTokens` with zero padding waste. The
    * alternative (next-fit: open a new bin whenever the document itself
    * does not fit) pads every bin and needs a sequential per-shard scan —
    * its running total resets at each bin, which no window aggregate
    * expresses.
    *
    * Sharding is the scale decision: a single global packing order is a
    * one-task sort at corpus scale, so documents first land in
    * `shards` deterministic shards (`id mod shards`) and pack independently
    * — packing is approximate by nature (any greedy order wastes at most
    * one document's tokens per bin), so shard-local packing trades nothing
    * measurable for full parallelism. One shuffle on the shard key; the
    * running sum is a single sorted window per shard partition.
    */
  def packSequences(df: DataFrame, idCol: String, tokens: Column,
                    budgetTokens: Int, shards: Int = 32): DataFrame = {
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("shard")).orderBy(col(idCol))
      .rowsBetween(org.apache.spark.sql.expressions.Window.unboundedPreceding, -1)
    df.withColumn("n_tokens", tokens)
      .withColumn("shard", pmod(col(idCol).cast("long"), lit(shards.toLong)))
      .withColumn("bin",
        floor(coalesce(sum(col("n_tokens")).over(w), lit(0L)) / budgetTokens))
  }

  /** Deterministic global corpus shuffle: assign every document a
    * pseudo-random shard and a dense position within it, so a training
    * loader reads shards in parallel and positions in order — a reproducible
    * shuffled epoch with no `rand()` (retry/speculation-stable, and a re-run
    * with the same seed yields byte-identical order). Changing `seed`
    * reshuffles everything.
    *
    * Shard membership comes from the first 16 bits of `md5(seed:id)` (mod
    * `shards` — portable, any engine with `md5` reproduces it); position is
    * a `row_number` over the shard ordered by the full hash, so within-shard
    * order is also hash-random, not id order. Output is the INDEX only —
    * `(id, shard, pos)` — never the payload: the one shuffle this plan
    * performs moves (id, 32-byte hash) pairs, and the loader either joins
    * content by id or writes content bucketed by shard. `shards` is the
    * parallelism knob: each shard's positions are sorted in a single task,
    * so size shards to ~the row count one task should sort (e.g. 10k shards
    * at 1e11 rows = 1e7 narrow rows per task); more shards = more parallel,
    * never less correct.
    */
  def shuffleShards(df: DataFrame, idCol: String, shards: Int,
                    seed: String = "0"): DataFrame = {
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("shard")).orderBy(col("_hx"), col(idCol))
    df.select(col(idCol),
        md5(concat_ws(":", lit(seed), col(idCol).cast("string"))).as("_hx"))
      .withColumn("shard",
        conv(substring(col("_hx"), 1, 4), 16, 10).cast("long") % shards)
      .withColumn("pos", row_number().over(w).cast("long") - 1L)
      .drop("_hx")
  }

  /** Temperature-scaled source-mixture weights (the UnifiedQA/"sampling
    * with temperature" recipe GPT-3, PaLM and the Pile all use): per
    * stratum, `weight ∝ n_tokens^alpha` normalized over strata — `alpha=1`
    * is proportional sampling, `alpha=0` uniform over sources, in between
    * upweights small high-quality sources. `target_tokens` is the per-epoch
    * token allocation out of `budgetTokens`.
    *
    * Scale shape: one map-side-combinable aggregation over the corpus (the
    * only full-data pass), then a broadcast of the one-row normalizer onto
    * the tiny per-stratum frame. `sqrt`-family powers are correctly-rounded
    * IEEE in any engine, so the weights are reproducible by an external
    * SQL oracle (to the 6-decimal rounding the output carries).
    */
  def mixtureWeights(df: DataFrame, stratumCol: String, tokens: Column,
                     alpha: Double, budgetTokens: Long): DataFrame = {
    val perStratum = df.groupBy(col(stratumCol))
      .agg(count(lit(1)).as("n_docs"), sum(tokens).cast("long").as("n_tokens"))
    // sqrt is correctly-rounded IEEE; JVM pow is only 1-ulp, so route the
    // common temperature through sqrt for bit-stable cross-engine weights
    val wRaw =
      if (alpha == 0.5) sqrt(col("n_tokens").cast("double"))
      else pow(col("n_tokens").cast("double"), lit(alpha))
    val z = perStratum.agg(sum(wRaw).as("_z"))
    perStratum.crossJoin(broadcast(z))
      .withColumn("weight", round(wRaw / col("_z"), 6))
      .withColumn("target_tokens",
        floor(lit(budgetTokens.toDouble) * wRaw / col("_z")).cast("long"))
      .drop("_z")
  }

  /** Deterministic train/validation/test assignment: every row gets a
    * split label from its [[hashBucket]] (md5 16-bit value mod 100), with
    * the first `splits` entry covering buckets `[0, pct)`, the next
    * `[pct, pct+pct2)`, and so on; rows past the last boundary get
    * `defaultSplit`. The holdout therefore has the same three properties
    * as [[stratifiedSample]]: reproducible across reruns/retries (no
    * `rand()`), stable under partition count, and portable (any engine
    * with `md5` can re-derive membership — an eval harness in another
    * stack selects the identical holdout). Because the bucket is a pure
    * function of the id, a document keeps its split for life: re-running
    * the pipeline over a grown corpus never leaks yesterday's training
    * docs into today's test set.
    *
    * Scale shape: one narrow codegen'd projection — no shuffle, no state.
    */
  def holdoutSplit(df: DataFrame, idCol: String,
                   splits: Seq[(String, Int)] = Seq("test" -> 1, "valid" -> 1),
                   defaultSplit: String = "train"): DataFrame = {
    require(splits.map(_._2).sum <= 100, "split percentages exceed 100")
    // bucket lands in its own projection so the when-chain branches
    // reference an attribute, not branch-count copies of the md5
    val uppers = splits.scanLeft(0) { case (acc, (_, pct)) => acc + pct }.tail
    val label = splits.zip(uppers).foldRight(lit(defaultSplit): Column) {
      case (((name, _), hi), rest) =>
        when(col("_bucket") < hi, lit(name)).otherwise(rest)
    }
    df.withColumn("_bucket", hashBucket(col(idCol)))
      .withColumn("split", label)
      .drop("_bucket")
  }

  /** Hashed-n-gram target-affinity weights — the data-selection shape of
    * DSIR (Xie et al. 2023, "Data Selection for Language Models via
    * Importance Resampling"): score every document by how much its hashed
    * n-gram feature distribution looks like a target domain's, then sample
    * the raw corpus by that weight. Word `n`-grams hash into `buckets`
    * feature buckets; `affinity` is the per-document mean bucket
    * likelihood ratio
    *
    *   (Σ_g countTarget[bucket(g)] / Σ_g countRaw[bucket(g)]) · (Nraw / Ntarget)
    *
    * — >1 means the document's features are over-represented in the target,
    * <1 under-represented. DSIR proper exponentiates per-gram log-ratios;
    * this keeps every aggregate an exact INTEGER sum (order-independent,
    * bit-stable across engines — the ratio and one final rounding are the
    * only floating-point steps), the same determinism stance as
    * [[graft.operators.TextAnalysis.corpusFamiliarity]]. The md5-hex bucket
    * is [[hashBucket]]'s, so any SQL engine replays it.
    *
    * `isTarget` marks the in-corpus target slice (a curated source, a
    * quality tier). A document with no words gets `n_grams = 0` and NULL
    * affinity — visible, not silently dropped.
    *
    * Scale shape: one narrow explode+hash pass; ONE map-side-combinable
    * aggregation builds the `buckets`-row feature table (tiny — it is
    * explicitly `broadcast` back onto the gram stream, so the corpus never
    * shuffles for the lookup); one doc-keyed map-side-combinable aggregate;
    * totals are a 1-row broadcast. The target slice needs no second pass —
    * its counts ride the same aggregation as a conditional sum.
    */
  def affinityWeights(docs: DataFrame, idCol: String, textCol: String,
                      isTarget: Column, buckets: Int = 1024,
                      n: Int = 2): DataFrame = {
    // split once below the Spread shuffle (the gram lambda reads a
    // materialized attribute, not a per-element re-split) and persist the
    // narrow (doc_id, tgt, bucket) frame — it feeds both the feature-table
    // aggregation and the per-doc scoring pass
    val grams = Spread(docs.select(col(idCol).as("doc_id"), isTarget.as("_tgt"),
        split(lower(col(textCol)), "\\s+").as("_ws")))
      .select(col("doc_id"), col("_tgt"),
        explode(TextAnalysis.ngramsOfWords(col("_ws"), n)).as("gram"))
      .select(col("doc_id"), col("_tgt"),
        (conv(substring(md5(col("gram")), 1, 4), 16, 10).cast("long")
          % buckets).as("_bucket"))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val featureTable = grams.groupBy("_bucket")
      .agg(count(lit(1)).as("_cr"),
        sum(when(col("_tgt"), 1L).otherwise(0L)).as("_ct"))
    val totals = featureTable.agg(sum(col("_cr")).as("_nr"), sum(col("_ct")).as("_nt"))
    val perDoc = grams.join(broadcast(featureTable), "_bucket")
      .groupBy("doc_id")
      .agg(count(lit(1)).as("n_grams"),
        sum(col("_ct")).as("_st"), sum(col("_cr")).as("_sr"))
    docs.select(col(idCol).as("doc_id"))
      .join(perDoc, Seq("doc_id"), "left")
      .crossJoin(broadcast(totals))
      .select(col("doc_id"),
        coalesce(col("n_grams"), lit(0L)).as("n_grams"),
        round(col("_st").cast("double") * col("_nr") /
          (col("_sr").cast("double") * col("_nt")), 6).as("affinity"))
  }

  /** T5/UL2-style span corruption (Raffel et al. 2020, §3.1.4 "BERT-style
    * denoising"): mask ~`maskPct`% of whitespace tokens, coalesce adjacent
    * masked tokens into spans, replace each span in the INPUT with one
    * `<extra_id_k>` sentinel and emit `<extra_id_k> tok…` runs as the
    * TARGET — the (inputs, targets) pre-tokenization shape a denoising
    * objective trains on.
    *
    * Determinism: the per-token mask decision is [[hashBucket]] of
    * `"id:pos"` — a pure function of (document id, token position), so
    * re-runs, retries, and any partitioning reproduce the same corruption
    * (`rand()` would not), and an external SQL engine replays it exactly.
    *
    * Scale shape: one narrow codegen'd map — split, per-position hash
    * flags, and a single left-to-right `aggregate` fold that builds both
    * strings and all counters in one pass. No shuffle, no state. The fold
    * re-allocates the accumulator string per step (fine at web-document
    * lengths); a book-length corpus would swap the fold for a custom
    * Expression with a StringBuilder — same plan shape otherwise.
    *
    * Output: (doc_id, n_tokens, n_masked, n_spans, input_digest,
    * target_digest) — digests are md5 of the space-joined streams (the
    * full strings are corpus-sized; callers wanting the text itself use
    * [[spanCorruptText]]).
    */
  def spanCorrupt(docs: DataFrame, idCol: String, textCol: String,
                  maskPct: Int = 15): DataFrame =
    spanCorruptText(docs, idCol, textCol, maskPct)
      .select(col("doc_id"), col("n_tokens"), col("n_masked"), col("n_spans"),
        md5(col("input_text")).as("input_digest"),
        md5(col("target_text")).as("target_digest"))

  /** [[spanCorrupt]] with the corrupted input/target TEXT columns kept.
    * Runs on the native [[graft.functions.SpanCorrupt]] kernel — one JVM
    * call per row; the HOF fold below ([[spanCorruptTextHof]]) computes
    * identical output five interpreted steps per token and is retained as
    * the in-test differential oracle (the minhashBandRows stance).
    */
  def spanCorruptText(docs: DataFrame, idCol: String, textCol: String,
                      maskPct: Int = 15): DataFrame =
    docs
      .select(col(idCol).cast("long").as("doc_id"),
        // null text ⇒ empty token list; the split materializes once (it is
        // non-cheap and referenced twice, so CollapseProject keeps the
        // projection boundary — the fingerprintFrame mechanism)
        filter(split(coalesce(col(textCol), lit("")), "\\s+"), w => w =!= "")
          .as("_ws"))
      .select(col("doc_id"), size(col("_ws")).cast("long").as("n_tokens"),
        graft.functions.SpanCorrupt.spanCorrupt(col("_ws"), col("doc_id"),
          maskPct).as("_st"))
      .select(col("doc_id"), col("n_tokens"),
        col("_st").getField("n_masked").as("n_masked"),
        col("_st").getField("n_spans").as("n_spans"),
        col("_st").getField("input").as("input_text"),
        col("_st").getField("target").as("target_text"))

  /** The portable single-fold formulation — the differential oracle for
    * the native kernel (identical output, interpreted per token).
    */
  private[graft] def spanCorruptTextHof(docs: DataFrame, idCol: String,
                                            textCol: String,
                                            maskPct: Int = 15): DataFrame = {
    val zipped = zip_with(
      col("_ws"),
      transform(col("_ws"), (_, i) =>
        hashBucket(concat(col("doc_id").cast("string"), lit(":"),
          i.cast("string"))) < maskPct),
      (w, m) => struct(w.as("w"), m.as("m")))
    val init = struct(lit("").as("inp"), lit("").as("tgt"),
      lit(0).as("k"), lit(false).as("prev"), lit(0).as("nm"))
    def stStruct(inp: Column, tgt: Column, k: Column, prev: Column,
                 nm: Column) =
      struct(inp.as("inp"), tgt.as("tgt"), k.as("k"), prev.as("prev"),
        nm.as("nm"))
    val folded = aggregate(zipped, init, (st, x) => {
      val w = x.getField("w")
      val m = x.getField("m")
      val inp = st.getField("inp")
      val tgt = st.getField("tgt")
      val k = st.getField("k")
      val prev = st.getField("prev")
      val nm = st.getField("nm")
      val sent = concat(lit("<extra_id_"), k.cast("string"), lit(">"))
      when(m && prev, // span continues: token goes to the target only
        stStruct(inp, concat(tgt, lit(" "), w), k, lit(true), nm + 1))
        .when(m, // span starts: sentinel k to both sides, then the token
          stStruct(concat(inp, lit(" "), sent),
            concat(tgt, lit(" "), sent, lit(" "), w),
            k + 1, lit(true), nm + 1))
        .otherwise( // kept token
          stStruct(concat(inp, lit(" "), w), tgt, k, lit(false), nm))
    })
    docs
      .select(col(idCol).as("doc_id"),
        // null text ⇒ empty token list (split(null) is a null ARRAY, which
        // would null the whole fold and size() would read -1)
        filter(split(coalesce(col(textCol), lit("")), "\\s+"), w => w =!= "")
          .as("_ws"))
      .withColumn("_st", folded)
      .select(col("doc_id"),
        size(col("_ws")).cast("long").as("n_tokens"),
        col("_st").getField("nm").cast("long").as("n_masked"),
        col("_st").getField("k").cast("long").as("n_spans"),
        ltrim(col("_st").getField("inp")).as("input_text"),
        ltrim(col("_st").getField("tgt")).as("target_text"))
  }

  /** Per-domain quota cap — the crawl-curation stage that keeps any one
    * site from dominating the corpus (the C4/RefinedWeb per-host cap):
    * at most `maxPerDomain` documents survive per domain, chosen by a
    * DETERMINISTIC seeded md5 id-hash order — reproducible across
    * reruns/retries and portable to any engine, never `rand()` (the
    * [[stratifiedSample]]/[[holdoutSplit]] stance). Changing `seed`
    * rotates which documents a crowded domain keeps; documents of
    * under-cap domains always survive.
    *
    * `domain` = lowercased `www.`-stripped host of the canonicalized URL
    * ([[graft.operators.TextAnalysis.canonicalizeUrl]]); schemeless/
    * relative URLs have no host and share the '' domain, capped together
    * (upstream frontier hygiene should have absolutized them).
    *
    * Scale shape: a narrow map derives (domain, hv), then selection runs
    * on the [[graft.plans.GroupTopK]] bounded heaps — partial per-map-task
    * heaps, so the one exchange carries ≤ domains × cap rows no matter
    * the corpus size (never a global sort, never a full row_number).
    *
    * Output: the surviving rows of `docs` plus `domain`.
    */
  /** Domain of a URL: lowercased, `www.`-stripped host of the
    * canonicalized form; '' when schemeless/relative. Shared by the batch
    * [[domainCap]] and the streaming sibling so both cap the SAME groups.
    */
  def urlDomain(url: Column): Column =
    regexp_extract(graft.operators.TextAnalysis.canonicalizeUrl(url),
      "^[a-z][a-z0-9+.\\-]*://([^/?#:]*)", 1)

  /** The seeded selection hash: md5 hex of `seed:id` — a STRING order, so
    * any engine (and the streaming sibling) re-derives the identical
    * survivor set.
    */
  def capHash(id: Column, seed: String): Column =
    md5(concat(lit(s"$seed:"), id.cast("string")))

  def domainCap(docs: DataFrame, idCol: String, urlCol: String,
                maxPerDomain: Int, seed: String = "cap0"): DataFrame = {
    require(maxPerDomain > 0, s"need maxPerDomain > 0, got $maxPerDomain")
    val withDomain = docs
      .withColumn("domain", urlDomain(col(urlCol)))
      .withColumn("_hv", capHash(col(idCol), seed))
    graft.plans.GroupTopK.topK(withDomain, Seq("domain"),
        Seq("_hv" -> true, idCol -> true), maxPerDomain)
      .drop("_hv")
  }

  /** Token-budget corpus selection: fill `budgetTokens` with the
    * BEST-scored documents — "give me the top ~15T tokens by quality" —
    * the final cut of a curation funnel after scoring.
    *
    * Semantics (deterministic, engine-replayable): take whole score
    * strata from the top down while they fit; the one stratum that
    * crosses the budget is filled partially, its documents admitted in
    * seeded-hash order ([[capHash]] — the [[domainCap]] stance: never
    * `rand()`, so retries/speculation/engines agree) with a running token
    * sum capped at the stratum's remaining budget. A document that would
    * overflow the remainder is skipped and admission stops (prefix
    * semantics). Equivalent to the greedy cut of the corpus ordered by
    * (score desc, hash, id) — computed WITHOUT that global sort:
    *
    *  1. ONE map-side-combinable histogram `groupBy(score) → sum(tokens)`
    *     (≤ |score domain| rows — scores must be integer-quantized, the
    *     [[graft.operators.Stats.histogramQuantiles]] contract);
    *  2. a window cumsum over the TINY histogram finds the threshold
    *     score and the crossing stratum's remaining budget;
    *  3. full strata = a broadcast-threshold narrow filter (no shuffle);
    *     the boundary stratum alone pays a per-document cumsum window —
    *     stratum-sized, never corpus-sized.
    *
    * All arithmetic is exact BIGINT. `scoreCol`/`tokensCol` must be
    * integral and non-negative.
    */
  def budgetSelect(docs: DataFrame, idCol: String, scoreCol: String,
                   tokensCol: String, budgetTokens: Long,
                   seed: String = "sel0"): DataFrame = {
    require(budgetTokens >= 0, s"need budgetTokens >= 0, got $budgetTokens")
    val w = org.apache.spark.sql.expressions.Window
    val base = docs
      .withColumn("_score", col(scoreCol).cast("long"))
      .withColumn("_tok", col(tokensCol).cast("long"))
    val hist = base.groupBy(col("_score")).agg(sum(col("_tok")).as("_stok"))
    // histogram-sized single-partition window (the histogramQuantiles
    // contract) — never the corpus
    val hw = w.orderBy(col("_score").desc)
      .rowsBetween(w.unboundedPreceding, w.currentRow)
    val cum = hist
      .withColumn("_cum", sum(col("_stok")).over(hw))
      .withColumn("_prev",
        coalesce(lag(col("_cum"), 1).over(w.orderBy(col("_score").desc)), lit(0L)))
    val fullMin = cum.filter(col("_cum") <= budgetTokens)
      .agg(min(col("_score")).as("_fm")) // null when even the top crosses
    val boundary = cum
      .filter(col("_prev") < budgetTokens && col("_cum") > budgetTokens)
      .select(col("_score").as("_bscore"),
        (lit(budgetTokens) - col("_prev")).as("_brem")) // 0 or 1 row
    val fullSel = base.crossJoin(broadcast(fullMin))
      .filter(col("_score") >= col("_fm")) // null _fm admits nothing
      .drop("_fm")
    val bw = w.partitionBy(col("_bscore"))
      .orderBy(col("_hv"), col(idCol))
      .rowsBetween(w.unboundedPreceding, w.currentRow)
    val bSel = base.join(broadcast(boundary), col("_score") === col("_bscore"))
      .withColumn("_hv", capHash(col(idCol), seed))
      .withColumn("_crun", sum(col("_tok")).over(bw))
      .filter(col("_crun") <= col("_brem"))
      .drop("_bscore", "_brem", "_hv", "_crun")
    fullSel.unionByName(bSel).drop("_score", "_tok")
  }

  /** Weighted sampling without replacement by PRIORITY SAMPLING
    * (Duffield–Lund–Thorup, "Priority sampling for estimation of arbitrary
    * subset sums", JACM 54(6), 2007): each row draws a uniform
    * `u = m / 2^48` from a seeded hash (never `rand()` — the
    * [[stratifiedSample]] determinism stance), gets priority `q = w / u`,
    * and the k largest priorities per group form the sample. The k+1-th
    * priority is the threshold τ; each sampled row's Horvitz–Thompson
    * weight estimate is `w_hat = max(w, τ)`, making `sum(w_hat)` over any
    * subset of the sample an (near-)unbiased estimate of that subset's true
    * weight sum — the property that lets a 15T-token corpus be audited
    * from a k-row sample per stratum.
    *
    * Integer-exact and engine-portable: `q = (w · 2^48) div m` in BIGINT
    * (exact for weights in [1, 16384]: w·2^48 ≤ 2^62), ties broken by
    * (m, id), so DuckDB replays the selection bit-for-bit and re-runs /
    * task retries / other engines pick the identical sample. The floored
    * τ quantizes the DLT estimator by < 1 weight unit per sampled row
    * (documented bias bound; exact comparisons would need rational keys).
    *
    * Scale shape: a narrow map derives (m, q), selection runs on the
    * [[graft.plans.GroupTopK]] bounded heaps — the one exchange carries
    * ≤ groups × (k+1) rows regardless of corpus size (no global sort, no
    * corpus-wide window). The final ranking/threshold window runs over the
    * survivor frame only.
    *
    * The survivor relation is a pure function of the row SET (top-(k+1) by
    * a per-row key) — mergeable like [[graft.operators.Sketches.kmvSurvivors]]:
    * persist [[wsSurvivors]], fold daily batches in with [[wsUpdate]],
    * finalize with [[wsSample]]; incremental == one-shot (test-locked).
    *
    * Null hygiene: null ids are excluded (no hash ⇒ no draw); a null or
    * out-of-range weight raises — silently dropping or clamping would skew
    * the estimator.
    */
  def weightedSample(df: DataFrame, idCol: String, groupCols: Seq[String],
                     weightCol: String, k: Int,
                     seed: String = "ws0"): DataFrame =
    wsSample(wsSurvivors(df, idCol, groupCols, weightCol, k, seed), idCol,
      groupCols, k)

  /** Max admissible weight: w · 2^48 must stay inside a signed 64-bit
    * priority (2^14 · 2^48 = 2^62). Rescale heavier weights upstream.
    */
  val maxSampleWeight: Long = 1L << 14

  /** The sample STATE: per group, the k+1 rows with the largest priorities,
    * as (group cols..., id, weight, mh, prio). Persistable, mergeable
    * ([[wsUpdate]]), engine-portable. k+1 rather than k so the threshold
    * τ — the k+1-th priority — survives merges.
    */
  def wsSurvivors(df: DataFrame, idCol: String, groupCols: Seq[String],
                  weightCol: String, k: Int,
                  seed: String = "ws0"): DataFrame = {
    require(k >= 1, s"need k >= 1, got $k")
    val wRaw = col(weightCol).cast("long")
    val wChecked = when(wRaw.between(1L, maxSampleWeight), wRaw)
      .otherwise(raise_error(concat(
        lit(s"weightedSample: weight must be in [1, $maxSampleWeight], got "),
        coalesce(wRaw.cast("string"), lit("null")))))
    val base = df
      .filter(col(idCol).isNotNull)
      .select((groupCols :+ idCol).map(col) :+ wChecked.as("weight"): _*)
      .withColumn("mh",
        conv(substring(md5(concat(lit(s"$seed:"), col(idCol).cast("string"))),
          1, 12), 16, 10).cast("long") + 1)
      .withColumn("prio", expr("(weight * 281474976710656) div mh"))
    graft.plans.GroupTopK.topK(base, groupCols,
      Seq("prio" -> false, "mh" -> true, idCol -> true), k + 1)
  }

  /** Fold a new batch into a persisted survivor relation: union, re-take
    * the k+1 largest priorities. A replayed id with an UNCHANGED weight
    * re-derives the identical (mh, prio) row and collapses; an id
    * re-delivered with a CHANGED weight (a re-crawled doc) derives a
    * second row for the same id, so the merge dedups per (group, id)
    * keeping the larger priority — at a fixed mh the priority is strictly
    * monotone in the weight, so the LARGER WEIGHT WINS, deterministically,
    * and a without-replacement sample can never hold one id twice.
    * (Refreshing weights DOWNWARD requires rebuilding the sample — the
    * survivor relation cannot un-see a larger draw.) Ids must be unique
    * within one batch frame.
    */
  def wsUpdate(survivors: DataFrame, batch: DataFrame, idCol: String,
               groupCols: Seq[String], weightCol: String, k: Int,
               seed: String = "ws0"): DataFrame = {
    val merged = survivors.unionByName(
      wsSurvivors(batch, idCol, groupCols, weightCol, k, seed))
    // survivor-frame-sized window (≤ 2 · groups · (k+1) rows), never the
    // corpus; rn=1 also collapses byte-identical re-delivery, so no
    // separate distinct() is needed
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy((groupCols :+ idCol).map(col): _*)
      .orderBy(col("prio").desc)
    val deduped = merged.withColumn("_r", row_number().over(w))
      .filter(col("_r") === 1).drop("_r")
    graft.plans.GroupTopK.topK(deduped, groupCols,
      Seq("prio" -> false, "mh" -> true, idCol -> true), k + 1)
  }

  /** Finalize: rows ranked 1..k are the sample; the k+1-th priority (when
    * the group had more than k rows) is τ and `w_hat = max(w, τ)`. Runs
    * entirely on the survivor frame — groups × (k+1) rows.
    */
  def wsSample(survivors: DataFrame, idCol: String, groupCols: Seq[String],
               k: Int): DataFrame = {
    val w = org.apache.spark.sql.expressions.Window
    val grp = w.partitionBy(groupCols.map(col): _*)
    val ord = grp.orderBy(col("prio").desc, col("mh").asc, col(idCol).asc)
    survivors
      .withColumn("_rn", row_number().over(ord))
      .withColumn("_tau", max(when(col("_rn") === k + 1, col("prio"))).over(grp))
      .filter(col("_rn") <= k)
      .withColumn("w_hat", greatest(col("weight"), coalesce(col("_tau"), lit(0L))))
      .drop("_rn", "_tau", "mh", "prio")
  }
}
