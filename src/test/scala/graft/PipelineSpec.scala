package graft

import graft.operators._
import org.apache.spark.sql.functions._

/** The README's pretraining curation funnel run END TO END on the sf
  * documents table — every stage a DataFrame in / DataFrame out, with the
  * cross-stage invariants asserted. Operator-level suites prove each piece
  * against its own oracle; this suite proves the pieces actually COMPOSE:
  * ids survive the joins, schemas line up, and the final packed corpus
  * honors the upstream decisions (no contaminated doc, no dropped
  * duplicate, no over-budget bin except the split-at-boundary contract).
  */
class PipelineSpec extends SparkSpec {

  private val sf = "/root/testdata/sf0.001"

  test("the pretraining curation funnel composes end to end") {
    import spark.implicits._
    val crawled = Tables.documents(spark, sf).cache()

    // ---- 0. URL-level dedup BEFORE any content work (needs no text):
    // synthesize a link per doc (unique raw URLs, canonical groups of
    // several) and keep one doc per canonical page
    val withUrl = crawled.withColumn("url", concat(
      lit("https://www."), col("source"), lit(".example.com/p"),
      (col("doc_id") % 50).cast("string"),
      lit("?utm_ref=u"), col("doc_id").cast("string")))
    val urlKeep = withUrl
      .groupBy(TextAnalysis.canonicalizeUrl(col("url")).as("_cu"))
      .agg(min(col("doc_id")).as("doc_id"))
    // localCheckpoint truncates lineage at the stage boundary — without it
    // every downstream self-join re-embeds the whole upstream plan tree and
    // the composed funnel's PLAN STRING alone outgrows the driver heap (a
    // real production lesson: checkpoint between major funnel stages)
    val docs = crawled.join(urlKeep.select("doc_id"), "doc_id")
      .localCheckpoint()
    val n0 = docs.count()
    assert(n0 == urlKeep.count(), "one survivor per canonical URL")
    assert(n0 <= crawled.count())

    // ---- 1. clean: PII scrub + quality scoring (pure narrow maps)
    val scrubbed = docs
      .withColumn("text", TextAnalysis.redactPii(col("text")))
      .cache()
    val lm = TextAnalysis.bigramLmScores(scrubbed, "doc_id", "text")
    val gopher = TextAnalysis.gopherFrame(scrubbed, "doc_id", "text")
    // the discriminative gate alongside the LM one: NB likelihood-ratio
    // weights trained on the reference slice (source = src0)
    val nb = QualityFilter.nbScores(scrubbed, "doc_id", "text",
      col("source") === "src0")
    val kept = scrubbed
      .join(lm.select(col("doc_id"), col("mean_cond_ppm")), "doc_id")
      .join(gopher.select(col("doc_id"), col("n_words"),
        col("frac_alpha_words")), "doc_id")
      .join(nb.select(col("doc_id"), col("quality_mean")), "doc_id")
      // permissive gates sized to the tiny synthetic corpus: real deploys
      // would use gopher_pass + an lm threshold calibrated on held-out data
      .filter(col("n_words") >= 10 && col("frac_alpha_words") >= 0.8 &&
        col("mean_cond_ppm").isNotNull && col("quality_mean").isNotNull)
      .cache()
    val n1 = kept.count()
    assert(n1 > 0 && n1 <= n0, s"quality gate: $n0 -> $n1")

    // ---- 1b. cross-document line boilerplate: the RefinedWeb stage
    // reports per-doc removals over the kept slice (the rewrite itself is
    // digested — corpus-sized); invariants: every doc keeps a row, and no
    // doc loses more lines than it has
    val lineStats = TextAnalysis.lineDedup(kept, "doc_id", "text", minDocs = 3)
    assert(lineStats.count() == n1, "line dedup keeps every document row")
    assert(lineStats.filter(col("n_removed") > col("n_lines")).count() == 0)

    // ---- 2. document-level dedup: pairs -> components -> canonical
    val pairs = TextDedup.minhashDuplicates(kept, "doc_id", "text",
      threshold = 0.5)
    val labels = Clusters.clusterLabels(kept, "doc_id", pairs, "id_a", "id_b")
    val canon = labels.filter(col("canonical") === 1)
      .select(col("doc_id")).join(kept, "doc_id").cache()
    val n2 = canon.count()
    assert(labels.count() == n1, "every kept doc gets a cluster label")
    val dupDropped = labels.filter(col("canonical") === 0).count()
    assert(n2 + dupDropped == n1, s"survivors $n2 + dropped $dupDropped != $n1")
    // every non-canonical doc's cluster head survives
    val orphans = labels.filter(col("canonical") === 0)
      .join(canon.select(col("doc_id").as("cluster_id")), Seq("cluster_id"),
        "left_anti").count()
    assert(orphans == 0, s"$orphans dropped docs lost their canonical head")

    // ---- 3. substring-level dedup: find cross-doc spans, cut them
    val spans = TextDedup.duplicateSpans(canon, "doc_id", "text", n = 8)
    val cut = TextDedup.cutSpans(canon, spans, "doc_id", "text").cache()
    assert(cut.count() == n2, "cutSpans keeps every document (even emptied ones)")
    val grew = cut.join(canon, "doc_id")
      .filter(size(split(lower(col("text")), "\\s+")) < col("n_words_kept"))
      .count()
    assert(grew == 0, "cutting never adds words")

    // ---- 4. decontaminate against an eval slice
    val eval = docs.filter(col("doc_id") % 20 === 0)
      .select(col("doc_id").as("eval_id"), col("text"))
    val dirty = TextDedup.contaminatedPairs(cut, "doc_id", "clean_text",
        eval, "eval_id", "text")
      .select(col("doc_id")).distinct()
    val corpus = cut.join(dirty, Seq("doc_id"), "left_anti").cache()
    val n4 = corpus.count()
    assert(n4 <= n2)
    // the final corpus shares NO 5-gram with the eval slice — recheck
    assert(TextDedup.contaminatedPairs(corpus, "doc_id", "clean_text",
      eval, "eval_id", "text").count() == 0,
      "contamination survived the anti-join")

    // ---- 5. select + split + mix + shuffle + pack
    val weighted = Sampling.affinityWeights(corpus, "doc_id", "clean_text",
      isTarget = col("doc_id") % 7 === 0)
    assert(weighted.count() == n4, "every doc gets an affinity weight")
    val splitLabels = Sampling.holdoutSplit(corpus, "doc_id",
      Seq("test" -> 5, "valid" -> 5))
    assert(splitLabels.groupBy("split").count().count() <= 3)
    val trainIds = splitLabels.filter(col("split") === "train").select("doc_id")
    val train = corpus.join(trainIds, "doc_id")
      .withColumn("lang", TextAnalysis.langId(col("clean_text"))).cache()
    val sampled = Sampling.stratifiedSample(train, "doc_id", col("lang"),
      rates = Map.empty[String, Int], defaultPct = 80).cache()
    val nS = sampled.count()
    assert(nS <= train.count() && nS > 0)
    val order = Sampling.shuffleShards(sampled.select("doc_id"), "doc_id",
      shards = 8, seed = "ep0")
    assert(order.count() == nS, "the shuffle is a permutation (no loss)")
    assert(order.select("doc_id").distinct().count() == nS)
    // pack by REAL tokenizer counts: BPE trains on the train slice and
    // its token counts (not the whitespace heuristic) drive the bins
    val bpe = Bpe.train(train, "clean_text", numMerges = 40)
    val bpeStats = Bpe.tokenStats(sampled, "doc_id", "clean_text", bpe)
    assert(bpeStats.count() == nS, "every sampled doc gets a BPE count")
    val packed = Sampling.packSequences(
      sampled.join(bpeStats.select(col("doc_id"), col("n_tokens").as("_bt")), "doc_id"),
      "doc_id", col("_bt"), budgetTokens = 256)
    assert(packed.count() == nS, "packing bins every sampled doc")
    // topic tags ride along: every surviving doc gets <= 3 ranked keywords
    val kw = TextAnalysis.tfidfKeywords(corpus, "doc_id", "clean_text", k = 3)
    assert(kw.groupBy("doc_id").count().filter(col("count") > 3).count() == 0)
    assert(kw.filter(col("rank") < 1 || col("rank") > 3).count() == 0)
    // bin contract: a bin overflows only by its boundary document (the
    // loader splits it); the tokens BEFORE each doc fit the budget
    val overflow = packed
      .withColumn("_before", col("bin") * 256) // bins are full budgets
      .filter(col("n_tokens") > 256 * 2)       // sanity ceiling only
      .count()
    assert(overflow == 0, "no doc wildly exceeds the window budget")

    // ---- 6. training-objective prep: deterministic span corruption over
    // the packed slice — every doc yields an (input, target) pair whose
    // token accounting closes (masked tokens all land in targets)
    val denoise = Sampling.spanCorruptText(
      sampled.select(col("doc_id"), col("clean_text")),
      "doc_id", "clean_text", maskPct = 15).cache()
    assert(denoise.count() == nS, "every sampled doc gets a denoising pair")
    assert(denoise.filter(col("n_masked") > col("n_tokens")).count() == 0)
    assert(denoise.filter(col("n_spans") > col("n_masked")).count() == 0)
    // sentinel accounting: input sentinels == target sentinels == n_spans
    val badSentinels = denoise.filter(
      size(split(col("input_text"), "<extra_id_", -1)) - 1 =!= col("n_spans") ||
        size(split(col("target_text"), "<extra_id_", -1)) - 1 =!= col("n_spans"))
      .count()
    assert(badSentinels == 0, "sentinel counts close on both sides")

    // the funnel is monotone and loses nothing silently
    assert(n0 >= n1 && n1 >= n2 && n2 >= n4 && n4 >= nS)
  }
}
