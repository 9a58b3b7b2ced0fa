package graft.queries

import graft.Tables
import graft.operators.{Clusters, MediaOps, ProductQuantization, Sampling, TextAnalysis, TextDedup, VectorOps}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Training-data-pipeline verification queries over `documents` and
  * `embeddings` — near-dup detection, similarity search, text analysis,
  * multimodal plumbing. Oracles re-derive the semantics in DuckDB with
  * engine-portable primitives (md5, explicit list arithmetic); hash-based
  * stages (xxhash64 MinHash, LSH buckets) are oracle-checked through their
  * *verified outputs* (exact jaccard / exact cosine on candidates), which
  * coincide with brute force when candidate recall is 1 — recall itself is
  * asserted in the ScalaTest suites.
  */
object LlmQueries {

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    // MinHash + LSH banding, verified by exact 3-gram jaccard >= 0.5.
    // Bounded oracle fixture (r13 verdict item 3): the row reads docs
    // 0..499 — the WHOLE corpus at sf <= 0.01 (hashes unchanged there) and
    // a fixed 500-doc slice above, so the DuckDB replay (a brute-force
    // O(n^2) gram-intersect join) fits any per-query budget at every
    // scale instead of deferring at sf >= 0.1. Engine-side scale evidence
    // for the uncapped operator is VolumeBench "dedup" + the sf1 ladder.
    "dedup_minhash" -> { (s, d) =>
      TextDedup.minhashDuplicates(
        Tables.documents(s, d).filter(col("doc_id") < oracleDocCap),
        "doc_id", "text")
    },

    // Exact 4-gram jaccard via prefix filtering (recall 1 by construction;
    // the probabilistic LSH counterpart is dedup_minhash). Same bounded
    // oracle fixture as dedup_minhash.
    "dedup_ngram" -> { (s, d) =>
      TextDedup.ngramJaccardDuplicates(
        Tables.documents(s, d).filter(col("doc_id") < oracleDocCap),
        "doc_id", "text")
    },

    // SimHash 64-bit near-dup (chunk-bucketed candidates, exact hamming).
    // Word-hash bits derive from md5 hex digits, so the oracle re-derives
    // the identical signatures in DuckDB. bucketCap lifted out of range
    // like dedup_embed's: at sf0.1 a dense 16-bit chunk value crossed the
    // default cap of 200 and routed 9 pairs to the exact-signature
    // fallback the plain-equality oracle doesn't model (caught by the r9
    // sf0.1 oracle run); the cap semantics stay verified by the
    // forced-low-cap hot variants and LlmOpsSpec's planted hot bucket.
    "dedup_simhash" -> { (s, d) =>
      TextDedup.simhashDuplicates(Tables.documents(s, d), "doc_id", "text",
        bucketCap = 1 << 20)
    },

    // Embedding near-dup pairs above cosine 0.45 via LSH buckets.
    // bucketCap is lifted out of range here so the oracle can replay the
    // light banding path EXACTLY at any scale (at sf0.1 the default cap of
    // 200 started firing on the densest buckets — caught by the r9 sf0.1
    // oracle run as a 1-pair divergence vs the old brute-force oracle).
    // The census-cap fallback semantics are oracle-checked separately by
    // the forced-low-cap dedup_minhash_hot / dedup_semantic_hot variants.
    "dedup_embed" -> { (s, d) =>
      VectorOps.embeddingDuplicates(Tables.embeddings(s, d), "vec_id",
        "embedding", threshold = 0.45, bucketCap = 1 << 20)
    },

    // Incremental embedding dedup (the daily-crawl shape for vectors):
    // the corpus (vec_id % 10 != 0) is indexed ONCE, the arriving batch
    // (every 10th vector) probes it; verification reads the STORED corpus
    // vectors. Cap lifted like dedup_embed's so the oracle replays the
    // light path exactly.
    "dedup_embed_incremental" -> { (s, d) =>
      val e = Tables.embeddings(s, d)
      val idx = VectorOps.embeddingIndex(
        e.filter(col("vec_id") % 10 =!= 0), "vec_id", "embedding")
      VectorOps.embeddingDuplicatesAgainst(
        e.filter(col("vec_id") % 10 === 0), "vec_id", "embedding", idx,
        threshold = 0.45, bucketCap = 1 << 20)
    },

    // Exact cosine top-5 for a fixed query set (every 50th vector).
    "ann_topk" -> { (s, d) =>
      val e = Tables.embeddings(s, d)
      val q = e.filter(col("vec_id") % 50 === 0)
      VectorOps.bruteForceTopK(q, "vec_id", "embedding", e, "vec_id",
        "embedding", k = 5)
    },

    // LSH-bucketed approximate top-5 over the same queries. The oracle
    // replays the exact bucket computation: the deterministic hyperplanes
    // embed in the SQL as a literal DOUBLE[] and the sign-dots re-derive
    // the same buckets. Recall >= 0.9 vs brute force is asserted in
    // LlmOpsSpec besides.
    "ann_lsh" -> { (s, d) =>
      val e = Tables.embeddings(s, d)
      val q = e.filter(col("vec_id") % 50 === 0)
      VectorOps.lshTopK(q, "vec_id", "embedding", e, "vec_id", "embedding",
        k = 5)
    },

    // IVF approximate top-5: deterministic coarse centroids (every
    // stride-th vector, stride = max(25, ceil(sqrt(N)), N/cap) — ~sqrt(N)
    // centroids), nprobe nearest lists scanned with exact cosine.
    "ann_ivf" -> { (s, d) =>
      val e = Tables.embeddings(s, d)
      val q = e.filter(col("vec_id") % 50 === 0)
      VectorOps.ivfTopK(q, "vec_id", "embedding", e, "vec_id", "embedding",
        k = 5, minStride = 25, nprobe = 4)
    },

    // Product-quantization approximate top-5: the memory-compression path
    // (m=8 one-byte codes + a norm per vector instead of 64 floats).
    // Deterministic stride-sampled codebook, ADC candidate scan rounded to
    // 6 before the cut (so the candidate set is engine-stable), exact
    // rerank of the k*refine survivors — fully replayed by the oracle.
    "ann_pq" -> { (s, d) =>
      val e = Tables.embeddings(s, d)
      val q = e.filter(col("vec_id") % 50 === 0)
      val idx = ProductQuantization.pqIndex(e, "vec_id", "embedding",
        m = 8, ksub = 64, dim = 64)
      ProductQuantization.pqTopK(q, "vec_id", "embedding", idx, k = 5, refine = 8)
    },

    // IVF + PQ composed — the production ANN shape: nprobe inverted
    // lists bound the scanned fraction, PQ codes bound the bytes per
    // scanned row; exact rerank of the k*refine survivors. Oracle replays
    // both prunings end to end.
    // Bounded oracle fixture (r13 verdict item 3): vec_id < 500 is the
    // whole table at sf <= 0.01 (hashes unchanged) and a fixed 500-vector
    // slice above — the composed two-pruning CTE replay was ~30 CPU-min at
    // sf0.1's 2000 vectors and deferred; it now fits every budget.
    "ann_ivf_pq" -> { (s, d) =>
      val e = Tables.embeddings(s, d).filter(col("vec_id") < oracleDocCap)
      val q = e.filter(col("vec_id") % 50 === 0)
      val idx = ProductQuantization.pqIndex(e, "vec_id", "embedding",
        m = 8, ksub = 64, dim = 64)
      ProductQuantization.ivfPqTopK(q, "vec_id", "embedding", idx,
        k = 5, minStride = 25, nprobe = 4, refine = 8)
    },

    // Corpus cartography: per-cell rollup of the IVF/SemDedup Voronoi
    // cells — the map a cluster-level curation pass (SemDedup, DsDm)
    // reads before pruning or rebalancing. One broadcast-matrix narrow
    // assignment + one map-side-combinable aggregate; per-row norms enter
    // as floor(x*1e6) integers so the cell sums are bit-exact.
    "cluster_assign" -> { (s, d) =>
      VectorOps.clusterAssign(Tables.embeddings(s, d), "vec_id", "embedding",
        minStride = 25)
    },

    // Language id + quality features per document.
    "text_quality" -> { (s, d) =>
      val feats = TextAnalysis.qualityFeatures(col("text"))
      Tables.documents(s, d).select(
        col("doc_id") +: TextAnalysis.langId(col("text")).as("lang_id") +:
          feats.map { case (n, c) => c.as(n) }: _*)
    },

    // Token counts: whitespace + BPE-ish subword runs.
    "text_tokens" -> { (s, d) =>
      Tables.documents(s, d).select(col("doc_id"),
        TextAnalysis.wsTokens(col("text")).as("ws_tokens"),
        TextAnalysis.subwordTokens(col("text")).as("sub_tokens"))
    },

    // Winnowing-style md5 fingerprint; grouping by it finds boilerplate.
    // Narrow map with the split pinned behind a collapse barrier.
    "text_fingerprint" -> { (s, d) =>
      TextAnalysis.fingerprintFrame(Tables.documents(s, d), "doc_id", "text")
    },

    // Multimodal plumbing: binary payload + metadata -> batched feature
    // extraction (decode stubbed deterministically). Features emitted as a
    // CSV string: the driver's pandas compare cannot hash array columns.
    "media_features" -> { (s, d) =>
      MediaOps.decodeFeaturesBatched(
          MediaOps.asMedia(Tables.documents(s, d), "doc_id", "text"))
        .withColumn("features",
          concat_ws(",", col("features").cast("array<string>")))
    },

    // Multimodal frame sampling: each payload fans out into its 250ms
    // frames — timestamps, byte-slice digests, frame counts — as a
    // zero-exchange narrow map (the video/audio keyframe-extraction
    // plumbing; slicing is byte-true, duration is the stub contract).
    "media_frames" -> { (s, d) =>
      MediaOps.sampleFrames(
          MediaOps.asMedia(Tables.documents(s, d), "doc_id", "text"),
          everyMs = 250, frameBytes = 16)
        .select(col("media_id"), col("frame_idx"), col("ts_ms"),
          col("frame_digest"), col("n_frames"))
    },

    // Multimodal resize: every payload decimated to <= 64 bytes by byte
    // stride (the resample stub), metadata updated, digest of the resized
    // content hash-compared — zero-exchange narrow map, output bound hard
    // for any payload size.
    "media_resize" -> { (s, d) =>
      MediaOps.resizePayload(
        MediaOps.asMedia(Tables.documents(s, d), "doc_id", "text"),
        targetBytes = 64)
    },

    // Duplicate clusters: connected components (large-star/small-star) over
    // the exact n-gram jaccard pairs; every document labeled with its
    // component min + a canonical (survivor) flag.
    // Bounded oracle fixture (r13 verdict item 3): the recursive-CTE
    // connected-components replay is super-linear in edges; docs 0..499
    // keeps it inside any budget at every scale (no-op at sf <= 0.01).
    "dedup_cluster" -> { (s, d) =>
      val docs = Tables.documents(s, d).filter(col("doc_id") < oracleDocCap)
      val pairs = TextDedup.ngramJaccardDuplicates(docs, "doc_id", "text")
      Clusters.clusterLabels(docs, "doc_id", pairs, "id_a", "id_b")
    },

    // Deterministic stratified sampling for training-mix rebalancing:
    // md5-bucket per doc, per-language keep percentages (cap English at
    // 10%, keep 40% of the rest).
    "sample_stratified" -> { (s, d) =>
      val docs = Tables.documents(s, d)
        .select(col("doc_id"), TextAnalysis.langId(col("text")).as("lang_id"))
      Sampling.stratifiedSample(docs, "doc_id", col("lang_id"),
        rates = Map("en" -> 10, "es" -> 40, "de" -> 40, "fr" -> 40, "zh" -> 40))
    },

    // Per-domain quota cap (the C4/RefinedWeb per-host cap): plants a URL
    // per document — two absolute hosts with case/www/default-port noise
    // the canonicalizer must collapse, plus a RELATIVE third that lands in
    // the '' domain — and keeps at most 7 docs per domain by the seeded
    // md5 order. Survivor identity is the hash lock: a wrong canon/host/
    // order anywhere rotates the kept set.
    "sample_domain_cap" -> { (s, d) =>
      val id = col("doc_id")
      val url = when(id % 3 === 0,
          concat(lit("https://WWW.AlphaNews.com:443/a/"), id.cast("string")))
        .when(id % 3 === 1,
          concat(lit("http://beta-site.ORG/p?utm_x=1&b="), id.cast("string")))
        .otherwise(concat(lit("/relative/"), id.cast("string")))
      Sampling.domainCap(
          Tables.documents(s, d).select(id, url.as("url")),
          "doc_id", "url", maxPerDomain = 7)
        .select(col("doc_id"), col("domain"))
    },

    // Fuzzy near-dup via blocked edit distance (the record-linkage shape):
    // titles derive from the corpus plus two planted typo families — one
    // edited at the END (caught by the prefix block) and one edited at the
    // FRONT (caught by the suffix block) — verified by banded levenshtein.
    // Cap lifted out of range so the oracle replays the light blocking
    // path exactly at any scale (the dedup_embed stance; cap semantics are
    // spec-locked with planted hot blocks in FuzzyDedupSpec).
    // Fixture-sizing note (the dedup_minhash_hot lesson): every planted
    // title carries its gid at BOTH ends, so a family member shares a
    // 32-char affix block ONLY with its own typo partner — block sizes and
    // pair output stay O(corpus/17) at every scale, never quadratic in the
    // family count.
    "dedup_fuzzy" -> { (s, d) =>
      val id = col("doc_id")
      val gid = expr("doc_id div 17").cast("string")
      val title = when(id % 17 === 5, concat(lit("doc "), gid,
          lit(" alpha beta gamma delta epsilon zeta eta theta headline "), gid))
        .when(id % 17 === 6, concat(lit("doc "), gid,
          lit(" alpha beta gamma delta epsilon zeta eta theta headlines "), gid))
        .when(id % 17 === 11, concat(lit("story "), gid,
          lit(" front page alpha omega psi chi phi tau sigma rho "), gid))
        .when(id % 17 === 12, concat(lit("story "), gid,
          lit(" fromt page alpha omega psi chi phi tau sigma rho "), gid))
        .otherwise(substring(col("text"), 1, 120))
      TextDedup.fuzzyDuplicates(
        Tables.documents(s, d).select(id, title.as("title")),
        "doc_id", "title", maxDist = 8, bucketCap = 1 << 20)
    },

    // Weighted sampling without replacement (priority sampling,
    // Duffield–Lund–Thorup 2007): k=25 docs per language, weight = clamped
    // n_chars, priorities integer-exact so survivor identity AND the
    // Horvitz–Thompson w_hat estimator are the hash lock.
    "sample_weighted" -> { (s, d) =>
      val docs = Tables.documents(s, d).select(col("doc_id"), col("lang"),
        greatest(least(col("n_chars"), lit(16384L)), lit(1L)).as("w"))
      Sampling.weightedSample(docs, "doc_id", Seq("lang"), "w", k = 25)
        .select(col("doc_id"), col("lang"), col("weight"), col("w_hat"))
    },

    // T5-style span corruption: deterministic hash-masked spans,
    // <extra_id_k> sentinels, (input, target) digests — the denoising
    // objective's data prep as one narrow fold. 15% token mask rate.
    "span_corrupt" -> { (s, d) =>
      Sampling.spanCorrupt(Tables.documents(s, d), "doc_id", "text",
        maskPct = 15)
    },

    // Greedy shard-parallel sequence packing into 2048-token bins.
    "pack_sequences" -> { (s, d) =>
      Sampling.packSequences(
          Tables.documents(s, d)
            .select(col("doc_id"), TextAnalysis.wsTokens(col("text")).as("_nt")),
          "doc_id", col("_nt"), budgetTokens = 2048, shards = 32)
        .select(col("doc_id"), col("n_tokens").cast("long").as("n_tokens"),
          col("shard"), col("bin"))
    },

    // Benchmark decontamination: every 20th document plays the eval set;
    // the rest is the training corpus. 5-gram overlap, broadcast eval side.
    "decontaminate" -> { (s, d) =>
      val docs = Tables.documents(s, d)
      TextDedup.contaminatedPairs(
        docs.filter(col("doc_id") % 20 =!= 0), "doc_id", "text",
        docs.filter(col("doc_id") % 20 === 0), "doc_id", "text",
        shingleK = 5)
    },

    // Unigram-LM-shaped familiarity: mean corpus word probability + hapax
    // occurrences per document, exact integer arithmetic throughout.
    "text_rarity" -> { (s, d) =>
      TextAnalysis.corpusFamiliarity(Tables.documents(s, d), "doc_id", "text")
    },

    // Bigram-LM quality score (integer-quantized conditional probability):
    // the corpus is its own language model; low scores flag improbable
    // word transitions. Exact integer sums => bit-stable hash.
    "text_lm" -> { (s, d) =>
      TextAnalysis.bigramLmScores(Tables.documents(s, d), "doc_id", "text")
    },

    // CCNet's signature move on top of the LM score: per-LANGUAGE tercile
    // buckets (head/middle/tail) via the exact histogram percentiles —
    // the cut relation is ~5 rows, broadcast back onto the scored corpus.
    // No-bigram docs (score NULL) land in tail, the discard bucket.
    "text_ccnet_buckets" -> { (s, d) =>
      val docs = Tables.documents(s, d)
      // consumed twice (tercile cuts AND the final bucket join) — persist
      // or the corpus LM trains twice
      val scored = docs.select(col("doc_id"), col("lang"))
        .join(TextAnalysis.bigramLmScores(docs, "doc_id", "text")
          .select(col("doc_id"), col("mean_cond_ppm")), "doc_id")
        .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
      // eager fill: the tercile-cut broadcast branch and the final bucket
      // join race this cache under AQE, each re-training the corpus LM
      scored.count()
      val cuts = graft.operators.Stats.histogramQuantiles(
          scored.filter(col("mean_cond_ppm").isNotNull),
          Seq("lang"), "mean_cond_ppm", pcts = Seq(33, 66))
        .select(col("lang"), col("p33"), col("p66"))
      scored.join(broadcast(cuts), Seq("lang"), "left")
        .select(col("doc_id"), col("lang"), col("mean_cond_ppm"),
          when(col("mean_cond_ppm").isNull, "tail")
            .when(col("mean_cond_ppm") <= col("p33"), "tail")
            .when(col("mean_cond_ppm") <= col("p66"), "middle")
            .otherwise("head").as("bucket"))
    },

    // The discriminative quality filter (fastText-recipe shape): NB-style
    // per-word likelihood-ratio weights trained "reference slice vs rest"
    // (source = src0 plays the reference), integer-exact ppm arithmetic,
    // tf-weighted document scores. Complements text_lm_cross (the LM
    // flavour of the same CCNet filtering step).
    "quality_nb" -> { (s, d) =>
      graft.operators.QualityFilter.nbScores(
        Tables.documents(s, d), "doc_id", "text", col("source") === "src0")
    },

    // The CCNet shape proper: the model trains on a reference slice
    // (source = src0, ~5% of the corpus) and scores EVERYONE — full
    // Laplace with out-of-vocabulary transitions, still integer-exact.
    "text_lm_cross" -> { (s, d) =>
      val docs = Tables.documents(s, d)
      val model = TextAnalysis.bigramModel(
        docs.filter(col("source") === "src0"), "doc_id", "text")
      TextAnalysis.bigramLmScoresWith(docs, "doc_id", "text", model)
    },

    // Reproducible global corpus shuffle: every document gets a
    // pseudo-random shard and a dense in-shard position (the index a
    // training loader reads); id-only input by design.
    "shuffle_shards" -> { (s, d) =>
      Sampling.shuffleShards(Tables.documents(s, d).select("doc_id"),
        "doc_id", shards = 16, seed = "42")
    },

    // Temperature-scaled source-mixture weights (alpha=0.5) with a
    // 10M-token per-epoch allocation.
    "mix_weights" -> { (s, d) =>
      Sampling.mixtureWeights(
        Tables.documents(s, d).select(col("source"),
          TextAnalysis.wsTokens(col("text")).as("_nt")),
        "source", col("_nt"), alpha = 0.5, budgetTokens = 10000000L)
    },

    // SemDedup-style cluster-scoped pruning: one row per prunable vector
    // with its in-cluster keeper.
    "dedup_semantic" -> { (s, d) =>
      VectorOps.semanticDuplicates(Tables.embeddings(s, d), "vec_id",
        "embedding", threshold = 0.4)
    },

    // Exact duplicate-substring spans (ExactSubstr, Lee et al. 2022):
    // maximal word ranges whose every 8-word window appears in >= 2
    // distinct documents — the planted near-dup pairs light up as long
    // shared spans.
    "dedup_substring" -> { (s, d) =>
      TextDedup.duplicateSpans(Tables.documents(s, d), "doc_id", "text",
        n = 8, minDocs = 2)
    },

    // DSIR-shaped hashed-bigram affinity against an in-corpus target slice
    // (source src0 plays the curated domain).
    "affinity_weights" -> { (s, d) =>
      Sampling.affinityWeights(Tables.documents(s, d), "doc_id", "text",
        isTarget = col("source") === "src0", buckets = 1024, n = 2)
    },

    // Incremental dedup: every 10th document plays the arriving batch,
    // probing the MinHash index built over the rest — corpus text is read
    // once for the index and never again.
    "dedup_incremental" -> { (s, d) =>
      val docs = Tables.documents(s, d)
      val idx = TextDedup.minhashIndex(
        docs.filter(col("doc_id") % 10 =!= 0), "doc_id", "text")
      TextDedup.minhashDuplicatesAgainst(
        docs.filter(col("doc_id") % 10 === 0), "doc_id", "text", idx)
    },

    // Deterministic lifetime train/valid/test assignment (2% test, 3%
    // valid, rest train) from the md5 bucket.
    "split_assign" -> { (s, d) =>
      Sampling.holdoutSplit(Tables.documents(s, d).select("doc_id"),
        "doc_id", splits = Seq("test" -> 2, "valid" -> 3))
    },

    // The cut step of ExactSubstr: every document with its duplicated
    // spans removed (digested — the full cleaned corpus is the real
    // output) plus the surviving word count.
    "dedup_substring_cut" -> { (s, d) =>
      val docs = Tables.documents(s, d)
      val spans = TextDedup.duplicateSpans(docs, "doc_id", "text",
        n = 8, minDocs = 2)
      TextDedup.cutSpans(docs, spans, "doc_id", "text")
        .select(col("doc_id"), md5(col("clean_text")).as("clean_digest"),
          col("n_words_kept"))
    },

    // The over-cap exact-signature fallback under load: every 5th document
    // (bounded to doc_id < 5000, so the planted group is FIXTURE-sized —
    // identical at sf <= 0.1 where all ids are < 5000, and capped at 1000
    // members above it: an UNBOUNDED plant would make the row's cost the
    // C(n/5, 2) pair OUTPUT instead of the fallback path under test)
    // becomes identical boilerplate, a group whose every band bucket blows
    // past cap 20 — at production scale this branch runs constantly on
    // licence blocks and shared headers. The boilerplate pairs must come
    // out of the exact-signature group (jaccard 1.0, pair count exactly
    // C(group, 2)) while the untouched near-dup pairs still arrive
    // through the light banding path.
    // Bounded oracle fixture (r13 verdict item 3): corpus capped to docs
    // 0..499 like dedup_minhash (no-op at sf <= 0.01); the plant condition
    // keeps its historical `< 5000` conjunct (redundant under the cap).
    "dedup_minhash_hot" -> { (s, d) =>
      val planted = Tables.documents(s, d)
        .filter(col("doc_id") < oracleDocCap)
        .select(col("doc_id"),
          when(col("doc_id") % 5 === 0 && col("doc_id") < 5000, lit(boilerText))
            .otherwise(col("text")).as("text"))
      TextDedup.minhashDuplicates(planted, "doc_id", "text", bucketCap = 20)
    },

    // The mega-cell sub-split under load: clusterCap forced to 25 puts 9
    // of the 20 quantizer cells over cap, so their members split by the
    // 8-bit LSH sign bucket before the pairwise expansion — the branch a
    // degenerate production cell (all-zero embeddings, crawler junk)
    // exercises constantly. The oracle replays the sub-split bit-for-bit
    // from the literal hyperplane matrix.
    "dedup_semantic_hot" -> { (s, d) =>
      VectorOps.semanticDuplicates(Tables.embeddings(s, d), "vec_id",
        "embedding", threshold = 0.4, clusterCap = 25)
    },

    // BM25 ranked retrieval — the LEXICAL side of the similarity-search
    // family (ann_* is the vector side): top-20 documents for a three-term
    // query mixing one rare term ('dup', df ~5% of docs — high idf
    // dominates) with two common ones. The portable integer scoring path
    // (quantized idf, fraction-cleared tf ratio, exact BIGINT sums) is the
    // hash-verifiable twin of the production double path; the plan
    // tokenizes narrow, filters to the 3 posting lists BEFORE the one
    // (doc, term) exchange, broadcasts the tiny df/corpus stats, and
    // top-ks on TakeOrderedAndProject.
    "text_bm25" -> { (s, d) =>
      graft.operators.TextRank.bm25TopKPortable(Tables.documents(s, d),
        "doc_id", "text", bm25Query, k = 20)
    },

    // Token-budget selection — the curation funnel's final cut: fill 40%
    // of the corpus' characters with the best docs by an integer
    // length-bucket score. Whole strata admit via a broadcast threshold
    // from ONE histogram aggregate; only the one budget-crossing stratum
    // pays a per-doc cumsum (seeded-hash admission order, exact BIGINT
    // arithmetic — replayed stratum-for-stratum by the oracle).
    "sample_budget" -> { (s, d) =>
      val docs = Tables.documents(s, d)
        .select(col("doc_id"), expr("length(text) div 50").as("score"),
          col("n_chars").cast("long").as("tok"))
      val total = docs.agg(sum(col("tok"))).head().getLong(0)
      graft.operators.Sampling.budgetSelect(docs, "doc_id", "score", "tok",
        budgetTokens = total * 2 / 5)
    },

    // The query-service shape of text_bm25: ONE indexing pass builds the
    // persisted postings/df/stats relations (the minhashIndex stance for
    // retrieval), then the query costs only its posting lists + broadcasts
    // — no corpus scan, no re-tokenization. Must equal text_bm25's ranking
    // by construction, so it shares its oracle.
    "text_bm25_indexed" -> { (s, d) =>
      val idx = graft.operators.TextRank.bm25Index(
        Tables.documents(s, d), "doc_id", "text")
      graft.operators.TextRank.bm25TopKIndexed(idx, bm25Query, k = 20)
    },

    // Hybrid retrieval: the BM25 lexical ranking over documents fused with
    // the exact-cosine vector ranking against a fixed query embedding
    // (vec 0), by reciprocal-rank fusion — scaled-integer contributions
    // `1e9 div (60 + rank)` so the fused score is an exact BIGINT sum.
    // Ids ranked by only one list get one contribution (at sf0.1 docs
    // 2000+ have no embedding — the real-world asymmetric-coverage shape).
    "hybrid_rrf" -> { (s, d) =>
      val lex = graft.operators.TextRank.bm25TopKPortable(
        Tables.documents(s, d), "doc_id", "text", bm25Query, k = 50)
        .select(col("doc_id").as("id"), col("rank"))
      val e = Tables.embeddings(s, d)
      val sem = VectorOps.bruteForceTopK(e.filter(col("vec_id") === 0),
        "vec_id", "embedding", e, "vec_id", "embedding", k = 50)
        .select(col("nid").as("id"), col("rank"))
      val fused = graft.operators.TextRank.rrfFuse(Seq(lex, sem), Seq("id"))
      fused.orderBy(col("rrf_score").desc, col("id")).limit(10)
        .withColumn("rank",
          row_number().over(org.apache.spark.sql.expressions.Window
            .orderBy(col("rrf_score").desc, col("id"))).cast("int"))
    })

  /** Fixed query for the retrieval rows: one rare + two common terms. */
  private[queries] val bm25Query: Seq[String] = Seq("dup", "vector", "merge")

  /** Planted boilerplate for [[queries dedup_minhash_hot]]: fixed text with
    * enough words for a nontrivial 3-gram set; shares no 3-word sequence
    * with the generated corpus, so cross pairs never reach jaccard 0.5.
    */
  private[queries] val boilerText: String =
    "standard licence header text all rights reserved redistribution and " +
      "use in source and binary forms with or without modification are " +
      "permitted provided that the following conditions are met"

  /** Bounded-oracle-fixture cap (r13 verdict item 3). The five rows whose
    * DuckDB replay is super-linear (brute-force pair joins, recursive-CTE
    * components, the composed IVF+PQ CTE) read only ids below this cap:
    * the WHOLE table at sf <= 0.01 (ids there are 0..499, so the filter is
    * a no-op and historical hashes are unchanged) and a fixed 500-row
    * slice at larger scales, so the oracle compare fits any per-query
    * budget at every sf instead of deferring. Engine-side scale evidence
    * for the uncapped operators lives in VolumeBench's dedup/joins ladders
    * and the sf1 bench runs of the library functions.
    */
  private[queries] val oracleDocCap = 500

  private val docsCte =
    "WITH d AS (SELECT doc_id, text, string_split(text, ' ') AS words FROM documents)"

  /** [[docsCte]] restricted to the bounded oracle fixture. */
  private val cappedDocsCte =
    "WITH d AS (SELECT doc_id, text, string_split(text, ' ') AS words " +
      s"FROM documents WHERE doc_id < $oracleDocCap)"

  val oracle: Map[String, String] = Map(
    "dedup_minhash" ->
      s"""$cappedDocsCte,
         |sh AS (SELECT doc_id,
         |         list_distinct([words[i] || ' ' || words[i+1] || ' ' || words[i+2]
         |                        for i in range(1, greatest(len(words) - 1, 2))]) AS grams
         |       FROM d)
         |SELECT a.doc_id AS id_a, b.doc_id AS id_b,
         |       round(len(list_intersect(a.grams, b.grams))::DOUBLE /
         |             len(list_distinct(list_concat(a.grams, b.grams))), 6) AS jaccard
         |FROM sh a JOIN sh b ON a.doc_id < b.doc_id
         |WHERE len(list_intersect(a.grams, b.grams))::DOUBLE /
         |      len(list_distinct(list_concat(a.grams, b.grams))) >= 0.5""".stripMargin,

    // prefix filtering is exact, so the oracle is the brute-force jaccard
    // join — no candidate-generation replay needed
    "dedup_ngram" ->
      s"""$cappedDocsCte,
         |sh AS (SELECT doc_id,
         |         list_distinct([words[i] || ' ' || words[i+1] || ' ' || words[i+2] || ' ' || words[i+3]
         |                        for i in range(1, greatest(len(words) - 2, 2))]) AS grams
         |       FROM d)
         |SELECT a.doc_id AS id_a, b.doc_id AS id_b,
         |       round(len(list_intersect(a.grams, b.grams))::DOUBLE /
         |             len(list_distinct(list_concat(a.grams, b.grams))), 6) AS jaccard
         |FROM sh a JOIN sh b ON a.doc_id < b.doc_id
         |WHERE len(list_intersect(a.grams, b.grams))::DOUBLE /
         |      len(list_distinct(list_concat(a.grams, b.grams))) >= 0.5""".stripMargin,

    // `st` mirrors VectorOps.ivfStride(count, 25, 65536) exactly: stride =
    // max(25, ceil(sqrt(N)), ceil(N/65536)) — change both together.
    "ann_ivf" ->
      """WITH n AS (SELECT vec_id, embedding::DOUBLE[] AS v FROM embeddings),
        |m AS (SELECT vec_id, v, sqrt(list_sum([x*x for x in v])) AS nrm FROM n),
        |st AS (SELECT greatest(25,
        |                CAST(ceil(sqrt(count(*)::DOUBLE)) AS BIGINT),
        |                CAST(ceil(count(*)::DOUBLE / 65536.0) AS BIGINT)) AS stride
        |       FROM m),
        |cent AS (SELECT vec_id AS cid, v AS cv, nrm AS cn FROM m
        |         WHERE vec_id % (SELECT stride FROM st) = 0),
        |sims AS (SELECT m.vec_id, cent.cid,
        |         list_sum([m.v[i]*cent.cv[i] for i in range(1, len(m.v)+1)]) /
        |           (m.nrm*cent.cn) AS cs
        |         FROM m CROSS JOIN cent),
        |assign AS (SELECT vec_id, cid FROM (
        |    SELECT *, row_number() OVER (PARTITION BY vec_id ORDER BY cs DESC, cid) AS rn
        |    FROM sims) WHERE rn = 1),
        |probes AS (SELECT vec_id AS qid, cid FROM (
        |    SELECT *, row_number() OVER (PARTITION BY vec_id ORDER BY cs DESC, cid) AS rn
        |    FROM sims WHERE vec_id % 50 = 0) WHERE rn <= 4),
        |cand AS (SELECT p.qid, a.vec_id AS nid
        |         FROM probes p JOIN assign a ON p.cid = a.cid AND p.qid <> a.vec_id),
        |scored AS (SELECT cand.qid, cand.nid,
        |    round(list_sum([a.v[i]*b.v[i] for i in range(1, len(a.v)+1)]) /
        |          (a.nrm*b.nrm), 6) AS sim
        |    FROM cand JOIN m a ON a.vec_id = cand.qid JOIN m b ON b.vec_id = cand.nid)
        |SELECT qid, nid, sim, CAST(rank AS INTEGER) AS rank FROM (
        |  SELECT *, row_number() OVER (PARTITION BY qid ORDER BY sim DESC, nid) AS rank
        |  FROM scored)
        |WHERE rank <= 5""".stripMargin,

    // Same stride/assignment prefix as ann_ivf (mirrors VectorOps.ivfStride
    // and the max-cosine/tie-to-smaller-cid assignment); the rollup sums
    // floor(norm*1e6) integers — bit-exact in any engine.
    "cluster_assign" ->
      """WITH n AS (SELECT vec_id, embedding::DOUBLE[] AS v FROM embeddings),
        |m AS (SELECT vec_id, v, sqrt(list_sum([x*x for x in v])) AS nrm FROM n),
        |st AS (SELECT greatest(25,
        |                CAST(ceil(sqrt(count(*)::DOUBLE)) AS BIGINT),
        |                CAST(ceil(count(*)::DOUBLE / 65536.0) AS BIGINT)) AS stride
        |       FROM m),
        |cent AS (SELECT vec_id AS cid, v AS cv, nrm AS cn FROM m
        |         WHERE vec_id % (SELECT stride FROM st) = 0),
        |sims AS (SELECT m.vec_id, m.nrm, cent.cid,
        |         list_sum([m.v[i]*cent.cv[i] for i in range(1, len(m.v)+1)]) /
        |           (m.nrm*cent.cn) AS cs
        |         FROM m CROSS JOIN cent),
        |assign AS (SELECT vec_id, nrm, cid FROM (
        |    SELECT *, row_number() OVER (PARTITION BY vec_id ORDER BY cs DESC, cid) AS rn
        |    FROM sims) WHERE rn = 1)
        |SELECT cid, count(*) AS n_members, min(vec_id) AS min_id,
        |  CAST(sum(CAST(floor(nrm * 1e6) AS BIGINT)) AS BIGINT) AS sum_norm_q6
        |FROM assign GROUP BY cid""".stripMargin,

    "ann_pq" ->
      """WITH n AS (SELECT vec_id, embedding::DOUBLE[] AS v FROM embeddings),
        |mm AS (SELECT vec_id, v, sqrt(list_sum([x*x for x in v])) AS nrm FROM n),
        |st AS (SELECT greatest(1, CAST(ceil(count(*)::DOUBLE / 64) AS BIGINT)) AS stride
        |       FROM mm),
        |cb AS (SELECT row_number() OVER (ORDER BY vec_id) - 1 AS code, v
        |       FROM mm WHERE vec_id % (SELECT stride FROM st) = 0),
        |codes AS (
        |  SELECT vec_id, j, code FROM (
        |    SELECT mm.vec_id, js.j, cb.code,
        |      row_number() OVER (PARTITION BY mm.vec_id, js.j
        |        ORDER BY list_sum([ (mm.v[js.j*8+i] - cb.v[js.j*8+i])
        |                          * (mm.v[js.j*8+i] - cb.v[js.j*8+i])
        |                            for i in range(1,9)]) ASC,
        |                 cb.code ASC) AS rn
        |    FROM mm CROSS JOIN (SELECT unnest(range(0,8)) AS j) js CROSS JOIN cb)
        |  WHERE rn = 1),
        |cls AS (SELECT vec_id, list(code ORDER BY j) AS cl FROM codes GROUP BY vec_id),
        |cbl AS (SELECT list(v ORDER BY code) AS cbv FROM cb),
        |q AS (SELECT * FROM mm WHERE vec_id % 50 = 0),
        |adc AS (SELECT q.vec_id AS qid, c.vec_id AS nid,
        |    round(list_sum([
        |        list_sum([ q.v[j*8+i] * cbl.cbv[c.cl[j+1] + 1][j*8+i]
        |                   for i in range(1,9)])
        |      for j in range(0,8)]) / (q.nrm * m2.nrm), 6) AS adc
        |  FROM q CROSS JOIN cls c JOIN mm m2 ON m2.vec_id = c.vec_id CROSS JOIN cbl
        |  WHERE q.vec_id <> c.vec_id),
        |cand AS (SELECT qid, nid FROM (
        |    SELECT *, row_number() OVER (PARTITION BY qid ORDER BY adc DESC, nid ASC) AS rn
        |    FROM adc) WHERE rn <= 40),
        |scored AS (SELECT cand.qid, cand.nid,
        |    round(list_sum([a.v[i]*b.v[i] for i in range(1, len(a.v)+1)]) /
        |          (a.nrm*b.nrm), 6) AS sim
        |    FROM cand JOIN mm a ON a.vec_id = cand.qid JOIN mm b ON b.vec_id = cand.nid)
        |SELECT qid, nid, sim, CAST(rank AS INTEGER) AS rank FROM (
        |  SELECT *, row_number() OVER (PARTITION BY qid ORDER BY sim DESC, nid) AS rank
        |  FROM scored)
        |WHERE rank <= 5""".stripMargin,

    "ann_ivf_pq" ->
      s"""WITH n AS (SELECT vec_id, embedding::DOUBLE[] AS v FROM embeddings
        |           WHERE vec_id < $oracleDocCap),
        |mm AS (SELECT vec_id, v, sqrt(list_sum([x*x for x in v])) AS nrm FROM n),
        |sti AS (SELECT greatest(25,
        |                CAST(ceil(sqrt(count(*)::DOUBLE)) AS BIGINT),
        |                CAST(ceil(count(*)::DOUBLE / 65536.0) AS BIGINT)) AS stride
        |        FROM mm),
        |cent AS (SELECT vec_id AS cid, v AS cv, nrm AS cn FROM mm
        |         WHERE vec_id % (SELECT stride FROM sti) = 0),
        |sims AS (SELECT mm.vec_id, cent.cid,
        |         list_sum([mm.v[i]*cent.cv[i] for i in range(1, len(mm.v)+1)]) /
        |           (mm.nrm*cent.cn) AS cs
        |         FROM mm CROSS JOIN cent),
        |assign AS (SELECT vec_id, cid FROM (
        |    SELECT *, row_number() OVER (PARTITION BY vec_id ORDER BY cs DESC, cid) AS rn
        |    FROM sims) WHERE rn = 1),
        |probes AS (SELECT vec_id AS qid, cid FROM (
        |    SELECT *, row_number() OVER (PARTITION BY vec_id ORDER BY cs DESC, cid) AS rn
        |    FROM sims WHERE vec_id % 50 = 0) WHERE rn <= 4),
        |stp AS (SELECT greatest(1, CAST(ceil(count(*)::DOUBLE / 64) AS BIGINT)) AS stride
        |        FROM mm),
        |cb AS (SELECT row_number() OVER (ORDER BY vec_id) - 1 AS code, v
        |       FROM mm WHERE vec_id % (SELECT stride FROM stp) = 0),
        |codes AS (
        |  SELECT vec_id, j, code FROM (
        |    SELECT mm.vec_id, js.j, cb.code,
        |      row_number() OVER (PARTITION BY mm.vec_id, js.j
        |        ORDER BY list_sum([ (mm.v[js.j*8+i] - cb.v[js.j*8+i])
        |                          * (mm.v[js.j*8+i] - cb.v[js.j*8+i])
        |                            for i in range(1,9)]) ASC,
        |                 cb.code ASC) AS rn
        |    FROM mm CROSS JOIN (SELECT unnest(range(0,8)) AS j) js CROSS JOIN cb)
        |  WHERE rn = 1),
        |cls AS (SELECT vec_id, list(code ORDER BY j) AS cl FROM codes GROUP BY vec_id),
        |cbl AS (SELECT list(v ORDER BY code) AS cbv FROM cb),
        |cand0 AS (SELECT p.qid, a.vec_id AS nid
        |          FROM probes p JOIN assign a ON p.cid = a.cid AND p.qid <> a.vec_id),
        |adc AS (SELECT c0.qid, c0.nid,
        |    round(list_sum([
        |        list_sum([ q.v[j*8+i] * cbl.cbv[c.cl[j+1] + 1][j*8+i]
        |                   for i in range(1,9)])
        |      for j in range(0,8)]) / (q.nrm * m2.nrm), 6) AS adc
        |  FROM cand0 c0
        |  JOIN mm q ON q.vec_id = c0.qid
        |  JOIN cls c ON c.vec_id = c0.nid
        |  JOIN mm m2 ON m2.vec_id = c0.nid
        |  CROSS JOIN cbl),
        |cand AS (SELECT qid, nid FROM (
        |    SELECT *, row_number() OVER (PARTITION BY qid ORDER BY adc DESC, nid ASC) AS rn
        |    FROM adc) WHERE rn <= 40),
        |scored AS (SELECT cand.qid, cand.nid,
        |    round(list_sum([a.v[i]*b.v[i] for i in range(1, len(a.v)+1)]) /
        |          (a.nrm*b.nrm), 6) AS sim
        |    FROM cand JOIN mm a ON a.vec_id = cand.qid JOIN mm b ON b.vec_id = cand.nid)
        |SELECT qid, nid, sim, CAST(rank AS INTEGER) AS rank FROM (
        |  SELECT *, row_number() OVER (PARTITION BY qid ORDER BY sim DESC, nid) AS rank
        |  FROM scored)
        |WHERE rank <= 5""".stripMargin,

    "dedup_embed" -> dedupEmbedOracle,

    "dedup_embed_incremental" -> dedupEmbedIncrementalOracle,

    "ann_topk" ->
      """WITH n AS (SELECT vec_id, embedding::DOUBLE[] AS v FROM embeddings),
        |m AS (SELECT vec_id, v, sqrt(list_sum([x*x for x in v])) AS nrm FROM n),
        |q AS (SELECT * FROM m WHERE vec_id % 50 = 0),
        |scored AS (
        |  SELECT q.vec_id AS qid, c.vec_id AS nid,
        |         round(list_sum([q.v[i]*c.v[i] for i in range(1, len(q.v)+1)]) /
        |               (q.nrm*c.nrm), 6) AS sim
        |  FROM q JOIN m c ON q.vec_id <> c.vec_id)
        |SELECT qid, nid, sim, CAST(rank AS INTEGER) AS rank FROM (
        |  SELECT *, row_number() OVER (PARTITION BY qid ORDER BY sim DESC, nid) AS rank
        |  FROM scored)
        |WHERE rank <= 5""".stripMargin,

    "text_quality" ->
      """WITH d0 AS (SELECT doc_id, text, string_split(lower(text), ' ') AS w,
        |              length(text) AS n FROM documents),
        |sc AS (SELECT *,
        |  len(list_filter(w, x -> list_contains(['the','a','of','and','to','in','is','it','that','for'], x)))::DOUBLE / len(w) AS s_en,
        |  len(list_filter(w, x -> list_contains(['el','la','de','que','y','en','un','es','los','por'], x)))::DOUBLE / len(w) AS s_es,
        |  len(list_filter(w, x -> list_contains(['der','die','das','und','ist','von','mit','den','nicht','ein'], x)))::DOUBLE / len(w) AS s_de,
        |  len(list_filter(w, x -> list_contains(['le','la','de','et','un','est','que','pour','dans','les'], x)))::DOUBLE / len(w) AS s_fr,
        |  len(list_filter(w, x -> list_contains(['de5','shi4','le5','zai4','he2','you3','wo3','ta1','zhe4','bu4'], x)))::DOUBLE / len(w) AS s_zh,
        |  (n - length(regexp_replace(text, '[0-9]', '', 'g')))::DOUBLE / n AS digit_r,
        |  (n - length(regexp_replace(text, '[^a-zA-Z0-9 ]', '', 'g')))::DOUBLE / n AS punct_r
        |FROM d0)
        |SELECT doc_id,
        |  CASE WHEN s_zh > greatest(s_en, s_es, s_de, s_fr) THEN 'zh'
        |       WHEN s_fr > greatest(s_en, s_es, s_de) THEN 'fr'
        |       WHEN s_de > greatest(s_en, s_es) THEN 'de'
        |       WHEN s_es > s_en THEN 'es'
        |       ELSE 'en' END AS lang_id,
        |  len(w)::BIGINT AS n_words,
        |  round(digit_r, 6) AS digit_ratio,
        |  round(punct_r, 6) AS punct_ratio,
        |  round(s_en, 6) AS stop_ratio,
        |  round((n - (len(w) - 1))::DOUBLE / len(w), 6) AS mean_word_len,
        |  round(least(len(w)::DOUBLE / 20, 1.0) * 0.4
        |        + (1.0 - least(digit_r * 5, 1.0)) * 0.2
        |        + (1.0 - least(punct_r * 5, 1.0)) * 0.2
        |        + least(s_en * 5, 1.0) * 0.2, 6) AS quality
        |FROM sc""".stripMargin,

    "text_tokens" ->
      s"""$docsCte
         |SELECT doc_id, CAST(len(words) AS INTEGER) AS ws_tokens,
         |       CAST(len(regexp_extract_all(lower(text), '[a-z]+|[0-9]+|[^a-z0-9 ]', 0)) AS INTEGER) AS sub_tokens
         |FROM d""".stripMargin,

    "text_fingerprint" ->
      s"""$docsCte
         |SELECT doc_id,
         |  list_min([md5(words[i] || ' ' || words[i+1] || ' ' || words[i+2] || ' ' ||
         |                words[i+3] || ' ' || words[i+4])
         |            for i in range(1, greatest(len(words) - 3, 2))]) AS fp
         |FROM d""".stripMargin,

    "dedup_simhash" -> simhashOracle,

    "ann_lsh" -> annLshOracle,

    "media_features" ->
      """SELECT doc_id AS media_id, 'txt' AS format,
        |       length(text)::BIGINT AS n_bytes,
        |       array_to_string([ascii(md5(text)[j])::INT::VARCHAR
        |                        for j in range(1, 9)], ',') AS features
        |FROM documents""".stripMargin,

    // Frame-sampling replay: strlen is DuckDB's byte length and the stub
    // payloads are ASCII by construction (spec-asserted), so char-based
    // substr slices the same bytes Spark's binary substring does.
    "media_frames" ->
      """WITH m AS (SELECT doc_id AS media_id, text,
        |             strlen(text)::BIGINT AS dur FROM documents),
        |f AS (SELECT media_id, text, (dur + 249) // 250 AS n_frames
        |      FROM m WHERE dur >= 1),
        |x AS (SELECT media_id, n_frames, text,
        |        unnest(range(0, n_frames)) AS fi FROM f)
        |SELECT media_id, fi::BIGINT AS frame_idx,
        |       (fi * 250)::BIGINT AS ts_ms,
        |       md5(substr(text, (fi * 250 + 1)::INTEGER, 16)) AS frame_digest,
        |       n_frames
        |FROM x""".stripMargin,

    // Resize replay: same stride math (`//` == Spark's div on these
    // non-negative operands), char-based selection under the same
    // spec-asserted ASCII precondition as media_frames.
    "media_resize" ->
      """WITH m AS (SELECT doc_id AS media_id, text,
        |             strlen(text)::BIGINT AS n FROM documents),
        |k AS (SELECT media_id, text, n,
        |        greatest((n + 63) // 64, CAST(1 AS BIGINT)) AS stride FROM m),
        |r AS (SELECT media_id, n, stride,
        |        CASE WHEN (n + stride - 1) // stride <= 0 THEN ''
        |             ELSE array_to_string(
        |               [substr(text, (i * stride + 1)::INTEGER, 1)
        |                for i in range(0, (n + stride - 1) // stride)], '')
        |        END AS resized
        |      FROM k)
        |SELECT media_id, n AS orig_bytes, stride,
        |       strlen(resized)::BIGINT AS new_bytes,
        |       md5(resized) AS resized_digest
        |FROM r""".stripMargin,

    // transitive closure over the same 4-gram jaccard pairs dedup_ngram
    // checks; cluster id = min reachable doc id (component min)
    "dedup_cluster" ->
      s"""WITH RECURSIVE d AS (
        |  SELECT doc_id, text, string_split(text, ' ') AS words FROM documents
        |  WHERE doc_id < $oracleDocCap),
        |sh AS (SELECT doc_id,
        |         list_distinct([words[i] || ' ' || words[i+1] || ' ' || words[i+2] || ' ' || words[i+3]
        |                        for i in range(1, greatest(len(words) - 2, 2))]) AS grams
        |       FROM d),
        |p AS (SELECT a.doc_id AS ua, b.doc_id AS ub
        |      FROM sh a JOIN sh b ON a.doc_id < b.doc_id
        |      WHERE len(list_intersect(a.grams, b.grams))::DOUBLE /
        |            len(list_distinct(list_concat(a.grams, b.grams))) >= 0.5),
        |e AS (SELECT ua AS u, ub AS v FROM p UNION SELECT ub, ua FROM p),
        |reach(n, r) AS (
        |  SELECT u, u FROM e
        |  UNION
        |  SELECT e.u, reach.r FROM e JOIN reach ON reach.n = e.v),
        |lbl AS (SELECT n, min(r) AS root FROM reach GROUP BY n)
        |SELECT doc.doc_id,
        |       COALESCE(lbl.root, doc.doc_id) AS cluster_id,
        |       CAST(COALESCE(lbl.root, doc.doc_id) = doc.doc_id AS INT) AS canonical
        |FROM d doc LEFT JOIN lbl ON lbl.n = doc.doc_id""".stripMargin,

    // same md5 bucket (first 4 hex digits mod 100) and the same lang-id
    // scoring text_quality replays; keep pct: en 10, es/de/fr/zh 40
    "sample_stratified" -> sampleStratifiedOracle,

    "span_corrupt" -> spanCorruptOracle,

    // Integer replay of QualityFilter: t = class-prior ppm, per-word
    // Laplace ratio, tf-weighted sums; mean is NULL for wordless docs
    // (matches the Spark `_s div _n` on a left-join miss).
    "quality_nb" ->
      """WITH w AS (SELECT doc_id, source = 'src0' AS pos,
        |    unnest(string_split_regex(lower(text), '\s+')) AS word
        |  FROM documents),
        |wf AS (SELECT * FROM w WHERE length(word) > 0),
        |cnt AS (SELECT word,
        |    sum(CASE WHEN pos THEN 1 ELSE 0 END) AS cp,
        |    sum(CASE WHEN pos THEN 0 ELSE 1 END) AS cn
        |  FROM wf GROUP BY word),
        |tot AS (SELECT sum(cp) AS tp, sum(cn) AS tn, count(*) AS v FROM cnt),
        |tt AS (SELECT (1000000 * (tn + v)) // (tp + v) AS t FROM tot),
        |wt AS (SELECT word, ((cp + 1) * (SELECT t FROM tt)) // (cn + 1) AS wgt
        |       FROM cnt),
        |tf AS (SELECT doc_id, word, count(*) AS tf FROM wf
        |       GROUP BY doc_id, word),
        |sc AS (SELECT doc_id, sum(tf) AS n, sum(tf * wgt) AS s
        |       FROM tf JOIN wt USING (word) GROUP BY doc_id)
        |SELECT d.doc_id,
        |  CAST(coalesce(sc.n, 0) AS BIGINT) AS n_scored,
        |  CAST(coalesce(sc.s, 0) AS BIGINT) AS quality_score,
        |  CAST(sc.s // sc.n AS BIGINT) AS quality_mean
        |FROM documents d LEFT JOIN sc ON d.doc_id = sc.doc_id""".stripMargin,

    "pack_sequences" ->
      """WITH t AS (SELECT doc_id, len(string_split(text, ' '))::BIGINT AS n_tokens,
        |                  doc_id % 32 AS shard
        |           FROM documents),
        |c AS (SELECT *, coalesce(sum(n_tokens) OVER (
        |        PARTITION BY shard ORDER BY doc_id
        |        ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS cum
        |      FROM t)
        |SELECT doc_id, n_tokens, shard,
        |       CAST(floor(cum / 2048.0) AS BIGINT) AS bin
        |FROM c""".stripMargin,

    "text_rarity" ->
      """WITH w AS (SELECT doc_id, unnest(string_split(lower(text), ' ')) AS word
        |           FROM documents),
        |f AS (SELECT word, count(*) AS c FROM w GROUP BY word),
        |t AS (SELECT sum(c) AS n FROM f),
        |d AS (SELECT w.doc_id, count(*) AS n_words, sum(f.c) AS fs,
        |             sum(CASE WHEN f.c = 1 THEN 1 ELSE 0 END) AS hapax
        |      FROM w JOIN f USING (word) GROUP BY w.doc_id)
        |SELECT doc_id, coalesce(n_words, 0)::BIGINT AS n_words,
        |       coalesce(hapax, 0)::BIGINT AS hapax,
        |       round(fs::DOUBLE / (n_words * (SELECT n FROM t)), 6) AS commonness
        |FROM documents LEFT JOIN d USING (doc_id)""".stripMargin,

    "text_lm" -> textLmOracle,

    // the same LM replay as a CTE, then the histogram percentile_disc
    // replay (the quantile_group spelling) for per-lang tercile cuts
    "text_ccnet_buckets" ->
      s"""WITH lm AS ($textLmOracle),
        |sc AS (SELECT lm.doc_id, d.lang, lm.mean_cond_ppm AS s
        |       FROM lm JOIN documents d USING (doc_id)),
        |hist AS (SELECT lang, s, count(*) AS cnt FROM sc
        |         WHERE s IS NOT NULL GROUP BY 1, 2),
        |c AS (SELECT lang, s, cnt,
        |        CAST(sum(cnt) OVER (PARTITION BY lang ORDER BY s) AS BIGINT) AS cum,
        |        CAST(sum(cnt) OVER (PARTITION BY lang) AS BIGINT) AS n
        |      FROM hist),
        |cut AS (SELECT lang,
        |          min(CASE WHEN cum >= (n * 33 + 99) // 100 THEN s END) AS p33,
        |          min(CASE WHEN cum >= (n * 66 + 99) // 100 THEN s END) AS p66
        |        FROM c GROUP BY lang)
        |SELECT sc.doc_id, sc.lang, sc.s AS mean_cond_ppm,
        |  CASE WHEN sc.s IS NULL THEN 'tail'
        |       WHEN sc.s <= cut.p33 THEN 'tail'
        |       WHEN sc.s <= cut.p66 THEN 'middle'
        |       ELSE 'head' END AS bucket
        |FROM sc LEFT JOIN cut USING (lang)""".stripMargin,

    "text_lm_cross" ->
      """WITH ws AS (SELECT doc_id, source,
        |              string_split_regex(lower(text), '\s+') AS w
        |            FROM documents),
        |g AS (SELECT doc_id, source, p.w1 AS w1, p.w2 AS w2 FROM
        |        (SELECT doc_id, source,
        |           unnest(list_transform(generate_series(1, len(w) - 1),
        |             i -> struct_pack(w1 := w[i], w2 := w[i + 1]))) AS p
        |         FROM ws WHERE len(w) >= 2)),
        |c2 AS (SELECT w1, w2, count(*) AS c2 FROM g
        |       WHERE source = 'src0' GROUP BY w1, w2),
        |c1 AS (SELECT w1, sum(c2) AS c1 FROM c2 GROUP BY w1),
        |v AS (SELECT count(*) AS v FROM c1),
        |scored AS (SELECT g.doc_id,
        |    ((coalesce(c2.c2, 0) + 1) * 1000000)
        |      // (coalesce(c1.c1, 0) + (SELECT v FROM v)) AS ppm
        |  FROM g LEFT JOIN c2 ON g.w1 = c2.w1 AND g.w2 = c2.w2
        |         LEFT JOIN c1 ON g.w1 = c1.w1),
        |d AS (SELECT doc_id, count(*) AS nb, sum(ppm) AS sp
        |      FROM scored GROUP BY doc_id)
        |SELECT doc_id, coalesce(nb, 0)::BIGINT AS n_bigrams,
        |       coalesce(sp, 0)::BIGINT AS sum_cond_ppm,
        |       CAST(sp // nb AS BIGINT) AS mean_cond_ppm
        |FROM documents LEFT JOIN d USING (doc_id)""".stripMargin,

    // brute-force 5-gram intersection between the corpus and eval slices
    "decontaminate" ->
      """WITH d AS (SELECT doc_id, string_split(text, ' ') AS words FROM documents),
        |g AS (SELECT doc_id,
        |        list_distinct([words[i] || ' ' || words[i+1] || ' ' || words[i+2] || ' ' ||
        |                       words[i+3] || ' ' || words[i+4]
        |                       for i in range(1, greatest(len(words) - 3, 2))]) AS grams
        |      FROM d),
        |c AS (SELECT * FROM g WHERE doc_id % 20 <> 0),
        |e AS (SELECT * FROM g WHERE doc_id % 20 = 0)
        |SELECT c.doc_id, e.doc_id AS eval_id,
        |       len(list_intersect(c.grams, e.grams))::BIGINT AS shared
        |FROM c JOIN e ON len(list_intersect(c.grams, e.grams)) > 0""".stripMargin,

    "shuffle_shards" -> shuffleShardsOracle,

    "mix_weights" ->
      """WITH t AS (SELECT source, count(*) AS n_docs,
        |             CAST(sum(len(string_split(text, ' '))) AS BIGINT) AS n_tokens
        |           FROM documents GROUP BY source),
        |z AS (SELECT sum(sqrt(n_tokens::DOUBLE)) AS z FROM t)
        |SELECT source, n_docs, n_tokens,
        |       round(sqrt(n_tokens::DOUBLE) / z.z, 6) AS weight,
        |       CAST(floor(10000000 * sqrt(n_tokens::DOUBLE) / z.z) AS BIGINT) AS target_tokens
        |FROM t CROSS JOIN z""".stripMargin,

    // SemDedup replay: the same stride-sampled centroids and max-cosine
    // assignment as the ann_ivf oracle, then per-cell pairwise cosine and
    // the keep = most-similar-lower-id rule. The engine's over-cap cell
    // sub-split never fires at oracle scale (cells ~sqrt(N) members vs cap
    // 2000), so plain cell equality reproduces its candidates.
    "dedup_semantic" ->
      """WITH n AS (SELECT vec_id, embedding::DOUBLE[] AS v FROM embeddings),
        |m AS (SELECT vec_id, v, sqrt(list_sum([x*x for x in v])) AS nrm FROM n),
        |st AS (SELECT greatest(25,
        |                CAST(ceil(sqrt(count(*)::DOUBLE)) AS BIGINT),
        |                CAST(ceil(count(*)::DOUBLE / 65536.0) AS BIGINT)) AS stride
        |       FROM m),
        |cent AS (SELECT vec_id AS cid, v AS cv, nrm AS cn FROM m
        |         WHERE vec_id % (SELECT stride FROM st) = 0),
        |sims AS (SELECT m.vec_id, cent.cid,
        |         list_sum([m.v[i]*cent.cv[i] for i in range(1, len(m.v)+1)]) /
        |           (m.nrm*cent.cn) AS cs
        |         FROM m CROSS JOIN cent),
        |assign AS (SELECT vec_id, cid FROM (
        |    SELECT *, row_number() OVER (PARTITION BY vec_id ORDER BY cs DESC, cid) AS rn
        |    FROM sims) WHERE rn = 1),
        |cand AS (SELECT a.vec_id AS id_a, b.vec_id AS id_b, a.cid
        |         FROM assign a JOIN assign b ON a.cid = b.cid AND a.vec_id < b.vec_id),
        |scored AS (SELECT cand.id_a, cand.id_b, cand.cid,
        |    round(list_sum([x.v[i]*y.v[i] for i in range(1, len(x.v)+1)]) /
        |          (x.nrm*y.nrm), 6) AS sim
        |    FROM cand JOIN m x ON x.vec_id = cand.id_a JOIN m y ON y.vec_id = cand.id_b)
        |SELECT id_b AS drop_id, id_a AS keep_id, cid, sim FROM (
        |  SELECT *, row_number() OVER (PARTITION BY id_b ORDER BY sim DESC, id_a) AS rn
        |  FROM scored WHERE sim >= 0.4)
        |WHERE rn = 1""".stripMargin,

    // Duplicate-substring replay: rolling 8-word windows by position, the
    // >=2-distinct-docs window set, and the pos - row_number() run merge.
    // Gram strings join directly (the engine's md5 of the same strings is
    // injective on this corpus by the 128-bit argument in the scaladoc).
    "dedup_substring" ->
      """WITH w AS (SELECT doc_id, string_split_regex(lower(text), '\s+') AS ws
        |           FROM documents),
        |g AS (SELECT doc_id, unnest(range(0, greatest(len(ws) - 8, 0) + 1)) AS pos, ws
        |      FROM w),
        |gg AS (SELECT doc_id, pos,
        |         array_to_string(list_slice(ws, pos + 1, pos + 8), ' ') AS gram
        |       FROM g),
        |dup AS (SELECT gram FROM gg GROUP BY gram
        |        HAVING count(DISTINCT doc_id) >= 2),
        |hits AS (SELECT doc_id, pos FROM gg JOIN dup USING (gram)),
        |runs AS (SELECT doc_id, pos,
        |           pos - row_number() OVER (PARTITION BY doc_id ORDER BY pos) AS rid
        |         FROM hits)
        |SELECT doc_id, min(pos) AS span_start, max(pos) + 7 AS span_end,
        |       count(*) AS n_windows
        |FROM runs GROUP BY doc_id, rid""".stripMargin,

    "affinity_weights" -> affinityWeightsOracle,

    // Over-cap fallback replay: planted docs (doc_id % 5 = 0) carry
    // identical text, so every band bucket holding them has 100 members >>
    // cap 20 and the engine must route them through the exact-signature
    // group — replayed here literally as "identical distinct-gram set =>
    // pair" within the planted slice. Untouched docs keep flowing through
    // the light banding path (their buckets hold <= 2 members: the corpus
    // near-dup clusters are pairs, measured), replayed as recall-1 brute
    // force. Cross pairs can't reach 0.5 (the boilerplate shares no 3-word
    // sequence with the corpus).
    "dedup_minhash_hot" ->
      s"""WITH d AS (SELECT doc_id,
         |             CASE WHEN doc_id % 5 = 0 AND doc_id < 5000 THEN '$boilerText'
         |                  ELSE text END AS text
         |           FROM documents WHERE doc_id < $oracleDocCap),
         |w AS (SELECT doc_id, text, string_split(text, ' ') AS words FROM d),
         |sh AS (SELECT doc_id,
         |         list_distinct([words[i] || ' ' || words[i+1] || ' ' || words[i+2]
         |                        for i in range(1, greatest(len(words) - 1, 2))]) AS grams
         |       FROM w),
         |light AS (
         |  SELECT a.doc_id AS id_a, b.doc_id AS id_b,
         |         round(len(list_intersect(a.grams, b.grams))::DOUBLE /
         |               len(list_distinct(list_concat(a.grams, b.grams))), 6) AS jaccard
         |  FROM sh a JOIN sh b
         |    ON a.doc_id < b.doc_id
         |   AND NOT (a.doc_id % 5 = 0 AND a.doc_id < 5000)
         |   AND NOT (b.doc_id % 5 = 0 AND b.doc_id < 5000)
         |  WHERE len(list_intersect(a.grams, b.grams))::DOUBLE /
         |        len(list_distinct(list_concat(a.grams, b.grams))) >= 0.5),
         |heavy AS (
         |  SELECT a.doc_id AS id_a, b.doc_id AS id_b, 1.0::DOUBLE AS jaccard
         |  FROM sh a JOIN sh b
         |    ON a.doc_id < b.doc_id AND a.doc_id % 5 = 0 AND a.doc_id < 5000
         |   AND b.doc_id % 5 = 0 AND b.doc_id < 5000
         |  WHERE list_sort(a.grams) = list_sort(b.grams))
         |SELECT * FROM light UNION ALL SELECT * FROM heavy""".stripMargin,

    "dedup_semantic_hot" -> dedupSemanticHotOracle,

    // Same strata arithmetic: histogram cumsum → threshold + crossing
    // stratum, seeded-md5 admission order within it, exact BIGINTs.
    "sample_budget" ->
      """WITH b AS (SELECT doc_id, length(text) // 50 AS score,
        |             n_chars::BIGINT AS tok FROM documents),
        |tot AS (SELECT CAST(sum(tok) AS BIGINT) AS t FROM b),
        |bud AS (SELECT (SELECT t FROM tot) * 2 // 5 AS bud),
        |h AS (SELECT score, CAST(sum(tok) AS BIGINT) AS stok
        |      FROM b GROUP BY score),
        |c AS (SELECT score, stok,
        |        CAST(sum(stok) OVER (ORDER BY score DESC
        |          ROWS UNBOUNDED PRECEDING) AS BIGINT) AS cum
        |      FROM h),
        |c2 AS (SELECT *, coalesce(lag(cum) OVER (ORDER BY score DESC), 0)
        |         AS prev FROM c),
        |fullmin AS (SELECT min(score) AS fm FROM c2
        |            WHERE cum <= (SELECT bud FROM bud)),
        |bd AS (SELECT score AS bscore,
        |         CAST((SELECT bud FROM bud) - prev AS BIGINT) AS brem
        |       FROM c2 WHERE prev < (SELECT bud FROM bud)
        |         AND cum > (SELECT bud FROM bud)),
        |fullsel AS (SELECT doc_id, score, tok FROM b
        |            WHERE score >= (SELECT fm FROM fullmin)),
        |bsel AS (SELECT doc_id, score, tok FROM (
        |    SELECT b.doc_id, b.score, b.tok,
        |      CAST(sum(b.tok) OVER (
        |        ORDER BY md5('sel0:' || b.doc_id::VARCHAR), b.doc_id
        |        ROWS UNBOUNDED PRECEDING) AS BIGINT) AS crun
        |    FROM b JOIN bd ON b.score = bd.bscore)
        |  WHERE crun <= (SELECT brem FROM bd))
        |SELECT doc_id, score, tok FROM fullsel
        |UNION ALL SELECT doc_id, score, tok FROM bsel""".stripMargin,

    "sample_weighted" -> sampleWeightedOracle,

    // Fuzzy-dedup replay: the planted title build, the same normalize +
    // two-affix blocking, self-join pair generation, exact levenshtein.
    // DuckDB and Spark agree on classic unit-cost edit distance over the
    // ASCII norms ([a-z0-9] by construction).
    "dedup_fuzzy" ->
      """WITH t AS (SELECT doc_id,
        |    CASE WHEN doc_id % 17 = 5
        |           THEN 'doc ' || (doc_id // 17)::VARCHAR ||
        |                ' alpha beta gamma delta epsilon zeta eta theta headline ' ||
        |                (doc_id // 17)::VARCHAR
        |         WHEN doc_id % 17 = 6
        |           THEN 'doc ' || (doc_id // 17)::VARCHAR ||
        |                ' alpha beta gamma delta epsilon zeta eta theta headlines ' ||
        |                (doc_id // 17)::VARCHAR
        |         WHEN doc_id % 17 = 11
        |           THEN 'story ' || (doc_id // 17)::VARCHAR ||
        |                ' front page alpha omega psi chi phi tau sigma rho ' ||
        |                (doc_id // 17)::VARCHAR
        |         WHEN doc_id % 17 = 12
        |           THEN 'story ' || (doc_id // 17)::VARCHAR ||
        |                ' fromt page alpha omega psi chi phi tau sigma rho ' ||
        |                (doc_id // 17)::VARCHAR
        |         ELSE substr(text, 1, 120) END AS title
        |  FROM documents),
        |f AS (SELECT doc_id AS id,
        |        regexp_replace(lower(title), '[^a-z0-9]', '', 'g') AS norm
        |      FROM t
        |      WHERE length(regexp_replace(lower(title), '[^a-z0-9]', '', 'g')) >= 8),
        |k AS (SELECT id, 'p:' || substr(norm, 1, 32) AS bk FROM f
        |      UNION ALL
        |      SELECT id, 's:' || substr(norm, greatest(length(norm) - 31, 1), 32) AS bk
        |      FROM f),
        |pr AS (SELECT DISTINCT a.id AS id_a, b.id AS id_b
        |       FROM k a JOIN k b ON a.bk = b.bk AND a.id < b.id),
        |v AS (SELECT id_a, id_b, levenshtein(fa.norm, fb.norm)::BIGINT AS dist
        |      FROM pr JOIN f fa ON pr.id_a = fa.id JOIN f fb ON pr.id_b = fb.id)
        |SELECT id_a, id_b, dist FROM v WHERE dist <= 8""".stripMargin,

    "text_bm25" -> textBm25Oracle,

    // the indexed path must produce the identical ranking — same oracle
    "text_bm25_indexed" -> textBm25Oracle,

    "hybrid_rrf" -> hybridRrfOracle,

    "split_assign" -> splitAssignOracle,

    // Domain-cap replay: the planted URL build, the canonicalizer's own
    // host derivation (lower, www-strip; '' when schemeless), then
    // row_number over the seeded md5 order within each domain.
    "sample_domain_cap" ->
      """WITH u AS (SELECT doc_id,
        |    CASE WHEN doc_id % 3 = 0
        |           THEN 'https://WWW.AlphaNews.com:443/a/' || CAST(doc_id AS VARCHAR)
        |         WHEN doc_id % 3 = 1
        |           THEN 'http://beta-site.ORG/p?utm_x=1&b=' || CAST(doc_id AS VARCHAR)
        |         ELSE '/relative/' || CAST(doc_id AS VARCHAR) END AS url
        |  FROM documents),
        |h AS (SELECT doc_id,
        |    CASE WHEN regexp_extract(url, '^([A-Za-z][A-Za-z0-9+.\-]*)://', 1) = ''
        |         THEN ''
        |         ELSE regexp_replace(lower(regexp_extract(
        |                regexp_extract(url, '^[A-Za-z][A-Za-z0-9+.\-]*://([^/?#]*)', 1),
        |                '^([^:]*)', 1)), '^www\.', '') END AS domain
        |  FROM u),
        |r AS (SELECT doc_id, domain,
        |    row_number() OVER (PARTITION BY domain
        |      ORDER BY md5('cap0:' || CAST(doc_id AS VARCHAR)), doc_id) AS rn
        |  FROM h)
        |SELECT doc_id, domain FROM r WHERE rn <= 7""".stripMargin,

    // Incremental-dedup oracle: brute-force 3-gram jaccard restricted to
    // (batch, corpus) cross pairs — recall 1 transfers from dedup_minhash
    // because probe and index share the banding math.
    "dedup_incremental" ->
      s"""$docsCte,
         |sh AS (SELECT doc_id,
         |         list_distinct([words[i] || ' ' || words[i+1] || ' ' || words[i+2]
         |                        for i in range(1, greatest(len(words) - 1, 2))]) AS grams
         |       FROM d)
         |SELECT a.doc_id AS new_id, b.doc_id AS old_id,
         |       round(len(list_intersect(a.grams, b.grams))::DOUBLE /
         |             len(list_distinct(list_concat(a.grams, b.grams))), 6) AS jaccard
         |FROM sh a JOIN sh b ON a.doc_id % 10 = 0 AND b.doc_id % 10 <> 0
         |WHERE len(list_intersect(a.grams, b.grams))::DOUBLE /
         |      len(list_distinct(list_concat(a.grams, b.grams))) >= 0.5""".stripMargin,

    // Span-cut replay, fully relational (covered word positions from the
    // span set, anti-joined against all positions, surviving words
    // re-joined in order) — a fully-duplicated document keeps 0 words and
    // digests the empty string in both engines.
    "dedup_substring_cut" ->
      """WITH w AS (SELECT doc_id, string_split_regex(lower(text), '\s+') AS ws
        |           FROM documents),
        |g AS (SELECT doc_id, unnest(range(0, greatest(len(ws) - 8, 0) + 1)) AS pos, ws
        |      FROM w),
        |gg AS (SELECT doc_id, pos,
        |         array_to_string(list_slice(ws, pos + 1, pos + 8), ' ') AS gram
        |       FROM g),
        |dup AS (SELECT gram FROM gg GROUP BY gram
        |        HAVING count(DISTINCT doc_id) >= 2),
        |hits AS (SELECT doc_id, pos FROM gg JOIN dup USING (gram)),
        |runs AS (SELECT doc_id, pos,
        |           pos - row_number() OVER (PARTITION BY doc_id ORDER BY pos) AS rid
        |         FROM hits),
        |sp AS (SELECT doc_id, min(pos) AS s, max(pos) + 7 AS e
        |       FROM runs GROUP BY doc_id, rid),
        |cov AS (SELECT DISTINCT doc_id, unnest(range(s, e + 1)) AS p FROM sp),
        |pos_all AS (SELECT doc_id, unnest(range(0, len(ws))) AS p, ws FROM w),
        |kept AS (SELECT pos_all.doc_id, pos_all.p, ws[p + 1] AS word
        |         FROM pos_all ANTI JOIN cov USING (doc_id, p)),
        |agg AS (SELECT doc_id, string_agg(word, ' ' ORDER BY p) AS clean,
        |          count(*) AS nk
        |        FROM kept GROUP BY doc_id)
        |SELECT d.doc_id, md5(coalesce(agg.clean, '')) AS clean_digest,
        |       coalesce(agg.nk, 0)::BIGINT AS n_words_kept
        |FROM (SELECT doc_id FROM documents) d LEFT JOIN agg USING (doc_id)""".stripMargin)

  /** Priority-sampling oracle: the seeded 48-bit hash unpacked from md5 hex
    * digits (the sketch_distinct idiom), integer priorities
    * `(w · 2^48) // m`, row_number over (prio DESC, m, id) per language;
    * rank ≤ 25 is the sample, rank 26's priority is τ, `w_hat =
    * greatest(w, τ)`. `//` and Spark's `div` agree on non-negative BIGINTs.
    */
  private lazy val sampleWeightedOracle: String = {
    def dv(k: Int) =
      s"(CASE WHEN ascii(substr(hx, $k, 1)) >= 97 THEN ascii(substr(hx, $k, 1)) - 87" +
        s" ELSE ascii(substr(hx, $k, 1)) - 48 END)"
    val hv = (1 to 12)
      .map(i => s"${dv(i)} * CAST(${1L << (4 * (12 - i))} AS BIGINT)")
      .mkString(" + ")
    s"""WITH b AS (SELECT doc_id, lang,
       |             greatest(least(n_chars, 16384), 1) AS w,
       |             md5('ws0:' || doc_id::VARCHAR) AS hx FROM documents),
       |h AS (SELECT doc_id, lang, w, ($hv) + 1 AS mh FROM b),
       |q AS (SELECT doc_id, lang, w, mh,
       |        (w * 281474976710656) // mh AS prio FROM h),
       |r AS (SELECT *, row_number() OVER (PARTITION BY lang
       |        ORDER BY prio DESC, mh, doc_id) AS rn FROM q),
       |tau AS (SELECT lang, max(CASE WHEN rn = 26 THEN prio END) AS tau
       |        FROM r GROUP BY lang)
       |SELECT r.doc_id, r.lang, r.w AS weight,
       |       greatest(r.w, coalesce(tau.tau, 0)) AS w_hat
       |FROM r JOIN tau USING (lang) WHERE rn <= 25""".stripMargin
  }

  /** Holdout-split oracle: the [[sampleStratifiedOracle]] bucket
    * arithmetic, mapped through the cumulative split boundaries
    * (test < 2, valid < 5, else train).
    */
  private lazy val splitAssignOracle: String = {
    def dv(k: Int) =
      s"(CASE WHEN ascii(substr(hx, $k, 1)) >= 97 THEN ascii(substr(hx, $k, 1)) - 87" +
        s" ELSE ascii(substr(hx, $k, 1)) - 48 END)"
    s"""WITH h AS (SELECT doc_id, md5(doc_id::VARCHAR) AS hx FROM documents),
       |b AS (SELECT doc_id,
       |        (${dv(1)} * 4096 + ${dv(2)} * 256 + ${dv(3)} * 16 + ${dv(4)}) % 100 AS bucket
       |      FROM h)
       |SELECT doc_id,
       |       CASE WHEN bucket < 2 THEN 'test'
       |            WHEN bucket < 5 THEN 'valid'
       |            ELSE 'train' END AS split
       |FROM b""".stripMargin
  }

  /** Affinity-weights oracle: hashed-bigram buckets via the same
    * md5-first-4-hex-digits arithmetic as [[sampleStratifiedOracle]], exact
    * integer bucket/doc sums, one final double ratio rounded to 6 — the
    * engine's arithmetic step for step.
    */
  private lazy val affinityWeightsOracle: String = {
    def dv(k: Int) =
      s"(CASE WHEN ascii(substr(hx, $k, 1)) >= 97 THEN ascii(substr(hx, $k, 1)) - 87" +
        s" ELSE ascii(substr(hx, $k, 1)) - 48 END)"
    s"""WITH w AS (SELECT doc_id, source,
       |             string_split_regex(lower(text), '\\s+') AS ws FROM documents),
       |g AS (SELECT doc_id, source,
       |        unnest(range(0, greatest(len(ws) - 2, 0) + 1)) AS pos, ws
       |      FROM w),
       |gr AS (SELECT doc_id, source,
       |         md5(array_to_string(list_slice(ws, pos + 1, pos + 2), ' ')) AS hx
       |       FROM g),
       |b AS (SELECT doc_id, source,
       |        (${dv(1)} * 4096 + ${dv(2)} * 256 + ${dv(3)} * 16 + ${dv(4)}) % 1024 AS bucket
       |      FROM gr),
       |ft AS (SELECT bucket, count(*) AS cr,
       |         sum(CASE WHEN source = 'src0' THEN 1 ELSE 0 END) AS ct
       |       FROM b GROUP BY bucket),
       |tot AS (SELECT sum(cr) AS nr, sum(ct) AS nt FROM ft),
       |agg AS (SELECT doc_id, count(*) AS n_grams,
       |          sum(ct) AS st, sum(cr) AS sr
       |        FROM b JOIN ft USING (bucket) GROUP BY doc_id)
       |SELECT d.doc_id, coalesce(agg.n_grams, 0)::BIGINT AS n_grams,
       |       round((st::DOUBLE * nr) / (sr::DOUBLE * nt), 6) AS affinity
       |FROM (SELECT doc_id FROM documents) d
       |LEFT JOIN agg USING (doc_id) CROSS JOIN tot""".stripMargin
  }

  /** Span-corruption oracle: the mask flag re-derives
    * [[graft.operators.Sampling.hashBucket]] of "id:pos" from md5 hex
    * digits; spans come from a lag-window span-start flag + running sum
    * (relational replay of the operator's single-pass fold); the
    * input/target streams are `string_agg` over per-position pieces —
    * `string_agg` skips NULL pieces exactly like the fold appends nothing.
    */
  private lazy val spanCorruptOracle: String = {
    def dv(k: Int) =
      s"(CASE WHEN ascii(substr(hx, $k, 1)) >= 97 THEN ascii(substr(hx, $k, 1)) - 87" +
        s" ELSE ascii(substr(hx, $k, 1)) - 48 END)"
    s"""WITH t AS (SELECT doc_id,
       |      list_filter(string_split_regex(text, '\\s+'), w -> w <> '') AS ws
       |    FROM documents),
       |pos AS (SELECT doc_id, g AS i, ws[g] AS w FROM
       |        (SELECT doc_id, ws, unnest(generate_series(1, len(ws))) AS g
       |         FROM t)),
       |h AS (SELECT doc_id, i, w,
       |        md5(doc_id || ':' || (i - 1)) AS hx FROM pos),
       |mk AS (SELECT doc_id, i, w,
       |        ((${dv(1)} * 4096 + ${dv(2)} * 256 + ${dv(3)} * 16 + ${dv(4)}) % 100) < 15 AS m
       |      FROM h),
       |sp AS (SELECT *, CASE WHEN m AND NOT
       |          coalesce(lag(m) OVER (PARTITION BY doc_id ORDER BY i), false)
       |        THEN 1 ELSE 0 END AS spanstart FROM mk),
       |sid AS (SELECT *, sum(spanstart) OVER
       |          (PARTITION BY doc_id ORDER BY i) AS k FROM sp),
       |pieces AS (SELECT doc_id, i, m,
       |    CASE WHEN NOT m THEN w
       |         WHEN spanstart = 1 THEN '<extra_id_' || (k - 1) || '>'
       |         ELSE NULL END AS pi,
       |    CASE WHEN NOT m THEN NULL
       |         WHEN spanstart = 1 THEN '<extra_id_' || (k - 1) || '>' || ' ' || w
       |         ELSE w END AS pt,
       |    k FROM sid),
       |agg AS (SELECT doc_id, count(*) AS n_tokens,
       |    sum(CASE WHEN m THEN 1 ELSE 0 END) AS n_masked,
       |    max(k) AS n_spans,
       |    string_agg(pi, ' ' ORDER BY i) AS inp,
       |    string_agg(pt, ' ' ORDER BY i) AS tgt
       |  FROM pieces GROUP BY doc_id)
       |SELECT d.doc_id,
       |  CAST(coalesce(a.n_tokens, 0) AS BIGINT) AS n_tokens,
       |  CAST(coalesce(a.n_masked, 0) AS BIGINT) AS n_masked,
       |  CAST(coalesce(a.n_spans, 0) AS BIGINT) AS n_spans,
       |  md5(coalesce(a.inp, '')) AS input_digest,
       |  md5(coalesce(a.tgt, '')) AS target_digest
       |FROM documents d LEFT JOIN agg a ON d.doc_id = a.doc_id""".stripMargin
  }

  /** Shuffle-shards oracle: md5('seed:id'), shard = first 16 hash bits mod
    * 16 (the [[graft.operators.Sampling.hashBucket]] hex-digit arithmetic),
    * pos = row_number within shard ordered by the full hash — hex strings
    * compare identically in both engines (lowercase ASCII).
    */
  private lazy val shuffleShardsOracle: String = {
    def dv(k: Int) =
      s"(CASE WHEN ascii(substr(hx, $k, 1)) >= 97 THEN ascii(substr(hx, $k, 1)) - 87" +
        s" ELSE ascii(substr(hx, $k, 1)) - 48 END)"
    s"""WITH h AS (SELECT doc_id, md5('42:' || doc_id::VARCHAR) AS hx FROM documents),
       |s AS (SELECT doc_id, hx,
       |        CAST((${dv(1)} * 4096 + ${dv(2)} * 256 + ${dv(3)} * 16 + ${dv(4)}) % 16 AS BIGINT) AS shard
       |      FROM h)
       |SELECT doc_id, shard,
       |       CAST(row_number() OVER (PARTITION BY shard ORDER BY hx, doc_id) - 1 AS BIGINT) AS pos
       |FROM s""".stripMargin
  }

  /** Stratified-sample oracle: lang scores are the text_quality oracle's;
    * the bucket re-derives Sampling.hashBucket (value of md5's first 4 hex
    * digits, mod 100) from ascii arithmetic.
    */
  private lazy val sampleStratifiedOracle: String = {
    def dv(k: Int) =
      s"(CASE WHEN ascii(substr(hx, $k, 1)) >= 97 THEN ascii(substr(hx, $k, 1)) - 87" +
        s" ELSE ascii(substr(hx, $k, 1)) - 48 END)"
    s"""WITH d0 AS (SELECT doc_id, text, string_split(lower(text), ' ') AS w,
       |              length(text) AS n FROM documents),
       |sc AS (SELECT doc_id,
       |  len(list_filter(w, x -> list_contains(['the','a','of','and','to','in','is','it','that','for'], x)))::DOUBLE / len(w) AS s_en,
       |  len(list_filter(w, x -> list_contains(['el','la','de','que','y','en','un','es','los','por'], x)))::DOUBLE / len(w) AS s_es,
       |  len(list_filter(w, x -> list_contains(['der','die','das','und','ist','von','mit','den','nicht','ein'], x)))::DOUBLE / len(w) AS s_de,
       |  len(list_filter(w, x -> list_contains(['le','la','de','et','un','est','que','pour','dans','les'], x)))::DOUBLE / len(w) AS s_fr,
       |  len(list_filter(w, x -> list_contains(['de5','shi4','le5','zai4','he2','you3','wo3','ta1','zhe4','bu4'], x)))::DOUBLE / len(w) AS s_zh
       |FROM d0),
       |lang AS (SELECT doc_id,
       |  CASE WHEN s_zh > greatest(s_en, s_es, s_de, s_fr) THEN 'zh'
       |       WHEN s_fr > greatest(s_en, s_es, s_de) THEN 'fr'
       |       WHEN s_de > greatest(s_en, s_es) THEN 'de'
       |       WHEN s_es > s_en THEN 'es'
       |       ELSE 'en' END AS lang_id
       |  FROM sc),
       |h AS (SELECT doc_id, lang_id, md5(doc_id::VARCHAR) AS hx FROM lang),
       |b AS (SELECT doc_id, lang_id,
       |        (${dv(1)} * 4096 + ${dv(2)} * 256 + ${dv(3)} * 16 + ${dv(4)}) % 100 AS bucket
       |      FROM h)
       |SELECT doc_id, lang_id FROM b
       |WHERE bucket < CASE lang_id WHEN 'en' THEN 10 ELSE 40 END""".stripMargin
  }

  /** Mega-cell sub-split replay: the dedup_semantic oracle's cells, plus —
    * for cells whose census exceeds clusterCap 25 — the engine's 8-bit LSH
    * sign bucket appended to the pair key, re-derived from the literal
    * hyperplane matrix (hyperplanes(1, 8, 64) is seeded and deterministic,
    * exactly like the ann_lsh oracle's). Light cells keep sub = 0, so one
    * (cid, sub) equality join replays both branches.
    */
  private lazy val dedupSemanticHotOracle: String = {
    val planes = VectorOps.hyperplanes(tables = 1, bits = 8, dim = 64).head
    val pl = planes.flatten.mkString("[", ",", "]")
    val subExpr = (0 until 8).map { b =>
      s"(CASE WHEN list_sum([m.v[i+1] * p[${b * 64}+i+1] for i in range(0,64)]) >= 0 THEN ${1 << b} ELSE 0 END)"
    }.mkString(" + ")
    s"""WITH pl AS (SELECT $pl::DOUBLE[] AS p),
       |n AS (SELECT vec_id, embedding::DOUBLE[] AS v FROM embeddings),
       |m AS (SELECT vec_id, v, sqrt(list_sum([x*x for x in v])) AS nrm FROM n),
       |st AS (SELECT greatest(25,
       |                CAST(ceil(sqrt(count(*)::DOUBLE)) AS BIGINT),
       |                CAST(ceil(count(*)::DOUBLE / 65536.0) AS BIGINT)) AS stride
       |       FROM m),
       |cent AS (SELECT vec_id AS cid, v AS cv, nrm AS cn FROM m
       |         WHERE vec_id % (SELECT stride FROM st) = 0),
       |sims AS (SELECT m.vec_id, cent.cid,
       |         list_sum([m.v[i]*cent.cv[i] for i in range(1, len(m.v)+1)]) /
       |           (m.nrm*cent.cn) AS cs
       |         FROM m CROSS JOIN cent),
       |assign AS (SELECT vec_id, cid FROM (
       |    SELECT *, row_number() OVER (PARTITION BY vec_id ORDER BY cs DESC, cid) AS rn
       |    FROM sims) WHERE rn = 1),
       |census AS (SELECT cid, count(*) AS cnt FROM assign GROUP BY cid),
       |sub AS (SELECT a.vec_id, a.cid,
       |          CASE WHEN census.cnt > 25 THEN $subExpr ELSE 0 END AS sub
       |        FROM assign a JOIN census USING (cid)
       |        JOIN m ON m.vec_id = a.vec_id CROSS JOIN pl),
       |cand AS (SELECT a.vec_id AS id_a, b.vec_id AS id_b, a.cid
       |         FROM sub a JOIN sub b
       |           ON a.cid = b.cid AND a.sub = b.sub AND a.vec_id < b.vec_id),
       |scored AS (SELECT cand.id_a, cand.id_b, cand.cid,
       |    round(list_sum([x.v[i]*y.v[i] for i in range(1, len(x.v)+1)]) /
       |          (x.nrm*y.nrm), 6) AS sim
       |    FROM cand JOIN m x ON x.vec_id = cand.id_a JOIN m y ON y.vec_id = cand.id_b)
       |SELECT id_b AS drop_id, id_a AS keep_id, cid, sim FROM (
       |  SELECT *, row_number() OVER (PARTITION BY id_b ORDER BY sim DESC, id_a) AS rn
       |  FROM scored WHERE sim >= 0.4)
       |WHERE rn = 1""".stripMargin
  }

  /** LSH ANN re-derived in DuckDB: VectorOps.hyperplanes is seeded and
    * deterministic, so the plane matrix embeds as a literal DOUBLE[].
    * Sign-dots accumulate left-to-right in both engines (Scala while-loop /
    * DuckDB list comprehension), so buckets — and therefore the candidate
    * set, the top-5, and the hash — are identical.
    */
  /** Exact replay of embeddingDuplicates' light banding path (the catalog
    * query lifts bucketCap out of range, so this IS the whole operator
    * there): the same deterministic hyperplanes as [[annLshOracle]],
    * candidates = distinct ordered pairs sharing any (table, bucket),
    * verification = exact cosine rounded half-up to 6. An earlier
    * brute-force all-pairs oracle was subtly wrong at scale: LSH is
    * approximate by contract, and at sf0.1 one sim-0.4626 pair misses all
    * 32 tables (expected ~0.2% at that angle) — the oracle must replay the
    * candidate structure, not idealize it.
    */
  /** Shared CTE prefix for the bucket-replay embedding oracles: the
    * literal hyperplane matrix, normed vectors, and one (vec_id, t, bucket)
    * row per (vector, table) — exactly the operator's candidate basis.
    */
  private lazy val embedBucketCtes: String = {
    val planes = VectorOps.hyperplanes(tables = 32, bits = 4, dim = 64)
    val pl = (for (t <- planes; b <- t; x <- b) yield x).mkString("[", ",", "]")
    def bucket(t: Int) = (0 until 4).map { b =>
      val off = (t * 4 + b) * 64
      s"(CASE WHEN list_sum([v[i+1] * p[$off+i+1] for i in range(0,64)]) >= 0 THEN ${1 << b} ELSE 0 END)"
    }.mkString(" + ")
    val ts = (0 until 32).mkString(", ")
    val buckets = (0 until 32).map(bucket).mkString(",\n      ")
    s"""WITH pl AS (SELECT $pl::DOUBLE[] AS p),
       |n AS (SELECT vec_id, embedding::DOUBLE[] AS v FROM embeddings),
       |m AS (SELECT vec_id, v, sqrt(list_sum([x*x for x in v])) AS nrm FROM n),
       |bk AS (SELECT vec_id,
       |    unnest([$ts]) AS t,
       |    unnest([
       |      $buckets
       |    ]) AS bucket
       |  FROM n CROSS JOIN pl)""".stripMargin
  }

  private lazy val dedupEmbedOracle: String =
    s"""$embedBucketCtes,
       |cand AS (SELECT DISTINCT a.vec_id AS id_a, b.vec_id AS id_b
       |         FROM bk a JOIN bk b
       |           ON a.t = b.t AND a.bucket = b.bucket AND a.vec_id < b.vec_id)
       |SELECT cand.id_a, cand.id_b,
       |  round(list_sum([x.v[i]*y.v[i] for i in range(1, len(x.v)+1)]) /
       |        (x.nrm*y.nrm), 6) AS sim
       |FROM cand JOIN m x ON x.vec_id = cand.id_a
       |          JOIN m y ON y.vec_id = cand.id_b
       |WHERE round(list_sum([x.v[i]*y.v[i] for i in range(1, len(x.v)+1)]) /
       |            (x.nrm*y.nrm), 6) >= 0.45""".stripMargin

  /** Incremental probe replay: candidates are cross pairs (batch = every
    * 10th vector, corpus = the rest) sharing any (table, bucket); with the
    * catalog cap lifted, the operator's exact-signature probe is a strict
    * subset of the bucket join (identical signatures share every bucket),
    * so this replays the whole candidate set.
    */
  private lazy val dedupEmbedIncrementalOracle: String =
    s"""$embedBucketCtes,
       |cand AS (SELECT DISTINCT a.vec_id AS new_id, b.vec_id AS old_id
       |         FROM bk a JOIN bk b
       |           ON a.t = b.t AND a.bucket = b.bucket
       |         WHERE a.vec_id % 10 = 0 AND b.vec_id % 10 <> 0)
       |SELECT cand.new_id, cand.old_id,
       |  round(list_sum([x.v[i]*y.v[i] for i in range(1, len(x.v)+1)]) /
       |        (x.nrm*y.nrm), 6) AS sim
       |FROM cand JOIN m x ON x.vec_id = cand.new_id
       |          JOIN m y ON y.vec_id = cand.old_id
       |WHERE round(list_sum([x.v[i]*y.v[i] for i in range(1, len(x.v)+1)]) /
       |            (x.nrm*y.nrm), 6) >= 0.45""".stripMargin

  /** BM25 portable-scoring replay (see
    * [[graft.operators.TextRank.bm25TopKPortable]]): whitespace tokens,
    * postings restricted to the query terms, idf quantized
    * `floor(ln((2N−2df+1)/(2df+1) + 1) · 2^20)` (the 2^20 multiply is
    * exact; the int/int division is correctly rounded IEEE on both
    * engines), tf ratio cleared of fractions by 10·T, one truncating
    * division per posting (`//` == Spark's `div` on these nonnegative
    * values), exact BIGINT sums. Returns the scored-docs CTE chain ending
    * in relation `co(doc_id, score_scaled)`.
    */
  private def bm25Ctes: String = {
    val terms = bm25Query.map(t => s"'$t'").mkString(", ")
    s"""WITH d0 AS (SELECT doc_id, string_split(lower(text), ' ') AS w
       |            FROM documents),
       |dl AS (SELECT doc_id, CAST(len(w) AS BIGINT) AS dl, w FROM d0),
       |st AS (SELECT CAST(count(*) AS BIGINT) AS n_docs,
       |              CAST(sum(dl) AS BIGINT) AS total_len FROM dl),
       |t AS (SELECT doc_id, dl, unnest(w) AS term FROM dl),
       |mt AS (SELECT doc_id, dl, term, CAST(count(*) AS BIGINT) AS tf
       |       FROM t WHERE term IN ($terms) GROUP BY 1, 2, 3),
       |dfr AS (SELECT term, CAST(count(DISTINCT doc_id) AS BIGINT) AS df
       |        FROM mt GROUP BY term),
       |sc AS (SELECT mt.doc_id,
       |         CAST(floor(ln((2 * st.n_docs - 2 * dfr.df + 1)::DOUBLE /
       |                       (2 * dfr.df + 1) + 1) * 1048576) AS BIGINT)
       |           AS idf_q,
       |         mt.tf, mt.dl, st.n_docs, st.total_len
       |       FROM mt JOIN dfr ON dfr.term = mt.term CROSS JOIN st),
       |co AS (SELECT doc_id,
       |         CAST(sum((idf_q * 22 * total_len * tf) //
       |                  (10 * total_len * tf + 3 * total_len +
       |                   9 * dl * n_docs)) AS BIGINT) AS score_scaled
       |       FROM sc GROUP BY doc_id)""".stripMargin
  }

  private lazy val textBm25Oracle: String =
    s"""$bm25Ctes
       |SELECT doc_id, score_scaled, CAST(rank AS INTEGER) AS rank FROM (
       |  SELECT *, row_number() OVER (ORDER BY score_scaled DESC, doc_id)
       |    AS rank
       |  FROM co)
       |WHERE rank <= 20""".stripMargin

  /** RRF fusion replay: the BM25 top-50 and the exact-cosine top-50
    * against vec 0, each contributing `1e9 // (60 + rank)`, summed as
    * exact BIGINTs, final top-10 by (rrf_score desc, id).
    */
  private lazy val hybridRrfOracle: String =
    s"""$bm25Ctes,
       |lex AS (SELECT doc_id AS id, rank FROM (
       |    SELECT doc_id, row_number() OVER
       |        (ORDER BY score_scaled DESC, doc_id) AS rank FROM co)
       |  WHERE rank <= 50),
       |nv AS (SELECT vec_id, embedding::DOUBLE[] AS v FROM embeddings),
       |mv AS (SELECT vec_id, v, sqrt(list_sum([x*x for x in v])) AS nrm
       |       FROM nv),
       |qv AS (SELECT * FROM mv WHERE vec_id = 0),
       |sscore AS (SELECT c.vec_id AS id,
       |    round(list_sum([qv.v[i]*c.v[i] for i in range(1, len(qv.v)+1)]) /
       |          (qv.nrm*c.nrm), 6) AS sim
       |  FROM qv JOIN mv c ON c.vec_id <> 0),
       |sem AS (SELECT id, rank FROM (
       |    SELECT id, row_number() OVER (ORDER BY sim DESC, id) AS rank
       |    FROM sscore)
       |  WHERE rank <= 50),
       |allr AS (SELECT id, 1000000000 // (60 + rank) AS c FROM lex
       |         UNION ALL
       |         SELECT id, 1000000000 // (60 + rank) FROM sem),
       |f AS (SELECT id, CAST(sum(c) AS BIGINT) AS rrf_score,
       |        CAST(count(*) AS BIGINT) AS n_lists
       |      FROM allr GROUP BY id)
       |SELECT id, rrf_score, n_lists, CAST(rank AS INTEGER) AS rank FROM (
       |  SELECT *, row_number() OVER (ORDER BY rrf_score DESC, id) AS rank
       |  FROM f)
       |WHERE rank <= 10""".stripMargin

  private lazy val annLshOracle: String = {
    val planes = VectorOps.hyperplanes(tables = 32, bits = 4, dim = 64)
    val pl = (for (t <- planes; b <- t; x <- b) yield x).mkString("[", ",", "]")
    def bucket(t: Int) = (0 until 4).map { b =>
      val off = (t * 4 + b) * 64
      s"(CASE WHEN list_sum([v[i+1] * p[$off+i+1] for i in range(0,64)]) >= 0 THEN ${1 << b} ELSE 0 END)"
    }.mkString(" + ")
    val ts = (0 until 32).mkString(", ")
    val buckets = (0 until 32).map(bucket).mkString(",\n      ")
    s"""WITH pl AS (SELECT $pl::DOUBLE[] AS p),
       |n AS (SELECT vec_id, embedding::DOUBLE[] AS v FROM embeddings),
       |m AS (SELECT vec_id, v, sqrt(list_sum([x*x for x in v])) AS nrm FROM n),
       |bk AS (SELECT vec_id,
       |    unnest([$ts]) AS t,
       |    unnest([
       |      $buckets
       |    ]) AS bucket
       |  FROM n CROSS JOIN pl),
       |cand AS (SELECT DISTINCT q.vec_id AS qid, c.vec_id AS nid
       |         FROM (SELECT * FROM bk WHERE vec_id % 50 = 0) q
       |         JOIN bk c ON q.t = c.t AND q.bucket = c.bucket AND q.vec_id <> c.vec_id),
       |scored AS (
       |  SELECT cand.qid, cand.nid,
       |         round(list_sum([a.v[i]*b.v[i] for i in range(1, len(a.v)+1)]) /
       |               (a.nrm*b.nrm), 6) AS sim
       |  FROM cand JOIN m a ON a.vec_id = cand.qid JOIN m b ON b.vec_id = cand.nid)
       |SELECT qid, nid, sim, CAST(rank AS INTEGER) AS rank FROM (
       |  SELECT *, row_number() OVER (PARTITION BY qid ORDER BY sim DESC, nid) AS rank
       |  FROM scored)
       |WHERE rank <= 5""".stripMargin
  }

  /** SimHash re-derived in DuckDB: same md5-hex bit basis as
    * TextDedup.md5Bit (digit j/4 of the first 16 hex chars, bit j%4), same
    * +-1 votes over the word multiset, same 4x16-bit chunk candidates, and
    * hamming summed over chunk XORs (== the 64-bit hamming). The catalog
    * query lifts bucketCap out of range, so plain chunk equality IS the
    * operator's candidate structure at any scale (at sf0.1 a dense chunk
    * value crossed the old default cap — the r9 oracle run caught the
    * 9-pair divergence); the cap fallback stays verified by the hot
    * variants.
    */
  private lazy val simhashOracle: String = {
    def digitVal(pos: Int) =
      s"(CASE WHEN ascii(substr(hx, $pos, 1)) >= 97 THEN ascii(substr(hx, $pos, 1)) - 87" +
        s" ELSE ascii(substr(hx, $pos, 1)) - 48 END)"
    val votes = (0 until 64).map { j =>
      s"sum(CASE WHEN (${digitVal(1 + j / 4)} >> ${j % 4}) & 1 = 1 THEN 1 ELSE -1 END) AS v$j"
    }.mkString(",\n  ")
    def chunk(c: Int) = (0 until 16).map { j =>
      s"(CASE WHEN v${16 * c + j} > 0 THEN ${1 << j} ELSE 0 END)"
    }.mkString(" + ")
    s"""WITH w AS (SELECT doc_id, unnest(string_split(text, ' ')) AS word FROM documents),
       |h AS (SELECT doc_id, substr(md5(word), 1, 16) AS hx FROM w),
       |v AS (SELECT doc_id,
       |  $votes
       |  FROM h GROUP BY doc_id),
       |ch AS (SELECT doc_id, ${chunk(0)} AS c0, ${chunk(1)} AS c1,
       |              ${chunk(2)} AS c2, ${chunk(3)} AS c3 FROM v)
       |SELECT id_a, id_b, hamming FROM (
       |  SELECT a.doc_id AS id_a, b.doc_id AS id_b,
       |    CAST(bit_count(xor(a.c0, b.c0)) + bit_count(xor(a.c1, b.c1)) +
       |         bit_count(xor(a.c2, b.c2)) + bit_count(xor(a.c3, b.c3)) AS INT) AS hamming
       |  FROM ch a JOIN ch b
       |    ON a.doc_id < b.doc_id
       |   AND (a.c0 = b.c0 OR a.c1 = b.c1 OR a.c2 = b.c2 OR a.c3 = b.c3))
       |WHERE hamming <= 3""".stripMargin
  }

  /** The bigram-LM self-scoring replay — `text_lm`'s oracle, also embedded
    * as a CTE by `text_ccnet_buckets`.
    */
  private lazy val textLmOracle: String =
    """WITH ws AS (SELECT doc_id, string_split_regex(lower(text), '\s+') AS w
      |            FROM documents),
      |g AS (SELECT doc_id, p.w1 AS w1, p.w2 AS w2 FROM
      |        (SELECT doc_id,
      |           unnest(list_transform(generate_series(1, len(w) - 1),
      |             i -> struct_pack(w1 := w[i], w2 := w[i + 1]))) AS p
      |         FROM ws WHERE len(w) >= 2)),
      |c2 AS (SELECT w1, w2, count(*) AS c2 FROM g GROUP BY w1, w2),
      |c1 AS (SELECT w1, sum(c2) AS c1 FROM c2 GROUP BY w1),
      |v AS (SELECT count(*) AS v FROM c1),
      |ppm AS (SELECT w1, w2,
      |          ((c2 + 1) * 1000000) // (c1 + (SELECT v FROM v)) AS ppm
      |        FROM c2 JOIN c1 USING (w1)),
      |d AS (SELECT doc_id, count(*) AS nb, sum(ppm) AS sp
      |      FROM g JOIN ppm USING (w1, w2) GROUP BY doc_id)
      |SELECT doc_id, coalesce(nb, 0)::BIGINT AS n_bigrams,
      |       coalesce(sp, 0)::BIGINT AS sum_cond_ppm,
      |       CAST(sp // nb AS BIGINT) AS mean_cond_ppm
      |FROM documents LEFT JOIN d USING (doc_id)""".stripMargin
}
