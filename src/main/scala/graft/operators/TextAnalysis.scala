package graft.operators

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Text analysis for training-data pipelines: language id, quality scoring,
  * token counting, document fingerprinting. All codegen'd column
  * expressions — narrow maps that scale embarrassingly.
  */
object TextAnalysis {

  /** Tiny function-word profiles. A real pipeline would ship larger
    * profiles; the operator shape (set-intersect scoring + fixed-order
    * argmax) is what matters.
    */
  val langProfiles: Seq[(String, Seq[String])] = Seq(
    "en" -> Seq("the", "a", "of", "and", "to", "in", "is", "it", "that", "for"),
    "es" -> Seq("el", "la", "de", "que", "y", "en", "un", "es", "los", "por"),
    "de" -> Seq("der", "die", "das", "und", "ist", "von", "mit", "den", "nicht", "ein"),
    "fr" -> Seq("le", "la", "de", "et", "un", "est", "que", "pour", "dans", "les"),
    "zh" -> Seq("de5", "shi4", "le5", "zai4", "he2", "you3", "wo3", "ta1", "zhe4", "bu4")
  )

  private def words(text: Column): Column = split(lower(text), "\\s+")

  /** Per-language score: occurrences of profile words / total words. */
  def langScore(text: Column, profile: Seq[String]): Column = {
    val w = words(text)
    val prof = array(profile.map(lit): _*)
    size(filter(w, x => array_contains(prof, x))).cast("double") / size(w)
  }

  /** Most likely language by profile score, ties resolved in profile order.
    *
    * Argmax as `array_max` over (score, -profileIndex, lang) structs: a
    * later profile wins only on a strictly greater score (equal scores fall
    * to the -index field, which prefers the earliest profile) — the same
    * decision a `when(s > best)` fold makes, but each score expression
    * appears exactly ONCE. The fold form embedded the running best score
    * twice per level, doubling the (interpreted, HOF-based) score
    * subtrees per profile — 2^profiles copies that common-subexpression
    * elimination cannot dedupe outside codegen; observed 10x on the
    * sampling query. NaN scores only occur all-at-once (a wordless text
    * NaNs every profile), so struct ordering's NaN-is-largest never
    * diverges from the fold's comparison semantics.
    */
  def langId(text: Column): Column = {
    val cands = langProfiles.zipWithIndex.map { case ((l, p), i) =>
      struct(langScore(text, p).as("s"), lit(-i).as("p"), lit(l).as("l"))
    }
    array_max(array(cands: _*)).getField("l")
  }

  /** Whitespace token count. */
  def wsTokens(text: Column): Column = size(words(text))

  /** BPE-ish subword count: alpha runs, digit runs and single punctuation
    * marks each count as one token.
    */
  def subwordTokens(text: Column): Column =
    size(regexp_extract_all(lower(text), lit("[a-z]+|[0-9]+|[^a-z0-9 ]"), lit(0)))

  /** Quality features + a composite score in [0, 1]:
    * penalises very short docs, high digit/punct ratios, low stopword ratio
    * — the usual cheap pre-filters before expensive dedup/scoring stages.
    */
  def qualityFeatures(text: Column): Seq[(String, Column)] = {
    val n = length(text)
    val w = words(text)
    val nWords = size(w)
    val digitRatio = (n - length(regexp_replace(text, "[0-9]", ""))).cast("double") / n
    val punctRatio = (n - length(regexp_replace(text, "[^a-zA-Z0-9 ]", ""))).cast("double") / n
    val stopRatio = langScore(text, langProfiles.head._2)
    val meanWordLen = (n - (nWords - 1)).cast("double") / nWords
    val score =
      least(nWords.cast("double") / 20, lit(1.0)) * 0.4 +
        (lit(1.0) - least(digitRatio * 5, lit(1.0))) * 0.2 +
        (lit(1.0) - least(punctRatio * 5, lit(1.0))) * 0.2 +
        least(stopRatio * 5, lit(1.0)) * 0.2
    Seq(
      "n_words" -> nWords.cast("long"),
      "digit_ratio" -> round(digitRatio, 6),
      "punct_ratio" -> round(punctRatio, 6),
      "stop_ratio" -> round(stopRatio, 6),
      "mean_word_len" -> round(meanWordLen, 6),
      "quality" -> round(score, 6))
  }

  /** Corpus-frequency familiarity per document — the shape of a unigram-LM
    * quality scorer with the corpus itself as the table (swap in an external
    * frequency table at production scale without changing the plan):
    * `commonness` = mean corpus probability of the document's words
    * (Σ count(w) / (n_words · N)), `hapax` = how many of its word
    * occurrences are corpus-unique. Low commonness / high hapax flags
    * gibberish, OCR noise, and rare-language contamination — the cheap
    * LM-style pre-filter before expensive scoring.
    *
    * Deliberately built on INTEGER sums + one final division: word counts
    * are exact, so the score is bit-stable across engines, partitionings,
    * and reruns (a mean-log-prob formulation would hang the oracle hash on
    * libm `ln` rounding and float summation order).
    *
    * Scale shape: one map-side-combined count shuffle for the frequency
    * table, one join of occurrences to frequencies on the word key, one
    * per-doc aggregate; the corpus-total is a 1-row broadcast.
    *
    * @param docs frame with `idCol` and `textCol`
    */
  def corpusFamiliarity(docs: org.apache.spark.sql.DataFrame,
                        idCol: String, textCol: String): org.apache.spark.sql.DataFrame = {
    val w = Spread(docs.select(col(idCol).as("doc_id"), col(textCol).as("_t")))
      .select(col("doc_id"), explode(words(col("_t"))).as("word"))
    val freq = w.groupBy("word").agg(count(lit(1)).as("c"))
    val total = freq.agg(sum(col("c")).as("n"))
    val agg = w.join(freq, "word")
      .groupBy("doc_id")
      .agg(count(lit(1)).as("_nw"),
        sum(col("c")).as("_fs"),
        sum(when(col("c") === 1, 1L).otherwise(0L)).as("_hx"))
    // left-join back to the full id set: a document whose text yields no
    // word rows (empty/whitespace-only — exactly what a quality pre-filter
    // must see) still gets a row, with 0 counts and NULL commonness
    docs.select(col(idCol).as("doc_id"))
      .join(agg, Seq("doc_id"), "left")
      .crossJoin(broadcast(total))
      .select(col("doc_id"),
        coalesce(col("_nw"), lit(0L)).as("n_words"),
        coalesce(col("_hx"), lit(0L)).as("hapax"),
        round(col("_fs").cast("double") / (col("_nw") * col("n")), 6)
          .as("commonness"))
  }

  /** Bigram-LM conditional-probability score per document — the
    * distributed, bit-stable stand-in for the KenLM perplexity quality
    * filter of CCNet (Wenzek et al. 2019, arXiv:1911.00359): text whose
    * word transitions are improbable under the corpus's own bigram model
    * (gibberish, OCR noise, wrong-language shards) scores low and gets
    * filtered before training.
    *
    * Integer-quantized Laplace bigram model, the [[corpusFamiliarity]]
    * stance taken one order up: each bigram occurrence contributes
    * `ppm = (1e6 * (C(w1 w2) + 1)) div (C(w1 ·) + V)` (V = distinct
    * prefix vocabulary) — pure integer arithmetic — and the document
    * score is `mean_cond_ppm = Σ ppm div n_bigrams` — integer end to end,
    * so the score is bit-identical across engines, partitionings, and
    * reruns (an earlier floating mean hit a 6th-decimal round-half tie
    * between Spark's and DuckDB's `round` on the very first corpus; a
    * mean-log-prob "real" perplexity would be worse — libm `ln` rounding
    * plus float summation order. The quantized smoothed-conditional mean
    * preserves the filtering ranking.) The
    * smoothing is load-bearing, not cosmetic: UNsmoothed conditionals
    * score a hapax prefix's single continuation at probability 1, so
    * unique-word gibberish would rank HIGHEST; Laplace pins a
    * never-seen-prefix transition near 2/V instead. The `div` product
    * `(C2+1) * 1e6` stays inside a long up to ~9e12 occurrences of a
    * single bigram.
    *
    * Scale shape: words split ONCE below the Spread shuffle and the
    * narrow (doc, w1, w2) gram frame persisted (two consumers); ONE
    * map-side-combined bigram count; prefix totals are a second agg over
    * the GRAM TABLE (vocab-bounded, not corpus-bounded); the score join
    * shuffles gram pairs on the gram key — at web scale the model table
    * outgrows any broadcast, so the shuffle join IS the plan. Wordless /
    * single-word documents keep a row via the left join (0 bigrams, NULL
    * score).
    */
  def bigramLmScores(docs: org.apache.spark.sql.DataFrame, idCol: String,
                     textCol: String): org.apache.spark.sql.DataFrame = {
    import org.apache.spark.storage.StorageLevel
    val g = bigramGrams(docs, idCol, textCol)
      .persist(StorageLevel.MEMORY_AND_DISK) // consumed by model AND score
    // NOT eagerly filled (measured): the model branch and the scoring join
    // race the cache, but the duplicated narrow pass overlaps otherwise
    // idle cores — serializing it read +0.5 s on the sf0.1 bench
    val c2 = g.groupBy("w1", "w2").agg(count(lit(1)).as("c2"))
    val c1 = c2.groupBy("w1").agg(sum(col("c2")).as("c1"))
    val vocab = c1.agg(count(lit(1)).as("v"))
    val model = c2.join(c1, "w1")
      .crossJoin(broadcast(vocab))
      .select(col("w1"), col("w2"),
        expr("(c2 + 1) * 1000000 div (c1 + v)").as("ppm"))
    // self-scoring: every doc bigram exists in the model, so an inner
    // join is exact (the general OOV path lives in bigramLmScoresWith)
    val agg = g.join(model, Seq("w1", "w2"))
      .groupBy("doc_id")
      .agg(count(lit(1)).as("_nb"), sum(col("ppm")).as("_sp"))
    scoreOutput(docs, idCol, agg)
  }

  /** The (doc_id, w1, w2) bigram-occurrence frame shared by the LM
    * builders: words split once below the Spread shuffle, pair structs
    * built positionally (a <2-word doc yields no rows).
    */
  private def bigramGrams(docs: org.apache.spark.sql.DataFrame, idCol: String,
                          textCol: String): org.apache.spark.sql.DataFrame =
    // pair array built by the native WordBigrams kernel — one call per row
    // instead of an interpreted transform lambda + struct allocation per
    // pair (r15; LlmOpsSpec pins bit-equality against the HOF form, which
    // also covers the folded-in `when(size >= 2, ...)` empty-array guard)
    Spread(docs.select(col(idCol).as("doc_id"),
        split(lower(col(textCol)), "\\s+").as("_ws")))
      .select(col("doc_id"),
        explode(graft.functions.WordBigrams.wordBigrams(col("_ws"))).as("_p"))
      .select(col("doc_id"), col("_p.w1").as("w1"), col("_p.w2").as("w2"))

  private def scoreOutput(docs: org.apache.spark.sql.DataFrame, idCol: String,
                          agg: org.apache.spark.sql.DataFrame): org.apache.spark.sql.DataFrame =
    docs.select(col(idCol).as("doc_id"))
      .join(agg, Seq("doc_id"), "left")
      .select(col("doc_id"),
        coalesce(col("_nb"), lit(0L)).as("n_bigrams"),
        coalesce(col("_sp"), lit(0L)).as("sum_cond_ppm"),
        expr("_sp div _nb").as("mean_cond_ppm"))

  /** A trained bigram LM as a first-class artifact (the [[TextDedup]]
    * MinhashIndex stance): `c2` pair counts are the ONLY persistent state —
    * prefix totals and the vocabulary size re-derive from them — so
    * [[BigramModel.save]] writes one narrow parquet table and
    * [[loadBigramModel]] reconstructs the rest with two aggregations.
    * This is the real CCNet shape: the model trains on a REFERENCE corpus
    * (Wikipedia in the paper; a curated slice here) and scores the crawl,
    * so "improbable" means improbable *in the target domain*, not merely
    * rare in the crawl itself.
    */
  final case class BigramModel(c2: org.apache.spark.sql.DataFrame,
                               c1: org.apache.spark.sql.DataFrame,
                               vocab: Long) {
    def save(path: String): Unit =
      c2.write.mode("overwrite").parquet(path)
  }

  /** Train a [[BigramModel]] on a reference corpus. */
  def bigramModel(ref: org.apache.spark.sql.DataFrame, idCol: String,
                  textCol: String): BigramModel =
    modelFromCounts(bigramGrams(ref, idCol, textCol)
      .groupBy("w1", "w2").agg(count(lit(1)).as("c2")))

  /** Reload a [[BigramModel]] saved by [[BigramModel.save]]. */
  def loadBigramModel(spark: org.apache.spark.sql.SparkSession,
                      path: String): BigramModel =
    modelFromCounts(spark.read.parquet(path))

  private def modelFromCounts(c2: org.apache.spark.sql.DataFrame): BigramModel = {
    import org.apache.spark.storage.StorageLevel
    val c2p = c2.persist(StorageLevel.MEMORY_AND_DISK)
    val c1 = c2p.groupBy("w1").agg(sum(col("c2")).as("c1"))
      .persist(StorageLevel.MEMORY_AND_DISK)
    BigramModel(c2p, c1, c1.count())
  }

  /** [[bigramLmScores]] against an EXTERNAL [[BigramModel]] — full Laplace
    * with out-of-vocabulary handling, still integer end to end: a bigram
    * scores `(C2+1)*1e6 div (C1+V)` with `C2 = 0` for an unseen pair and
    * `C1 = 0` for an unseen prefix, so OOV text degrades smoothly to
    * ~`1e6 div V` per transition instead of erroring or NULLing out.
    * Left joins keep every document's bigrams; the model side is
    * vocab-bounded, so at web scale both joins shuffle gram keys against
    * a table that does NOT grow with the scored corpus.
    */
  def bigramLmScoresWith(docs: org.apache.spark.sql.DataFrame, idCol: String,
                         textCol: String,
                         model: BigramModel): org.apache.spark.sql.DataFrame = {
    val g = bigramGrams(docs, idCol, textCol)
    val agg = g
      .join(model.c2, Seq("w1", "w2"), "left")
      .join(model.c1, Seq("w1"), "left")
      .select(col("doc_id"),
        expr(s"(coalesce(c2, 0) + 1) * 1000000 div (coalesce(c1, 0) + ${model.vocab})")
          .as("ppm"))
      .groupBy("doc_id")
      .agg(count(lit(1)).as("_nb"), sum(col("ppm")).as("_sp"))
    scoreOutput(docs, idCol, agg)
  }

  /** Document fingerprint: lexicographic minimum of the md5 of each 5-word
    * window — a winnowing-style rolling selection that is stable under small
    * edits away from the minimum window. md5 keeps it reproducible in any
    * engine. Same per-element-re-split caveat as [[wordNgrams]]; corpus
    * pipelines use [[fingerprintFrame]].
    */
  def fingerprint(text: Column, window: Int = 5): Column =
    fingerprintOfWords(words(text), window)

  /** [[fingerprint]] over a pre-split words array. */
  def fingerprintOfWords(w: Column, window: Int = 5): Column =
    array_min(transform(sequence(lit(0), greatest(size(w) - window, lit(0))),
      i => md5(concat_ws(" ", slice(w, i + lit(1), lit(window))))))

  /** Frame-level [[fingerprint]]: computes the split ONCE per row behind a
    * collapse barrier, so the window lambda reads a materialized attribute.
    *
    * The Column form embeds `split(text)` in the (interpreted) transform
    * lambda, whose body re-evaluates per element — every window position
    * re-splits the whole document, O(words²) per row. A narrow map has no
    * shuffle boundary to materialize at, so the split is projected in its
    * own stage. What actually keeps the stages apart is CollapseProject's
    * cost rule: it declines to inline a non-cheap expression (the regex
    * split) that the upper projection references more than once (`size` in
    * the sequence bound + `slice` in the lambda body). The extra
    * `monotonically_increasing_id` column is belt-and-braces — note that it
    * alone is NOT load-bearing: ColumnPruning removes unreferenced child
    * columns regardless of determinism, so if a future edit made the upper
    * stage reference `_ws` exactly once the projections would silently
    * collapse back to O(words²). `PlanSpec`'s "collapse barriers hold" test
    * pins the behavior (the split must appear exactly once in the executed
    * plan) so that regression is loud. Still a pure narrow map — zero
    * exchanges. 3.4 s → linear at 5k docs / 271k words on the sf0.1 bench.
    */
  def fingerprintFrame(docs: org.apache.spark.sql.DataFrame, idCol: String,
                       textCol: String, window: Int = 5,
                       fpName: String = "fp"): org.apache.spark.sql.DataFrame =
    docs.select(col(idCol).as("doc_id"),
        split(lower(col(textCol)), "\\s+").as("_ws"),
        monotonically_increasing_id().as("_b"))
      .select(col("doc_id"), fingerprintOfWords(col("_ws"), window).as(fpName))

  /** Frame-level [[repetitionFeatures]], same barrier rationale as
    * [[fingerprintFrame]]: stage 1 pins the split words, stage 2 pins the
    * gram array AND both counts (so `array_distinct` runs once, not twice),
    * stage 3 derives the ratio. Zero exchanges.
    */
  def repetitionFrame(docs: org.apache.spark.sql.DataFrame, idCol: String,
                      textCol: String, n: Int = 3): org.apache.spark.sql.DataFrame =
    docs.select(col(idCol).as("doc_id"),
        split(lower(col(textCol)), "\\s+").as("_ws"),
        monotonically_increasing_id().as("_b1"))
      // native WordNgrams kernel — one call per row instead of an
      // interpreted lambda + slice + concat_ws per window (r15)
      .select(col("doc_id"),
        graft.functions.WordNgrams.wordNgrams(col("_ws"), n).as("_grams"),
        monotonically_increasing_id().as("_b2"))
      .select(col("doc_id"),
        size(col("_grams")).cast("long").as("n_grams"),
        size(array_distinct(col("_grams"))).cast("long").as("n_distinct"),
        monotonically_increasing_id().as("_b3"))
      .select(col("doc_id"), col("n_grams"), col("n_distinct"),
        round(lit(1.0) - col("n_distinct").cast("double") / col("n_grams"), 6)
          .as("rep_ratio"))

  /** All word n-grams of `text` as space-joined strings (one per start
    * position; a doc shorter than `n` words yields its single truncated
    * window). Shared basis for repetition scoring and boilerplate mining.
    *
    * NOTE for corpus-scale callers: this form embeds the regex split in the
    * (interpreted) transform lambda, which re-evaluates its body per
    * element — every window position re-splits the whole text, O(words²)
    * per document. Fine for per-doc feature maps over short docs; corpus
    * gram pipelines should project the split once below a shuffle boundary
    * and call [[ngramsOfWords]] on the materialized attribute (the same
    * contract as [[TextDedup.shinglesOfWords]]).
    */
  def wordNgrams(text: Column, n: Int): Column =
    ngramsOfWords(words(text), n)

  /** [[wordNgrams]] over a pre-split words array. */
  def ngramsOfWords(w: Column, n: Int): Column =
    transform(sequence(lit(0), greatest(size(w) - n, lit(0))),
      i => concat_ws(" ", slice(w, i + lit(1), lit(n))))

  /** Intra-document repetition: the fraction of word `n`-grams that are
    * repeats of an earlier window (1 - distinct/total). The standard cheap
    * filter for looping generations, boilerplate-stuffed pages and OCR
    * stutter. Narrow codegen'd map — no shuffle, no state.
    */
  def repetitionFeatures(text: Column, n: Int = 3): Seq[(String, Column)] = {
    val grams = wordNgrams(text, n)
    Seq(
      "n_grams" -> size(grams).cast("long"),
      "n_distinct" -> size(array_distinct(grams)).cast("long"),
      "rep_ratio" -> round(lit(1.0) -
        size(array_distinct(grams)).cast("double") / size(grams), 6))
  }

  /** Gopher/MassiveText-shaped document quality rules (Rae et al. 2021,
    * arXiv:2112.11446, table A1) over a text column that may contain line
    * breaks — the standard pre-training filter stack: length/word-shape
    * bounds, symbol-line structure (bullets, ellipses), intra-document
    * duplication (duplicate lines, dominant bigram). Two deviations from
    * the paper, both documented: fractions are COUNT fractions (the paper
    * mixes count and character fractions; integer counts keep the score
    * bit-stable across engines, the same stance as [[corpusFamiliarity]]),
    * and the stop-word rule is covered separately by
    * [[qualityFeatures]]'s `stop_ratio`.
    *
    * Shape: pure narrow map, zero exchanges. The lines / words / bigram
    * arrays are pinned behind [[fingerprintFrame]]-style collapse barriers
    * so each materializes once per row; the dominant-bigram count comes
    * from the longest equal run of the SORTED bigram array — one
    * O(n log n) `array_sort` plus one linear `aggregate` fold per doc,
    * never the O(n²) per-element `filter` count.
    *
    * Thresholds (gopher_pass): 50 <= n_words <= 100000, 3 <= mean word
    * length <= 10, >= 80% of words contain an alphabetic character,
    * duplicate-line fraction <= 0.30, bullet-start lines <= 0.90,
    * ellipsis-end lines <= 0.30, dominant bigram <= 0.20 of bigrams.
    */
  def gopherFrame(docs: org.apache.spark.sql.DataFrame, idCol: String,
                  textCol: String): org.apache.spark.sql.DataFrame = {
    // One native kernel call per row (graft.functions.GopherStats) instead
    // of the interpreted-HOF stack: the fold/filter/sort/transform lambdas
    // are CodegenFallback per ELEMENT, so every word paid several Catalyst
    // lambda invocations (r15, guide §"expressions and codegen"; KernelBench
    // gopher mode carries the A/B, LlmOpsSpec the bit-identical differential
    // vs the retained HOF formulation below).
    val st = graft.functions.GopherStats.gopherStats(col(textCol)).as("_g")
    docs.select(col(idCol).as("doc_id"), st)
      .select(col("doc_id"),
        col("_g.n_words").as("n_words"),
        col("_g.mean_word_len").as("mean_word_len"),
        col("_g.frac_alpha_words").as("frac_alpha_words"),
        col("_g.dup_line_frac").as("dup_line_frac"),
        col("_g.bullet_line_frac").as("bullet_line_frac"),
        col("_g.ellipsis_line_frac").as("ellipsis_line_frac"),
        col("_g.top_bigram_frac").as("top_bigram_frac"),
        (col("_g.n_words").between(50L, 100000L) &&
          col("_g.mean_word_len").between(3.0, 10.0) &&
          col("_g.frac_alpha_words") >= 0.8 &&
          col("_g.dup_line_frac") <= 0.3 &&
          col("_g.bullet_line_frac") <= 0.9 &&
          col("_g.ellipsis_line_frac") <= 0.3 &&
          col("_g.top_bigram_frac") <= 0.2).as("gopher_pass"))
  }

  /** The original interpreted-HOF formulation of [[gopherFrame]] — retained
    * as the differential oracle for the [[graft.functions.GopherStats]]
    * kernel (LlmOpsSpec asserts bit-identical frames on the planted-rule and
    * randomized corpora; KernelBench's `gopher` mode carries the A/B).
    */
  def gopherFrameHof(docs: org.apache.spark.sql.DataFrame, idCol: String,
                     textCol: String): org.apache.spark.sql.DataFrame = {
    // longest equal run in the sorted bigram array = the dominant bigram's
    // occurrence count (state: previous element, current run, best run)
    def maxRun(sorted: Column): Column = aggregate(
      sorted,
      struct(lit("").as("prev"), lit(0L).as("run"), lit(0L).as("best")),
      (acc, x) => {
        val run = when(x === acc.getField("prev"), acc.getField("run") + 1L)
          .otherwise(lit(1L))
        struct(x.as("prev"), run.as("run"),
          greatest(acc.getField("best"), run).as("best"))
      },
      acc => acc.getField("best"))
    docs.select(col(idCol).as("doc_id"),
        split(col(textCol), "\n").as("_ls"),
        split(col(textCol), "\\s+").as("_ws"),
        monotonically_increasing_id().as("_b1"))
      .select(col("doc_id"), col("_ls"), col("_ws"),
        size(col("_ws")).cast("long").as("n_words"),
        array_sort(ngramsOfWords(col("_ws"), 2)).as("_bgs"),
        monotonically_increasing_id().as("_b2"))
      .select(col("doc_id"),
        col("n_words"),
        round(aggregate(col("_ws"), lit(0L), (a, x) => a + length(x))
          .cast("double") / col("n_words"), 6).as("mean_word_len"),
        round(size(filter(col("_ws"), x => x.rlike("[A-Za-z]")))
          .cast("double") / col("n_words"), 6).as("frac_alpha_words"),
        round((size(col("_ls")) - size(array_distinct(col("_ls"))))
          .cast("double") / size(col("_ls")), 6).as("dup_line_frac"),
        round(size(filter(col("_ls"), x => x.startsWith("- ")))
          .cast("double") / size(col("_ls")), 6).as("bullet_line_frac"),
        round(size(filter(col("_ls"), x => x.endsWith("...")))
          .cast("double") / size(col("_ls")), 6).as("ellipsis_line_frac"),
        round(when(col("n_words") < 2, lit(0.0))
          .otherwise(maxRun(col("_bgs")).cast("double") / (col("n_words") - 1)), 6)
          .as("top_bigram_frac"),
        monotonically_increasing_id().as("_b3"))
      .select(col("doc_id"), col("n_words"), col("mean_word_len"),
        col("frac_alpha_words"), col("dup_line_frac"),
        col("bullet_line_frac"), col("ellipsis_line_frac"),
        col("top_bigram_frac"),
        (col("n_words").between(50L, 100000L) &&
          col("mean_word_len").between(3.0, 10.0) &&
          col("frac_alpha_words") >= 0.8 &&
          col("dup_line_frac") <= 0.3 &&
          col("bullet_line_frac") <= 0.9 &&
          col("ellipsis_line_frac") <= 0.3 &&
          col("top_bigram_frac") <= 0.2).as("gopher_pass"))
  }

  /** PII patterns: (name, regex, replacement). The regexes are written for
    * the portable intersection of Java regex and RE2 (character classes,
    * bounded repetition, `\b`) so an external SQL oracle reproduces both
    * the match counts and the redacted text byte-for-byte. The phone
    * pattern requires a leading `+` — the no-prefix forms ("555 0100")
    * false-positive on ordinary numeric text, and a redaction pass must be
    * precision-biased (a dropped real phone number costs one leak; a
    * mangled measurement corrupts training text corpus-wide).
    */
  val piiPatterns: Seq[(String, String, String)] = Seq(
    ("emails", "[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{2,}", "<EMAIL>"),
    ("ipv4", "\\b[0-9]{1,3}\\.[0-9]{1,3}\\.[0-9]{1,3}\\.[0-9]{1,3}\\b", "<IP>"),
    ("ssns", "\\b[0-9]{3}-[0-9]{2}-[0-9]{4}\\b", "<SSN>"),
    // card before phone: a spaced 16-digit PAN is a substring of what the
    // phone pattern would otherwise swallow
    ("cards", "\\b[0-9]{4}[- ][0-9]{4}[- ][0-9]{4}[- ][0-9]{4}\\b", "<CARD>"),
    ("phones", "\\+[0-9][0-9()\\- ]{6,}[0-9]", "<PHONE>"))

  /** Per-document PII match counts (one `n_<name>` column per pattern).
    * Narrow codegen'd map — no shuffle.
    */
  def piiCounts(text: Column): Seq[(String, Column)] =
    piiPatterns.map { case (name, re, _) =>
      s"n_$name" -> regexp_count(text, lit(re)).cast("long")
    }

  /** Redact all PII patterns from `text`, in [[piiPatterns]] order (emails
    * before IPs before phones — the earlier replacements' placeholders
    * contain no characters the later patterns match, so the passes are
    * order-independent in effect; the fixed order just makes the output
    * deterministic by construction). Narrow map; `regexp_replace` is
    * global in both Spark and ANSI-SQL engines' `'g'` mode.
    */
  def redactPii(text: Column): Column =
    piiPatterns.foldLeft(text) { case (t, (_, re, rep)) =>
      regexp_replace(t, re, rep)
    }

  /** Corpus-level boilerplate mining: the `k` most frequent word `n`-grams
    * across `docs`, with the number of distinct documents each appears in —
    * the candidate list a boilerplate-removal pass strips (headers, footers,
    * license blurbs). Total order (count desc, gram asc) makes the top-k
    * deterministic under ties.
    *
    * Scale shape: explode is narrow; the gram count is ONE map-side-combined
    * shuffle keyed by gram (doc multiplicity pre-aggregated per partition);
    * top-k is a `TakeOrderedAndProject`, never a global sort.
    *
    * `minOccurrences` (default 1 = off): with a value > 1, a pure-count
    * pre-pass (fully map-side combinable, no doc_id in the shuffle key)
    * selects candidate grams first, and only their (gram, doc_id) pairs
    * enter the exact `count_distinct` aggregation — AQE broadcasts the
    * candidate set when it is small. The caller owns the threshold: a gram
    * with fewer total occurrences than `minOccurrences` is excluded even if
    * it would otherwise rank.
    *
    * When it pays (measured at 500k docs, BENCH_SCALING.md round-8 notes):
    * NOT for wall-clock on singleton-dominated corpora — a singleton gram
    * is one shuffled row in the pre-pass AND one in the expansion, so the
    * filter saves little shuffle volume while adding a second scan and a
    * join. Its value is bounding the exact aggregation's working set (the
    * candidate set is tiny after the cut — 6 grams vs 21M in the measured
    * corpus), i.e. when the unfiltered (gram, doc_id) hash aggregation is
    * memory-bound/spilling, and for repeated mining over a materialized
    * exploded-gram table where the scan is paid once.
    */
  def boilerplateNgrams(docs: org.apache.spark.sql.DataFrame, idCol: String,
                        textCol: String, n: Int = 3, k: Int = 20,
                        minOccurrences: Long = 1L): org.apache.spark.sql.DataFrame = {
    // split ONCE below the Spread shuffle: the gram lambda then reads a
    // materialized words attribute instead of re-splitting the text per
    // window position (interpreted HOF bodies re-evaluate per element —
    // O(words²) per doc; 3.9 s → 1.9 s at 5k docs, 271k words)
    def exploded = Spread(docs.select(col(idCol).as("doc_id"),
        split(lower(col(textCol)), "\\s+").as("_ws")))
      .select(col("doc_id"),
        // native WordNgrams kernel: one call per row instead of an
        // interpreted lambda + slice + concat_ws per window (r15;
        // LlmOpsSpec pins bit-equality against ngramsOfWords)
        explode(graft.functions.WordNgrams.wordNgrams(col("_ws"), n)).as("gram"))
    val candidates =
      if (minOccurrences <= 1L) exploded
      else exploded.join(
        exploded.groupBy("gram").agg(count(lit(1)).as("occ"))
          .filter(col("occ") >= minOccurrences).select("gram"),
        Seq("gram"))
    candidates
      .groupBy("gram")
      .agg(count(lit(1)).as("n_occurrences"),
        count_distinct(col("doc_id")).as("n_docs"))
      .orderBy(col("n_occurrences").desc, col("gram").asc)
      .limit(k)
  }

  /** Collocation mining: the top-`k` adjacent word pairs by LIFT —
    * `c(ab) · T / (c(a) · c(b))` with T the total token count — which is
    * the MONOTONE integer twin of pointwise mutual information
    * (PMI = ln(lift)): the ranking is the PMI ranking with none of ln's
    * cross-engine rounding, so the whole row is integer-exact (the
    * [[tfidfKeywords]] stance). The vocabulary/tokenizer-construction
    * primitive: bigrams that co-occur far above chance are merge and
    * phrase candidates.
    *
    * `minCount` prunes the singleton-pair tail BEFORE the unigram joins
    * (the same reason boilerplateNgrams pre-filters); lift's denominator
    * is exact BIGINT, the ppm numerator widens through DECIMAL(38,0) —
    * `1e6 · c(ab) · T` passes 2^63 for corpora beyond ~3e6 tokens, and
    * HUGEINT/DECIMAL keep both engines exact. Scale shape: two
    * vocabulary-sized map-side-combinable aggregates, word-keyed joins
    * (never broadcast — a vocabulary outgrows driver memory at corpus
    * scale), one broadcast one-row total, `TakeOrderedAndProject` top-k.
    *
    * Output: (w1, w2, n_pair, n_w1, n_w2, lift_ppm, rank), ranked by
    * (lift_ppm desc, w1, w2).
    */
  def collocations(docs: org.apache.spark.sql.DataFrame, textCol: String,
                   minCount: Long = 5L, k: Int = 20)
      : org.apache.spark.sql.DataFrame = {
    require(minCount >= 1L && k >= 1, s"bad minCount=$minCount / k=$k")
    // single-space split, matching the oracle family's string_split(' ')
    def base = Spread(docs.select(split(lower(col(textCol)), " ").as("_ws")))
    val uni = base.select(explode(col("_ws")).as("t"))
      .groupBy(col("t")).agg(count(lit(1)).as("n"))
    val tot = uni.agg(sum(col("n")).as("tot"))
    val pairs = base.filter(size(col("_ws")) >= 2)
      .select(explode(
        // native WordBigrams kernel (r15) — see bigramGrams
        graft.functions.WordBigrams.wordBigrams(col("_ws"))).as("_p"))
      .select(col("_p.w1").as("w1"), col("_p.w2").as("w2"))
      .groupBy(col("w1"), col("w2")).agg(count(lit(1)).as("n_pair"))
      .filter(col("n_pair") >= minCount)
    pairs
      .join(uni.select(col("t").as("w1"), col("n").as("n_w1")), "w1")
      .join(uni.select(col("t").as("w2"), col("n").as("n_w2")), "w2")
      .crossJoin(broadcast(tot))
      // BOTH sides of the divide widen: the numerator passes 2^63 beyond
      // ~3e6 tokens, and two ~3e9-count words would overflow the BIGINT
      // product in the divisor too
      .withColumn("lift_ppm", expr(
        "(cast(1000000 as decimal(38,0)) * n_pair * tot) div " +
          "(cast(n_w1 as decimal(38,0)) * n_w2)"))
      .select(col("w1"), col("w2"), col("n_pair"), col("n_w1"), col("n_w2"),
        col("lift_ppm"))
      .orderBy(col("lift_ppm").desc, col("w1"), col("w2"))
      .limit(k)
      .withColumn("rank",
        row_number().over(org.apache.spark.sql.expressions.Window
          .orderBy(col("lift_ppm").desc, col("w1"), col("w2"))).cast("int"))
  }

  /** Integer-quantized TF-IDF keyword extraction: the top-`k` most
    * distinctive words per document — the curation-side relevance /
    * topic-tagging primitive. Same bit-stability stance as
    * [[bigramLmScores]]: `score = tf * ((1e6 * N) div df)` is integer end
    * to end (a floating `ln(N/df)` idf would hang the oracle hash on libm
    * rounding), and quantized idf preserves the per-document ranking.
    * `1e6 * N` stays inside a long to N = 9e12 documents.
    *
    * Scale shape: ONE map-side-combined (doc, word) count shuffle; the
    * document frequency is a second map-side agg over the tf frame (one
    * row per (doc, word) — counting rows IS counting distinct docs, no
    * count_distinct expansion); N is a 1-row broadcast; the tf-df join
    * shuffles on the word key (vocab outgrows broadcast at web scale, the
    * shuffle join IS the plan); top-k ranks inside each document's
    * partition. Ties break by word, so ranks are deterministic.
    *
    * Output: (doc_id, word, tf, score, rank 1..k); wordless documents
    * yield no rows.
    */
  def tfidfKeywords(docs: org.apache.spark.sql.DataFrame, idCol: String,
                    textCol: String, k: Int = 3): org.apache.spark.sql.DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val w = Spread(docs.select(col(idCol).as("doc_id"), col(textCol).as("_t")))
      .select(col("doc_id"), explode(words(col("_t"))).as("word"))
    // tf feeds BOTH the document-frequency census and the score join —
    // persist + eager fill so the tokenization/aggregation pass runs once
    // instead of once per racing consumer
    val tf = w.groupBy("doc_id", "word").agg(count(lit(1)).as("tf"))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    tf.count()
    val dfq = tf.groupBy("word").agg(count(lit(1)).as("df"))
    val n = docs.agg(count(lit(1)).as("n"))
    val wnd = Window.partitionBy("doc_id")
      .orderBy(col("score").desc, col("word").asc)
    tf.join(dfq, "word")
      .crossJoin(broadcast(n))
      .select(col("doc_id"), col("word"), col("tf"),
        (col("tf") * expr("(1000000 * n) div df")).as("score"))
      .withColumn("rank", row_number().over(wnd).cast("long"))
      .filter(col("rank") <= k)
  }

  /** Cross-document duplicated-LINE removal — the RefinedWeb/CCNet
    * paragraph-dedup stage ([[boilerplateNgrams]] turned into a rewrite):
    * every line whose distinct-document frequency reaches `minDocs` (cookie
    * banners, nav menus, subscribe prompts) is cut from EVERY document;
    * the document row survives with its cleaned text (digested — the full
    * rewrite is corpus-sized).
    *
    * Scale shape: document text never shuffles. The exploded frame carries
    * only (hash(line), doc_id, pos) — the DF census is one map-side-combined
    * `count_distinct`, the hot-line table it yields is boilerplate-sized
    * (broadcast-able; AQE decides), and the removal positions come back as
    * a small per-doc (doc_id, positions) frame joined onto the UNEXPLODED
    * corpus, where an index-filter lambda cuts the lines in a narrow map.
    * Cutting by position ≡ cutting by content: the hash join matches every
    * occurrence of a hot line.
    *
    * Line identity is TWO independent 64-bit hashes (xxhash64 of the line,
    * and of the line salted) — at the corpus scales this targets (billions
    * of distinct lines) a single 64-bit key makes birthday collisions
    * likely (~50% at 5·10⁹ lines), and a collision here silently cuts an
    * innocent line from every carrier; the 128-bit pair pushes the same
    * bound past 10¹⁸ lines.
    *
    * Output: (doc_id, n_lines, n_removed, clean_digest = md5 of the kept
    * lines re-joined with `\n`).
    */
  def lineDedup(docs: org.apache.spark.sql.DataFrame, idCol: String,
                textCol: String, minDocs: Int): org.apache.spark.sql.DataFrame = {
    val base = docs.select(col(idCol).as("doc_id"), col(textCol).as("text"))
    val lines = Spread(base)
      .select(col("doc_id"),
        posexplode(split(col("text"), "\n")).as(Seq("pos", "line")))
      .select(col("doc_id"), col("pos"),
        xxhash64(col("line")).as("h"),
        xxhash64(col("line"), lit(0x9e3779b9L)).as("h2"))
    val hot = lines.groupBy("h", "h2")
      .agg(count_distinct(col("doc_id")).as("_df"))
      .filter(col("_df") >= minDocs).select("h", "h2")
    val removed = lines.join(hot, Seq("h", "h2"))
      .groupBy("doc_id").agg(sort_array(collect_list(col("pos"))).as("_rm"))
    base.join(removed, Seq("doc_id"), "left")
      .select(col("doc_id"),
        size(split(col("text"), "\n")).cast("long").as("n_lines"),
        coalesce(size(col("_rm")), lit(0)).cast("long").as("n_removed"),
        md5(array_join(
          filter(split(col("text"), "\n"),
            (l, i) => not(coalesce(array_contains(col("_rm"), i), lit(false)))),
          "\n")).as("clean_digest"))
  }

  /** URL canonicalization for URL-level dedup — the crawl-frontier /
    * C4-style "same page, different link" collapse that runs BEFORE any
    * content dedup (it needs no text at all). Normalizations (the common
    * public conventions, each visible in the expression):
    *   - scheme and host lowercased; leading `www.` stripped
    *   - default ports stripped (`:443` for https, `:80` for http);
    *     non-default ports kept
    *   - fragment (`#…`) stripped
    *   - tracking params (`utm_*`) dropped; remaining query params sorted
    *     (`k=v` string sort); the `?` disappears with the last param
    *   - path kept byte-exact (paths are case-sensitive by spec)
    *
    * Pure codegen'd column expression (regexp splits + array HOFs): a
    * narrow map, embarrassingly parallel, with the dedup itself one
    * map-side-combinable groupBy on the canonical string.
    *
    * Schemeless or unparseable inputs (no `scheme://`) are returned
    * fragment-stripped but otherwise verbatim — NOT collapsed: without the
    * fallback every such URL canonicalized to the same `"://"` key and the
    * min-doc_id dedup would silently merge unrelated documents.
    */
  def canonicalizeUrl(u: Column): Column = {
    val noFrag = regexp_replace(u, "#.*$", "")
    val scheme = lower(regexp_extract(noFrag, "^([A-Za-z][A-Za-z0-9+.\\-]*)://", 1))
    val hostPort = regexp_extract(noFrag, "^[A-Za-z][A-Za-z0-9+.\\-]*://([^/?#]*)", 1)
    val host = regexp_replace(
      lower(regexp_extract(hostPort, "^([^:]*)", 1)), "^www\\.", "")
    val port = regexp_extract(hostPort, ":([0-9]+)$", 1)
    val keepPort = when(
      port === "" ||
        (scheme === "https" && port === "443") ||
        (scheme === "http" && port === "80"), lit(""))
      .otherwise(concat(lit(":"), port))
    val path = regexp_extract(noFrag, "^[A-Za-z][A-Za-z0-9+.\\-]*://[^/?#]*([^?#]*)", 1)
    val query = regexp_extract(noFrag, "\\?([^#]*)", 1)
    val params = filter(split(query, "&"),
      p => not(startswith(p, lit("utm_"))) && p =!= "")
    val qsorted = array_join(array_sort(params), "&")
    val qpart = when(qsorted === "", lit(""))
      .otherwise(concat(lit("?"), qsorted))
    when(scheme === "", noFrag)
      .otherwise(concat(scheme, lit("://"), host, keepPort, path, qpart))
  }

  /** The regex-chain formulation of
    * [[graft.functions.HtmlExtract]] — the definitional contract the native
    * kernel must match byte-for-byte (see the kernel's scaladoc for the
    * stage list), retained as the in-test differential oracle exactly like
    * span_corrupt's HOF fold. Every stage is a built-in (regex stages
    * codegen'd; the entity stage a split + transform HOF), so this also IS
    * the portable spelling an external SQL engine replays.
    *
    * Returns struct(title, text, n_links).
    */
  def htmlExtractRelational(html: Column): Column = {
    val s1 = regexp_replace(html, "(?s)<!--.*?-->", "")
    val s2 = regexp_replace(s1, "(?is)<head[^>]*>.*?</head[^>]*>", "")
    val s3 = regexp_replace(s2, "(?is)<script[^>]*>.*?</script[^>]*>", "")
    val s4 = regexp_replace(s3, "(?is)<style[^>]*>.*?</style[^>]*>", "")
    // [ \t\n\r\f>] spelled explicitly: RE2's \s excludes \x0B, Java's
    // includes it — the common subset keeps kernel, chain, and DuckDB
    // replay identical
    val nLinks = size(regexp_extract_all(s4,
      lit("(?i)<a[ \\t\\n\\r\\f>]"), lit(0))).cast("long")
    val tagless = regexp_replace(s4, "<[^>]*>", " ")
    // entity decode as ONE left-to-right pass: split on '&' and transform
    // each part (which lost its leading '&') — the fixed table first, then
    // numeric character references, else the '&' is restored verbatim.
    // A per-entity replace fold cannot host the numeric rule: whichever of
    // the two rule sets ran second would rescan the first's output
    // ('&amp;#38;' double-decoding class), where the kernel reads each '&'
    // exactly once. BMP non-surrogate bound as in the kernel; the decoded
    // char comes from hex→unhex→UTF-16BE (Spark's chr() is latin-1-bounded,
    // this is codepoint-exact for the whole BMP; DuckDB replays with chr()).
    val parts = split(tagless, "&", -1)
    val fixed = Seq("lt;" -> "<", "gt;" -> ">", "quot;" -> "\"",
      "apos;" -> "'", "#39;" -> "'", "nbsp;" -> " ", "amp;" -> "&")
    def decodePart(p: Column): Column = {
      val dec = regexp_extract(p, "^#([0-9]{1,6});", 1)
      val hx  = regexp_extract(p, "^#[xX]([0-9a-fA-F]{1,5});", 1)
      val code = when(dec =!= "", dec.cast("int"))
        .when(hx =!= "", conv(hx, 16, 10).cast("int"))
        .otherwise(lit(-1))
      val skip = when(dec =!= "", length(dec) + 2).otherwise(length(hx) + 3)
      val numeric = when(
        code >= 1 && code <= 0xFFFF && !(code >= 0xD800 && code <= 0xDFFF),
        concat(decode(unhex(lpad(hex(code), 4, "0")), "UTF-16BE"),
          p.substr(skip + 1, length(p))))
      fixed.foldRight(numeric.otherwise(concat(lit("&"), p))) { case ((e, r), el) =>
        when(startswith(p, lit(e)),
          concat(lit(r), p.substr(lit(e.length + 1), length(p)))).otherwise(el)
      }
    }
    val decoded = concat(element_at(parts, 1),
      array_join(transform(slice(parts, lit(2), greatest(size(parts) - 1, lit(0))),
        decodePart(_)), ""))
    val text = trim(regexp_replace(decoded, "[ \\t\\n\\r\\f]+", " "))
    struct(
      regexp_extract(html, "(?is)<title[^>]*>(.*?)</title[^>]*>", 1)
        .as("title"),
      text.as("text"), nLinks.as("n_links"))
  }

  /** Outlink extraction — the crawl-frontier feeder: one row per `href`
    * on an anchor tag — double-quoted, single-quoted, or unquoted (real
    * crawl HTML carries all three in volume) — in document order, each
    * canonicalized with [[canonicalizeUrl]] (relative/schemeless targets
    * ride the verbatim fallback, so distinct targets never merge).
    *
    * Contract (kept regex-narrow so any engine replays it): anchors are
    * `(?i)<a[^>]*?href=` followed by `"..."`, `'...'`, or a bare token up
    * to the RE2/Java-common whitespace class or '>', on the RAW input —
    * links inside comments or scripts count; strip markup first (the
    * [[extractContent]] chain) if frontier hygiene demands body-only
    * links. An unquoted token cannot contain quotes (excluded from its
    * class), so the quote strip is a full-anchored paired match: exactly
    * one strip applies, never a rescan ('"\'x\'"' keeps its inner
    * quotes). `href=` with nothing after it does not match (the bare
    * token needs one char), same as the failed-regex stance elsewhere.
    * Pure narrow map + explode: zero exchanges; the frontier rollup
    * downstream is one map-side-combinable groupBy on the canonical
    * string.
    *
    * Output: (id, link_idx, href, canon_url).
    */
  def outlinks(docs: org.apache.spark.sql.DataFrame, idCol: String,
               htmlCol: String): org.apache.spark.sql.DataFrame =
    docs
      .select(col(idCol), posexplode(regexp_extract_all(col(htmlCol),
        lit("(?i)<a[^>]*?href=(\"[^\"]*\"|'[^']*'|[^\"' \\t\\n\\r\\f>]+)"),
        lit(1)))
        .as(Seq("link_idx", "_hr")))
      .withColumn("href", stripHrefQuotes(col("_hr")))
      .drop("_hr")
      .withColumn("canon_url", canonicalizeUrl(col("href")))

  /** Strip ONE pair of surrounding quotes off an extracted href token —
    * the shared contract of [[outlinks]] and [[anchorLinks]]. (?s): the
    * extraction classes `"[^"]*"` / `'[^']*'` admit newlines, so the
    * paired strip must cross them too — without DOTALL a multi-line
    * quoted href would fall through both strip branches and keep its
    * literal quotes (polluting canon_url downstream).
    */
  private def stripHrefQuotes(hr: Column): Column =
    when(hr.rlike("(?s)^\".*\"$"),
      regexp_replace(hr, "(?s)^\"(.*)\"$", "$1"))
      .when(hr.rlike("(?s)^'.*'$"),
        regexp_replace(hr, "(?s)^'(.*)'$", "$1"))
      .otherwise(hr)

  /** Anchor elements with their link TEXT — the raw material of an
    * anchor-text index (the web-retrieval signal: how other pages describe
    * a target; the classic relevance booster search engines aggregate per
    * URL). Extraction contract: one row per anchor whose tag carries an
    * href in any of the three quotings [[outlinks]] handles; `anchor` is
    * the element's text up to the FIRST nested tag (`[^<]*` — a
    * `<b>bold</b>` wrapper contributes its prefix only; the single-regex
    * contract both engines replay verbatim), normalized lower / collapsed
    * / trimmed on the pinned RE2-Java-common `[ \t\n\r\f]` class.
    *
    * Zero exchanges — a narrow `regexp_extract_all` + explode map.
    */
  def anchorLinks(docs: org.apache.spark.sql.DataFrame, idCol: String,
                  htmlCol: String): org.apache.spark.sql.DataFrame = {
    val pat =
      "(?i)<a[^>]*?href=(\"[^\"]*\"|'[^']*'|[^\"' \\t\\n\\r\\f>]+)[^>]*>([^<]*)"
    docs
      .select(col(idCol), posexplode(regexp_extract_all(col(htmlCol),
        lit(pat), lit(0))).as(Seq("link_idx", "_el")))
      .withColumn("_hr", regexp_extract(col("_el"), pat, 1))
      .withColumn("anchor", lower(trim(regexp_replace(
        regexp_extract(col("_el"), pat, 2), "[ \\t\\n\\r\\f]+", " "))))
      .withColumn("href", stripHrefQuotes(col("_hr")))
      .drop("_hr", "_el")
      .withColumn("canon_url", canonicalizeUrl(col("href")))
  }

  /** URL blocklist gate — the C4/CCNet frontier-hygiene step: drop
    * documents whose URL matches a curated blocklist of exact domains,
    * domain SUFFIXES (subdomain-inclusive at label boundaries —
    * 'news.com' blocks 'cdn.news.com' and 'news.com' but never
    * 'alphanews.com'), or canon-URL path prefixes under a domain.
    *
    * `blocklist` rows: `(kind ∈ {domain, suffix, prefix}, domain,
    * pattern)` — `pattern` is the canonicalized-URL prefix for 'prefix'
    * rows, ignored otherwise.
    *
    * Scale shape: the blocklist collapses to ONE broadcast row of three
    * arrays (curated lists are 10^3-10^5 entries — broadcast-sized by
    * contract), and matching is a single narrow codegen'd filter over the
    * corpus: `array_contains` for exact domains, `arrays_overlap` against
    * the domain's label-suffix chain (so suffix matching is a hash-set
    * probe per label, never a scan of the pattern list), and an
    * `exists` HOF for the few prefix rules. The corpus never shuffles
    * and never joins row-by-row.
    *
    * Output: the surviving rows plus `domain` and `canon_url`.
    */
  def blocklistFilter(docs: org.apache.spark.sql.DataFrame, idCol: String,
                      urlCol: String,
                      blocklist: org.apache.spark.sql.DataFrame)
      : org.apache.spark.sql.DataFrame = {
    val bl = blocklist.agg(
      collect_list(when(col("kind") === "domain", col("domain"))).as("_bd"),
      collect_list(when(col("kind") === "suffix", col("domain"))).as("_bs"),
      collect_list(when(col("kind") === "prefix",
        struct(col("domain").as("d"), col("pattern").as("p")))).as("_bp"))
    docs
      .withColumn("canon_url", canonicalizeUrl(col(urlCol)))
      .withColumn("domain",
        graft.operators.Sampling.urlDomain(col(urlCol)))
      .crossJoin(broadcast(bl))
      .withColumn("_chain", expr(
        "transform(sequence(0, size(split(domain, '\\\\.')) - 1), " +
          "i -> array_join(slice(split(domain, '\\\\.'), i + 1, " +
          "size(split(domain, '\\\\.')) - i), '.'))"))
      // coalesce each probe: a NULL url yields NULL domain/canon, the
      // probes go NULL, and a bare three-valued filter would silently
      // DROP the row even against an empty blocklist — a gate must drop
      // only matches, so null-URL rows pass through (no rule can match)
      .filter(!coalesce(array_contains(col("_bd"), col("domain")), lit(false)) &&
        !coalesce(arrays_overlap(col("_bs"), col("_chain")), lit(false)) &&
        !coalesce(exists(col("_bp"), s =>
          s.getField("d") === col("domain") &&
            col("canon_url").startsWith(s.getField("p"))), lit(false)))
      .drop("_bd", "_bs", "_bp", "_chain")
  }

  /** Per-target anchor-text rollup: reference counts, referring-document
    * counts, and the DOMINANT anchor text (most references, ties by text)
    * — the per-URL relevance summary an indexer joins onto crawled pages.
    *
    * Scale shape: one map-side-combinable `(canon_url, anchor)` count
    * (bounded by distinct pairs, never raw anchors riding twice), the
    * argmax on the [[graft.plans.GroupTopK]] bounded heaps (k=1 — the
    * heap exchange carries one row per target per map task), and one
    * `canon_url` stats aggregate joined back. URLs and anchor texts are
    * short strings by construction; document payloads never enter any
    * exchange.
    */
  def anchorIndex(links: org.apache.spark.sql.DataFrame,
                  idCol: String): org.apache.spark.sql.DataFrame = {
    val counts = links.groupBy(col("canon_url"), col("anchor"))
      .agg(count(lit(1)).as("a_refs"))
    val top = graft.plans.GroupTopK.topK(counts, Seq("canon_url"),
        Seq("a_refs" -> false, "anchor" -> true), 1)
      .select(col("canon_url"), col("anchor").as("top_anchor"),
        col("a_refs").as("top_refs"))
    val stats = links.groupBy(col("canon_url"))
      .agg(count(lit(1)).as("n_refs"),
        count_distinct(col(idCol)).as("n_docs"))
    stats.join(top, Seq("canon_url"))
  }

  /** Main-content extraction over a corpus of raw HTML — the funnel's
    * entry step (strip markup, drop head/script/style/comment boilerplate,
    * count anchors as a link-density signal, decode entities). Runs on the
    * native single-pass kernel; zero exchanges — a pure narrow map, like
    * [[chunkDocuments]].
    *
    * Output: (id, title, n_links, n_chars, text_digest) — the digest is
    * md5 of the extracted text (corpus-sized payloads never leave the
    * scan stage; downstream analysis calls the kernel again or keeps the
    * struct).
    */
  def extractContent(docs: org.apache.spark.sql.DataFrame, idCol: String,
                     htmlCol: String): org.apache.spark.sql.DataFrame =
    docs
      .select(col(idCol),
        graft.functions.HtmlExtract.htmlExtract(col(htmlCol)).as("_e"))
      .select(col(idCol),
        col("_e.title").as("title"),
        col("_e.n_links").as("n_links"),
        length(col("_e.text")).cast("long").as("n_chars"),
        md5(col("_e.text")).as("text_digest"))

  /** Sliding-window document chunking — the RAG-indexing / long-context
    * curation splitter: fixed `chunkWords`-word windows advancing by
    * `chunkWords - overlapWords`, the final window shortened (never
    * duplicated: exactly enough windows to cover the last word, so a
    * trailing fragment shorter than the overlap is not emitted twice).
    * Zero-word documents emit no chunks.
    *
    * Scale shape: one narrow codegen'd split + `sequence`/`explode` — no
    * shuffle, no state, output rows ≈ corpus words / stride. Chunk
    * identity is (id, chunk_idx); `chunk_digest` is md5 of the
    * space-rejoined window (whitespace-normalized on both engines), so
    * chunk equality is comparable without shipping chunk text.
    */
  def chunkDocuments(docs: org.apache.spark.sql.DataFrame, idCol: String,
                     textCol: String, chunkWords: Int,
                     overlapWords: Int): org.apache.spark.sql.DataFrame = {
    require(chunkWords > 0 && overlapWords >= 0 && overlapWords < chunkWords,
      s"need 0 <= overlap < chunk, got chunk=$chunkWords overlap=$overlapWords")
    val stride = chunkWords - overlapWords
    docs
      .select(col(idCol),
        filter(split(col(textCol), "\\s+"), w => length(w) > 0).as("_ws"))
      .withColumn("_nw", size(col("_ws")).cast("long"))
      .filter(col("_nw") > 0)
      .withColumn("chunk_idx", explode(sequence(lit(0L),
        expr(s"greatest(0L, (_nw - $chunkWords + ${stride - 1}) div $stride)"))))
      .select(col(idCol), col("chunk_idx"),
        least(lit(chunkWords.toLong), col("_nw") - col("chunk_idx") * stride)
          .as("n_words"),
        md5(array_join(
          slice(col("_ws"), (col("chunk_idx") * stride + 1).cast("int"),
            lit(chunkWords)), " ")).as("chunk_digest"))
  }
}
