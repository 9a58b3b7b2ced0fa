package graft.operators

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.storage.StorageLevel

/** Naive-Bayes-shaped quality classifier — the discriminative counterpart
  * of the [[TextAnalysis.bigramModel]] LM filter (the CCNet/LLaMA recipe
  * trains a fastText classifier "reference pages vs random crawl" and
  * keeps documents the classifier likes; an NB/linear model over word
  * counts is the same operator shape minus the embedding table).
  *
  * Weights are Laplace-smoothed per-word likelihood ratios, integer
  * end-to-end (the text_lm stance — no floating log whose libm rounding
  * could diverge across engines):
  *
  *   t         = (1e6 * (totNeg + V)) div (totPos + V)   // class ratio, ppm
  *   weight(w) = ((cPos(w) + 1) * t) div (cNeg(w) + 1)
  *
  * so a class-neutral word scores ~t, reference-flavoured words score
  * above it, crawl-flavoured below; a document's score is the tf-weighted
  * sum (and `quality_mean = score div n` the length-normalized signal).
  * Summing ratios instead of multiplying them is a monotone-per-word
  * linearization — the standard practical filter shape, documented here
  * rather than pretending to be calibrated NB log-odds.
  *
  * Integer-overflow bound: `(cPos + 1) * t` must stay under 2^63 — with
  * t ≈ 1e6·(class ratio), that holds to ~1e12 occurrences of a single
  * word per class at balanced classes; corpora beyond that drop the ppm
  * scale to per-1e3.
  *
  * Scale shape: training is ONE map-side-combined (word, label) count
  * shuffle; the weight table is vocab-bounded (does NOT grow with the
  * scored corpus — the [[TextAnalysis.bigramLmScoresWith]] property), so
  * scoring shuffles (doc, word) term frequencies against a table AQE can
  * broadcast at small vocab and bucket-join at web vocab. Document text
  * never shuffles.
  */
object QualityFilter {

  /** A trained classifier as a first-class artifact: `counts` (word,
    * c_pos, c_neg) is the ONLY persistent state — totals and vocabulary
    * re-derive on load, weights are a projection.
    */
  final case class NbModel(counts: DataFrame, totPos: Long, totNeg: Long,
                           vocab: Long) {
    /** Class-prior ratio in ppm — also the weight of an unseen word
      * (cPos = cNeg = 0 gives (1 * t) div 1 = t).
      */
    val defaultWeight: Long = 1000000L * (totNeg + vocab) / (totPos + vocab)

    /** (word, wgt) likelihood-ratio table. */
    def weights: DataFrame = counts.select(col("word"),
      expr(s"(c_pos + 1) * ${defaultWeight}L div (c_neg + 1)").as("wgt"))

    def save(path: String): Unit =
      counts.write.mode("overwrite").parquet(path)

    def release(): Unit = { counts.unpersist(); () }
  }

  private def tokenRows(docs: DataFrame, idCol: String,
                        textCol: String): DataFrame =
    Spread(docs.select(col(idCol).as("doc_id"),
        split(lower(col(textCol)), "\\s+").as("_ws")))
      .select(col("doc_id"), explode(col("_ws")).as("word"))
      .filter(length(col("word")) > 0)

  /** Train on a labeled corpus: `label` marks the reference (positive)
    * class. One map-side-combined count shuffle; the totals aggregate is
    * a single collected row.
    */
  def nbModel(docs: DataFrame, textCol: String, label: Column): NbModel = {
    val counts = Spread(docs.select(label.as("_pos"),
        split(lower(col(textCol)), "\\s+").as("_ws")))
      .select(col("_pos"), explode(col("_ws")).as("word"))
      .filter(length(col("word")) > 0)
      .groupBy("word")
      .agg(sum(when(col("_pos"), 1L).otherwise(0L)).as("c_pos"),
        sum(when(col("_pos"), 0L).otherwise(1L)).as("c_neg"))
    modelFromCounts(counts)
  }

  /** Reload a model saved by [[NbModel.save]]. */
  def loadNbModel(spark: SparkSession, path: String): NbModel =
    modelFromCounts(spark.read.parquet(path))

  private def modelFromCounts(counts: DataFrame): NbModel = {
    val c = counts.persist(StorageLevel.MEMORY_AND_DISK)
    val t = c.agg(sum(col("c_pos")), sum(col("c_neg")), count(lit(1))).head()
    NbModel(c, t.getLong(0), t.getLong(1), t.getLong(2))
  }

  /** Score documents against a trained [[NbModel]] — out-of-vocabulary
    * words take `defaultWeight` (class-neutral), so foreign text degrades
    * to a neutral score instead of erroring. Output: (doc_id, n_scored,
    * quality_score, quality_mean) — mean is NULL for wordless documents
    * (the bigramLm convention).
    */
  def nbScoresWith(docs: DataFrame, idCol: String, textCol: String,
                   model: NbModel): DataFrame = {
    val tf = tokenRows(docs, idCol, textCol)
      .groupBy("doc_id", "word").agg(count(lit(1)).as("tf"))
    val agg = tf.join(model.weights, Seq("word"), "left")
      .select(col("doc_id"), col("tf"),
        coalesce(col("wgt"), lit(model.defaultWeight)).as("wgt"))
      .groupBy("doc_id")
      .agg(sum(col("tf")).as("_n"), sum(col("tf") * col("wgt")).as("_s"))
    docs.select(col(idCol).as("doc_id"))
      .join(agg, Seq("doc_id"), "left")
      .select(col("doc_id"),
        coalesce(col("_n"), lit(0L)).as("n_scored"),
        coalesce(col("_s"), lit(0L)).as("quality_score"),
        expr("_s div _n").as("quality_mean"))
  }

  /** Self-train-and-score convenience (the catalog query shape).
    *
    * Unlike the external-model path, training and scoring here read the
    * SAME corpus — so the token frame is split+exploded once and shared:
    * the model's eager totals read fills the cache serially (no racing
    * consumers), and the scoring tf aggregate reads it back instead of
    * re-running the tokenization. Counts are unchanged: the shared frame
    * carries both the label and the doc id, and each aggregate projects
    * away the column it never used.
    *
    * CACHE LIFECYCLE (r15, the session-hygiene contract shared by every
    * operator that persists an internal frame feeding its returned lazy
    * plan — TextDedup signatures, VectorOps bases, TextAnalysis tf, the
    * ccnet scored frame): the persisted frames cannot be unpersisted here
    * (the returned plan still reads them), and the caller holds no handle,
    * so a long-lived session must call `spark.catalog.clearCache()`
    * between query sessions — exactly what Bench/Verify/VolumeBench do —
    * or use the split model/score API ([[nbModel]]/[[nbScoresWith]]) whose
    * [[NbModel.release]] unpersists the only retained state.
    * CacheLifecycleSpec asserts the contract: repeated invocations with
    * the clear leave zero cached entries behind (no growth), and the
    * per-invocation residue without it is bounded by the operator's two
    * frames.
    */
  def nbScores(docs: DataFrame, idCol: String, textCol: String,
               label: Column): DataFrame = {
    val toks = Spread(docs.select(col(idCol).as("doc_id"), label.as("_pos"),
        split(lower(col(textCol)), "\\s+").as("_ws")))
      .select(col("doc_id"), col("_pos"), explode(col("_ws")).as("word"))
      .filter(length(col("word")) > 0)
      .persist(StorageLevel.MEMORY_AND_DISK)
    val model = modelFromCounts(toks
      .groupBy("word")
      .agg(sum(when(col("_pos"), 1L).otherwise(0L)).as("c_pos"),
        sum(when(col("_pos"), 0L).otherwise(1L)).as("c_neg")))
    val tf = toks.groupBy("doc_id", "word").agg(count(lit(1)).as("tf"))
    val agg = tf.join(model.weights, Seq("word"), "left")
      .select(col("doc_id"), col("tf"),
        coalesce(col("wgt"), lit(model.defaultWeight)).as("wgt"))
      .groupBy("doc_id")
      .agg(sum(col("tf")).as("_n"), sum(col("tf") * col("wgt")).as("_s"))
    docs.select(col(idCol).as("doc_id"))
      .join(agg, Seq("doc_id"), "left")
      .select(col("doc_id"),
        coalesce(col("_n"), lit(0L)).as("n_scored"),
        coalesce(col("_s"), lit(0L)).as("quality_score"),
        expr("_s div _n").as("quality_mean"))
  }
}
