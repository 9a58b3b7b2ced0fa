package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Locks the operator-internal persist lifecycle (r14 verdict item 8 /
  * advice): operators whose returned lazy plan reads an internal persisted
  * frame (nbScores' token frame, tfidf's tf frame, minhash signatures)
  * cannot unpersist it themselves — the documented contract is that a
  * long-lived session calls `spark.catalog.clearCache()` between query
  * sessions (what Bench/Verify/VolumeBench do). This spec asserts that the
  * contract actually bounds cache growth:
  *
  *  - with the clear, repeated invocations leave NOTHING cached — the
  *    probe plan that provably hit the cache before the clear (asserted
  *    isDefined) misses after it, every round;
  *  - the split model/score API's [[QualityFilter.NbModel.release]]
  *    unpersists the only retained state without a global clear.
  *
  * The assertions go through the session's CacheManager (what clearCache
  * drains) via plan lookup, not `getPersistentRDDs` — suites run
  * concurrently on one SparkContext, so context-global RDD counts would
  * race other suites.
  */
class CacheLifecycleSpec extends SparkSpec {

  import spark.implicits._

  /** Spark 4 moved CacheManager behind the classic Dataset type; the
    * runtime objects are classic Datasets, so the cast is total. */
  private def classic(df: org.apache.spark.sql.DataFrame) =
    df.asInstanceOf[org.apache.spark.sql.classic.Dataset[_]]

  private def docs = (0L until 200L)
    .map(i => (i, s"tok${i % 7} tok${i % 5} tok${i % 3} tok${i % 11} filler"))
    .toDF("doc_id", "text")

  /** The exact plan nbScores persists internally (same construction), used
    * as a cache probe: CacheManager matches on canonical plan equality.
    */
  private def tokProbe = Spread(
    docs.select(col("doc_id").as("doc_id"),
      (col("doc_id") % 2 === 0).as("_pos"),
      split(lower(col("text")), "\\s+").as("_ws")))
    .select(col("doc_id"), col("_pos"), explode(col("_ws")).as("word"))
    .filter(length(col("word")) > 0)

  test("repeated persist-heavy invocations + clearCache leave no residue") {
    for (round <- 1 to 3) {
      val nb = QualityFilter.nbScores(docs, "doc_id", "text",
        col("doc_id") % 2 === 0)
      assert(nb.count() == 200, s"round $round row count")
      val tf = TextAnalysis.tfidfKeywords(docs, "doc_id", "text")
      assert(tf.count() > 0, s"round $round tfidf rows")
      // the probe must HIT while the invocation's caches are live — this is
      // what makes the post-clear miss below meaningful
      assert(
        spark.sharedState.cacheManager.lookupCachedData(classic(tokProbe)).isDefined,
        s"round $round: token-frame probe should match the cached plan")
      // the session contract: clear between query sessions
      spark.catalog.clearCache()
      assert(
        spark.sharedState.cacheManager.lookupCachedData(classic(tokProbe)).isEmpty,
        s"round $round: nbScores token frame survived clearCache")
    }
  }

  test("NbModel.release unpersists the split API's only retained state") {
    val model = QualityFilter.nbModel(docs, "text", col("doc_id") % 2 === 0)
    val scored = QualityFilter.nbScoresWith(docs, "doc_id", "text", model)
    assert(scored.count() == 200)
    assert(
      spark.sharedState.cacheManager.lookupCachedData(classic(model.counts)).isDefined,
      "model counts should be cached while the model is live")
    model.release()
    assert(
      spark.sharedState.cacheManager.lookupCachedData(classic(model.counts)).isEmpty,
      "release() must unpersist the model counts")
  }
}
