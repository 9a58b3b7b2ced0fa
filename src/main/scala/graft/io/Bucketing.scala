package graft.io

import org.apache.spark.sql.DataFrame

/** Table bucketing for exchange-free joins — the storage-layout half of
  * the co-location story ([[graft.operators.Segments]] covers the
  * in-query partitioning half).
  *
  * A fact table re-joined on the same key every run (events by unit,
  * documents by doc_id, dedup pairs by cluster) pays a full shuffle per
  * join; writing it ONCE bucketed+sorted by that key makes every later
  * self- or dimension-join scan-aligned: Spark reads each bucket as one
  * partition, both sides arrive hash-distributed, and the sort-merge
  * join plans with NO Exchange (pinned by BucketingSpec). The per-query
  * Sort also disappears when the scan propagates its ordering — behind
  * `spark.sql.legacy.bucketedTableScan.outputOrdering=true` since
  * SPARK-28595, also pinned — but the Exchange is the 100 TB cost: the
  * one-off bucketed write replaces a per-query shuffle of the whole
  * fact table, the single biggest recurring cost of a pipeline that
  * iterates on the same corpus.
  *
  * Buckets should be sized so one bucket ≈ one task's worth of data
  * (128-512 MB); both join sides must use the SAME bucket count (or
  * integer multiples, which Spark coalesces when
  * `spark.sql.bucketing.coalesceBucketsInJoin.enabled` is set).
  */
object Bucketing {

  /** Write `df` as a parquet table bucketed AND sorted by `keys`.
    *
    * The pre-write `repartition(buckets, keys)` uses the same murmur3
    * bucket hash as the writer, so every bucket lands as ONE sorted file —
    * the condition under which the scan reports an output ordering and
    * the downstream sort-merge join drops its per-query Sort too (multiple
    * files per bucket keep the no-Exchange property but force a re-sort).
    * This shuffle is the one-off write-time cost the layout amortizes.
    */
  def writeBucketed(df: DataFrame, table: String, keys: Seq[String],
                    buckets: Int): Unit = {
    import org.apache.spark.sql.functions.col
    df.repartition(buckets, keys.map(col): _*)
      .write.mode("overwrite").format("parquet")
      .bucketBy(buckets, keys.head, keys.tail: _*)
      .sortBy(keys.head, keys.tail: _*)
      .saveAsTable(table)
  }
}
