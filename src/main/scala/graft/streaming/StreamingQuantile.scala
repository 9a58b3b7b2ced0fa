package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset, Encoder, Encoders}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** Streaming bottom-k quantile sample — the continuous counterpart of
  * [[graft.operators.Stats.sampleQuantiles]]: per group, keyed state holds
  * the k rows with the smallest 48-bit id-hashes ever seen (hash + raw
  * double value), and each micro-batch emits the refreshed percentile
  * estimates for groups it touched (update semantics).
  *
  * Same merge law as [[StreamingSketch]]: state ∪ batch → k smallest
  * distinct (hv, value) pairs. The survivor set is a pure function of the
  * row SET, so the stream result after any prefix equals the batch sketch
  * over that prefix under any batching, arrival order, or duplicate
  * re-delivery. State is ≤ k (long, double) pairs per group — bounded by
  * group cardinality, never stream length.
  *
  * The estimator is the batch operator's exactly: empirical quantile of
  * the sample under the 1-based ceil-rank convention
  * (`value[(n·p + 99) div 100 - 1]` over the value-sorted sample), so the
  * emitted quartet matches `sampleQuantiles` bit-for-bit on any prefix.
  * Percentiles are fixed at the catalog quartet (25/50/90/99), mirroring
  * the `quantile_sample` row.
  */
object StreamingQuantile {

  case class SampleRow(group: String, hv: Long, value: Double)

  /** Parallel arrays sorted by (hv, value) ascending, length <= k. */
  case class QuantileState(hvs: Array[Long], vs: Array[Double])

  case class QuantileEstimate(group: String, n_sample: Long,
                              p25: Double, p50: Double,
                              p90: Double, p99: Double)

  private def emit(group: String, pairs: Array[(Long, Double)]): QuantileEstimate = {
    val sorted = pairs.map(_._2).sorted
    val n = sorted.length
    def pick(p: Int): Double = sorted((n * p + 99) / 100 - 1)
    QuantileEstimate(group, n.toLong, pick(25), pick(50), pick(90), pick(99))
  }

  private def processGroup(k: Int)(
      group: String, rows: Iterator[SampleRow],
      state: GroupState[QuantileState]): Iterator[QuantileEstimate] = {
    val prev = state.getOption
      .map(s => s.hvs.zip(s.vs))
      .getOrElse(Array.empty[(Long, Double)])
    val merged = (prev ++ rows.map(r => (r.hv, r.value)))
      .distinct.sortBy { case (h, v) => (h, v) }.take(k)
    if (merged.isEmpty) return Iterator.empty
    val st = QuantileState(merged.map(_._1), merged.map(_._2))
    val prevSt = state.getOption
    if (!prevSt.exists(p => java.util.Arrays.equals(p.hvs, st.hvs) &&
        java.util.Arrays.equals(p.vs, st.vs))) state.update(st)
    Iterator.single(emit(group, merged))
  }

  /** `df` must expose (group, id, value); `id` must be row-unique (the
    * sample-uniformity contract, like the batch operator's `idExpr`).
    * Emits one refreshed [[QuantileEstimate]] per touched group per
    * micro-batch.
    */
  def quantileStream(df: DataFrame, k: Int = 256): Dataset[QuantileEstimate] = {
    require(k > 1 && k < 32768, s"quantileStream needs 1 < k < 32768, got $k")
    import df.sparkSession.implicits._
    implicit val stateEnc: Encoder[QuantileState] = Encoders.product[QuantileState]
    df.select(col("group").cast("string").as("group"),
        graft.operators.Sketches.hash48(col("id")).as("hv"),
        col("value").cast("double").as("value"))
      // null values excluded, matching the batch operator (and percentile
      // aggregates generally); a null hv cannot happen for a non-null id
      .filter(col("hv").isNotNull && col("value").isNotNull)
      .as[SampleRow]
      .groupByKey(_.group)
      .flatMapGroupsWithState(OutputMode.Update,
        GroupStateTimeout.NoTimeout)(processGroup(k))
  }
}
