package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset, Encoder, Encoders}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** Streaming KMV distinct-count — the continuous counterpart of
  * [[graft.operators.Sketches.kmvDistinct]]: per group, keyed state holds
  * only the k smallest distinct 48-bit value hashes ever seen, and each
  * micro-batch emits the refreshed estimate for groups it touched (update
  * semantics).
  *
  * This is exactly the KMV merge property run incrementally: state ∪ batch
  * hashes → k smallest distinct. Because the survivor set is a pure
  * function of the SET of values seen, the stream result after any prefix
  * equals the batch sketch over that prefix — regardless of batching,
  * arrival order, or re-delivery of duplicates (idempotent by
  * construction). State is k longs per group — bounded by group
  * cardinality, never by stream length or value cardinality.
  *
  * The hash is computed with the same md5-prefix column expression as the
  * batch operator BEFORE `groupByKey`, so the raw value string never
  * enters state or the shuffle.
  */
object StreamingSketch {

  case class HashedValue(group: String, hv: Long)

  case class KmvState(hashes: Array[Long]) // sorted ascending, length <= k

  case class KmvEstimate(group: String, n_kept: Long, kth_hv: Long,
                         est_distinct: Long)

  private def emit(k: Int, group: String, sorted: Array[Long]): KmvEstimate = {
    val n = sorted.length.toLong
    val kth = sorted.last
    val est = if (n < k) n else ((k - 1).toLong * (1L << 48)) / kth
    KmvEstimate(group, n, kth, est)
  }

  private def processGroup(k: Int)(
      group: String, rows: Iterator[HashedValue],
      state: GroupState[KmvState]): Iterator[KmvEstimate] = {
    val prev = state.getOption.map(_.hashes).getOrElse(Array.empty[Long])
    val merged = (prev ++ rows.map(_.hv)).distinct.sorted.take(k)
    if (merged.isEmpty) return Iterator.empty
    if (!java.util.Arrays.equals(prev, merged)) state.update(KmvState(merged))
    Iterator.single(emit(k, group, merged))
  }

  /** `df` must expose a string `group` column and a `value` column; emits
    * one refreshed [[KmvEstimate]] per touched group per micro-batch.
    */
  def kmvDistinctStream(df: DataFrame, k: Int = 256): Dataset[KmvEstimate] = {
    require(k > 1 && k < 32768, s"kmvDistinctStream needs 1 < k < 32768, got $k")
    import df.sparkSession.implicits._
    implicit val stateEnc: Encoder[KmvState] = Encoders.product[KmvState]
    df.select(col("group").cast("string").as("group"),
        graft.operators.Sketches.hash48(col("value")).as("hv"))
      // null values are excluded (count(DISTINCT) semantics — and a null
      // hv would fail the non-nullable Long decode below)
      .filter(col("hv").isNotNull)
      .as[HashedValue]
      .groupByKey(_.group)
      .flatMapGroupsWithState(OutputMode.Update,
        GroupStateTimeout.NoTimeout)(processGroup(k))
  }
}
