package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset, Encoder, Encoders}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** Streaming CUSUM drift detection — the in-stream counterpart of
  * [[graft.operators.Stats.cusum]]: per key, the one-sided Page statistic
  * `s_i = max(0, s_{i-1} + x_i - slack)` carried across micro-batches in
  * O(1) state.
  *
  * Where the batch operator uses the closed form over window frames, the
  * stream just runs the recursion directly — the state is TWO longs
  * (prefix sum `p` and its running floor `min(0, min p_j)`), so batch and
  * stream compute the identical statistic by construction. Rows within a
  * micro-batch are processed in (t_us, event_id) order (intra-batch
  * disorder absorbed); across batches the usual in-order-per-key contract
  * applies. Emits every event with its `cusum`; thresholding stays
  * downstream, exactly like the batch operator.
  *
  * State: (p, minP) per key — bounded by key cardinality, never stream
  * length; optional TTL reaps idle keys.
  */
object StreamingCusum {

  case class CusumEvent(key: Long, tUs: Long, eventId: Long, x: Long)

  case class CusumState(p: Long, minP: Long)

  case class CusumRow(key: Long, event_id: Long, t_us: Long, cusum: Long)

  private def processKey(slack: Long, ttlMs: Long)(
      key: Long, rows: Iterator[CusumEvent],
      state: GroupState[CusumState]): Iterator[CusumRow] = {
    if (state.hasTimedOut) {
      state.remove()
      return Iterator.empty
    }
    var st = state.getOption.getOrElse(CusumState(0L, 0L))
    val out = Seq.newBuilder[CusumRow]
    rows.toSeq.sortBy(e => (e.tUs, e.eventId)).foreach { e =>
      val p = st.p + e.x - slack
      val minP = math.min(st.minP, p)
      st = CusumState(p, minP)
      out += CusumRow(key, e.eventId, e.tUs, p - math.min(0L, minP))
    }
    state.update(st)
    if (ttlMs > 0) state.setTimeoutDuration(ttlMs)
    out.result().iterator
  }

  /** `df` must expose (key, t_us, event_id, x); emits every event with its
    * running `cusum` statistic.
    */
  def cusumStream(df: DataFrame, slack: Long,
                  ttlMs: Long = 0L): Dataset[CusumRow] = {
    import df.sparkSession.implicits._
    implicit val stateEnc: Encoder[CusumState] = Encoders.product[CusumState]
    val timeout =
      if (ttlMs > 0) GroupStateTimeout.ProcessingTimeTimeout
      else GroupStateTimeout.NoTimeout
    df.select(col("key").cast("long").as("key"),
        col("t_us").cast("long").as("tUs"),
        col("event_id").cast("long").as("eventId"),
        col("x").cast("long").as("x"))
      .as[CusumEvent]
      .groupByKey(_.key)
      .flatMapGroupsWithState(OutputMode.Append, timeout)(
        processKey(slack, ttlMs))
  }
}
