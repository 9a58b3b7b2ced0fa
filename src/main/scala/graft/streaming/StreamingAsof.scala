package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset, Encoder, Encoders}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** Streaming as-of join — the in-stream counterpart of
  * [[graft.operators.AsofJoin]]: probe events pick up the latest
  * setpoint at-or-before their timestamp within a key, with the setpoint
  * carried in keyed state across micro-batches (O(1) state per key — the
  * last setpoint only, never a buffer of rows).
  *
  * Semantics and their honest limits (append mode):
  *   - WITHIN a micro-batch, rows are processed in (ts, side) order with
  *     setpoints first on ties — identical to the batch operator, so any
  *     intra-batch disorder is absorbed.
  *   - ACROSS batches, a probe is answered from state at arrival: a
  *     setpoint that arrives in a LATER batch but with an EARLIER
  *     timestamp cannot retro-fill probes already emitted (append mode
  *     has no retraction). Deliver each key's feed in event-time order
  *     across batches — the same contract the corpus-replay streaming
  *     suites use — and batch/stream outputs are identical.
  *   - A late setpoint OLDER than the one in state is ignored (state
  *     keeps the max-timestamp setpoint), so state never regresses.
  *
  * State: one (ts, value) pair per key — bounded by key cardinality, not
  * stream length; optional TTL expires idle keys.
  */
object StreamingAsof {

  /** Unioned wire row: side 0 = setpoint (value set), side 1 = probe. */
  case class AsofEvent(key: Long, tUs: Long, side: Int, eventId: Long,
                       value: Double)

  case class AsofState(tUs: Long, value: Double)

  case class AsofJoined(event_id: Long, key: Long, t_us: Long,
                        asof_ts: Option[Long], asof_value: Option[Double])

  private def processKey(ttlMs: Long)(
      key: Long, rows: Iterator[AsofEvent],
      state: GroupState[AsofState]): Iterator[AsofJoined] = {
    if (state.hasTimedOut) {
      state.remove()
      return Iterator.empty
    }
    var cur = state.getOption
    val out = Seq.newBuilder[AsofJoined]
    // (ts, side, id) order: setpoints beat probes on timestamp ties (the
    // >= convention), ids make re-delivery deterministic
    rows.toSeq.sortBy(e => (e.tUs, e.side, e.eventId)).foreach { e =>
      if (e.side == 0) {
        if (cur.forall(_.tUs <= e.tUs)) cur = Some(AsofState(e.tUs, e.value))
      } else {
        val m = cur.filter(_.tUs <= e.tUs)
        out += AsofJoined(e.eventId, key, e.tUs, m.map(_.tUs), m.map(_.value))
      }
    }
    cur.foreach(state.update)
    if (ttlMs > 0) state.setTimeoutDuration(ttlMs)
    out.result().iterator
  }

  /** Join a streaming probe frame `(event_id, key, t_us)` against a
    * streaming setpoint frame `(key, t_us, value)`. Both sides may come
    * from one source (filtered two ways) or two unioned sources.
    */
  def asofJoinStream(probes: DataFrame, setpoints: DataFrame,
                     ttlMs: Long = 0L): Dataset[AsofJoined] = {
    import probes.sparkSession.implicits._
    implicit val stateEnc: Encoder[AsofState] = Encoders.product[AsofState]
    val u = probes.select(col("key").cast("long").as("key"),
        col("t_us").cast("long").as("tUs"), lit(1).as("side"),
        col("event_id").cast("long").as("eventId"), lit(0.0).as("value"))
      .unionByName(setpoints.select(col("key").cast("long").as("key"),
        col("t_us").cast("long").as("tUs"), lit(0).as("side"),
        lit(-1L).as("eventId"), col("value").cast("double").as("value")))
      .as[AsofEvent]
    val timeout =
      if (ttlMs > 0) GroupStateTimeout.ProcessingTimeTimeout
      else GroupStateTimeout.NoTimeout
    u.groupByKey(_.key)
      .flatMapGroupsWithState(OutputMode.Append, timeout)(processKey(ttlMs))
  }
}
