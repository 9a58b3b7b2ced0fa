package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset, Encoder, Encoders}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** Streaming EWMA level tracking — the in-stream counterpart of
  * [[graft.operators.Stats.ewma]]: per key, the integer fixed-point level
  * recurrence
  *
  *   level_0 = v_0 · 2^k ;  level_i = level_{i−1} + ((v_i · 2^k − level_{i−1}) >> k)
  *
  * carried across micro-batches in O(1) state (one long + an init flag),
  * each event emitted with its smoothed `level_q` and prior-residual
  * `resid` — identical arithmetic to the batch machine, so stream == batch
  * by construction on an in-order feed.
  *
  * Rows within a micro-batch are processed in (t_us, event_id) order
  * (intra-batch disorder absorbed); across batches the usual
  * in-order-per-key contract applies — for feeds that cannot promise it,
  * [[ewmaStreamOrdered]] puts the watermark-delay reorder buffer (see
  * [[Reorder]]) in front of the same recursion, with the loud
  * drop-and-count policy for events later than the delay. Like CUSUM (and
  * unlike the sketch streams) the recurrence is order-DEFINED, so disorder
  * tolerance needs the buffer, not algebra.
  *
  * State: (level, init) per key — bounded by key cardinality, never stream
  * length; optional TTL reaps idle keys (an expired key's level restarts
  * from its next observation, the cusumStream contract).
  */
object StreamingEwma {

  case class EwmaEvent(key: Long, tUs: Long, eventId: Long, v: Long)

  case class EwmaState(level: Long, init: Boolean)

  case class EwmaRow(key: Long, event_id: Long, t_us: Long, v: Long,
                     level_q: Long, resid: Long)

  /** The EWMA recursion proper over `evs` (already in (ts, id) order) from
    * `st0` — shared verbatim by the in-order and reorder-buffered paths,
    * and arithmetic-identical to [[graft.operators.Stats.ewma]]'s machine.
    */
  private def runMachine(k: Int, key: Long, evs: Seq[EwmaEvent],
                         st0: EwmaState): (Seq[EwmaRow], EwmaState) = {
    var st = st0
    val out = Seq.newBuilder[EwmaRow]
    evs.foreach { e =>
      val resid = if (!st.init) 0L else e.v - (st.level >> k)
      val level = if (!st.init) e.v << k
        else st.level + (((e.v << k) - st.level) >> k)
      st = EwmaState(level, init = true)
      out += EwmaRow(key, e.eventId, e.tUs, e.v, level >> k, resid)
    }
    (out.result(), st)
  }

  private def processKey(k: Int, ttlMs: Long)(
      key: Long, rows: Iterator[EwmaEvent],
      state: GroupState[EwmaState]): Iterator[EwmaRow] = {
    if (state.hasTimedOut) {
      state.remove()
      return Iterator.empty
    }
    val (out, st) = runMachine(k, key,
      rows.toSeq.sortBy(e => (e.tUs, e.eventId)),
      state.getOption.getOrElse(EwmaState(0L, init = false)))
    state.update(st)
    if (ttlMs > 0) state.setTimeoutDuration(ttlMs)
    out.iterator
  }

  /** Wire row of the reorder-buffered path: [[EwmaEvent]] plus the
    * event-time timestamp the watermark rides on.
    */
  case class EwmaEventT(key: Long, tUs: Long, eventId: Long, v: Long,
                        ts: java.sql.Timestamp)

  /** Pending (not-yet-released) event, key- and ts-column-free. */
  case class EwmaPend(tUs: Long, eventId: Long, v: Long)

  case class EwmaOrderedState(level: Long, init: Boolean, frontierUs: Long,
                              pending: Array[EwmaPend])

  private val pendOrder: Ordering[EwmaPend] = Ordering.by(p => (p.tUs, p.eventId))

  private lazy val log = org.slf4j.LoggerFactory.getLogger(getClass)

  private[streaming] def processKeyOrdered(k: Int,
      lateAcc: Option[org.apache.spark.util.LongAccumulator],
      idleTtlMs: Long)(
      key: Long, rows: Iterator[EwmaEventT],
      state: GroupState[EwmaOrderedState]): Iterator[EwmaRow] = {
    val wmMs = state.getCurrentWatermarkMs()
    val wmU  = Reorder.wmUs(wmMs)
    val prev = state.getOption
      .getOrElse(EwmaOrderedState(0L, init = false, Long.MinValue, Array.empty))
    if (state.hasTimedOut && prev.pending.isEmpty) {
      state.remove()
      return Iterator.empty
    }
    val incoming = rows.map(e => EwmaPend(e.tUs, e.eventId, e.v)).toSeq
    val (ready, still, nLate) = Reorder.release(
      prev.pending.toSeq, incoming, prev.frontierUs, wmU, (p: EwmaPend) => p.tUs)(pendOrder)
    if (nLate > 0) {
      lateAcc.foreach(_.add(nLate.toLong))
      log.warn(s"ewmaStreamOrdered key=$key dropped $nLate event(s) behind " +
        s"the watermark frontier (${prev.frontierUs} us) — beyond the configured delay")
    }
    // skip-write: nothing released, nothing admitted — state is unchanged
    if (!state.hasTimedOut && ready.isEmpty &&
        ready.size + still.size == prev.pending.length) {
      // Spark clears the stored timeout on every invocation — re-arm it
      // or this no-op batch would cancel the pending/idle wake-up
      Reorder.rearmOnSkip(state,
        if (prev.pending.isEmpty) None else Some(prev.pending.map(_.tUs).min),
        wmMs, idleTtlMs)
      return Iterator.empty
    }
    val (out, st) = runMachine(k, key,
      ready.map(p => EwmaEvent(key, p.tUs, p.eventId, p.v)),
      EwmaState(prev.level, prev.init))
    val relMax = if (ready.isEmpty) Long.MinValue else ready.map(_.tUs).max
    state.update(EwmaOrderedState(st.level, st.init,
      Reorder.advance(prev.frontierUs, wmU, relMax), still.toArray))
    if (still.nonEmpty)
      state.setTimeoutTimestamp(Reorder.nextTimeoutMs(still.map(_.tUs).min, wmMs))
    else if (idleTtlMs > 0)
      state.setTimeoutTimestamp(Reorder.idleTimeoutMs(wmMs, idleTtlMs))
    out.iterator
  }

  /** [[ewmaStream]] behind the bounded event-time reorder buffer (see
    * [[Reorder]]): tolerates ANY disorder — across micro-batches included —
    * up to `delayMs` of event time; later events drop loudly
    * (`numRowsDroppedByWatermark` + `lateAcc`); emission trails the feed
    * by ~`delayMs`. `idleTtlMs` > 0 reclaims state for keys with nothing
    * pending and no traffic for that much event time past the watermark.
    */
  def ewmaStreamOrdered(df: DataFrame, k: Int = 3, delayMs: Long,
                        lateAcc: Option[org.apache.spark.util.LongAccumulator] = None,
                        idleTtlMs: Long = 0L): Dataset[EwmaRow] = {
    require(k >= 1 && k <= 16, s"need 1 <= k <= 16, got $k")
    require(delayMs > 0, s"ewmaStreamOrdered needs delayMs > 0, got $delayMs")
    import df.sparkSession.implicits._
    implicit val stateEnc: Encoder[EwmaOrderedState] = Encoders.product[EwmaOrderedState]
    df.select(col("key").cast("long").as("key"),
        col("t_us").cast("long").as("tUs"),
        col("event_id").cast("long").as("eventId"),
        col("v").cast("long").as("v"))
      .filter(col("v").isNotNull)
      .withColumn("ts", timestamp_micros(col("tUs")))
      .withWatermark("ts", s"$delayMs milliseconds")
      .as[EwmaEventT]
      .groupByKey(_.key)
      .flatMapGroupsWithState(OutputMode.Append, GroupStateTimeout.EventTimeTimeout)(
        processKeyOrdered(k, lateAcc, idleTtlMs))
  }

  /** `df` must expose (key, t_us, event_id, v) with v already quantized to
    * BIGINT; emits every event with its smoothed level and residual.
    * Null metrics are excluded (no observation — the batch contract; a
    * null would also fail the non-nullable Long decode).
    */
  def ewmaStream(df: DataFrame, k: Int = 3,
                 ttlMs: Long = 0L): Dataset[EwmaRow] = {
    require(k >= 1 && k <= 16, s"need 1 <= k <= 16, got $k")
    import df.sparkSession.implicits._
    implicit val stateEnc: Encoder[EwmaState] = Encoders.product[EwmaState]
    val timeout =
      if (ttlMs > 0) GroupStateTimeout.ProcessingTimeTimeout
      else GroupStateTimeout.NoTimeout
    df.select(col("key").cast("long").as("key"),
        col("t_us").cast("long").as("tUs"),
        col("event_id").cast("long").as("eventId"),
        col("v").cast("long").as("v"))
      .filter(col("v").isNotNull)
      .as[EwmaEvent]
      .groupByKey(_.key)
      .flatMapGroupsWithState(OutputMode.Append, timeout)(
        processKey(k, ttlMs))
  }
}
