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
  *     suites use — and batch/stream outputs are identical. For feeds
  *     that CANNOT promise cross-batch order (replays, repartition
  *     merges), use [[asofJoinStreamOrdered]]: a watermark-delay reorder
  *     buffer in front of the same machine, with a loud drop-and-count
  *     policy for events later than the delay (see [[Reorder]]).
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

  /** The as-of machine proper: run `evs` (already in (ts, side, id) order —
    * setpoints beat probes on timestamp ties, the >= convention; ids make
    * re-delivery deterministic) from `cur0`, returning the joined probes
    * and the carried setpoint. Shared verbatim by the in-order and the
    * reorder-buffered entry points.
    */
  private def runMachine(key: Long, evs: Seq[AsofEvent], cur0: Option[AsofState])
      : (Seq[AsofJoined], Option[AsofState]) = {
    var cur = cur0
    val out = Seq.newBuilder[AsofJoined]
    evs.foreach { e =>
      if (e.side == 0) {
        if (cur.forall(_.tUs <= e.tUs)) cur = Some(AsofState(e.tUs, e.value))
      } else {
        val m = cur.filter(_.tUs <= e.tUs)
        out += AsofJoined(e.eventId, key, e.tUs, m.map(_.tUs), m.map(_.value))
      }
    }
    (out.result(), cur)
  }

  private def processKey(ttlMs: Long)(
      key: Long, rows: Iterator[AsofEvent],
      state: GroupState[AsofState]): Iterator[AsofJoined] = {
    if (state.hasTimedOut) {
      state.remove()
      return Iterator.empty
    }
    val (out, cur) = runMachine(key,
      rows.toSeq.sortBy(e => (e.tUs, e.side, e.eventId)), state.getOption)
    cur.foreach(state.update)
    if (ttlMs > 0) state.setTimeoutDuration(ttlMs)
    out.iterator
  }

  /** Wire row of the reorder-buffered path: [[AsofEvent]] plus the
    * event-time timestamp the watermark rides on (must survive the typed
    * projection or event-time timeouts are rejected).
    */
  case class AsofEventT(key: Long, tUs: Long, side: Int, eventId: Long,
                        value: Double, ts: java.sql.Timestamp)

  /** Pending (not-yet-released) event, key- and ts-column-free. */
  case class AsofPend(tUs: Long, side: Int, eventId: Long, value: Double)

  case class AsofOrderedState(hasCur: Boolean, curTs: Long, curValue: Double,
                              frontierUs: Long, pending: Array[AsofPend])

  private val pendOrder: Ordering[AsofPend] =
    Ordering.by(p => (p.tUs, p.side, p.eventId))

  private lazy val log = org.slf4j.LoggerFactory.getLogger(getClass)

  private def processKeyOrdered(lateAcc: Option[org.apache.spark.util.LongAccumulator],
                                idleTtlMs: Long)(
      key: Long, rows: Iterator[AsofEventT],
      state: GroupState[AsofOrderedState]): Iterator[AsofJoined] = {
    val wmMs = state.getCurrentWatermarkMs()
    val wmU  = Reorder.wmUs(wmMs)
    val prev = state.getOption
      .getOrElse(AsofOrderedState(hasCur = false, 0L, 0.0, Long.MinValue, Array.empty))
    // idle-TTL reclaim: a timed-out wake-up with nothing pending is the
    // idle timer firing (pending wake-ups always have a buffer) — drop the
    // key's state entirely, mirroring the in-order path's ttlMs contract
    if (state.hasTimedOut && prev.pending.isEmpty) {
      state.remove()
      return Iterator.empty
    }
    val incoming = rows.map(e => AsofPend(e.tUs, e.side, e.eventId, e.value)).toSeq
    val (ready, still, nLate) = Reorder.release(
      prev.pending.toSeq, incoming, prev.frontierUs, wmU, (p: AsofPend) => p.tUs)(pendOrder)
    if (nLate > 0) {
      lateAcc.foreach(_.add(nLate.toLong))
      log.warn(s"asofJoinStreamOrdered key=$key dropped $nLate event(s) behind " +
        s"the watermark frontier (${prev.frontierUs} us) — beyond the configured delay")
    }
    // skip-write: nothing released and nothing admitted (every incoming
    // row was frontier-late) leaves machine, frontier, and buffer exactly
    // as stored — rewriting the state row would be pure churn. Timed-out
    // wake-ups never take this path (a pending wake always releases; an
    // idle wake returned above).
    if (!state.hasTimedOut && ready.isEmpty &&
        ready.size + still.size == prev.pending.length) {
      // Spark clears the stored timeout on every invocation — re-arm it
      // or this no-op batch would cancel the pending/idle wake-up
      Reorder.rearmOnSkip(state,
        if (prev.pending.isEmpty) None else Some(prev.pending.map(_.tUs).min),
        wmMs, idleTtlMs)
      return Iterator.empty
    }
    val cur0 = if (prev.hasCur) Some(AsofState(prev.curTs, prev.curValue)) else None
    val (out, cur) = runMachine(key,
      ready.map(p => AsofEvent(key, p.tUs, p.side, p.eventId, p.value)), cur0)
    val relMax = if (ready.isEmpty) Long.MinValue else ready.map(_.tUs).max
    state.update(AsofOrderedState(cur.isDefined,
      cur.map(_.tUs).getOrElse(0L), cur.map(_.value).getOrElse(0.0),
      Reorder.advance(prev.frontierUs, wmU, relMax), still.toArray))
    if (still.nonEmpty)
      state.setTimeoutTimestamp(Reorder.nextTimeoutMs(still.map(_.tUs).min, wmMs))
    else if (idleTtlMs > 0)
      state.setTimeoutTimestamp(Reorder.idleTimeoutMs(wmMs, idleTtlMs))
    out.iterator
  }

  /** [[asofJoinStream]] behind a bounded event-time reorder buffer (see
    * [[Reorder]]): tolerates ANY disorder — across micro-batches included —
    * up to `delayMs` of event time, by buffering each event in keyed state
    * until the stream watermark passes it and only then feeding it, in
    * full (ts, side, id) order, to the unchanged as-of machine. Output
    * equals the batch operator under any delivery order/batching within
    * the delay. Events later than the delay are dropped loudly
    * (Spark's watermark filter counts them in `numRowsDroppedByWatermark`;
    * `lateAcc` nets any residual per-key-frontier stragglers — see
    * [[Reorder]]) — never silently mis-joined. Emission waits
    * for the watermark, so results trail the feed by ~`delayMs`.
    *
    * `idleTtlMs` > 0 reclaims state for keys with no pending events and no
    * traffic for that much EVENT time past the watermark (the ordered
    * analog of [[asofJoinStream]]'s ttlMs — without it, a churning key
    * space grows state without bound). The tradeoff is the same as the
    * in-order TTL: a probe arriving after its key expired re-starts from
    * empty state (no setpoint), so size the TTL above the longest
    * plausible per-key silence.
    */
  def asofJoinStreamOrdered(probes: DataFrame, setpoints: DataFrame,
                            delayMs: Long,
                            lateAcc: Option[org.apache.spark.util.LongAccumulator] = None,
                            idleTtlMs: Long = 0L)
      : Dataset[AsofJoined] = {
    require(delayMs > 0, s"asofJoinStreamOrdered needs delayMs > 0, got $delayMs")
    import probes.sparkSession.implicits._
    implicit val stateEnc: Encoder[AsofOrderedState] = Encoders.product[AsofOrderedState]
    val u = probes.select(col("key").cast("long").as("key"),
        col("t_us").cast("long").as("tUs"), lit(1).as("side"),
        col("event_id").cast("long").as("eventId"), lit(0.0).as("value"))
      .unionByName(setpoints.select(col("key").cast("long").as("key"),
        col("t_us").cast("long").as("tUs"), lit(0).as("side"),
        lit(-1L).as("eventId"), col("value").cast("double").as("value")))
      .withColumn("ts", timestamp_micros(col("tUs")))
      .withWatermark("ts", s"$delayMs milliseconds")
      .as[AsofEventT]
    u.groupByKey(_.key)
      .flatMapGroupsWithState(OutputMode.Append, GroupStateTimeout.EventTimeTimeout)(
        processKeyOrdered(lateAcc, idleTtlMs))
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
