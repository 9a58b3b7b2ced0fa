package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset, Encoder, Encoders}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** Streaming interval join — the in-stream counterpart of
  * [[graft.operators.IntervalJoin]]: each arriving point pairs with every
  * OPEN `[start, end)` window of its key, with the open-window set carried
  * in keyed state across micro-batches.
  *
  * Semantics (append mode, same contract family as [[StreamingAsof]]):
  *  - WITHIN a micro-batch, rows process in event-time order with windows
  *    opening before points on ties, so intra-batch disorder is absorbed;
  *  - ACROSS batches, a point matches the windows seen so far: a window
  *    arriving in a later batch with an earlier start cannot retro-match
  *    already-emitted points (no retraction in append mode). Deliver each
  *    key's feed in event-time order and stream == batch. For feeds that
  *    CANNOT promise cross-batch order, use [[intervalJoinStreamOrdered]]:
  *    a watermark-delay reorder buffer in front of the same machine, with
  *    a loud drop-and-count policy for events later than the delay (see
  *    [[Reorder]]).
  *
  * State stays bounded WITHOUT a watermark config: once a point at time t
  * has been processed, in-order delivery means no future point can land
  * before t, so every window with `end <= t` is closed and dropped at the
  * end of the batch. Per-key state is therefore the OVERLAP DEGREE of the
  * window feed (windows still open at the frontier), not its history;
  * an optional processing-time TTL reaps idle keys entirely.
  */
object StreamingInterval {

  /** side 0 = window (tUs = start), side 1 = point. */
  case class IvEvent(key: Long, tUs: Long, side: Int, eventId: Long,
                     endUs: Long, value: Double)

  case class IvWindow(startUs: Long, endUs: Long, value: Double)

  case class IvState(frontierUs: Long, windows: Array[IvWindow])

  case class IvMatch(event_id: Long, key: Long, t_us: Long,
                     start_us: Long, value: Double)

  /** The interval machine proper: run `evs` (already in (ts, side, id)
    * order — windows open before points on ties) from (frontier0, open0),
    * returning the matches, the advanced point frontier, and the surviving
    * open-window set (pruned by `closeUs` — the point frontier for the
    * in-order path, max(frontier, watermark) for the reorder-buffered one,
    * since there no future released point can precede the watermark).
    * Shared verbatim by both entry points.
    */
  private def runMachine(key: Long, evs: Seq[IvEvent], frontier0: Long,
                         open0: Array[IvWindow], closeUsOf: Long => Long)
      : (Seq[IvMatch], Long, Array[IvWindow]) = {
    var frontier = frontier0
    val open = scala.collection.mutable.ArrayBuffer.from(open0)
    val out = Seq.newBuilder[IvMatch]
    evs.foreach { e =>
      if (e.side == 0) {
        if (e.endUs > e.tUs && e.endUs > frontier)
          open += IvWindow(e.tUs, e.endUs, e.value)
      } else {
        if (e.tUs > frontier) frontier = e.tUs
        open.foreach { w =>
          if (e.tUs >= w.startUs && e.tUs < w.endUs)
            out += IvMatch(e.eventId, key, e.tUs, w.startUs, w.value)
        }
      }
    }
    val closeUs = closeUsOf(frontier)
    (out.result(), frontier, open.filter(_.endUs > closeUs).toArray)
  }

  private def processKey(ttlMs: Long)(
      key: Long, rows: Iterator[IvEvent],
      state: GroupState[IvState]): Iterator[IvMatch] = {
    if (state.hasTimedOut) {
      state.remove()
      return Iterator.empty
    }
    val prev = state.getOption.getOrElse(IvState(Long.MinValue, Array.empty))
    val (out, frontier, stillOpen) = runMachine(key,
      rows.toSeq.sortBy(e => (e.tUs, e.side, e.eventId)),
      prev.frontierUs, prev.windows, identity)
    if (stillOpen.nonEmpty || frontier != Long.MinValue)
      state.update(IvState(frontier, stillOpen))
    if (ttlMs > 0) state.setTimeoutDuration(ttlMs)
    out.iterator
  }

  /** Wire row of the reorder-buffered path: [[IvEvent]] plus the
    * event-time timestamp the watermark rides on.
    */
  case class IvEventT(key: Long, tUs: Long, side: Int, eventId: Long,
                      endUs: Long, value: Double, ts: java.sql.Timestamp)

  /** Pending (not-yet-released) event, key- and ts-column-free. */
  case class IvPend(tUs: Long, side: Int, eventId: Long, endUs: Long,
                    value: Double)

  case class IvOrderedState(frontierUs: Long, releasedUs: Long,
                            windows: Array[IvWindow], pending: Array[IvPend])

  private val pendOrder: Ordering[IvPend] =
    Ordering.by(p => (p.tUs, p.side, p.eventId))

  private lazy val log = org.slf4j.LoggerFactory.getLogger(getClass)

  private def processKeyOrdered(lateAcc: Option[org.apache.spark.util.LongAccumulator],
                                idleTtlMs: Long)(
      key: Long, rows: Iterator[IvEventT],
      state: GroupState[IvOrderedState]): Iterator[IvMatch] = {
    val wmMs = state.getCurrentWatermarkMs()
    val wmU  = Reorder.wmUs(wmMs)
    val prev = state.getOption
      .getOrElse(IvOrderedState(Long.MinValue, Long.MinValue, Array.empty, Array.empty))
    // idle-TTL reclaim (see Reorder.idleTimeoutMs): timed-out + nothing
    // pending = the idle timer — drop the key's state entirely
    if (state.hasTimedOut && prev.pending.isEmpty) {
      state.remove()
      return Iterator.empty
    }
    val incoming = rows.map(e => IvPend(e.tUs, e.side, e.eventId, e.endUs, e.value)).toSeq
    val (ready, still, nLate) = Reorder.release(
      prev.pending.toSeq, incoming, prev.releasedUs, wmU, (p: IvPend) => p.tUs)(pendOrder)
    if (nLate > 0) {
      lateAcc.foreach(_.add(nLate.toLong))
      log.warn(s"intervalJoinStreamOrdered key=$key dropped $nLate event(s) behind " +
        s"the watermark frontier (${prev.releasedUs} us) — beyond the configured delay")
    }
    // skip-write: nothing released, nothing admitted — state is unchanged
    // (the wm-close prune below only fires on released traffic; an idle
    // key's open windows are reaped by the idle TTL, not per-batch churn)
    if (!state.hasTimedOut && ready.isEmpty &&
        ready.size + still.size == prev.pending.length) {
      // Spark clears the stored timeout on every invocation — re-arm it
      // or this no-op batch would cancel the pending/idle wake-up
      Reorder.rearmOnSkip(state,
        if (prev.pending.isEmpty) None else Some(prev.pending.map(_.tUs).min),
        wmMs, idleTtlMs)
      return Iterator.empty
    }
    // windows additionally close at the watermark: every future released
    // point has t > wm, so end <= wm can never match again
    val (out, frontier, stillOpen) = runMachine(key,
      ready.map(p => IvEvent(key, p.tUs, p.side, p.eventId, p.endUs, p.value)),
      prev.frontierUs, prev.windows, f => math.max(f, wmU))
    val relMax = if (ready.isEmpty) Long.MinValue else ready.map(_.tUs).max
    state.update(IvOrderedState(frontier,
      Reorder.advance(prev.releasedUs, wmU, relMax), stillOpen, still.toArray))
    if (still.nonEmpty)
      state.setTimeoutTimestamp(Reorder.nextTimeoutMs(still.map(_.tUs).min, wmMs))
    else if (idleTtlMs > 0)
      state.setTimeoutTimestamp(Reorder.idleTimeoutMs(wmMs, idleTtlMs))
    out.iterator
  }

  /** [[intervalJoinStream]] behind a bounded event-time reorder buffer
    * (see [[Reorder]]): tolerates ANY disorder — across micro-batches
    * included — up to `delayMs` of event time, by buffering each event in
    * keyed state until the watermark passes it and only then feeding it,
    * in full (ts, side, id) order, to the unchanged interval machine.
    * Output equals the batch operator under any delivery order/batching
    * within the delay; events later than the delay are dropped loudly
    * (Spark's watermark filter counts them in `numRowsDroppedByWatermark`;
    * `lateAcc` nets any residual per-key-frontier stragglers — see
    * [[Reorder]]). Emission trails the feed by ~`delayMs`.
    *
    * WINDOW-LAG CONTRACT: window records ride the watermark at their
    * START (stamping them at their end would let a long window
    * fast-forward the global watermark past genuinely on-time points), so
    * with the default single delay a window record must ARRIVE within
    * `delayMs` of its start or the watermark filter drops the whole
    * window — counted in `numRowsDroppedByWatermark`, never silent, but
    * all of its matches go with it (spec-locked). For window feeds that
    * publish LATER than the point feed (the common shape: a window closes
    * before it is written), set `windowDelayMs` — typically
    * `delayMs + maxWindowLen` — and the window side carries its own
    * watermark: the global watermark is the MIN of the two sides
    * (Spark's multipleWatermarkPolicy default), so a window arriving up
    * to `windowDelayMs` after its start is admitted, at the price of
    * point emission trailing by up to `windowDelayMs` when the window
    * feed lags — the inherent single-global-watermark coupling, now a
    * knob instead of a wall. (The in-order [[intervalJoinStream]] does
    * NOT have this constraint: it admits any window whose end is ahead
    * of the point frontier — a feed whose windows publish late but in
    * order may prefer it.)
    *
    * `idleTtlMs` > 0 reclaims state for keys with no pending events and
    * no traffic for that much event time past the watermark (see
    * [[Reorder.idleTimeoutMs]]); open windows of an expired key are
    * dropped with it, so size the TTL above the longest window.
    */
  def intervalJoinStreamOrdered(points: DataFrame, windows: DataFrame,
                                delayMs: Long,
                                lateAcc: Option[org.apache.spark.util.LongAccumulator] = None,
                                idleTtlMs: Long = 0L,
                                windowDelayMs: Long = 0L)
      : Dataset[IvMatch] = {
    require(delayMs > 0, s"intervalJoinStreamOrdered needs delayMs > 0, got $delayMs")
    import points.sparkSession.implicits._
    implicit val stateEnc: Encoder[IvOrderedState] = Encoders.product[IvOrderedState]
    val p = points.select(col("key").cast("long").as("key"),
        col("t_us").cast("long").as("tUs"), lit(1).as("side"),
        col("event_id").cast("long").as("eventId"),
        lit(0L).as("endUs"), lit(0.0).as("value"))
    val w = windows.select(col("key").cast("long").as("key"),
        col("start_us").cast("long").as("tUs"), lit(0).as("side"),
        lit(-1L).as("eventId"), col("end_us").cast("long").as("endUs"),
        col("value").cast("double").as("value"))
    // Default: ONE watermark over the union — either side's progress
    // advances it (an idle window feed never stalls points). With
    // windowDelayMs set, each side carries its own watermark node and the
    // global watermark is their MIN: the window side may lag by
    // windowDelayMs without its records being branded late, and the
    // documented price is that points wait on the slower side — including
    // at stream start, where no points release until the FIRST window
    // batch establishes the window-side watermark.
    val u =
      if (windowDelayMs > 0)
        p.withColumn("ts", timestamp_micros(col("tUs")))
          .withWatermark("ts", s"$delayMs milliseconds")
          .unionByName(w.withColumn("ts", timestamp_micros(col("tUs")))
            .withWatermark("ts", s"$windowDelayMs milliseconds"))
          .as[IvEventT]
      else
        p.unionByName(w)
          .withColumn("ts", timestamp_micros(col("tUs")))
          .withWatermark("ts", s"$delayMs milliseconds")
          .as[IvEventT]
    u.groupByKey(_.key)
      .flatMapGroupsWithState(OutputMode.Append, GroupStateTimeout.EventTimeTimeout)(
        processKeyOrdered(lateAcc, idleTtlMs))
  }

  /** Join a streaming point frame `(event_id, key, t_us)` against a
    * streaming window frame `(key, start_us, end_us, value)`.
    */
  def intervalJoinStream(points: DataFrame, windows: DataFrame,
                         ttlMs: Long = 0L): Dataset[IvMatch] = {
    import points.sparkSession.implicits._
    implicit val stateEnc: Encoder[IvState] = Encoders.product[IvState]
    val u = points.select(col("key").cast("long").as("key"),
        col("t_us").cast("long").as("tUs"), lit(1).as("side"),
        col("event_id").cast("long").as("eventId"),
        lit(0L).as("endUs"), lit(0.0).as("value"))
      .unionByName(windows.select(col("key").cast("long").as("key"),
        col("start_us").cast("long").as("tUs"), lit(0).as("side"),
        lit(-1L).as("eventId"), col("end_us").cast("long").as("endUs"),
        col("value").cast("double").as("value")))
      .as[IvEvent]
    val timeout =
      if (ttlMs > 0) GroupStateTimeout.ProcessingTimeTimeout
      else GroupStateTimeout.NoTimeout
    u.groupByKey(_.key)
      .flatMapGroupsWithState(OutputMode.Append, timeout)(processKey(ttlMs))
  }
}
