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
  * applies — for feeds that cannot promise it, [[cusumStreamOrdered]] puts
  * a watermark-delay reorder buffer (see [[Reorder]]) in front of the same
  * recursion, with a loud drop-and-count policy for events later than the
  * delay. Emits every event with its `cusum`; thresholding stays
  * downstream, exactly like the batch operator.
  *
  * State: (p, minP) per key — bounded by key cardinality, never stream
  * length; optional TTL reaps idle keys.
  */
object StreamingCusum {

  case class CusumEvent(key: Long, tUs: Long, eventId: Long, x: Long)

  case class CusumState(p: Long, minP: Long)

  case class CusumRow(key: Long, event_id: Long, t_us: Long, cusum: Long)

  /** The CUSUM recursion proper over `evs` (already in (ts, id) order) from
    * `st0` — shared verbatim by the in-order and reorder-buffered paths.
    */
  private def runMachine(slack: Long, key: Long, evs: Seq[CusumEvent],
                         st0: CusumState): (Seq[CusumRow], CusumState) = {
    var st = st0
    val out = Seq.newBuilder[CusumRow]
    evs.foreach { e =>
      val p = st.p + e.x - slack
      val minP = math.min(st.minP, p)
      st = CusumState(p, minP)
      out += CusumRow(key, e.eventId, e.tUs, p - math.min(0L, minP))
    }
    (out.result(), st)
  }

  /** Rebase the carried prefix sums so they stay bounded by the STATISTIC
    * instead of drifting with the raw prefix: only `p - min(0, minP)` is
    * ever observable, and `minP <= 0` always (it starts at 0 and only
    * falls), so shifting both fields by `-minP` changes nothing emitted —
    * `out' = (p - minP) - min(0, 0) = p - minP = out` — while a
    * forever-running key with persistent drift no longer marches `p`
    * toward Long overflow.
    */
  private def rebase(st: CusumState): CusumState =
    CusumState(st.p - st.minP, 0L)

  private def processKey(slack: Long, ttlMs: Long)(
      key: Long, rows: Iterator[CusumEvent],
      state: GroupState[CusumState]): Iterator[CusumRow] = {
    if (state.hasTimedOut) {
      state.remove()
      return Iterator.empty
    }
    val (out, st) = runMachine(slack, key,
      rows.toSeq.sortBy(e => (e.tUs, e.eventId)),
      state.getOption.getOrElse(CusumState(0L, 0L)))
    state.update(rebase(st))
    if (ttlMs > 0) state.setTimeoutDuration(ttlMs)
    out.iterator
  }

  /** Wire row of the reorder-buffered path: [[CusumEvent]] plus the
    * event-time timestamp the watermark rides on.
    */
  case class CusumEventT(key: Long, tUs: Long, eventId: Long, x: Long,
                         ts: java.sql.Timestamp)

  /** Pending (not-yet-released) event, key- and ts-column-free. */
  case class CusumPend(tUs: Long, eventId: Long, x: Long)

  case class CusumOrderedState(p: Long, minP: Long, frontierUs: Long,
                               pending: Array[CusumPend])

  private val pendOrder: Ordering[CusumPend] = Ordering.by(p => (p.tUs, p.eventId))

  private lazy val log = org.slf4j.LoggerFactory.getLogger(getClass)

  private def processKeyOrdered(slack: Long,
      lateAcc: Option[org.apache.spark.util.LongAccumulator],
      idleTtlMs: Long)(
      key: Long, rows: Iterator[CusumEventT],
      state: GroupState[CusumOrderedState]): Iterator[CusumRow] = {
    val wmMs = state.getCurrentWatermarkMs()
    val wmU  = Reorder.wmUs(wmMs)
    val prev = state.getOption
      .getOrElse(CusumOrderedState(0L, 0L, Long.MinValue, Array.empty))
    // idle-TTL reclaim (see Reorder.idleTimeoutMs): timed-out + nothing
    // pending = the idle timer — drop the key's state entirely
    if (state.hasTimedOut && prev.pending.isEmpty) {
      state.remove()
      return Iterator.empty
    }
    val incoming = rows.map(e => CusumPend(e.tUs, e.eventId, e.x)).toSeq
    val (ready, still, nLate) = Reorder.release(
      prev.pending.toSeq, incoming, prev.frontierUs, wmU, (p: CusumPend) => p.tUs)(pendOrder)
    if (nLate > 0) {
      lateAcc.foreach(_.add(nLate.toLong))
      log.warn(s"cusumStreamOrdered key=$key dropped $nLate event(s) behind " +
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
    val (out, st) = runMachine(slack, key,
      ready.map(p => CusumEvent(key, p.tUs, p.eventId, p.x)),
      CusumState(prev.p, prev.minP))
    val relMax = if (ready.isEmpty) Long.MinValue else ready.map(_.tUs).max
    val rb = rebase(st)
    state.update(CusumOrderedState(rb.p, rb.minP,
      Reorder.advance(prev.frontierUs, wmU, relMax), still.toArray))
    if (still.nonEmpty)
      state.setTimeoutTimestamp(Reorder.nextTimeoutMs(still.map(_.tUs).min, wmMs))
    else if (idleTtlMs > 0)
      state.setTimeoutTimestamp(Reorder.idleTimeoutMs(wmMs, idleTtlMs))
    out.iterator
  }

  /** [[cusumStream]] behind a bounded event-time reorder buffer (see
    * [[Reorder]]): tolerates ANY disorder — across micro-batches included —
    * up to `delayMs` of event time. The CUSUM recursion is order-DEFINED
    * (not just order-sensitive), so the buffer is what makes a replayed or
    * repartition-merged feed compute the same statistic as the batch
    * closed form. Events later than the delay are dropped loudly
    * (Spark's watermark filter counts them in `numRowsDroppedByWatermark`;
    * `lateAcc` nets any residual per-key-frontier stragglers — see
    * [[Reorder]]); emission trails the feed by ~`delayMs`.
    *
    * `idleTtlMs` > 0 reclaims state for keys with nothing pending and no
    * traffic for that much event time past the watermark (see
    * [[Reorder.idleTimeoutMs]]); an expired key's statistic restarts from
    * 0 on its next event — the same contract as the in-order ttlMs.
    */
  def cusumStreamOrdered(df: DataFrame, slack: Long, delayMs: Long,
                         lateAcc: Option[org.apache.spark.util.LongAccumulator] = None,
                         idleTtlMs: Long = 0L)
      : Dataset[CusumRow] = {
    require(delayMs > 0, s"cusumStreamOrdered needs delayMs > 0, got $delayMs")
    import df.sparkSession.implicits._
    implicit val stateEnc: Encoder[CusumOrderedState] = Encoders.product[CusumOrderedState]
    df.select(col("key").cast("long").as("key"),
        col("t_us").cast("long").as("tUs"),
        col("event_id").cast("long").as("eventId"),
        col("x").cast("long").as("x"))
      .withColumn("ts", timestamp_micros(col("tUs")))
      .withWatermark("ts", s"$delayMs milliseconds")
      .as[CusumEventT]
      .groupByKey(_.key)
      .flatMapGroupsWithState(OutputMode.Append, GroupStateTimeout.EventTimeTimeout)(
        processKeyOrdered(slack, lateAcc, idleTtlMs))
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
