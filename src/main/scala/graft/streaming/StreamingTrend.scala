package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset, Encoder, Encoders}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** Streaming OLS trend — the in-stream counterpart of
  * [[graft.operators.Stats.trend]]: per key, the four integer moment sums
  * (Σx, Σy, Σxy, Σx²) over time-rebased observations carried across
  * micro-batches in O(1) state, the slope re-derived after every batch
  * that touches the key. The LATEST emission per key IS the trend (the
  * cmsStream update contract); arithmetic is replayed in exact BigInt with
  * the same truncate-toward-zero scaling as the batch DECIMAL `div`, so
  * stream == batch by construction on an in-order feed.
  *
  * The rebase origin t0 is the key's FIRST event time — equal to the
  * batch operator's per-key min only under the in-order-per-key contract
  * (intra-batch disorder is absorbed by sorting each batch; cross-batch
  * disorder needs [[trendStreamOrdered]]'s watermark-delay reorder buffer,
  * the cusum/ewma stance: the rebase is order-DEFINED, so disorder
  * tolerance needs the buffer, not algebra).
  *
  * State: six longs + a flag per key — bounded by key cardinality, never
  * stream length; optional TTL reaps idle keys (an expired key's trend
  * restarts from its next observation).
  */
object StreamingTrend {

  case class TrendEvent(key: Long, tUs: Long, eventId: Long, v: Long)

  case class TrendState(t0: Long, n: Long, sx: Long, sy: Long,
                        sxy: Long, sxx: Long, init: Boolean)

  case class TrendRow(key: Long, n: Long, sx: Long, sy: Long, sxy: Long,
                      sxx: Long, slope_ppm: Option[Long])

  /** The exact slope the batch side derives in DECIMAL(38,0): BigInt
    * combination, ×10^6, truncation toward zero (BigInt `/`), NULL on zero
    * x-variance.
    */
  def slopePpm(n: Long, sx: Long, sy: Long, sxy: Long, sxx: Long): Option[Long] = {
    val den = BigInt(n) * sxx - BigInt(sx) * sx
    if (den == 0) None
    else Some((((BigInt(n) * sxy - BigInt(sx) * sy) * 1000000) / den).toLong)
  }

  /** Fold `evs` (already (ts, id)-ordered) into the sums from `st0` —
    * arithmetic-identical to the batch aggregation.
    */
  private def runMachine(unitUs: Long, evs: Seq[TrendEvent],
                         st0: TrendState): TrendState = {
    var st = st0
    evs.foreach { e =>
      val t0 = if (!st.init) e.tUs else st.t0
      val x = Math.floorDiv(e.tUs - t0, unitUs) // tUs >= t0 in-order: div == floorDiv
      st = TrendState(t0, st.n + 1, st.sx + x, st.sy + e.v,
        st.sxy + x * e.v, st.sxx + x * x, init = true)
    }
    st
  }

  private def emit(key: Long, st: TrendState): TrendRow =
    TrendRow(key, st.n, st.sx, st.sy, st.sxy, st.sxx,
      slopePpm(st.n, st.sx, st.sy, st.sxy, st.sxx))

  private val zero = TrendState(0L, 0L, 0L, 0L, 0L, 0L, init = false)

  private def processKey(unitUs: Long, ttlMs: Long)(
      key: Long, rows: Iterator[TrendEvent],
      state: GroupState[TrendState]): Iterator[TrendRow] = {
    if (state.hasTimedOut) {
      state.remove()
      return Iterator.empty
    }
    val st = runMachine(unitUs,
      rows.toSeq.sortBy(e => (e.tUs, e.eventId)),
      state.getOption.getOrElse(zero))
    state.update(st)
    if (ttlMs > 0) state.setTimeoutDuration(ttlMs)
    Iterator.single(emit(key, st))
  }

  /** Wire row of the reorder-buffered path. */
  case class TrendEventT(key: Long, tUs: Long, eventId: Long, v: Long,
                         ts: java.sql.Timestamp)

  case class TrendPend(tUs: Long, eventId: Long, v: Long)

  case class TrendOrderedState(t0: Long, n: Long, sx: Long, sy: Long,
                               sxy: Long, sxx: Long, init: Boolean,
                               frontierUs: Long, pending: Array[TrendPend])

  private val pendOrder: Ordering[TrendPend] = Ordering.by(p => (p.tUs, p.eventId))

  private lazy val log = org.slf4j.LoggerFactory.getLogger(getClass)

  private[streaming] def processKeyOrdered(unitUs: Long,
      lateAcc: Option[org.apache.spark.util.LongAccumulator],
      idleTtlMs: Long)(
      key: Long, rows: Iterator[TrendEventT],
      state: GroupState[TrendOrderedState]): Iterator[TrendRow] = {
    val wmMs = state.getCurrentWatermarkMs()
    val wmU  = Reorder.wmUs(wmMs)
    val prev = state.getOption.getOrElse(TrendOrderedState(
      0L, 0L, 0L, 0L, 0L, 0L, init = false, Long.MinValue, Array.empty))
    if (state.hasTimedOut && prev.pending.isEmpty) {
      state.remove()
      return Iterator.empty
    }
    val incoming = rows.map(e => TrendPend(e.tUs, e.eventId, e.v)).toSeq
    val (ready, still, nLate) = Reorder.release(
      prev.pending.toSeq, incoming, prev.frontierUs, wmU, (p: TrendPend) => p.tUs)(pendOrder)
    if (nLate > 0) {
      lateAcc.foreach(_.add(nLate.toLong))
      log.warn(s"trendStreamOrdered key=$key dropped $nLate event(s) behind " +
        s"the watermark frontier (${prev.frontierUs} us) — beyond the configured delay")
    }
    if (!state.hasTimedOut && ready.isEmpty &&
        ready.size + still.size == prev.pending.length) {
      Reorder.rearmOnSkip(state,
        if (prev.pending.isEmpty) None else Some(prev.pending.map(_.tUs).min),
        wmMs, idleTtlMs)
      return Iterator.empty
    }
    val st = runMachine(unitUs,
      ready.map(p => TrendEvent(key, p.tUs, p.eventId, p.v)),
      TrendState(prev.t0, prev.n, prev.sx, prev.sy, prev.sxy, prev.sxx, prev.init))
    val relMax = if (ready.isEmpty) Long.MinValue else ready.map(_.tUs).max
    state.update(TrendOrderedState(st.t0, st.n, st.sx, st.sy, st.sxy, st.sxx,
      st.init, Reorder.advance(prev.frontierUs, wmU, relMax), still.toArray))
    if (still.nonEmpty)
      state.setTimeoutTimestamp(Reorder.nextTimeoutMs(still.map(_.tUs).min, wmMs))
    else if (idleTtlMs > 0)
      state.setTimeoutTimestamp(Reorder.idleTimeoutMs(wmMs, idleTtlMs))
    if (ready.isEmpty) Iterator.empty else Iterator.single(emit(key, st))
  }

  /** [[trendStream]] behind the bounded event-time reorder buffer (see
    * [[Reorder]]): tolerates ANY disorder up to `delayMs` of event time —
    * crucially including a key's true FIRST event arriving after later
    * ones, which would silently corrupt the in-order path's rebase origin.
    * Later-than-delay events drop loudly; emission trails by ~delayMs.
    */
  def trendStreamOrdered(df: DataFrame, unitUs: Long = 60000000L,
                         delayMs: Long,
                         lateAcc: Option[org.apache.spark.util.LongAccumulator] = None,
                         idleTtlMs: Long = 0L): Dataset[TrendRow] = {
    require(unitUs >= 1L, s"unitUs must be >= 1, got $unitUs")
    require(delayMs > 0, s"trendStreamOrdered needs delayMs > 0, got $delayMs")
    import df.sparkSession.implicits._
    implicit val stateEnc: Encoder[TrendOrderedState] =
      Encoders.product[TrendOrderedState]
    df.select(col("key").cast("long").as("key"),
        col("t_us").cast("long").as("tUs"),
        col("event_id").cast("long").as("eventId"),
        col("v").cast("long").as("v"))
      .filter(col("v").isNotNull)
      .withColumn("ts", timestamp_micros(col("tUs")))
      .withWatermark("ts", s"$delayMs milliseconds")
      .as[TrendEventT]
      .groupByKey(_.key)
      .flatMapGroupsWithState(OutputMode.Update, GroupStateTimeout.EventTimeTimeout)(
        processKeyOrdered(unitUs, lateAcc, idleTtlMs))
  }

  /** `df` must expose (key, t_us, event_id, v) with v already quantized to
    * BIGINT; emits the key's refreshed moment sums + slope after every
    * micro-batch that touches it — the latest row per key is the trend.
    */
  def trendStream(df: DataFrame, unitUs: Long = 60000000L,
                  ttlMs: Long = 0L): Dataset[TrendRow] = {
    require(unitUs >= 1L, s"unitUs must be >= 1, got $unitUs")
    import df.sparkSession.implicits._
    implicit val stateEnc: Encoder[TrendState] = Encoders.product[TrendState]
    val timeout =
      if (ttlMs > 0) GroupStateTimeout.ProcessingTimeTimeout
      else GroupStateTimeout.NoTimeout
    df.select(col("key").cast("long").as("key"),
        col("t_us").cast("long").as("tUs"),
        col("event_id").cast("long").as("eventId"),
        col("v").cast("long").as("v"))
      .filter(col("v").isNotNull)
      .as[TrendEvent]
      .groupByKey(_.key)
      .flatMapGroupsWithState(OutputMode.Update, timeout)(
        processKey(unitUs, ttlMs))
  }
}
