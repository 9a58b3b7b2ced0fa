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
  *    key's feed in event-time order and stream == batch.
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

  private def processKey(ttlMs: Long)(
      key: Long, rows: Iterator[IvEvent],
      state: GroupState[IvState]): Iterator[IvMatch] = {
    if (state.hasTimedOut) {
      state.remove()
      return Iterator.empty
    }
    val prev = state.getOption.getOrElse(IvState(Long.MinValue, Array.empty))
    var frontier = prev.frontierUs
    val open = scala.collection.mutable.ArrayBuffer.from(prev.windows)
    val out = Seq.newBuilder[IvMatch]
    rows.toSeq.sortBy(e => (e.tUs, e.side, e.eventId)).foreach { e =>
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
    val stillOpen = open.filter(_.endUs > frontier).toArray
    if (stillOpen.nonEmpty || frontier != Long.MinValue)
      state.update(IvState(frontier, stillOpen))
    if (ttlMs > 0) state.setTimeoutDuration(ttlMs)
    out.result().iterator
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
