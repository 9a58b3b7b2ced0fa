package graft.streaming

import org.apache.spark.sql.{Column, DataFrame, Dataset}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** Structured-Streaming pattern evaluation.
  *
  * The batch engine expresses patterns as window functions, which streaming
  * frames cannot run; the streaming path instead carries per-key state
  * through `flatMapGroupsWithState` — the Spark-native analogue of the
  * reference's per-key fs2 pipeline with carried pattern state
  * (reference: PatternsSearchJob.scala:89-160, PatternProcessor.scala:23-61).
  *
  * Semantics mirror the batch engine exactly:
  *  - a condition run is a maximal stretch of condition-true events with no
  *    inter-event gap above `eventsMaxGapMs` (gap == state reset);
  *  - `minDurationMs` > 0 is the Timer: success spans
  *    [first event at-or-after runStart + T, run end] (TimerPattern.scala:63-109);
  *  - closed incidents closer than `sessionGapMs` merge (reduceIncidents);
  *  - late events (behind the per-key high-water mark) are dropped, and the
  *    stream's watermark bounds state via event-time timeouts: a pending
  *    incident is flushed once the watermark passes `to + sessionGapMs`.
  *
  * Scale: state per key is O(1) — three longs for the open run, three for
  * the pending incident — so the state store stays tiny regardless of
  * window sizes, unlike buffering approaches.
  */
object StreamingPatterns {

  // the event-time column must survive into the typed projection as a
  // timestamp, or the upstream watermark is lost and event-time timeouts
  // are rejected
  case class KeyedEvent(key: String, ts: java.sql.Timestamp, cond: Boolean) {
    def tsMs: Long = ts.getTime
  }

  case class RunState(
    // open condition run (startMs >= 0 when open)
    startMs: Long, lastCondMs: Long, firstSuccMs: Long, succN: Long,
    // last seen event time on this key (late-event cutoff + gap detection)
    lastSeenMs: Long,
    // closed-but-unflushed incident awaiting the merge window
    pendFromMs: Long, pendToMs: Long, pendN: Long, hasPending: Boolean)

  object RunState {
    val empty: RunState = RunState(-1L, -1L, -1L, 0L, Long.MinValue, 0L, 0L, 0L, hasPending = false)
  }

  case class StreamIncident(key: String, fromMs: Long, toMs: Long, nEvents: Long)

  final case class StreamConfig(
    eventsMaxGapMs: Long = 60000L,
    sessionGapMs: Long = 2000L,
    minDurationMs: Long = 0L)

  /** Evaluate `cond` over a streaming frame keyed by `keys` ordered by
    * `tsCol` (must carry a watermark for state cleanup). Emits incidents in
    * append mode as runs close and merge windows expire.
    */
  def incidents(df: DataFrame, keys: Seq[String], tsCol: String, cond: Column,
                cfg: StreamConfig): Dataset[StreamIncident] = {
    import df.sparkSession.implicits._
    val keyed = df.select(
        concat_ws("|", keys.map(col): _*).as("key"),
        col(tsCol).as("ts"),
        coalesce(cond, lit(false)).as("cond"))
      .as[KeyedEvent]
    keyed
      .groupByKey(_.key)
      .flatMapGroupsWithState(OutputMode.Append, GroupStateTimeout.EventTimeTimeout)(
        process(cfg))
  }

  private def process(cfg: StreamConfig)(
    key: String,
    events: Iterator[KeyedEvent],
    state: GroupState[RunState]
  ): Iterator[StreamIncident] = {
    var s = state.getOption.getOrElse(RunState.empty)
    val out = scala.collection.mutable.ArrayBuffer.empty[StreamIncident]

    def emitOrMerge(fromMs: Long, toMs: Long, n: Long): Unit = {
      if (s.hasPending && fromMs - s.pendToMs <= cfg.sessionGapMs) {
        s = s.copy(pendToMs = math.max(s.pendToMs, toMs), pendN = s.pendN + n)
      } else {
        if (s.hasPending) out += StreamIncident(key, s.pendFromMs, s.pendToMs, s.pendN)
        s = s.copy(pendFromMs = fromMs, pendToMs = toMs, pendN = n, hasPending = true)
      }
    }

    def closeRun(): Unit = {
      if (s.startMs >= 0 && s.firstSuccMs >= 0)
        emitOrMerge(s.firstSuccMs, s.lastCondMs, s.succN)
      s = s.copy(startMs = -1L, lastCondMs = -1L, firstSuccMs = -1L, succN = 0L)
    }

    val wm = state.getCurrentWatermarkMs()

    if (!state.hasTimedOut) {
      // micro-batches are unordered; process in event time, drop late rows
      val sorted = events.toArray.sortBy(_.tsMs).iterator
        .filter(_.tsMs > s.lastSeenMs)
      sorted.foreach { e =>
        if (s.lastSeenMs != Long.MinValue && e.tsMs - s.lastSeenMs > cfg.eventsMaxGapMs)
          closeRun() // data gap: state reset (PatternProcessor.splitByCondition)
        if (e.cond) {
          if (s.startMs < 0) s = s.copy(startMs = e.tsMs)
          s = s.copy(lastCondMs = e.tsMs)
          if (e.tsMs >= s.startMs + cfg.minDurationMs) {
            if (s.firstSuccMs < 0) s = s.copy(firstSuccMs = e.tsMs)
            s = s.copy(succN = s.succN + 1)
          }
        } else closeRun()
        s = s.copy(lastSeenMs = e.tsMs)
      }
    }

    // Watermark-driven expiry runs on BOTH paths: Spark only fires timeouts
    // for keys with no data in the batch, so a key under continuous traffic
    // must flush inline here or its pending incident would never emit.
    // Once wm > lastSeen + maxGap, every admissible future event (ts > wm)
    // closes the run on arrival — so close it now (batch end-of-gap
    // semantics; an open run that never sees another event still emits).
    if (s.startMs >= 0 && wm > s.lastSeenMs + cfg.eventsMaxGapMs) closeRun()
    // once wm > pending.to + sessionGap, nothing can merge anymore
    if (s.hasPending && wm > s.pendToMs + cfg.sessionGapMs) {
      out += StreamIncident(key, s.pendFromMs, s.pendToMs, s.pendN)
      s = s.copy(hasPending = false)
    }

    if (s.startMs < 0 && !s.hasPending && wm > s.lastSeenMs) {
      // nothing open and the watermark subsumes the late-event cutoff:
      // retire the key's state entirely (bounded state under key churn)
      state.remove()
    } else {
      state.update(s)
      val deadline = math.min(
        if (s.hasPending) s.pendToMs + cfg.sessionGapMs + 1 else Long.MaxValue,
        if (s.startMs >= 0) s.lastSeenMs + cfg.eventsMaxGapMs + 1
        else s.lastSeenMs + 1) // lastSeen-only state: retire at next wm pass
      // clamp: Spark rejects a timeout timestamp at or below the watermark
      state.setTimeoutTimestamp(math.max(deadline, wm + 1))
    }
    out.iterator
  }
}
