package graft.streaming

/** Bounded event-time reorder buffer shared by the order-sensitive
  * relational streams ([[StreamingAsof]], [[StreamingInterval]],
  * [[StreamingCusum]] — their `*Ordered` entry points).
  *
  * The plain entry points document an in-order-per-key cross-batch
  * contract (intra-batch disorder is absorbed by a sort, cross-batch
  * regression is silently wrong for a replayed or repartition-merged
  * feed). The ordered variants instead buffer every arriving event in
  * keyed state until the stream's event-time watermark passes it, then
  * release buffered events in full event-time order into the unchanged
  * state machine — the same watermark-driven stance as the pattern
  * evaluator ([[StreamingPatterns]]), specialized to a pure reorder
  * stage. The reference sorts each chunk before evaluation for the same
  * reason (reference: streaming mappers/ProcessorCombinator.scala:16-29);
  * the watermark generalizes that to disorder that crosses chunks.
  *
  * Late-event policy (documented contract of every `*Ordered` variant):
  * an event arriving AFTER the watermark has already passed its timestamp
  * — i.e. later than the configured delay — is DROPPED LOUDLY, never
  * silently mis-processed. The primary channel is Spark's own: the
  * watermark filter in front of the stateful operator removes the row and
  * counts it in `StateOperatorProgress.numRowsDroppedByWatermark`
  * (job-metrics visible; spec-locked). As a residual net, any row that
  * still reaches the machine behind its key's released frontier (the
  * per-key frontier can lag the global watermark on idle keys, so Spark's
  * filter normally subsumes this) is counted on the caller's optional
  * accumulator and warn-logged with its key. This is exactly Spark's
  * watermark contract for windowed aggregation; within the delay, any
  * disorder (across batches included) is absorbed.
  *
  * State cost: the pending buffer holds only events inside the watermark
  * delay, so per-key state is bounded by delay x per-key event rate
  * (plus the operator's own O(1)-to-O(overlap) machine state), never by
  * stream length.
  */
object Reorder {

  /** Spark reports the watermark in ms, 0 until the first batch
    * establishes one; map 0 to MinValue so "no watermark yet" releases
    * nothing instead of releasing epoch-0 events.
    */
  def wmUs(wmMs: Long): Long = if (wmMs <= 0L) Long.MinValue else wmMs * 1000L

  /** Split `pending ++ incoming` into (ready, stillPending, nLate):
    * `ready` = events at or before the watermark, sorted by `ord` (the
    * operator's event-time order — ties resolved exactly as its
    * intra-batch sort does); `stillPending` = events the watermark has
    * not passed yet, ALSO sorted by `ord`; `nLate` = incoming events at
    * or behind the released frontier, which are dropped (the late-event
    * policy above).
    *
    * `ord` MUST order by `tsUs` first (every caller's ordering is
    * (ts, side, id)) — that makes the watermark split a PREFIX of the
    * merged sequence, so the whole release is one O(m log m) sort of the
    * m incoming events plus an O(n + m) merge with the n already-sorted
    * pending events, instead of re-sorting the union per touched key per
    * batch (the measured ~40% ordered-path overhead this replaced). The
    * returned stillPending is what callers persist, so the sorted
    * invariant self-maintains; a buffer restored from a checkpoint
    * written by an older version is detected unsorted in one scan and
    * sorted once.
    */
  def release[E](pending: Seq[E], incoming: Seq[E], frontierUs: Long,
                 watermarkUs: Long, tsUs: E => Long)
                (implicit ord: Ordering[E]): (Seq[E], Seq[E], Int) = {
    val fresh = incoming.filter(e => tsUs(e) > frontierUs)
    val nLate = incoming.size - fresh.size
    val pendSorted = if (isSorted(pending)) pending else pending.sorted
    val merged = mergeSorted(pendSorted, fresh.sorted)
    val cut = {
      val i = merged.indexWhere(e => tsUs(e) > watermarkUs)
      if (i < 0) merged.size else i
    }
    (merged.take(cut), merged.drop(cut), nLate)
  }

  private def isSorted[E](xs: Seq[E])(implicit ord: Ordering[E]): Boolean = {
    val it = xs.iterator
    if (!it.hasNext) return true
    var prev = it.next()
    while (it.hasNext) {
      val cur = it.next()
      if (ord.gt(prev, cur)) return false
      prev = cur
    }
    true
  }

  /** Linear two-pointer merge of two `ord`-sorted sequences; ties take
    * from `a` first (stable — `a` is the older pending buffer, and the
    * per-event ordering is total anyway since ids are distinct).
    */
  def mergeSorted[E](a: Seq[E], b: Seq[E])(implicit ord: Ordering[E]): Seq[E] = {
    if (a.isEmpty) return b
    if (b.isEmpty) return a
    val out = new scala.collection.mutable.ArrayBuffer[E](a.size + b.size)
    val ai = a.iterator.buffered
    val bi = b.iterator.buffered
    while (ai.hasNext && bi.hasNext) {
      if (ord.lteq(ai.head, bi.head)) out += ai.next() else out += bi.next()
    }
    while (ai.hasNext) out += ai.next()
    while (bi.hasNext) out += bi.next()
    out.toSeq
  }

  /** Wake-up for the earliest still-pending event, clamped above the
    * current watermark (Spark rejects event-time timeouts at or below
    * it — the same clamp the pattern evaluator uses).
    */
  def nextTimeoutMs(pendingMinUs: Long, wmMs: Long): Long =
    math.max(wmMs + 1L, pendingMinUs / 1000L)

  /** Idle-reclaim wake-up: `idleTtlMs` of EVENT time past the current
    * watermark. Set only when the pending buffer is empty; a timed-out
    * invocation that still finds nothing pending removes the key's state
    * (the ordered analog of the in-order paths' ttlMs). Every data batch
    * re-arms one of the two timers, so the idle timer slides with traffic.
    */
  def idleTimeoutMs(wmMs: Long, idleTtlMs: Long): Long =
    math.max(wmMs, 0L) + math.max(idleTtlMs, 1L)

  /** Re-arm the wake-up timer on a skip-write invocation. Spark CLEARS a
    * stored timeout on every function call that does not set one (the
    * GroupState contract: "the timeout is reset every time the function
    * is called"), so the no-op fast path — nothing released, nothing
    * admitted, state untouched — must still re-register the
    * pending-release (or idle-reclaim) timer: without this, one batch of
    * only frontier-late stragglers would cancel the armed wake-up and,
    * if the key then goes quiet, orphan its buffered events and leak its
    * state forever. No-op when the key has no stored state (nothing to
    * orphan, and setting a timeout without state is not allowed).
    */
  def rearmOnSkip[S](state: org.apache.spark.sql.streaming.GroupState[S],
                     pendingMinUs: Option[Long], wmMs: Long,
                     idleTtlMs: Long): Unit =
    if (state.exists) pendingMinUs match {
      case Some(minUs) => state.setTimeoutTimestamp(nextTimeoutMs(minUs, wmMs))
      case None if idleTtlMs > 0 =>
        state.setTimeoutTimestamp(idleTimeoutMs(wmMs, idleTtlMs))
      case None => ()
    }

  /** The released frontier after a batch: `wm - 1`, bumped to the max ts
    * actually RELEASED this batch. In the steady state Spark's late
    * filter is observed to drop arrivals at `ts <= wm` (equality
    * included), so any row reaching the machine already sits strictly
    * above both candidates and the exact edge is moot; the deliberate
    * choices matter at the seams: after a RESTART the conservative
    * `wm - 1` never brands an on-time replayed row late, and the
    * released-max bump guarantees an equal-ts straggler can never slip
    * in behind an already-released tie (the one ordering hazard a
    * boundary admit could create).
    */
  def advance(frontierUs: Long, watermarkUs: Long, releasedMaxUs: Long): Long = {
    val wmEdge =
      if (watermarkUs == Long.MinValue) Long.MinValue else watermarkUs - 1L
    math.max(frontierUs, math.max(wmEdge, releasedMaxUs))
  }
}
