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
    * not passed yet; `nLate` = incoming events at or behind the released
    * frontier, which are dropped (the late-event policy above).
    */
  def release[E](pending: Seq[E], incoming: Seq[E], frontierUs: Long,
                 watermarkUs: Long, tsUs: E => Long)
                (implicit ord: Ordering[E]): (Seq[E], Seq[E], Int) = {
    val fresh = incoming.filter(e => tsUs(e) > frontierUs)
    val nLate = incoming.size - fresh.size
    val (ready, still) = (pending ++ fresh).partition(e => tsUs(e) <= watermarkUs)
    (ready.sorted, still, nLate)
  }

  /** Wake-up for the earliest still-pending event, clamped above the
    * current watermark (Spark rejects event-time timeouts at or below
    * it — the same clamp the pattern evaluator uses).
    */
  def nextTimeoutMs(pendingMinUs: Long, wmMs: Long): Long =
    math.max(wmMs + 1L, pendingMinUs / 1000L)

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
