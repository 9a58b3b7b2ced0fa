package graft.streaming

import graft.dsl.StreamingEval
import org.apache.spark.sql.{Column, DataFrame, Dataset, Encoder, Encoders}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

import scala.collection.mutable.ArrayBuffer

/** Structured-Streaming pattern evaluation.
  *
  * The batch engine expresses patterns as window functions, which streaming
  * frames cannot run; the streaming path instead carries per-key state
  * through `flatMapGroupsWithState` — the Spark-native analogue of the
  * reference's per-key fs2 pipeline with carried pattern state
  * (reference: PatternsSearchJob.scala:89-160, PatternProcessor.scala:23-61).
  *
  * Two condition paths share one run/session machine:
  *  - [[incidents]]: a window-free Column condition (plus optional timer);
  *  - [[incidentsEval]]: a compiled [[graft.dsl.StreamingEval.Program]] for
  *    patterns with trailing aggregates / truth statistics — each windowed
  *    node keeps a bounded deque in the group state.
  *
  * Semantics mirror the batch engine exactly:
  *  - a condition run is a maximal stretch of condition-true events with no
  *    inter-event gap above `eventsMaxGapMs` (gap == state reset);
  *  - `minDurationMs` > 0 is the Timer: success spans
  *    [first event at-or-after runStart + T, run end] (TimerPattern.scala:63-109);
  *  - closed incidents closer than `sessionGapMs` merge (reduceIncidents);
  *  - late events (behind the per-key high-water mark) are dropped, and the
  *    stream's watermark bounds state via event-time timeouts: a pending
  *    incident is flushed once the watermark passes `to + sessionGapMs`,
  *    an open run emits once the watermark proves no event can extend it,
  *    and fully-idle keys retire their state.
  *
  * Scale: run/session state per key is O(1); evaluator deques are bounded
  * by each operator's window.
  */
object StreamingPatterns {

  private lazy val log = org.slf4j.LoggerFactory.getLogger(getClass)
  private def logWarning(msg: => String): Unit = log.warn(msg)

  // the event-time column must survive into the typed projection as a
  // timestamp, or the upstream watermark is lost and event-time timeouts
  // are rejected
  case class KeyedEvent(key: String, ts: java.sql.Timestamp, cond: Boolean) {
    def tsMs: Long = ts.getTime
  }

  /** Raw event for the evaluator path: referenced fields in Program order
    * (numerics NaN-coalesced, so missing data follows the reference's
    * NaN-decode convention).
    */
  case class KeyedRaw(key: String, ts: java.sql.Timestamp,
                      nums: Seq[Double], strs: Seq[String]) {
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

  /** Evaluator-path state: the run machine plus one bounded (ms, value)
    * deque per windowed operator.
    */
  case class EvalState(run: RunState, ops: Seq[Seq[graft.dsl.StreamingEval.Ent]])

  case class StreamIncident(key: String, fromMs: Long, toMs: Long, nEvents: Long)

  final case class StreamConfig(
    eventsMaxGapMs: Long = 60000L,
    sessionGapMs: Long = 2000L,
    minDurationMs: Long = 0L,
    // forward-looking patterns (andThen / wait) buffer events until the
    // decision frontier passes them; a degenerate pattern whose frontier
    // never advances (e.g. `A andThen B` with A always true and B never
    // true) would otherwise grow state linearly in events until a data gap
    // or watermark-idle finalize. Above this cap the part is force-
    // finalized (logged) — equivalent to an artificial data gap, so prefix
    // incidents are still exact; only a success spanning the cut is lost.
    maxUndecidedEvents: Int = 1 << 20,
    // incremented once per force-finalize when set, so an operator can see
    // FROM JOB METRICS that a degenerate pattern is truncating incidents
    // (rather than grepping executor logs for the warning). Accumulators
    // are Spark's executor→driver metric channel and are async-read-safe.
    forceFinalizeAcc: Option[org.apache.spark.util.LongAccumulator] = None)

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

  /** Evaluate a compiled windowed-pattern [[StreamingEval.Program]] over a
    * streaming frame — trailing aggregates, lag, and `for W <range>` truth
    * statistics, per key, with operator state bounded by the windows.
    */
  def incidentsEval(df: DataFrame, keys: Seq[String], tsCol: String,
                    program: StreamingEval.Program,
                    cfg: StreamConfig): Dataset[StreamIncident] = {
    import df.sparkSession.implicits._
    val inSchema = df.schema.fieldNames.toSet
    val numCols =
      if (program.numFields.isEmpty) array().cast("array<double>")
      else array(program.numFields.map { f =>
        if (inSchema(f)) coalesce(col(f).cast("double"), lit(Double.NaN))
        else lit(Double.NaN)
      }: _*)
    val strCols =
      if (program.strFields.isEmpty) array().cast("array<string>")
      else array(program.strFields.map(col): _*)
    val keyed = df.select(
        concat_ws("|", keys.map(col): _*).as("key"),
        col(tsCol).as("ts"),
        numCols.as("nums"),
        strCols.as("strs"))
      .as[KeyedRaw]
    implicit val stateEnc: Encoder[EvalState] = Encoders.product[EvalState]
    keyed
      .groupByKey(_.key)
      .flatMapGroupsWithState(OutputMode.Append, GroupStateTimeout.EventTimeTimeout)(
        processEval(program, cfg))
  }

  /** One side's RLE run queue for the streaming andThen merge: closed runs
    * plus the open tail (extends until its condition flips), with the
    * rewind floor / unwind bound to apply when the tail closes.
    */
  case class ABQueue(runs: Seq[(Long, Long, Boolean)],
                     openS: Long, openV: Boolean, hasOpen: Boolean,
                     floorCut: Long, unwindAt: Long)
  object ABQueue {
    val empty: ABQueue = ABQueue(Vector.empty, 0L, openV = false,
      hasOpen = false, 0L, 0L)
  }

  /** One cascade level of the streaming andThen chain: the left run queue,
    * the right-operand run queue, the level's emitted success intervals,
    * and (levels >= 1) the exclusive idx up to which decided events from the
    * level below have been pushed into `qL`.
    */
  case class ChainLevel(qL: ABQueue, qR: ABQueue,
                        emitted: Seq[(Long, Long)], pushedUpTo: Long)

  /** chain-path state: run machine + per-operand evaluator deques, the
    * cascade levels, and the undecided event buffer.
    */
  case class ChainState(run: RunState,
                        ops: Seq[Seq[Seq[graft.dsl.StreamingEval.Ent]]],
                        nextIdx: Long, rawLastMs: Long,
                        levels: Seq[ChainLevel],
                        buf: Seq[(Long, Long)])

  /** `A andThen B` — the two-operand case of [[incidentsChain]]. */
  def incidentsAndThen(df: DataFrame, keys: Seq[String], tsCol: String,
                       progA: StreamingEval.Program, progB: StreamingEval.Program,
                       cfg: StreamConfig): Dataset[StreamIncident] =
    incidentsChain(df, keys, tsCol, Seq(progA, progB), cfg)

  /** A left-associated `A1 andThen A2 andThen ... andThen An` over a
    * streaming frame: every operand's condition evaluates incrementally
    * (windowed ops included), and the exact batch queue-merge runs as a
    * CASCADE — level 1 merges A1's and A2's closed runs; level i's left
    * side is the decided output of level i-1 (run-length-compressed as its
    * frontier advances), its right side operand A(i+1)'s runs. This is the
    * same recursion the batch compiler uses for nested AndThen, evaluated
    * online: each level's open tail keeps the reference's `first.size`
    * check >= 2 mid-part, so prefix decisions equal the eventual whole-part
    * merge, and events flush to the run/session machine in order as the
    * LAST level's frontier passes them.
    *
    * Undecided events buffer until the final frontier passes them — under
    * alternating conditions that is roughly one flip's worth per side, but
    * a side whose condition never flips holds the frontier still, so the
    * buffer is additionally bounded by `cfg.maxUndecidedEvents`
    * (force-finalize with a log). A data gap or the watermark passing
    * `lastSeen + eventsMaxGap` finalizes the part exactly like the batch
    * per-(key, gap-run) evaluation.
    */
  def incidentsChain(df: DataFrame, keys: Seq[String], tsCol: String,
                     progs: Seq[StreamingEval.Program],
                     cfg: StreamConfig): Dataset[StreamIncident] = {
    import df.sparkSession.implicits._
    require(progs.size >= 2, "a chain needs at least two operands")
    require(progs.forall(p => p.numFields == progs.head.numFields &&
      p.strFields == progs.head.strFields),
      "operand programs must share field layout")
    val inSchema = df.schema.fieldNames.toSet
    val head = progs.head
    val numCols =
      if (head.numFields.isEmpty) array().cast("array<double>")
      else array(head.numFields.map { f =>
        if (inSchema(f)) coalesce(col(f).cast("double"), lit(Double.NaN))
        else lit(Double.NaN)
      }: _*)
    val strCols =
      if (head.strFields.isEmpty) array().cast("array<string>")
      else array(head.strFields.map(col): _*)
    val keyed = df.select(
        concat_ws("|", keys.map(col): _*).as("key"),
        col(tsCol).as("ts"),
        numCols.as("nums"),
        strCols.as("strs"))
      .as[KeyedRaw]
    implicit val stateEnc: Encoder[ChainState] = Encoders.product[ChainState]
    keyed
      .groupByKey(_.key)
      .flatMapGroupsWithState(OutputMode.Append, GroupStateTimeout.EventTimeTimeout)(
        processChain(progs, cfg))
  }

  // ---------------------------------------------------------------- tree

  /** A streaming pattern tree: arbitrary nesting of `andThen` and `wait`
    * over backward-looking leaf conditions — the general form of the
    * reference's recursive pattern compilation
    * (ASTPatternGenerator.scala:47-200), of which [[incidentsChain]] is the
    * left-spine special case.
    */
  sealed trait StreamTree extends Serializable
  final case class SLeaf(prog: StreamingEval.Program) extends StreamTree
  final case class SAndThen(l: StreamTree, r: StreamTree) extends StreamTree
  final case class SWait(windowMs: Long, inner: StreamTree) extends StreamTree

  /** Per-node runtime state snapshot (one uniform shape for all node
    * kinds; unused fields stay empty).
    */
  case class TreeNodeState(
    emitted: Seq[(Long, Long)], frontier: Long,
    pushedA: Long, pushedB: Long,
    qL: ABQueue, qR: ABQueue,
    wq: Seq[(Long, Long)], lastFail: Boolean,
    lastTimeIdx: Long, lastTimeMs: Long,
    openV: Boolean, hasOpen: Boolean, openTimes: Seq[(Long, Long)],
    leafOps: Seq[Seq[graft.dsl.StreamingEval.Ent]])

  case class TreeState(run: RunState, nextIdx: Long, rawLastMs: Long,
                       nodes: Seq[TreeNodeState], buf: Seq[(Long, Long)])

  /** Evaluate an arbitrarily nested `andThen`/`wait` tree over a streaming
    * frame. Every node consumes its children's DECIDED truth stream and
    * exposes its own decided-true intervals plus a frontier (the exclusive
    * idx below which its output is final): leaves decide on arrival;
    * `andThen` nodes run the incremental batch queue-merge over closed
    * runs of both children; `wait` nodes drive the exact WaitAccumState
    * machine over closing inner runs. Frontiers propagate bottom-up each
    * micro-batch — a parent only consumes below its children's frontiers,
    * so every decision equals the eventual whole-part batch evaluation —
    * and the root's decided stream feeds the shared run/session machine.
    * Buffering, gap resets, the undecided-event cap, and watermark
    * finalization all match [[incidentsChain]].
    */
  def incidentsTree(df: DataFrame, keys: Seq[String], tsCol: String,
                    tree: StreamTree, cfg: StreamConfig): Dataset[StreamIncident] = {
    import df.sparkSession.implicits._
    def leaves(t: StreamTree): Seq[StreamingEval.Program] = t match {
      case SLeaf(p)       => Seq(p)
      case SAndThen(l, r) => leaves(l) ++ leaves(r)
      case SWait(_, i)    => leaves(i)
    }
    val ls = leaves(tree)
    require(ls.nonEmpty, "a pattern tree needs at least one leaf")
    require(ls.forall(p => p.numFields == ls.head.numFields &&
      p.strFields == ls.head.strFields),
      "leaf programs must share field layout")
    val inSchema = df.schema.fieldNames.toSet
    val head = ls.head
    val numCols =
      if (head.numFields.isEmpty) array().cast("array<double>")
      else array(head.numFields.map { f =>
        if (inSchema(f)) coalesce(col(f).cast("double"), lit(Double.NaN))
        else lit(Double.NaN)
      }: _*)
    val strCols =
      if (head.strFields.isEmpty) array().cast("array<string>")
      else array(head.strFields.map(col): _*)
    val keyed = df.select(
        concat_ws("|", keys.map(col): _*).as("key"),
        col(tsCol).as("ts"),
        numCols.as("nums"),
        strCols.as("strs"))
      .as[KeyedRaw]
    implicit val stateEnc: Encoder[TreeState] = Encoders.product[TreeState]
    keyed
      .groupByKey(_.key)
      .flatMapGroupsWithState(OutputMode.Append, GroupStateTimeout.EventTimeTimeout)(
        processTree(tree, cfg))
  }

  /** Close a queue's open tail (applying its deferred rewind/unwind ops). */
  private def closeOpenQ(q: ABQueue, endIdx: Long): ABQueue =
    if (!q.hasOpen) q
    else {
      val keep = endIdx >= q.floorCut && endIdx > q.unwindAt
      val runs =
        if (keep) q.runs :+ ((math.max(q.openS, q.floorCut), endIdx, q.openV))
        else q.runs
      q.copy(runs = runs, hasOpen = false)
    }

  private def pushCondQ(q: ABQueue, v: Boolean, idx: Long): ABQueue =
    if (q.hasOpen && q.openV == v) q
    else closeOpenQ(q, idx - 1).copy(openS = idx, openV = v, hasOpen = true)

  /** Earliest still-undecided idx of a queue; `bound` when fully decided. */
  private def frontQ(q: ABQueue, bound: Long): Long =
    q.runs.headOption.map(_._1).getOrElse(
      if (q.hasOpen) math.max(q.openS, q.floorCut) else bound)

  private[streaming] def processTree(tree: StreamTree, cfg: StreamConfig)(
    key: String,
    events: Iterator[KeyedRaw],
    state: GroupState[TreeState]
  ): Iterator[StreamIncident] = {
    import graft.dsl.PatternCompiler

    // preorder flatten: parent index < child indices, so a reverse-index
    // sweep processes children before parents (postorder)
    val flat = ArrayBuffer.empty[StreamTree]
    val childA = ArrayBuffer.empty[Int]
    val childB = ArrayBuffer.empty[Int]
    def flattenTree(t: StreamTree): Int = {
      val id = flat.length
      flat += t; childA += -1; childB += -1
      t match {
        case SLeaf(_)       => ()
        case SAndThen(l, r) => childA(id) = flattenTree(l); childB(id) = flattenTree(r)
        case SWait(_, i)    => childA(id) = flattenTree(i)
      }
      id
    }
    flattenTree(tree)
    val n = flat.length
    val leafIds = flat.indices.filter(flat(_).isInstanceOf[SLeaf])

    val st0 = state.getOption.getOrElse(TreeState(RunState.empty,
      nextIdx = 1L, rawLastMs = Long.MinValue,
      flat.map {
        case SLeaf(p) => TreeNodeState(Vector.empty, 1L, 1L, 1L,
          ABQueue.empty, ABQueue.empty, Vector.empty, lastFail = false, 0L, 0L,
          openV = false, hasOpen = false, Vector.empty,
          Vector.fill(p.ops.size)(Vector.empty))
        case _ => TreeNodeState(Vector.empty, 1L, 1L, 1L,
          ABQueue.empty, ABQueue.empty, Vector.empty, lastFail = false, 0L, 0L,
          openV = false, hasOpen = false, Vector.empty, Vector.empty)
      }.toSeq,
      Vector.empty))

    val emitted = Array.from(st0.nodes.map(s => Vector.from(s.emitted)))
    val frontier = Array.from(st0.nodes.map(_.frontier))
    val pushedA = Array.from(st0.nodes.map(_.pushedA))
    val pushedB = Array.from(st0.nodes.map(_.pushedB))
    val qL = Array.from(st0.nodes.map(_.qL))
    val qR = Array.from(st0.nodes.map(_.qR))
    val wst = Array.from(st0.nodes.map(s =>
      PatternCompiler.WaitSt(Vector.from(s.wq), s.lastFail,
        (s.lastTimeIdx, s.lastTimeMs))))
    val openV = Array.from(st0.nodes.map(_.openV))
    val hasOpen = Array.from(st0.nodes.map(_.hasOpen))
    val openTimes = Array.from(st0.nodes.map(s => Vector.from(s.openTimes)))
    val leafDeques: Map[Int, Array[ArrayBuffer[graft.dsl.StreamingEval.Ent]]] =
      leafIds.map(li => li ->
        st0.nodes(li).leafOps.map(v => ArrayBuffer.from(v)).toArray).toMap

    val out = ArrayBuffer.empty[StreamIncident]
    val m = new RunMachine(cfg, key, st0.run, out, retainMs = cfg.eventsMaxGapMs)
    var nextIdx = st0.nextIdx
    var rawLastMs = st0.rawLastMs
    var buf = Vector.from(st0.buf)

    def contains(iv: Vector[(Long, Long)], idx: Long): Boolean =
      iv.exists(p => idx >= p._1 && idx <= p._2)

    def msOf(idx: Long): Long = {
      // buf is sorted by idx and holds every event at or above the root
      // frontier; every pulled idx is above it (frontiers are monotone down
      // the tree: F(root) <= F(descendant) <= any pull bound)
      var lo = 0
      var hi = buf.length - 1
      while (lo <= hi) {
        val mid = (lo + hi) >>> 1
        val v = buf(mid)._1
        if (v == idx) return buf(mid)._2
        else if (v < idx) lo = mid + 1
        else hi = mid - 1
      }
      throw new IllegalStateException(s"idx $idx not buffered (key '$key')")
    }

    def stepRun(i: Int, w: Long): Unit =
      if (hasOpen(i) && openTimes(i).nonEmpty) {
        val (w2, em) = PatternCompiler.waitStep(wst(i), w, openV(i), openTimes(i))
        wst(i) = w2
        em.foreach { case (s, e, v) => if (v) emitted(i) = emitted(i) :+ ((s, e)) }
        openTimes(i) = Vector.empty
      }

    /** One bottom-up pass: pull children's decided streams, advance each
      * node's machine and frontier, flush the root's decided events into
      * the run/session machine.
      */
    def pump(finalize: Boolean): Unit = {
      var i = n - 1
      while (i >= 0) {
        flat(i) match {
          case SLeaf(_) =>
            if (finalize) frontier(i) = nextIdx

          case SAndThen(_, _) =>
            val a = childA(i)
            val b = childB(i)
            val limA = if (finalize) nextIdx else frontier(a)
            val limB = if (finalize) nextIdx else frontier(b)
            var ql = qL(i)
            var qr = qR(i)
            var ia = pushedA(i)
            while (ia < limA) { ql = pushCondQ(ql, contains(emitted(a), ia), ia); ia += 1 }
            var ib = pushedB(i)
            while (ib < limB) { qr = pushCondQ(qr, contains(emitted(b), ib), ib); ib += 1 }
            pushedA(i) = math.max(pushedA(i), limA)
            pushedB(i) = math.max(pushedB(i), limB)
            emitted(a) = emitted(a).filter(_._2 >= pushedA(i))
            emitted(b) = emitted(b).filter(_._2 >= pushedB(i))
            val (ca, cb) =
              if (finalize) (closeOpenQ(ql, nextIdx - 1), closeOpenQ(qr, nextIdx - 1))
              else (ql, qr)
            val r = PatternCompiler.andThenMergeInc(
              ca.runs.toList, cb.runs.toList, ca.hasOpen, cb.hasOpen)
            emitted(i) = emitted(i) ++ r.emitted
            val ql2 = ca.copy(runs = r.remA.toVector,
              floorCut = math.max(ca.floorCut, r.aFloor))
            val qr2 = cb.copy(runs = r.remB.toVector,
              floorCut = math.max(cb.floorCut, r.bFloor),
              unwindAt = math.max(cb.unwindAt, r.bUnwind))
            qL(i) = ql2
            qR(i) = qr2
            frontier(i) =
              if (finalize) nextIdx
              else math.min(frontQ(ql2, pushedA(i)), frontQ(qr2, pushedB(i)))

          case SWait(w, _) =>
            val a = childA(i)
            val limA = if (finalize) nextIdx else frontier(a)
            var ia = pushedA(i)
            while (ia < limA) {
              val v = contains(emitted(a), ia)
              if (hasOpen(i) && openV(i) != v) stepRun(i, w)
              if (!hasOpen(i) || openV(i) != v) { hasOpen(i) = true; openV(i) = v }
              openTimes(i) = openTimes(i) :+ ((ia, msOf(ia)))
              ia += 1
            }
            pushedA(i) = math.max(pushedA(i), limA)
            emitted(a) = emitted(a).filter(_._2 >= pushedA(i))
            if (finalize) { stepRun(i, w); hasOpen(i) = false }
            frontier(i) =
              if (finalize) nextIdx
              else {
                val cands = wst(i).windowQueue.headOption.map(_._1).toSeq ++
                  (if (wst(i).lastTime._2 != 0L) Seq(wst(i).lastTime._1) else Nil) ++
                  openTimes(i).headOption.map(_._1)
                if (cands.isEmpty) pushedA(i) else cands.min
              }
        }
        i -= 1
      }
      val rootF = if (finalize) nextIdx else frontier(0)
      val (decided, rest) = buf.span(_._1 < rootF)
      decided.foreach { case (idx, ms) => m.feed(ms, contains(emitted(0), idx)) }
      buf = rest
      emitted(0) = emitted(0).filter(_._2 >= rootF)
      if (finalize) {
        for (j <- 0 until n) {
          emitted(j) = Vector.empty
          frontier(j) = nextIdx
          pushedA(j) = nextIdx
          pushedB(j) = nextIdx
          qL(j) = ABQueue.empty
          qR(j) = ABQueue.empty
          wst(j) = PatternCompiler.WaitSt.empty
          openV(j) = false
          hasOpen(j) = false
          openTimes(j) = Vector.empty
        }
        leafDeques.values.foreach(_.foreach(_.clear()))
      }
    }

    val wm = state.getCurrentWatermarkMs()

    if (!state.hasTimedOut) {
      events.toArray.sortBy(_.tsMs).iterator
        .filter(_.tsMs > rawLastMs)
        .foreach { e =>
          if (rawLastMs != Long.MinValue && e.tsMs - rawLastMs > cfg.eventsMaxGapMs)
            pump(finalize = true) // part ends at the data gap
          val idx = nextIdx
          nextIdx += 1
          buf = buf :+ ((idx, e.tsMs))
          leafIds.foreach { li =>
            val SLeaf(p) = flat(li): @unchecked
            val v = p.eval(leafDeques(li), e.tsMs, e.nums.toArray, e.strs.toArray)
            if (v) emitted(li) =
              if (emitted(li).nonEmpty && emitted(li).last._2 == idx - 1)
                emitted(li).init :+ ((emitted(li).last._1, idx))
              else emitted(li) :+ ((idx, idx))
            frontier(li) = nextIdx
          }
          rawLastMs = e.tsMs
          if (buf.length > cfg.maxUndecidedEvents) {
            logWarning(s"pattern-tree state for key '$key' exceeded " +
              s"${cfg.maxUndecidedEvents} undecided events (frontier " +
              "stalled); force-finalizing the part")
            cfg.forceFinalizeAcc.foreach(_.add(1L))
            pump(finalize = true)
          }
        }
      pump(finalize = false)
    }
    if (rawLastMs != Long.MinValue && wm > rawLastMs + cfg.eventsMaxGapMs &&
      buf.nonEmpty) pump(finalize = true)

    val effWm = if (buf.nonEmpty) math.min(wm, buf.head._2 - 1) else wm
    m.expire(effWm)

    if (m.retired(wm) && buf.isEmpty) state.remove()
    else {
      state.update(TreeState(m.s, nextIdx, rawLastMs,
        (0 until n).map { j =>
          TreeNodeState(emitted(j), frontier(j), pushedA(j), pushedB(j),
            qL(j), qR(j),
            wst(j).windowQueue, wst(j).lastFail,
            wst(j).lastTime._1, wst(j).lastTime._2,
            openV(j), hasOpen(j), openTimes(j),
            leafDeques.get(j).map(_.map(_.toVector).toSeq).getOrElse(Vector.empty))
        },
        buf))
      val d = m.deadline(wm)
      val dBuf =
        if (buf.nonEmpty) math.max(rawLastMs + cfg.eventsMaxGapMs + 1, wm + 1)
        else Long.MaxValue
      state.setTimeoutTimestamp(math.min(d, dBuf))
    }
    out.iterator
  }

  private[streaming] def processChain(progs: Seq[StreamingEval.Program], cfg: StreamConfig)(
    key: String,
    events: Iterator[KeyedRaw],
    state: GroupState[ChainState]
  ): Iterator[StreamIncident] = {
    import graft.dsl.PatternCompiler
    val nLevels = progs.size - 1
    val st0 = state.getOption.getOrElse(ChainState(RunState.empty,
      progs.map(p => Vector.fill(p.ops.size)(Vector.empty)),
      nextIdx = 1L, rawLastMs = Long.MinValue,
      Vector.fill(nLevels)(ChainLevel(ABQueue.empty, ABQueue.empty,
        Vector.empty, 1L)),
      Vector.empty))
    val deques = st0.ops.map(_.map(v => ArrayBuffer.from(v)).toArray).toArray
    val out = ArrayBuffer.empty[StreamIncident]
    val m = new RunMachine(cfg, key, st0.run, out, retainMs = cfg.eventsMaxGapMs)

    var nextIdx = st0.nextIdx
    var rawLastMs = st0.rawLastMs
    val levels = Array.from(st0.levels)
    var buf = Vector.from(st0.buf)

    // close a queue's open tail (applying its deferred rewind/unwind ops)
    def closeOpen(q: ABQueue, endIdx: Long): ABQueue =
      if (!q.hasOpen) q
      else {
        val keep = endIdx >= q.floorCut && endIdx > q.unwindAt
        val runs =
          if (keep) q.runs :+ ((math.max(q.openS, q.floorCut), endIdx, q.openV))
          else q.runs
        q.copy(runs = runs, hasOpen = false)
      }

    def pushCond(q: ABQueue, v: Boolean, idx: Long): ABQueue =
      if (q.hasOpen && q.openV == v) q
      else {
        val closed = closeOpen(q, idx - 1)
        closed.copy(openS = idx, openV = v, hasOpen = true)
      }

    def front(q: ABQueue): Long =
      q.runs.headOption.map(_._1).getOrElse(
        if (q.hasOpen) math.max(q.openS, q.floorCut) else nextIdx)

    /** One bottom-up pass over the cascade. Per level: feed newly decided
      * events from the level below into the left queue, run the incremental
      * merge on closed runs, compute the level frontier; the last level's
      * frontier flushes the event buffer into the run/session machine.
      */
    def mergeRound(finalize: Boolean): Unit = {
      // frontier and emitted snapshot of the level below (level "0" is the
      // raw event stream: every arrived event is a decided left input of
      // level 1, pushed directly in the event loop)
      var fLower = nextIdx
      var lowerEmitted: Vector[(Long, Long)] = Vector.empty
      for (i <- 0 until nLevels) {
        var lv = levels(i)
        if (i > 0) {
          // decided events of level i-1 become this level's left runs
          var idx = lv.pushedUpTo
          var qL = lv.qL
          while (idx < fLower) {
            val v = lowerEmitted.exists(iv => idx >= iv._1 && idx <= iv._2)
            qL = pushCond(qL, v, idx)
            idx += 1
          }
          lv = lv.copy(qL = qL, pushedUpTo = fLower)
        }
        val (ca, cb) =
          if (finalize) (closeOpen(lv.qL, nextIdx - 1), closeOpen(lv.qR, nextIdx - 1))
          else (lv.qL, lv.qR)
        val r = PatternCompiler.andThenMergeInc(
          ca.runs.toList, cb.runs.toList, ca.hasOpen, cb.hasOpen)
        val emitted = Vector.from(lv.emitted) ++ r.emitted
        val qL2 = ca.copy(runs = r.remA.toVector,
          floorCut = math.max(ca.floorCut, r.aFloor))
        val qR2 = cb.copy(runs = r.remB.toVector,
          floorCut = math.max(cb.floorCut, r.bFloor),
          unwindAt = math.max(cb.unwindAt, r.bUnwind))
        // decision frontier: everything below the earliest still-undecided
        // run start on either side is final. An upper level whose left
        // queue is empty is bounded by what the lower level has decided.
        val frontL =
          if (i == 0 || qL2.runs.nonEmpty || qL2.hasOpen) front(qL2)
          else lv.pushedUpTo
        val frontier =
          if (finalize) nextIdx else math.min(frontL, front(qR2))
        if (i == nLevels - 1) {
          val (decided, rest) = buf.span(_._1 < frontier)
          decided.foreach { case (idx, ms) =>
            m.feed(ms, emitted.exists(iv => idx >= iv._1 && idx <= iv._2))
          }
          buf = rest
        }
        // the next level's push loop reads this snapshot, so pruning the
        // stored copy below the frontier is safe
        fLower = frontier
        lowerEmitted = emitted
        levels(i) = lv.copy(qL = qL2, qR = qR2,
          emitted = emitted.filter(_._2 >= frontier))
      }
      if (finalize) {
        for (i <- 0 until nLevels)
          levels(i) = ChainLevel(ABQueue.empty, ABQueue.empty,
            Vector.empty, nextIdx)
        deques.foreach(_.foreach(_.clear()))
      }
    }

    val wm = state.getCurrentWatermarkMs()

    if (!state.hasTimedOut) {
      events.toArray.sortBy(_.tsMs).iterator
        .filter(_.tsMs > rawLastMs)
        .foreach { e =>
          if (rawLastMs != Long.MinValue && e.tsMs - rawLastMs > cfg.eventsMaxGapMs)
            mergeRound(finalize = true) // part ends at the data gap
          val idx = nextIdx
          nextIdx += 1
          val conds = progs.indices.map(j =>
            progs(j).eval(deques(j), e.tsMs, e.nums.toArray, e.strs.toArray))
          levels(0) = levels(0).copy(qL = pushCond(levels(0).qL, conds(0), idx))
          for (j <- 1 until progs.size)
            levels(j - 1) = levels(j - 1).copy(
              qR = pushCond(levels(j - 1).qR, conds(j), idx))
          buf = buf :+ ((idx, e.tsMs))
          rawLastMs = e.tsMs
          // cap checked per event, not per trigger: one huge micro-batch
          // with a stalled frontier must not grow the buffer past the cap
          // before the force-finalize fires
          if (buf.length > cfg.maxUndecidedEvents) {
            logWarning(s"andThen state for key '$key' exceeded " +
              s"${cfg.maxUndecidedEvents} undecided events (frontier " +
              "stalled); force-finalizing the part")
            cfg.forceFinalizeAcc.foreach(_.add(1L))
            mergeRound(finalize = true)
          }
        }
      mergeRound(finalize = false)
    }
    // the watermark proving no event can extend the part finalizes it,
    // mirroring batch end-of-data semantics for quiet keys
    if (rawLastMs != Long.MinValue && wm > rawLastMs + cfg.eventsMaxGapMs &&
      buf.nonEmpty) mergeRound(finalize = true)

    // never expire past an undecided event: its incident contribution is
    // still unknown
    val effWm = if (buf.nonEmpty) math.min(wm, buf.head._2 - 1) else wm
    m.expire(effWm)

    if (m.retired(wm) && buf.isEmpty) state.remove()
    else {
      state.update(ChainState(m.s,
        deques.map(_.map(_.toVector).toSeq).toSeq,
        nextIdx, rawLastMs, levels.toSeq, buf))
      val d = m.deadline(wm)
      val dBuf =
        if (buf.nonEmpty) math.max(rawLastMs + cfg.eventsMaxGapMs + 1, wm + 1)
        else Long.MaxValue
      state.setTimeoutTimestamp(math.min(d, dBuf))
    }
    out.iterator
  }

  /** wait-path state: run machine + inner-condition evaluator deques, the
    * wait machine (windowQueue/lastFail/lastTime), the open inner run's
    * (idx, ms) times, undecided events, and decided-true idx intervals.
    */
  case class WaitState(run: RunState,
                       ops: Seq[Seq[graft.dsl.StreamingEval.Ent]],
                       nextIdx: Long, rawLastMs: Long,
                       wq: Seq[(Long, Long)], lastFail: Boolean,
                       lastTimeIdx: Long, lastTimeMs: Long,
                       openV: Boolean, hasOpen: Boolean,
                       openTimes: Seq[(Long, Long)],
                       buf: Seq[(Long, Long)], emitted: Seq[(Long, Long)])

  /** `wait(T, X)` over a streaming frame: the exact WaitAccumState machine
    * consumes inner-condition runs as they close. Emissions can stretch
    * back into already-closed runs (the windowQueue retains events within
    * the window, and the machine's lastTime fallback points one event
    * back), so events are final only once they fall below the frontier
    * min(windowQueue.head, lastTime); a data gap or the watermark passing
    * lastSeen + eventsMaxGap finalizes the part like batch end-of-data.
    */
  def incidentsWait(df: DataFrame, keys: Seq[String], tsCol: String,
                    windowMs: Long, prog: StreamingEval.Program,
                    cfg: StreamConfig): Dataset[StreamIncident] = {
    import df.sparkSession.implicits._
    val inSchema = df.schema.fieldNames.toSet
    val numCols =
      if (prog.numFields.isEmpty) array().cast("array<double>")
      else array(prog.numFields.map { f =>
        if (inSchema(f)) coalesce(col(f).cast("double"), lit(Double.NaN))
        else lit(Double.NaN)
      }: _*)
    val strCols =
      if (prog.strFields.isEmpty) array().cast("array<string>")
      else array(prog.strFields.map(col): _*)
    val keyed = df.select(
        concat_ws("|", keys.map(col): _*).as("key"),
        col(tsCol).as("ts"),
        numCols.as("nums"),
        strCols.as("strs"))
      .as[KeyedRaw]
    implicit val stateEnc: Encoder[WaitState] = Encoders.product[WaitState]
    keyed
      .groupByKey(_.key)
      .flatMapGroupsWithState(OutputMode.Append, GroupStateTimeout.EventTimeTimeout)(
        processWait(windowMs, prog, cfg))
  }

  private[streaming] def processWait(windowMs: Long, prog: StreamingEval.Program,
                          cfg: StreamConfig)(
    key: String,
    events: Iterator[KeyedRaw],
    state: GroupState[WaitState]
  ): Iterator[StreamIncident] = {
    import graft.dsl.PatternCompiler
    val st0 = state.getOption.getOrElse(WaitState(RunState.empty,
      Vector.fill(prog.ops.size)(Vector.empty),
      nextIdx = 1L, rawLastMs = Long.MinValue,
      Vector.empty, lastFail = false, 0L, 0L,
      openV = false, hasOpen = false, Vector.empty, Vector.empty, Vector.empty))
    val deques = st0.ops.map(v => ArrayBuffer.from(v)).toArray
    val out = ArrayBuffer.empty[StreamIncident]
    val m = new RunMachine(cfg, key, st0.run, out, retainMs = cfg.eventsMaxGapMs)

    var nextIdx = st0.nextIdx
    var rawLastMs = st0.rawLastMs
    var wst = PatternCompiler.WaitSt(Vector.from(st0.wq), st0.lastFail,
      (st0.lastTimeIdx, st0.lastTimeMs))
    var openV = st0.openV
    var hasOpen = st0.hasOpen
    var openTimes = Vector.from(st0.openTimes)
    var buf = Vector.from(st0.buf)
    var emitted = Vector.from(st0.emitted)

    def stepRun(): Unit = if (hasOpen && openTimes.nonEmpty) {
      val (w2, em) = PatternCompiler.waitStep(wst, windowMs, openV, openTimes)
      wst = w2
      em.foreach { case (s, e, v) => if (v) emitted = emitted :+ ((s, e)) }
      openTimes = Vector.empty
    }

    def flushDecided(finalize: Boolean): Unit = {
      // future emissions can only start at windowQueue entries or lastTime
      val frontier =
        if (finalize) nextIdx
        else {
          val cands = wst.windowQueue.headOption.map(_._1).toSeq ++
            (if (wst.lastTime._2 != 0L) Seq(wst.lastTime._1) else Seq.empty) ++
            openTimes.headOption.map(_._1).toSeq
          if (cands.isEmpty) nextIdx else cands.min
        }
      val (decided, rest) = buf.span(_._1 < frontier)
      decided.foreach { case (idx, ms) =>
        m.feed(ms, emitted.exists(iv => idx >= iv._1 && idx <= iv._2))
      }
      buf = rest
      emitted = emitted.filter(_._2 >= frontier)
    }

    def finalizePart(): Unit = {
      stepRun()
      hasOpen = false
      flushDecided(finalize = true)
      wst = PatternCompiler.WaitSt.empty
      emitted = Vector.empty
      deques.foreach(_.clear())
    }

    val wm = state.getCurrentWatermarkMs()

    if (!state.hasTimedOut) {
      events.toArray.sortBy(_.tsMs).iterator
        .filter(_.tsMs > rawLastMs)
        .foreach { e =>
          if (rawLastMs != Long.MinValue && e.tsMs - rawLastMs > cfg.eventsMaxGapMs)
            finalizePart() // part ends at the data gap
          val idx = nextIdx
          nextIdx += 1
          val c = prog.eval(deques, e.tsMs, e.nums.toArray, e.strs.toArray)
          if (hasOpen && openV != c) stepRun()
          if (!hasOpen || openV != c) { hasOpen = true; openV = c }
          openTimes = openTimes :+ ((idx, e.tsMs))
          buf = buf :+ ((idx, e.tsMs))
          rawLastMs = e.tsMs
          // cap checked per event (see the chain path): the cap must bound
          // in-batch growth too, not just cross-batch carried state
          if (buf.length > cfg.maxUndecidedEvents) {
            logWarning(s"wait state for key '$key' exceeded " +
              s"${cfg.maxUndecidedEvents} undecided events (frontier " +
              "stalled); force-finalizing the part")
            cfg.forceFinalizeAcc.foreach(_.add(1L))
            finalizePart()
          }
        }
      flushDecided(finalize = false)
    }
    if (rawLastMs != Long.MinValue && wm > rawLastMs + cfg.eventsMaxGapMs &&
      buf.nonEmpty) finalizePart()

    val effWm = if (buf.nonEmpty) math.min(wm, buf.head._2 - 1) else wm
    m.expire(effWm)

    if (m.retired(wm) && buf.isEmpty) state.remove()
    else {
      state.update(WaitState(m.s, deques.map(_.toVector).toSeq,
        nextIdx, rawLastMs,
        wst.windowQueue, wst.lastFail, wst.lastTime._1, wst.lastTime._2,
        openV, hasOpen, openTimes, buf, emitted))
      val d = m.deadline(wm)
      val dBuf =
        if (buf.nonEmpty) math.max(rawLastMs + cfg.eventsMaxGapMs + 1, wm + 1)
        else Long.MaxValue
      state.setTimeoutTimestamp(math.min(d, dBuf))
    }
    out.iterator
  }

  /** The shared run/session machine: condition runs, gap resets, timer
    * qualification, and incident merge (same semantics as the batch
    * extractIncidents + sessionize pipeline).
    */
  /** @param retainMs extra state lifetime past the last event: the
    *   evaluator path must keep operator deques alive while a future event
    *   could still reach back into them (max op window, capped at the gap —
    *   beyond the gap the deques reset on arrival anyway). 0 for the
    *   scalar path.
    */
  private final class RunMachine(cfg: StreamConfig, key: String,
                                 var s: RunState,
                                 out: ArrayBuffer[StreamIncident],
                                 retainMs: Long = 0L) {

    private def emitOrMerge(fromMs: Long, toMs: Long, n: Long): Unit = {
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

    def isGap(tsMs: Long): Boolean =
      s.lastSeenMs != Long.MinValue && tsMs - s.lastSeenMs > cfg.eventsMaxGapMs

    def feed(tsMs: Long, cond: Boolean): Unit = {
      if (isGap(tsMs))
        closeRun() // data gap: state reset (PatternProcessor.splitByCondition)
      if (cond) {
        if (s.startMs < 0) s = s.copy(startMs = tsMs)
        s = s.copy(lastCondMs = tsMs)
        if (tsMs >= s.startMs + cfg.minDurationMs) {
          if (s.firstSuccMs < 0) s = s.copy(firstSuccMs = tsMs)
          s = s.copy(succN = s.succN + 1)
        }
      } else closeRun()
      s = s.copy(lastSeenMs = tsMs)
    }

    /** Watermark-driven expiry; runs on BOTH the data and timeout paths:
      * Spark only fires timeouts for keys with no data in the batch, so a
      * key under continuous traffic must flush inline here. Once
      * wm > lastSeen + maxGap, every admissible future event (ts > wm)
      * closes the run on arrival — so close it now (batch end-of-gap
      * semantics); once wm > pending.to + sessionGap nothing can merge.
      */
    def expire(wm: Long): Unit = {
      if (s.startMs >= 0 && wm > s.lastSeenMs + cfg.eventsMaxGapMs) closeRun()
      if (s.hasPending && wm > s.pendToMs + cfg.sessionGapMs) {
        out += StreamIncident(key, s.pendFromMs, s.pendToMs, s.pendN)
        s = s.copy(hasPending = false)
      }
    }

    def retired(wm: Long): Boolean =
      s.startMs < 0 && !s.hasPending && wm > s.lastSeenMs + retainMs

    /** Next event-time deadline, clamped above the watermark (Spark rejects
      * a timeout timestamp at or below it).
      */
    def deadline(wm: Long): Long = {
      val d = math.min(
        if (s.hasPending) s.pendToMs + cfg.sessionGapMs + 1 else Long.MaxValue,
        if (s.startMs >= 0) s.lastSeenMs + cfg.eventsMaxGapMs + 1
        else s.lastSeenMs + retainMs + 1) // quiescent: retire once safe
      math.max(d, wm + 1)
    }
  }

  private def process(cfg: StreamConfig)(
    key: String,
    events: Iterator[KeyedEvent],
    state: GroupState[RunState]
  ): Iterator[StreamIncident] = {
    val out = ArrayBuffer.empty[StreamIncident]
    val m = new RunMachine(cfg, key, state.getOption.getOrElse(RunState.empty), out)
    val wm = state.getCurrentWatermarkMs()

    if (!state.hasTimedOut) {
      // micro-batches are unordered; process in event time, drop late rows
      events.toArray.sortBy(_.tsMs).iterator
        .filter(_.tsMs > m.s.lastSeenMs)
        .foreach(e => m.feed(e.tsMs, e.cond))
    }
    m.expire(wm)

    if (m.retired(wm)) {
      // nothing open and the watermark subsumes the late-event cutoff:
      // retire the key's state entirely (bounded state under key churn)
      state.remove()
    } else {
      state.update(m.s)
      state.setTimeoutTimestamp(m.deadline(wm))
    }
    out.iterator
  }

  private[streaming] def processEval(program: StreamingEval.Program, cfg: StreamConfig)(
    key: String,
    events: Iterator[KeyedRaw],
    state: GroupState[EvalState]
  ): Iterator[StreamIncident] = {
    val st = state.getOption.getOrElse(
      EvalState(RunState.empty, Vector.fill(program.ops.size)(Vector.empty)))
    val deques: Array[ArrayBuffer[graft.dsl.StreamingEval.Ent]] =
      st.ops.map(v => ArrayBuffer.from(v)).toArray
    val out = ArrayBuffer.empty[StreamIncident]
    // op state must survive any quiet spell a future event could bridge:
    // lag's last-value and timer/for-stat run state reach back through the
    // whole gap-run, so retain for the full gap (after which deques reset
    // on arrival anyway)
    val retainMs = if (program.ops.isEmpty) 0L else cfg.eventsMaxGapMs
    val m = new RunMachine(cfg, key, st.run, out, retainMs)
    val wm = state.getCurrentWatermarkMs()

    if (!state.hasTimedOut) {
      events.toArray.sortBy(_.tsMs).iterator
        .filter(_.tsMs > m.s.lastSeenMs)
        .foreach { e =>
          // pattern state resets at data gaps, exactly like the batch
          // engine's per-(key, gap_run) window partitioning
          if (m.isGap(e.tsMs)) deques.foreach(_.clear())
          val cond = program.eval(deques, e.tsMs, e.nums.toArray, e.strs.toArray)
          m.feed(e.tsMs, cond)
        }
    }
    m.expire(wm)

    if (m.retired(wm)) state.remove()
    else {
      state.update(EvalState(m.s, deques.map(_.toVector).toSeq))
      state.setTimeoutTimestamp(m.deadline(wm))
    }
    out.iterator
  }
}
