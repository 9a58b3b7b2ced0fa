package graft.streaming

import graft.dsl.StreamingEval
import org.apache.spark.sql.{DataFrame, Dataset, Encoder, Encoders}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}
import org.apache.spark.sql.types.StringType

import scala.collection.mutable

/** Streaming `NarrowDataUnfolding` — the reference's
  * SparseRowsDataAccumulator (streaming/.../transformers/
  * SparseRowsDataAccumulator.scala:15-175) as per-key state INSIDE the
  * pattern evaluator's own `flatMapGroupsWithState`, because Spark does
  * not allow one fMGWS to feed another in the same streaming query.
  *
  * A narrow row is (keys…, ts, sensor, value…); the per-key state holds
  * each sensor's last NON-NULL value and its recording time. Every narrow
  * row whose sensor is in the configured `sensors` list produces (with
  * same-ts rows merged) one WIDE event at its timestamp, whose field
  * values are the accumulated ones still inside `timeoutMs`
  * (strict `now - recorded < timeout`, the batch [[graft.operators
  * .PatternOps.forwardFill]] open left edge) — expired or never-seen
  * fields read as NaN (numeric) / null (string), exactly the batch
  * pivot + timed-fill semantics locked by CorpusNarrowSpec. The
  * synthesized events then run through the UNCHANGED process functions of
  * [[StreamingPatterns]] (eval / chain / tree / wait), whose state is
  * wrapped alongside the sensor map ([[StreamingUnfold.NarrowState]]) via
  * a delegating [[GroupState]] view.
  *
  * Boundary (documented, matches the pattern engine's own retirement
  * semantics): when the watermark retires a fully-idle key, the sensor
  * map retires with it — an UNBOUNDED-timeout fill whose key goes idle
  * longer than the retirement horizon restarts from empty, where batch
  * would still fill from the old values. Timed fills (every reference
  * narrow config sets a timeout) are unaffected: the values would have
  * expired anyway.
  */
object StreamingUnfold {

  /** Narrow-source shape: `num`/`str` carry the row's value routed per the
    * sensor's configured value column; None = the cell was NULL (does not
    * overwrite the accumulator — `last(ignoreNulls)` semantics).
    */
  case class NarrowRaw(key: String, ts: java.sql.Timestamp, sensor: String,
                       num: Option[Double], str: Option[String]) {
    def tsMs: Long = ts.getTime
  }

  /** Wrapped state: the inner path's state plus the sensor accumulator as
    * parallel seqs (encoder-friendly). `strV` entries may be null.
    */
  case class NarrowState[S](inner: Option[S], sensors: Seq[String],
                            recMs: Seq[Long], hasNum: Seq[Boolean],
                            numV: Seq[Double], strV: Seq[String])

  final case class NarrowStreamConfig(
    sensorCol: String,
    defaultValueCol: String,
    valueColumnMapping: Map[String, String] = Map.empty,
    timeoutMs: Option[Long] = None)

  /** Delegating view: the inner process function reads/writes its own
    * state type against the outer wrapped state. `update` writes through
    * immediately so a subsequent `setTimeoutTimestamp` sees defined state;
    * `remove` is deferred to [[wrap]]'s single final write.
    */
  private final class InnerStateView[S](outer: GroupState[NarrowState[S]],
                                        mk: Option[S] => NarrowState[S])
      extends GroupState[S] {
    var cur: Option[S] = outer.getOption.flatMap(_.inner)
    var removedFlag: Boolean = false
    override def exists: Boolean = cur.isDefined
    override def get: S = cur.getOrElse(throw new NoSuchElementException("no state"))
    override def getOption: Option[S] = cur
    override def update(s: S): Unit = {
      cur = Some(s); removedFlag = false; outer.update(mk(cur))
    }
    override def remove(): Unit = { cur = None; removedFlag = true }
    override def hasTimedOut: Boolean = outer.hasTimedOut
    override def setTimeoutDuration(d: Long): Unit = outer.setTimeoutDuration(d)
    override def setTimeoutDuration(d: String): Unit = outer.setTimeoutDuration(d)
    override def setTimeoutTimestamp(t: Long): Unit = outer.setTimeoutTimestamp(t)
    override def setTimeoutTimestamp(t: Long, add: String): Unit =
      outer.setTimeoutTimestamp(t, add)
    override def setTimeoutTimestamp(t: java.sql.Date): Unit =
      outer.setTimeoutTimestamp(t)
    override def setTimeoutTimestamp(t: java.sql.Date, add: String): Unit =
      outer.setTimeoutTimestamp(t, add)
    override def getCurrentWatermarkMs(): Long = outer.getCurrentWatermarkMs()
    override def getCurrentProcessingTimeMs(): Long = outer.getCurrentProcessingTimeMs()
  }

  /** Wrap an inner process function with the unfold accumulator.
    *
    * Rows whose sensor is not in `sensorSet` are ignored HERE, not by a
    * plan-level filter: Catalyst pushes a sensor predicate below the
    * user's `EventTimeWatermark` node (it does not reference the event
    * time column), so a stream whose tail is unlisted sensors would stop
    * advancing the watermark and pending incidents would never flush.
    * Ignored rows still update the watermark; they produce no evaluation
    * point and no accumulator update — exactly the batch pivot, which
    * drops them.
    */
  private[streaming] def wrap[S](
      numF: Seq[String], strF: Seq[String], timeoutMs: Option[Long],
      sensorSet: Set[String],
      proc: (String, Iterator[StreamingPatterns.KeyedRaw], GroupState[S])
        => Iterator[StreamingPatterns.StreamIncident])
      : (String, Iterator[NarrowRaw], GroupState[NarrowState[S]])
        => Iterator[StreamingPatterns.StreamIncident] = {
    (key, rows, outer) =>
      // decode accumulator: sensor -> (recordedMs, hasNum, num, str)
      val m = mutable.LinkedHashMap.empty[String, (Long, Boolean, Double, String)]
      outer.getOption.foreach { st =>
        var i = 0
        while (i < st.sensors.length) {
          m(st.sensors(i)) = (st.recMs(i), st.hasNum(i), st.numV(i), st.strV(i))
          i += 1
        }
      }
      val wide = mutable.ArrayBuffer.empty[StreamingPatterns.KeyedRaw]
      if (!outer.hasTimedOut) {
        val sorted = rows.toArray.filter(r => sensorSet(r.sensor))
          .sortBy(_.tsMs) // stable: same-ts keeps input order
        var i = 0
        while (i < sorted.length) {
          val t = sorted(i).tsMs
          var j = i
          while (j < sorted.length && sorted(j).tsMs == t) {
            val r = sorted(j)
            if (r.num.isDefined || r.str.isDefined) {
              // last-non-null wins; an out-of-order older row never
              // overwrites a newer recording
              if (m.get(r.sensor).forall(_._1 <= t))
                m(r.sensor) = (t, r.num.isDefined, r.num.getOrElse(Double.NaN),
                  r.str.orNull)
            }
            j += 1
          }
          def alive(rec: Long): Boolean =
            timeoutMs.forall(to => t - rec < to) // strict: batch open left edge
          val nums = numF.map { f =>
            m.get(f) match {
              case Some((rec, true, v, _)) if alive(rec) => v
              case _                                     => Double.NaN
            }
          }
          val strs = strF.map { f =>
            m.get(f) match {
              case Some((rec, _, _, s)) if alive(rec) => s
              case _                                  => null
            }
          }
          wide += StreamingPatterns.KeyedRaw(key, new java.sql.Timestamp(t), nums, strs)
          i = j
        }
      }
      def encodeState(inner: Option[S]): NarrowState[S] = {
        val ks = m.keys.toSeq
        NarrowState(inner, ks, ks.map(m(_)._1), ks.map(m(_)._2),
          ks.map(m(_)._3), ks.map(m(_)._4))
      }
      val view = new InnerStateView[S](outer, encodeState)
      // materialize before the final state write: the inner iterator may
      // touch state lazily, and exactly one terminal write must win
      val out = proc(key, wide.iterator, view).toVector
      if (view.removedFlag) outer.remove()
      else outer.update(encodeState(view.cur))
      out.iterator
  }

  /** Wide sparse row: one evaluation point per ROW; `nums` None / `strs`
    * null mark missing cells that [[wrapFilled]] fills from state.
    */
  case class FilledRaw(key: String, ts: java.sql.Timestamp,
                       nums: Seq[Option[Double]], strs: Seq[String]) {
    def tsMs: Long = ts.getTime
  }

  /** Streaming `WideDataFilling`: every row is an evaluation point; cells
    * present refresh the accumulator, missing cells of a FILLED column
    * read the last recorded value still inside `timeoutMs` (strict — the
    * batch [[graft.operators.PatternOps.forwardFill]] edge), missing
    * cells of unfilled columns read NaN / null. Accumulator entries are
    * keyed by field name, same state class as the narrow wrap.
    */
  private[streaming] def wrapFilled[S](
      numF: Seq[String], strF: Seq[String],
      fillCols: Set[String], timeoutMs: Option[Long],
      proc: (String, Iterator[StreamingPatterns.KeyedRaw], GroupState[S])
        => Iterator[StreamingPatterns.StreamIncident])
      : (String, Iterator[FilledRaw], GroupState[NarrowState[S]])
        => Iterator[StreamingPatterns.StreamIncident] = {
    (key, rows, outer) =>
      val m = mutable.LinkedHashMap.empty[String, (Long, Boolean, Double, String)]
      outer.getOption.foreach { st =>
        var i = 0
        while (i < st.sensors.length) {
          m(st.sensors(i)) = (st.recMs(i), st.hasNum(i), st.numV(i), st.strV(i))
          i += 1
        }
      }
      val wide = mutable.ArrayBuffer.empty[StreamingPatterns.KeyedRaw]
      if (!outer.hasTimedOut) {
        rows.toArray.sortBy(_.tsMs).foreach { r =>
          val t = r.tsMs
          def alive(rec: Long): Boolean = timeoutMs.forall(to => t - rec < to)
          val nums = numF.indices.map { i =>
            val f = numF(i)
            r.nums(i) match {
              case Some(v) =>
                if (fillCols(f) && m.get(f).forall(_._1 <= t))
                  m(f) = (t, true, v, null)
                v
              case None =>
                if (fillCols(f)) m.get(f) match {
                  case Some((rec, true, v, _)) if alive(rec) => v
                  case _                                     => Double.NaN
                } else Double.NaN
            }
          }
          val strs = strF.indices.map { i =>
            val f = strF(i)
            r.strs(i) match {
              case s: String =>
                if (fillCols(f) && m.get(f).forall(_._1 <= t))
                  m(f) = (t, false, Double.NaN, s)
                s
              case null =>
                if (fillCols(f)) m.get(f) match {
                  case Some((rec, _, _, s)) if alive(rec) => s
                  case _                                  => null
                } else null
            }
          }
          wide += StreamingPatterns.KeyedRaw(key, new java.sql.Timestamp(t), nums, strs)
        }
      }
      def encodeState(inner: Option[S]): NarrowState[S] = {
        val ks = m.keys.toSeq
        NarrowState(inner, ks, ks.map(m(_)._1), ks.map(m(_)._2),
          ks.map(m(_)._3), ks.map(m(_)._4))
      }
      val view = new InnerStateView[S](outer, encodeState)
      val out = proc(key, wide.iterator, view).toVector
      if (view.removedFlag) outer.remove()
      else outer.update(encodeState(view.cur))
      out.iterator
  }

  /** Project a wide sparse frame to [[FilledRaw]]: referenced fields only,
    * null cells preserved (they are what filling is about).
    */
  private def filledKeyed(df: DataFrame, keys: Seq[String], tsCol: String,
                          numF: Seq[String], strF: Seq[String]): Dataset[FilledRaw] = {
    import df.sparkSession.implicits._
    val inSchema = df.schema.fieldNames.toSet
    val numCols =
      if (numF.isEmpty) array().cast("array<double>")
      else array(numF.map(f =>
        if (inSchema(f)) col(f).cast("double") else lit(null).cast("double")): _*)
    val strCols =
      if (strF.isEmpty) array().cast("array<string>")
      else array(strF.map(f =>
        if (inSchema(f)) col(f).cast("string") else lit(null).cast("string")): _*)
    df.select(concat_ws("|", keys.map(col): _*).as("key"),
        col(tsCol).as("ts"), numCols.as("nums"), strCols.as("strs"))
      .as[FilledRaw]
  }

  /** Project a narrow frame to [[NarrowRaw]]: values routed per sensor
    * through `valueColumnMapping` / `defaultValueCol`. Unlisted sensors
    * are NOT filtered here — see [[wrap]]: a plan-level sensor predicate
    * gets pushed below the watermark node and would stall the watermark
    * on unlisted-sensor traffic.
    */
  private def narrowKeyed(df: DataFrame, keys: Seq[String], tsCol: String,
                          narrow: NarrowStreamConfig,
                          numF: Seq[String], strF: Seq[String]): Dataset[NarrowRaw] = {
    import df.sparkSession.implicits._
    def vc(s: String): String =
      narrow.valueColumnMapping.getOrElse(s, narrow.defaultValueCol)
    val numExpr = numF.foldLeft(lit(null).cast("double")) { (acc, f) =>
      when(col(narrow.sensorCol) === f, col(vc(f)).cast("double")).otherwise(acc)
    }
    val strExpr = strF.foldLeft(lit(null).cast("string")) { (acc, f) =>
      when(col(narrow.sensorCol) === f, col(vc(f)).cast("string")).otherwise(acc)
    }
    df.select(concat_ws("|", keys.map(col): _*).as("key"),
        col(tsCol).as("ts"), col(narrow.sensorCol).as("sensor"),
        numExpr.as("num"), strExpr.as("str"))
      .as[NarrowRaw]
  }

  /** Referenced-field split for a narrow source: a field is string-typed
    * iff its routed value column is string-typed in the narrow schema.
    */
  def fieldSplit(df: DataFrame, fields: Set[String],
                 narrow: NarrowStreamConfig): (Vector[String], Vector[String]) = {
    // a field's wide type IS its routed value column's type — exactly what
    // the batch pivot produces and what the wide path's schema split sees
    def strTyped(f: String): Boolean = {
      val c = narrow.valueColumnMapping.getOrElse(f, narrow.defaultValueCol)
      df.schema.fields.exists(sf => sf.name == c && sf.dataType == StringType)
    }
    val strF = fields.filter(strTyped).toVector.sorted
    ((fields -- strF).toVector.sorted, strF)
  }

  import StreamingPatterns._

  def incidentsEvalNarrow(df: DataFrame, keys: Seq[String], tsCol: String,
                          narrow: NarrowStreamConfig, sensors: Seq[String],
                          program: StreamingEval.Program,
                          cfg: StreamConfig): Dataset[StreamIncident] = {
    import df.sparkSession.implicits._
    implicit val stateEnc: Encoder[NarrowState[EvalState]] =
      Encoders.product[NarrowState[EvalState]]
    narrowKeyed(df, keys, tsCol, narrow, program.numFields, program.strFields)
      .groupByKey(_.key)
      .flatMapGroupsWithState(OutputMode.Append, GroupStateTimeout.EventTimeTimeout)(
        wrap(program.numFields, program.strFields, narrow.timeoutMs, sensors.toSet,
          processEval(program, cfg)))
  }

  def incidentsChainNarrow(df: DataFrame, keys: Seq[String], tsCol: String,
                           narrow: NarrowStreamConfig, sensors: Seq[String],
                           progs: Seq[StreamingEval.Program],
                           cfg: StreamConfig): Dataset[StreamIncident] = {
    import df.sparkSession.implicits._
    val head = progs.head
    implicit val stateEnc: Encoder[NarrowState[ChainState]] =
      Encoders.product[NarrowState[ChainState]]
    narrowKeyed(df, keys, tsCol, narrow, head.numFields, head.strFields)
      .groupByKey(_.key)
      .flatMapGroupsWithState(OutputMode.Append, GroupStateTimeout.EventTimeTimeout)(
        wrap(head.numFields, head.strFields, narrow.timeoutMs, sensors.toSet,
          processChain(progs, cfg)))
  }

  def incidentsTreeNarrow(df: DataFrame, keys: Seq[String], tsCol: String,
                          narrow: NarrowStreamConfig, sensors: Seq[String],
                          tree: StreamTree,
                          cfg: StreamConfig): Dataset[StreamIncident] = {
    import df.sparkSession.implicits._
    def leaves(t: StreamTree): Seq[StreamingEval.Program] = t match {
      case SLeaf(p)       => Seq(p)
      case SAndThen(l, r) => leaves(l) ++ leaves(r)
      case SWait(_, i)    => leaves(i)
    }
    val head = leaves(tree).head
    implicit val stateEnc: Encoder[NarrowState[TreeState]] =
      Encoders.product[NarrowState[TreeState]]
    narrowKeyed(df, keys, tsCol, narrow, head.numFields, head.strFields)
      .groupByKey(_.key)
      .flatMapGroupsWithState(OutputMode.Append, GroupStateTimeout.EventTimeTimeout)(
        wrap(head.numFields, head.strFields, narrow.timeoutMs, sensors.toSet,
          processTree(tree, cfg)))
  }

  def incidentsWaitNarrow(df: DataFrame, keys: Seq[String], tsCol: String,
                          narrow: NarrowStreamConfig, sensors: Seq[String],
                          windowMs: Long, prog: StreamingEval.Program,
                          cfg: StreamConfig): Dataset[StreamIncident] = {
    import df.sparkSession.implicits._
    implicit val stateEnc: Encoder[NarrowState[WaitState]] =
      Encoders.product[NarrowState[WaitState]]
    narrowKeyed(df, keys, tsCol, narrow, prog.numFields, prog.strFields)
      .groupByKey(_.key)
      .flatMapGroupsWithState(OutputMode.Append, GroupStateTimeout.EventTimeTimeout)(
        wrap(prog.numFields, prog.strFields, narrow.timeoutMs, sensors.toSet,
          processWait(windowMs, prog, cfg)))
  }

  // ------------------------------------------- WideDataFilling entries

  def incidentsEvalFilled(df: DataFrame, keys: Seq[String], tsCol: String,
                          fillCols: Set[String], timeoutMs: Option[Long],
                          program: StreamingEval.Program,
                          cfg: StreamConfig): Dataset[StreamIncident] = {
    import df.sparkSession.implicits._
    implicit val stateEnc: Encoder[NarrowState[EvalState]] =
      Encoders.product[NarrowState[EvalState]]
    filledKeyed(df, keys, tsCol, program.numFields, program.strFields)
      .groupByKey(_.key)
      .flatMapGroupsWithState(OutputMode.Append, GroupStateTimeout.EventTimeTimeout)(
        wrapFilled(program.numFields, program.strFields, fillCols, timeoutMs,
          processEval(program, cfg)))
  }

  def incidentsChainFilled(df: DataFrame, keys: Seq[String], tsCol: String,
                           fillCols: Set[String], timeoutMs: Option[Long],
                           progs: Seq[StreamingEval.Program],
                           cfg: StreamConfig): Dataset[StreamIncident] = {
    import df.sparkSession.implicits._
    val head = progs.head
    implicit val stateEnc: Encoder[NarrowState[ChainState]] =
      Encoders.product[NarrowState[ChainState]]
    filledKeyed(df, keys, tsCol, head.numFields, head.strFields)
      .groupByKey(_.key)
      .flatMapGroupsWithState(OutputMode.Append, GroupStateTimeout.EventTimeTimeout)(
        wrapFilled(head.numFields, head.strFields, fillCols, timeoutMs,
          processChain(progs, cfg)))
  }

  def incidentsTreeFilled(df: DataFrame, keys: Seq[String], tsCol: String,
                          fillCols: Set[String], timeoutMs: Option[Long],
                          tree: StreamTree,
                          cfg: StreamConfig): Dataset[StreamIncident] = {
    import df.sparkSession.implicits._
    def leaves(t: StreamTree): Seq[StreamingEval.Program] = t match {
      case SLeaf(p)       => Seq(p)
      case SAndThen(l, r) => leaves(l) ++ leaves(r)
      case SWait(_, i)    => leaves(i)
    }
    val head = leaves(tree).head
    implicit val stateEnc: Encoder[NarrowState[TreeState]] =
      Encoders.product[NarrowState[TreeState]]
    filledKeyed(df, keys, tsCol, head.numFields, head.strFields)
      .groupByKey(_.key)
      .flatMapGroupsWithState(OutputMode.Append, GroupStateTimeout.EventTimeTimeout)(
        wrapFilled(head.numFields, head.strFields, fillCols, timeoutMs,
          processTree(tree, cfg)))
  }

  def incidentsWaitFilled(df: DataFrame, keys: Seq[String], tsCol: String,
                          fillCols: Set[String], timeoutMs: Option[Long],
                          windowMs: Long, prog: StreamingEval.Program,
                          cfg: StreamConfig): Dataset[StreamIncident] = {
    import df.sparkSession.implicits._
    implicit val stateEnc: Encoder[NarrowState[WaitState]] =
      Encoders.product[NarrowState[WaitState]]
    filledKeyed(df, keys, tsCol, prog.numFields, prog.strFields)
      .groupByKey(_.key)
      .flatMapGroupsWithState(OutputMode.Append, GroupStateTimeout.EventTimeTimeout)(
        wrapFilled(prog.numFields, prog.strFields, fillCols, timeoutMs,
          processWait(windowMs, prog, cfg)))
  }
}
