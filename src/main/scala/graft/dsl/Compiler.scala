package graft.dsl

import org.apache.spark.sql.{Column, DataFrame, Row}
import org.apache.spark.sql.expressions.{Window, WindowSpec}
import org.apache.spark.sql.functions._

import scala.collection.mutable.ArrayBuffer

/** Engine configuration, mirroring the reference's input-conf knobs
  * (reference: streaming/.../io/JDBCInputConf.scala:24-49).
  *
  * @param keys            partition fields; all pattern state is per-key
  * @param tsCol           event-time column (TimestampType)
  * @param eventsMaxGapMs  data gap that resets all pattern state
  *                        (reference: mappers/PatternProcessor.scala:77-92)
  * @param sessionGapMs    incident merge window ("defaultEventsGapMs",
  *                        reference: PatternsSearchJob.scala:259-305)
  * @param toleranceFraction bare `X for T` becomes [T*(1-f), T*(1+f)]
  */
final case class PatternConfig(
  keys: Seq[String],
  tsCol: String,
  eventsMaxGapMs: Long = 60000L,
  sessionGapMs: Long = 2000L,
  toleranceFraction: Double = 0.0,
  /** Column whose value becomes the incident's `unit` (reference:
    * ToIncidentsMapper.scala:19-21 — per-event extraction, Int.MinValue on
    * parse failure). None = no unit column on incidents.
    */
  unitIdField: Option[String] = None,
  /** Re-distribute events on (keys..., gap_run) after gap assignment.
    *
    * Every pattern stage's window partitions *logically* by
    * (keys, gap_run) — state resets at data gaps — but Spark's
    * EnsureRequirements never plans the finer exchange on its own:
    * hashpartitioning(keys) from the gap-assignment window already
    * *satisfies* ClusteredDistribution(keys :+ gap_run), so without this
    * explicit repartition a hot key (one unit owning most of the corpus)
    * serializes every window stage into a single task. With it, the hot
    * key's gap runs spread across the cluster and only the cheap linear
    * gap/idx assignment pass (lag + running sum + row_number) remains
    * per-key-serial. Costs one extra exchange of the event frame, which
    * the skew ladder (VolumeBench skew mode) shows is noise next to the
    * win once any key is large.
    */
  gapSubPartition: Boolean = true
)

/** AST -> Spark compiler.
  *
  * Strategy (Spark-first, not a port of the reference's combinator
  * interpreter): every trilean node becomes a *boolean column* over the event
  * frame, built with window functions partitioned by (keys..., gap_run) and
  * ordered by event-time millis — one shuffle + one sort for the whole
  * pattern, all stages inside whole-stage codegen. The two genuinely
  * sequential operators — `andThen`'s queue merge (cross-run consumption
  * semantics) and `wait`'s accumulation machine — stream each part's events
  * through bounded-memory state machines in one `mapPartitions` pass
  * ([[PatternCompiler.AndThenMachine]], [[PatternCompiler.WaitMachine]]);
  * the emitted idx intervals (segment-sized, orders of magnitude smaller
  * than the events) map back to an event column with an equi-join on the
  * partition key.
  *
  * Reference semantics sources are cited per method.
  */

/** The window-free scalar subset of the compiler — shared between the batch
  * engine and the streaming path (which cannot use window functions and
  * compiles conditions through [[TspEngine.streamingCondition]]).
  */
private[dsl] object ScalarFunctions {

  /** Scalar function registry (reference: FunctionRegistry.scala:114-454).
    * Everything maps to a codegen'd Catalyst expression; degree-variant trig
    * composes with `radians`.
    */
  def call(fn: String, a: Seq[Column]): Column = (fn, a) match {
    case ("add", Seq(x, y)) => x + y
    case ("sub", Seq(x, y)) => x - y
    case ("mul", Seq(x, y)) => x * y
    case ("div", Seq(x, y)) => x / y

    // Missing numeric data decodes to NaN in the reference
    // (BasicDecoders.scala:16-77), and comparisons follow *Scala* NaN
    // ordering: every comparison with NaN is false except `!=`, which is
    // true. A NULL operand here plays NaN's role, so ordered comparisons and
    // equality collapse NULL to false while `ne` collapses it to true.
    // (Spark's native NaN ordering — NaN greatest — would silently flip
    // `NaN > x` to true, so the NULL path must be explicit.)
    case ("lt", Seq(x, y)) => coalesce(x < y, lit(false))
    case ("le", Seq(x, y)) => coalesce(x <= y, lit(false))
    case ("gt", Seq(x, y)) => coalesce(x > y, lit(false))
    case ("ge", Seq(x, y)) => coalesce(x >= y, lit(false))
    case ("eq", Seq(x, y)) => coalesce(x === y, lit(false))
    case ("ne", Seq(x, y)) => when(x.isNull || y.isNull, lit(true)).otherwise(x =!= y)

    case ("and", Seq(x, y)) => x && y
    case ("or", Seq(x, y))  => x || y
    case ("xor", Seq(x, y)) => x =!= y
    case ("not", Seq(x))    => !x
    case ("neq", Seq(x, y)) => x =!= y

    case ("abs", Seq(x))  => abs(x)
    case ("sin", Seq(x))  => sin(x)
    case ("cos", Seq(x))  => cos(x)
    case ("tan" | "tg", Seq(x))  => tan(x)
    case ("cot" | "ctg", Seq(x)) => lit(1.0) / tan(x)
    case ("sind", Seq(x)) => sin(radians(x))
    case ("cosd", Seq(x)) => cos(radians(x))
    case ("tand" | "tgd", Seq(x))  => tan(radians(x))
    case ("cotd" | "ctgd", Seq(x)) => lit(1.0) / tan(radians(x))
    // documented in the reference's docs (docs/writing-patterns.md:149-156)
    // though absent from its registry; cheap to support properly
    case ("exp", Seq(x))     => exp(x)
    case ("ln", Seq(x))      => log(x)
    case ("log", Seq(x))     => log(x)
    case ("sigmoid", Seq(x)) => lit(1.0) / (lit(1.0) + exp(-x))

    case (other, args) =>
      throw Parser.ParseError(s"unknown function '$other'/${args.length}", 0)
  }

  /** Row-wise reducers with per-argument filters (reference:
    * FunctionRegistry.scala:456-518, ReducePattern.scala:40-70: arguments
    * failing the filter are excluded from the fold; a Fail argument that
    * *passes* the filter fails the whole result; the filter sees Fail as NaN
    * with Scala — not SQL — NaN ordering).
    */
  def reducer(r: ReducerCall, value: Ast => Column): Column = {
    val args = r.args.map(a => value(a).cast("double"))
    val condCol: Column => Column = r.cond match {
      case None    => _ => lit(true)
      case Some(u) => x => uToColumn(u, x)
    }
    val passNaN: Boolean = r.cond.forall(u => UExpr.eval(u, Double.NaN))
    // a NULL (Fail) argument: if the filter passes NaN, the whole reducer
    // fails; otherwise the argument is just excluded
    val nullPoisons = args.map(a => a.isNull && lit(passNaN)).reduce(_ || _)
    val pass = args.map(a => a.isNotNull && coalesce(condCol(a), lit(false)))

    def foldWith(init: Column, f: (Column, Column) => Column): Column =
      args.zip(pass).foldLeft(init) { case (acc, (a, p)) => when(p, f(acc, a)).otherwise(acc) }

    val result = r.fn match {
      case "sumof"   => foldWith(lit(0.0), _ + _)
      case "minof"   => foldWith(lit(Double.MaxValue), least(_, _))
      case "maxof"   => foldWith(lit(Double.MinValue), greatest(_, _))
      case "countof" => foldWith(lit(0.0), (acc, _) => acc + 1.0)
      case "avgof" =>
        val s = foldWith(lit(0.0), _ + _)
        val c = foldWith(lit(0.0), (acc, _) => acc + 1.0)
        // reference: 0 survivors -> 0.0/0.0 = NaN -> every comparison fails
        // (Scala ordering). Spark's NaN sorts *greatest*, so emit NULL (our
        // Fail/NaN stand-in) instead of letting NaN leak into comparisons.
        when(c > 0, s / c)
      case other => throw Parser.ParseError(s"unknown reducer '$other'", 0)
    }
    when(!nullPoisons, result)
  }

  def uToColumn(u: UExpr, hole: Column): Column = u match {
    case UNum(v)    => lit(v)
    case UHole      => hole
    case UBool(b)   => lit(b)
    case UNot(e)    => !uToColumn(e, hole)
    case UAnd(l, r) => uToColumn(l, hole) && uToColumn(r, hole)
    case UOr(l, r)  => uToColumn(l, hole) || uToColumn(r, hole)
    case UXor(l, r) => uToColumn(l, hole) =!= uToColumn(r, hole)
    case UBin(op, l, r) =>
      val (a, b) = (uToColumn(l, hole), uToColumn(r, hole))
      op match {
        case "+" => a + b; case "-" => a - b
        case "*" => a * b; case "/" => a / b
      }
    case UCmp(op, l, r) =>
      val (a, b) = (uToColumn(l, hole), uToColumn(r, hole))
      op match {
        case "<" => a < b; case "<=" => a <= b
        case ">" => a > b; case ">=" => a >= b
        case "=" => a === b; case "!=" => a =!= b
      }
  }
}

final class PatternCompiler(base: DataFrame, cfg: PatternConfig) {

  import PatternCompiler._

  /** Working frame; compilation appends `_p<N>_*` columns step by step. */
  private var df: DataFrame = _
  private var n = 0
  private def fresh(tag: String): String = { n += 1; s"_p${n}_$tag" }

  private val MS = "_p_ms"
  private val GAP = "_p_gap"
  private val IDX = "_p_idx"
  private val pcols: Seq[String] = cfg.keys :+ GAP

  /** One canonical window: partition by (keys, gap_run), order by millis.
    * Every window expression reuses this spec so Catalyst plans a single
    * Exchange + Sort for the entire pattern.
    */
  private def w: WindowSpec =
    Window.partitionBy(pcols.map(col): _*).orderBy(col(MS))

  locally {
    val ms = unix_millis(col(cfg.tsCol))
    val keyW = Window.partitionBy(cfg.keys.map(col): _*).orderBy(ms)
    val delta = ms - lag(ms, 1).over(keyW)
    df = base
      .withColumn(MS, ms)
      .withColumn(GAP,
        sum(when(delta > cfg.eventsMaxGapMs, 1).otherwise(0)).over(keyW).cast("long"))
      .withColumn(IDX, row_number().over(keyW).cast("long"))
    // see PatternConfig.gapSubPartition: force the exchange Spark's
    // subset-clustering rule would otherwise elide, so window stages run at
    // (key, gap_run) granularity instead of one-task-per-key
    if (cfg.gapSubPartition) df = df.repartition(pcols.map(col): _*)
  }

  /** The working frame with everything compiled so far (for multi-pattern
    * shared evaluation).
    */
  def currentFrame: DataFrame = df

  /** Compile to the final success column; returns the enriched frame and the
    * name of a non-null boolean column (true == the pattern holds at the
    * event).
    */
  def compile(ast: Ast): (DataFrame, String) = {
    val c = trilean(ast)
    val out = fresh("res")
    df = df.withColumn(out, coalesce(c, lit(false)))
    (df, out)
  }

  /** Incident extraction: run-length the success column per (keys, gap_run)
    * — a run never crosses a gap, like the reference's per-gap-run state
    * reset — then merge incidents closer than sessionGapMs (reference:
    * reduceIncidents, PatternsSearchJob.scala:259-305: new series iff
    * `from - prev.to > maxWindowMs`).
    */
  def incidents(ast: Ast): DataFrame = {
    val (frame, res) = compile(ast)
    extractIncidents(frame, res)
  }

  /** Segments + sessionization for an already-compiled success column. */
  def extractIncidents(frame: DataFrame, res: String): DataFrame = {
    val runCol = fresh("irun")
    val prev = lag(col(res), 1).over(w)
    val withRun = frame.withColumn(runCol,
      sum(when(col(res) <=> prev, 0).otherwise(1)).over(w).cast("long"))
    // unit rides along as the stringified field value of the segment's
    // earliest event (tie-broken on (MS, IDX) so duplicate timestamps pick
    // a deterministic row; the field is a per-equipment constant in
    // practice). Parsed to int after sessionization, Int.MinValue on
    // failure — ToIncidentsMapper.scala:19-21.
    val unitAgg = cfg.unitIdField.map(f =>
      min_by(col(f).cast("string"), struct(col(MS), col(IDX))).as("_p_unit")).toSeq
    val segs = withRun
      .filter(col(res))
      .groupBy((pcols :+ runCol).map(col): _*)
      .agg(min(col(cfg.tsCol)).as("seg_from"),
        Seq(
          max(col(cfg.tsCol)).as("seg_to"),
          min(col(MS)).as("from_ms"),
          max(col(MS)).as("to_ms"),
          count(lit(1)).as("n_events")) ++ unitAgg: _*)
      .drop(runCol, GAP)
    val merged = graft.operators.Segments.sessionize(segs, cfg.keys,
      cfg.sessionGapMs, carry = cfg.unitIdField.map(_ => "_p_unit").toSeq)
    if (cfg.unitIdField.isEmpty) merged
    else merged
      .withColumn("unit",
        coalesce(expr("try_cast(_p_unit AS int)"), lit(Int.MinValue)))
      .drop("_p_unit")
  }

  // ------------------------------------------------------------ trilean

  /** Trilean layer: returns a boolean column where `true` == Succ(true) and
    * false/null == Fail. At this layer only and/or/andThen compose (the
    * grammar, ASTBuilder.scala:29-38), and for those SQL semantics over
    * non-null booleans coincide with the reference's Fail-absorbing logic
    * (FunctionRegistry.scala:278-324).
    */
  private def trilean(ast: Ast): Column = ast match {
    case AssertAst(b) =>
      // Succ(true) iff the boolean expr is true; false and NULL both -> Fail
      // (ASTPatternGenerator.scala:191-194)
      coalesce(value(b), lit(false))

    case Call("and", Seq(a, b)) if isTrilean(a) || isTrilean(b) =>
      trilean(a) && trilean(b)
    case Call("or", Seq(a, b)) if isTrilean(a) || isTrilean(b) =>
      trilean(a) || trilean(b)

    case TimerAst(cond, _, maxMs) => timer(cond, maxMs)

    case UntilAst(cond, stop) =>
      // `X until B` == Timer(X, [inf,inf]) and Assert(not B); the infinite
      // timer succeeds on every X point (ASTBuilder.scala:48-56 + overflow
      // behavior of TimerPattern with MaxWindow), so: X && !B
      trilean(cond) && coalesce(!value(stop), lit(false))

    case f: ForWithIntervalAst => forWithInterval(f)

    case AndThenAst(a, b) => andThen(a, b)

    case WaitAst(windowMs, inner) => waitOp(windowMs, inner)

    case other =>
      // a bare boolean expression at trilean position (e.g. output of `or`
      // over two comparisons)
      coalesce(value(other), lit(false))
  }

  private def isTrilean(a: Ast): Boolean = a match {
    case _: TimerAst | _: UntilAst | _: ForWithIntervalAst | _: AndThenAst |
        _: WaitAst | _: AssertAst => true
    case Call("and" | "or", args) => args.exists(isTrilean)
    case _                        => false
  }

  /** Force a column into the frame under a fresh name (window-function
    * results must be materialized before further window functions stack on
    * top of them).
    */
  private def materialize(c: Column, tag: String): String = {
    val name = fresh(tag)
    df = df.withColumn(name, c)
    name
  }

  /** Mark every event whose [[IDX]] lies inside any decided interval —
    * `ivRows` is one `(pcols..., _p_s, _p_e)` row per interval, as emitted
    * by the andThen/wait machine passes.
    *
    * Shape: interval-open markers union into the frame and one linear
    * window pass per key carries the last opened interval's end forward;
    * an event is inside iff the carried end has not passed. Replaces a
    * per-key interval-ARRAY join + `exists()` scan per event, which was
    * O(events x intervals) per key — quadratic under a flapping condition
    * where the interval count tracks the event count — and whose single
    * array row per key was itself an unbounded-state hazard. Markers sort
    * before events at the same position (`_p_iv_mk` 0 < 1), so an interval
    * is inclusive of both endpoints.
    */
  private def stampIntervals(ivRows: DataFrame, out: String): Unit = {
    val markers = ivRows.select(
      pcols.map(col) ++ Seq(col("_p_s").as("_p_iv_pos"),
        col("_p_e").as("_p_iv_end"), lit(0).as("_p_iv_mk")): _*)
    val events = df
      .withColumn("_p_iv_pos", col(IDX))
      .withColumn("_p_iv_end", lit(null).cast("long"))
      .withColumn("_p_iv_mk", lit(1))
    val sw = Window.partitionBy(pcols.map(col): _*)
      .orderBy(col("_p_iv_pos"), col("_p_iv_mk"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    df = markers.unionByName(events, allowMissingColumns = true)
      .withColumn("_p_iv_open", last(col("_p_iv_end"), ignoreNulls = true).over(sw))
      .filter(col("_p_iv_mk") === 1)
      .withColumn(out,
        coalesce(col("_p_iv_open") >= col("_p_iv_pos"), lit(false)))
      .drop("_p_iv_pos", "_p_iv_end", "_p_iv_mk", "_p_iv_open")
  }

  // ------------------------------------------------------------ timer

  /** `X for T`: Succ on events of a continuous true-run once the run has
    * lasted >= windowMs; the first events of the run (before start+T) are
    * Fail (reference: TimerPattern.scala:63-109 — fail for points with
    * `t < head + window`, succ from the first point with `t + window <= end`
    * through the run end).
    */
  private def timer(cond: Ast, windowMs: Long): Column = {
    val c = materialize(coalesce(trilean(cond), lit(false)), "tc")
    val prev = lag(col(c), 1, false).over(w)
    val runStartMarker = col(c) && !prev
    val startMs = materialize(
      max(when(runStartMarker, col(MS))).over(w.rowsBetween(Window.unboundedPreceding, 0)),
      "tstart")
    val t = fresh("timer")
    df = df.withColumn(t, col(c) && col(MS) >= col(startMs) + windowMs)
    col(t)
  }

  // ------------------------------------------------- window statistics

  /** `X for [exactly] W <range>` via sliding truth statistics (reference:
    * WindowStatistic.scala:45-104 + the interval decision in
    * ASTPatternGenerator.scala:165-179).
    *
    * Columnar formulation: window membership is `t_i >= t - W` (queue
    * eviction `t_i + W < t`, :81); the duration between consecutive events is
    * attributed to the *previous* event's truth value, capped at W (:66-67,
    * :128-133); the oldest in-window duration is clipped to the part inside
    * the window (:86-97).
    */
  private def forWithInterval(f: ForWithIntervalAst): Column = {
    val W = f.windowMs
    val c = materialize(coalesce(trilean(f.inner), lit(false)), "wsc")
    val prevMs = lag(col(MS), 1).over(w)
    val prevC = lag(col(c), 1).over(w)
    val delta = col(MS) - prevMs
    val sdur = materialize(
      when(prevMs.isNotNull && prevC, least(delta, lit(W))).otherwise(0L), "sdur")
    val fdur = materialize(
      when(prevMs.isNotNull && !prevC, least(delta, lit(W))).otherwise(0L), "fdur")

    val frame = w.rangeBetween(-W, 0)
    val hMs = min(col(MS)).over(frame)
    // tie-break min_by on (MS, IDX): with duplicate timestamps the picked
    // oldest-in-window row must be deterministic across runs/partitions
    val hS = min_by(col(sdur), struct(col(MS), col(IDX))).over(frame)
    val hF = min_by(col(fdur), struct(col(MS), col(IDX))).over(frame)
    // clip the oldest duration to the window (WindowStatistic.scala:86-97)
    val sCorr = when(hS > 0, hS - (lit(W) - (col(MS) - hMs))).otherwise(0L)
    val fCorr = when(hF > 0, hF - (lit(W) - (col(MS) - hMs))).otherwise(0L)
    val succMs = materialize(sum(col(sdur)).over(frame) - sCorr, "sms")
    val failMs = materialize(sum(col(fdur)).over(frame) - fCorr, "fms")
    val succCnt = materialize(
      sum(when(col(c), 1L).otherwise(0L)).over(frame), "scnt")

    val inInterval = f.interval match {
      case TimeIv(mn, mx)  => col(succMs) >= mn && col(succMs) <= mx
      case CountIv(s, e)   =>
        val lo = col(succCnt) >= s
        e.fold(lo)(hi => lo && col(succCnt) <= hi)
    }
    // `exactly` => only evaluate once the window is fully covered by data
    // (stats.totalMillis >= window, ASTPatternGenerator.scala:173)
    val ended =
      if (!f.exactly) lit(true)
      else (col(succMs) + col(failMs)) >= W
    val out = fresh("fwi")
    df = df.withColumn(out, inInterval && ended)
    col(out)
  }

  // ------------------------------------------------------------ andThen

  /** `A andThen B`: exact port of the reference's queue-merge over
    * run-length-compressed results (reference: AndThenPattern.scala:42-94).
    * Both operand conditions stream through [[PatternCompiler.AndThenMachine]]
    * — one `mapPartitions` pass per (keys, gap-run) group, rows
    * hash-partitioned on the keys and sorted by (keys, idx), exactly the
    * shape [[waitOp]] uses. The machine RLE-compresses each side in-stream
    * and drains decided prefixes through the incremental queue merge, so
    * per-part state is the undecided runs only — never whole-part arrays
    * (an earlier groupBy + collect_list formulation put every condition run
    * of a part into one Tungsten array row, unbounded under a flapping
    * condition). The machine emits one ROW per decided idx interval —
    * never a per-key interval array — and [[stampIntervals]] marks the
    * events in one linear window pass (an earlier array-join + `exists`
    * scan was O(events x intervals) per key).
    */
  private def andThen(a: Ast, b: Ast): Column = {
    val ca = materialize(coalesce(trilean(a), lit(false)), "ata")
    val cb = materialize(coalesce(trilean(b), lit(false)), "atb")
    val nk = pcols.length
    val src = df
      .select((pcols.map(col) ++ Seq(col(IDX), col(ca), col(cb))): _*)
      .repartition(pcols.map(col): _*)
      .sortWithinPartitions((pcols :+ IDX).map(col): _*)
    val outSchema = org.apache.spark.sql.types.StructType(
      src.schema.fields.take(nk) ++ Seq(
        org.apache.spark.sql.types.StructField("_p_s",
          org.apache.spark.sql.types.LongType, nullable = false),
        org.apache.spark.sql.types.StructField("_p_e",
          org.apache.spark.sql.types.LongType, nullable = false)))
    val merged = src.mapPartitions { it =>
      val buf = it.buffered
      new Iterator[Iterator[Row]] {
        def hasNext: Boolean = buf.hasNext
        def next(): Iterator[Row] = {
          val head = buf.head
          val key: IndexedSeq[Any] = (0 until nk).map(head.get)
          val m = new AndThenMachine
          var same = true
          while (buf.hasNext && same) {
            val r = buf.head
            var i = 0
            same = true
            while (same && i < nk) { same = r.get(i) == key(i); i += 1 }
            if (same) {
              buf.next()
              m.feed(r.getLong(nk), r.getBoolean(nk + 1), r.getBoolean(nk + 2))
            }
          }
          m.finish().iterator.map { case (s, e) => Row.fromSeq(key ++ Seq(s, e)) }
        }
      }.flatten
    }(org.apache.spark.sql.Encoders.row(outSchema))

    val out = fresh("andthen")
    stampIntervals(merged, out)
    col(out)
  }

  // ------------------------------------------------------------ wait

  /** `wait(T, X)`: exact port of the reference's wait state machine
    * (aggregators/WaitPattern.scala:29-89, driven per inner RLE run as
    * AccumPattern.scala:60-85 feeds it). The sequential machine streams over
    * each (key, gap-run) group inside one `mapPartitions` pass — rows arrive
    * hash-partitioned on the keys and sorted by (keys, idx), and
    * [[PatternCompiler.WaitMachine]] consumes them one at a time holding only
    * the reference's windowQueue (events within `windowMs` of the frontier,
    * the same bound the reference's own queue has) plus O(1) run bookkeeping
    * — never a whole part's events. The emitted idx intervals (bounded by
    * condition flips, like the andThen runs) come out as one row each and
    * [[stampIntervals]] marks the events in one linear window pass.
    * An earlier columnar formulation ("success within
    * [t, t+W]") diverged from the reference on short-window and
    * part-boundary cases (caught by the randomized differential spec); the
    * streaming machine is differential-tested against the [[waitMerge]]
    * whole-part port, which itself is differential-tested against a direct
    * reference port.
    */
  private def waitOp(windowMs: Long, inner: Ast): Column = {
    val c = materialize(coalesce(trilean(inner), lit(false)), "waitin")
    val nk = pcols.length
    val src = df
      .select((pcols.map(col) ++ Seq(col(IDX), col(MS), col(c))): _*)
      .repartition(pcols.map(col): _*)
      .sortWithinPartitions((pcols :+ IDX).map(col): _*)
    val outSchema = org.apache.spark.sql.types.StructType(
      src.schema.fields.take(nk) ++ Seq(
        org.apache.spark.sql.types.StructField("_p_s",
          org.apache.spark.sql.types.LongType, nullable = false),
        org.apache.spark.sql.types.StructField("_p_e",
          org.apache.spark.sql.types.LongType, nullable = false)))
    val wMs = windowMs
    val evs = src.mapPartitions { it =>
      val buf = it.buffered
      new Iterator[Iterator[Row]] {
        def hasNext: Boolean = buf.hasNext
        def next(): Iterator[Row] = {
          val head = buf.head
          val key: IndexedSeq[Any] = (0 until nk).map(head.get)
          val m = new WaitMachine(wMs)
          var same = true
          while (buf.hasNext && same) {
            val r = buf.head
            var i = 0
            same = true
            while (same && i < nk) { same = r.get(i) == key(i); i += 1 }
            if (same) {
              buf.next()
              m.feed(r.getLong(nk), r.getLong(nk + 1), r.getBoolean(nk + 2))
            }
          }
          m.finish().iterator.map { case (s, e) => Row.fromSeq(key ++ Seq(s, e)) }
        }
      }.flatten
    }(org.apache.spark.sql.Encoders.row(outSchema))
    val out = fresh("wait")
    stampIntervals(evs, out)
    col(out)
  }

  // ------------------------------------------------------------ values

  /** Value layer: numeric / string / boolean scalar expressions. NULL == the
    * reference's Fail (missing data, failed coercion); Spark's 3-valued
    * logic reproduces the registry's Fail-absorbing `or` and Fail-propagating
    * `and`/arithmetic (FunctionRegistry.scala:278-324).
    */
  private def value(ast: Ast): Column = ast match {
    case Const(v: Double)  => lit(v)
    case Const(v: Boolean) => lit(v)
    case Const(v: String)  => lit(v)
    case Const(v)          => lit(v)

    case Ident(name) => col(name)

    case CastAst(inner, to) =>
      val t = to match {
        case "int32"   => "int"
        case "int64"   => "bigint"
        case "float64" => "double"
        case "boolean" => "boolean"
        case "string"  => "string"
      }
      value(inner).cast(t)

    case Call(fn, args) => ScalarFunctions.call(fn, args.map(value))

    case Agg(fn, arg, windowMs) => aggregate(fn, arg, windowMs)

    case r: ReducerCall => ScalarFunctions.reducer(r, value)

    // trilean node used in a value position (e.g. compared with a boolean)
    case other => trilean(other)
  }

  /** Windowed aggregates `sum/count/avg/lag(x, T)` (reference:
    * GroupPattern.scala:20-99, PreviousValue.scala:12-74).
    *
    * GroupPattern evicts at `t_i + W <= t`, so its window is the *open-left*
    * interval (t-W, t] — hence rangeBetween(-(W-1), 0) on millis. A NULL
    * input yields NULL output at that event but does not poison the window
    * (the reference skips Fail inputs entirely, GroupPattern.scala:63-94).
    *
    * `lag(x, T)` returns the last value in effect at or before `t - T`
    * (PreviousValue.scala:44-70); `lag(x)` is the T=1ms special case, i.e.
    * the previous event's value.
    */
  private def aggregate(fn: String, argAst: Ast, windowMs: Long): Column = {
    val x = materialize(value(argAst), "agg")
    fn match {
      case "lag" =>
        val c = fresh("lag")
        df = df.withColumn(c,
          last(col(x), ignoreNulls = true)
            .over(w.rangeBetween(Window.unboundedPreceding, -windowMs)))
        col(c)
      case _ =>
        val frame = w.rangeBetween(-(windowMs - 1), 0)
        val agg = fn match {
          case "sum"   => sum(col(x))
          case "count" => count(col(x)).cast("double")
          case "avg"   => avg(col(x))
        }
        val c = fresh(fn)
        df = df.withColumn(c, when(col(x).isNotNull, agg.over(frame)))
        col(c)
    }
  }

}

object PatternCompiler {

  /** Exact port of the reference's andThen queue merge
    * (AndThenPattern.scala:42-94) over run-length-compressed values.
    *
    * Runs are (startIdx, endIdx, isSucc) triples sorted by start. Emits the
    * success intervals only: union [min(s1,s2), max(e1+1, e2)] when a B-run
    * begins inside-or-adjacent-after an A-run; both sides are then rewound
    * past the emitted interval (consumption), reproducing the reference's
    * sequential matching.
    */
  def andThenMerge(
    aRuns: Seq[(Long, Long, Boolean)],
    bRuns: Seq[(Long, Long, Boolean)]
  ): Seq[(Long, Long)] = {
    // mutable queues with rewind semantics (PQueue.scala:77-94)
    final class Q(init: Seq[(Long, Long, Boolean)]) {
      private val buf = ArrayBuffer.from(init)
      def headOption: Option[(Long, Long, Boolean)] = buf.headOption
      def size: Int = buf.size
      def behead(): Unit = if (buf.nonEmpty) buf.remove(0)
      def rewindTo(newStart: Long): Unit = {
        while (buf.nonEmpty && buf.head._2 < newStart) buf.remove(0)
        if (buf.nonEmpty && buf.head._1 <= newStart)
          buf(0) = buf.head.copy(_1 = newStart)
      }
      def unwindWhile(p: ((Long, Long, Boolean)) => Boolean): Unit =
        while (buf.nonEmpty && p(buf.head)) buf.remove(0)
    }

    val first = new Q(aRuns)
    val second = new Q(bRuns)
    val out = ArrayBuffer.empty[(Long, Long)]
    var done = false
    while (!done) {
      (first.headOption, second.headOption) match {
        case (Some((s1, e1, v1)), Some((s2, e2, v2))) =>
          if (!v1) {
            first.behead()
            second.unwindWhile(_._2 <= s1)
          } else if (!v2) {
            if (first.size == 1) { first.rewindTo(e2 + 1); second.behead() }
            else second.behead()
          } else {
            if (s1 > e2) second.behead() // late B, skip
            else if (e1 + 1 < s2) first.behead() // gap, fail A
            else {
              val start = math.min(s1, s2)
              val end = math.max(e1 + 1, e2)
              out += ((start, end))
              first.rewindTo(end + 1)
              second.rewindTo(end + 1)
            }
          }
        case _ => done = true
      }
    }
    out.toSeq
  }

  /** Incremental form of [[andThenMerge]] for the streaming evaluator:
    * processes the CLOSED run prefixes of both queues and stops when either
    * empties, returning the emitted intervals plus the remaining (possibly
    * rewound) runs. `aOpen`/`bOpen` signal that an open tail run exists, so
    * the reference's `first.size` check counts it; with both false this is
    * exactly the batch merge. Mid-part the size-1 branch can never fire
    * (the open tail always makes size >= 2), which is what makes prefix
    * processing produce the same decisions as the eventual full-list merge.
    */
  /** Result of one incremental merge round: emitted intervals, remaining
    * closed runs per side, and the operations that must later apply to each
    * side's still-open tail run when it closes — a rewind floor (drop if
    * end < floor, else cut start to floor) and, for the second side, an
    * unwind bound (drop if end <= bound; unwind never cuts starts).
    */
  final case class MergeRound(
    emitted: List[(Long, Long)],
    remA: List[(Long, Long, Boolean)],
    remB: List[(Long, Long, Boolean)],
    aFloor: Long,
    bFloor: Long,
    bUnwind: Long)

  def andThenMergeInc(
    aRuns: List[(Long, Long, Boolean)],
    bRuns: List[(Long, Long, Boolean)],
    aOpen: Boolean,
    bOpen: Boolean
  ): MergeRound = {
    def rewindTo(q: List[(Long, Long, Boolean)], n: Long) =
      q.dropWhile(_._2 < n) match {
        case (s, e, v) :: t if s <= n => (n, e, v) :: t
        case other                    => other
      }
    val out = List.newBuilder[(Long, Long)]
    var a = aRuns
    var b = bRuns
    var aFloor = 0L
    var bFloor = 0L
    var bUnwind = 0L
    var done = false
    while (!done) (a, b) match {
      case (Nil, _) | (_, Nil) => done = true
      case ((s1, e1, v1) :: at, (s2, e2, v2) :: bt) =>
        if (!v1) {
          a = at
          b = b.dropWhile(_._2 <= s1)
          bUnwind = math.max(bUnwind, s1)
        } else if (!v2) {
          if (a.size + (if (aOpen) 1 else 0) == 1) {
            a = rewindTo(a, e2 + 1); aFloor = math.max(aFloor, e2 + 1); b = bt
          } else b = bt
        } else if (s1 > e2) b = bt
        else if (e1 + 1 < s2) a = at
        else {
          val start = math.min(s1, s2)
          val end = math.max(e1 + 1, e2)
          out += ((start, end))
          a = rewindTo(a, end + 1)
          b = rewindTo(b, end + 1)
          aFloor = math.max(aFloor, end + 1)
          bFloor = math.max(bFloor, end + 1)
        }
    }
    MergeRound(out.result(), a, b, aFloor, bFloor, bUnwind)
  }

  /** UDF wrapper: rows are structs (s, e, v) sorted by s. Retained as the
    * whole-part oracle for [[AndThenMachine]] (differential spec); the
    * production path streams events through the machine instead of
    * materializing per-part run arrays.
    */
  val andThenUdf = udf { (a: Seq[Row], b: Seq[Row]) =>
    val ar = a.map(r => (r.getLong(0), r.getLong(1), r.getBoolean(2)))
    val br = b.map(r => (r.getLong(0), r.getLong(1), r.getBoolean(2)))
    val maxIdx = math.max(ar.lastOption.map(_._2).getOrElse(0L),
      br.lastOption.map(_._2).getOrElse(0L))
    andThenMerge(ar, br).map { case (s, e) => (s, math.min(e, maxIdx)) }
  }

  /** Memory-bounded streaming form of [[andThenMerge]] for the batch
    * operator: feed one part's events in idx order with both operand
    * conditions, read the emitted success intervals from [[finish]].
    *
    * Identical output to `andThenMerge(rle(A), rle(B))` (asserted by the
    * randomized differential spec) — the machine RLE-compresses each side's
    * condition as events arrive and runs [[andThenMergeInc]] whenever a run
    * closes, so decided prefixes drain continuously instead of accumulating
    * into whole-part run arrays. Mid-part the incremental merge stops at the
    * first run needing the other side's open tail (prefix-stable decisions,
    * see [[andThenMergeInc]]); the deferred rewind floor / unwind bound of
    * each round applies to the open tail when it closes, exactly the
    * protocol the streaming cascade uses (StreamingPatterns.processChain).
    *
    * State: the open run per side (O(1)) plus the closed runs the merge
    * could not yet consume. After every round at least one side's closed
    * list is empty (the merge runs until a side drains), so pending state is
    * bounded by one side's condition flips across the other side's longest
    * run — orders of magnitude below per-event buffering, and heap-resident
    * (never a Tungsten row), so a pathological flapping condition degrades
    * to GC pressure instead of a single giant array row.
    */
  final class AndThenMachine {
    private final class Side {
      var runs = List.empty[(Long, Long, Boolean)]
      private val tail = ArrayBuffer.empty[(Long, Long, Boolean)]
      var hasOpen = false
      var openS = 0L
      var openV = false
      var floorCut = 0L
      var unwindAt = 0L
      def closedList: List[(Long, Long, Boolean)] =
        if (tail.isEmpty) runs else runs ++ tail
      /** Open/extend the tail run; returns true iff a run closed. */
      def push(v: Boolean, idx: Long): Boolean =
        if (hasOpen && openV == v) false
        else {
          val closed = hasOpen
          if (hasOpen) closeOpen(idx - 1)
          openS = idx; openV = v; hasOpen = true
          closed
        }
      /** Close the tail, applying the deferred rewind floor (drop if the run
        * ends below it, else cut its start) and unwind bound (drop if the
        * run ends at or below it) — mirrors the streaming `closeOpen`.
        */
      def closeOpen(endIdx: Long): Unit = if (hasOpen) {
        if (endIdx >= floorCut && endIdx > unwindAt)
          tail += ((math.max(openS, floorCut), endIdx, openV))
        hasOpen = false
      }
      def afterMerge(rem: List[(Long, Long, Boolean)], floor: Long, unwind: Long): Unit = {
        runs = rem
        tail.clear()
        floorCut = math.max(floorCut, floor)
        unwindAt = math.max(unwindAt, unwind)
      }
    }

    private val a = new Side
    private val b = new Side
    private val emitted = ArrayBuffer.empty[(Long, Long)]
    private var last = Long.MinValue

    def feed(idx: Long, ca: Boolean, cb: Boolean): Unit = {
      val c1 = a.push(ca, idx)
      val c2 = b.push(cb, idx)
      last = idx
      if (c1 || c2) mergeRound()
    }

    private def mergeRound(): Unit = {
      val r = andThenMergeInc(a.closedList, b.closedList, a.hasOpen, b.hasOpen)
      emitted ++= r.emitted
      a.afterMerge(r.remA, r.aFloor, 0L)
      b.afterMerge(r.remB, r.bFloor, r.bUnwind)
    }

    /** Close both sides, run the final (fully closed) merge, and return the
      * success intervals with ends clamped to the last fed idx (the merge
      * can extend an interval one slot past the final event, like the
      * whole-part UDF's maxIdx clamp).
      */
    def finish(): Seq[(Long, Long)] = {
      if (last == Long.MinValue) return Seq.empty
      a.closeOpen(last)
      b.closeOpen(last)
      mergeRound()
      emitted.map { case (s, e) => (s, math.min(e, last)) }.toSeq
    }
  }

  /** Exact port of the reference wait state machine over one part's events
    * (aggregators/WaitPattern.scala:29-89 — WaitAccumState.updated — called
    * once per inner RLE run with that run's (idx, time) map, exactly as
    * AccumPattern.processQueue drives it; state resets per part like all
    * pattern state). Returns the emitted SUCCESS idx intervals.
    *
    * Faithfulness notes, mirrored from the reference source:
    *  - a fail run shifts the accumulation window: `start`/`end` move left
    *    by the window for lastFail / current-fail respectively;
    *  - the windowQueue clean keeps one element before `start`
    *    (`length > 1 && wq(1) < start`), so an emitted interval can begin
    *    one event before the window;
    *  - `cleanedWindowQueue.lastOption` in the reference reads the queue
    *    AFTER takeWhileFromQueue mutated it, i.e. the REMAINING queue.
    */
  def waitMerge(windowMs: Long,
                events: Seq[(Long, Long, Boolean)]): Seq[(Long, Long)] = {
    // RLE the per-event cond into runs (SimplePattern unites adjacent equal
    // results, so the inner queue holds one IdxValue per cond run)
    val runs = ArrayBuffer.empty[(Boolean, ArrayBuffer[(Long, Long)])]
    events.foreach { case (idx, ms, cond) =>
      if (runs.nonEmpty && runs.last._1 == cond) runs.last._2 += ((idx, ms))
      else runs += ((cond, ArrayBuffer((idx, ms))))
    }
    var st = WaitSt.empty
    val out = ArrayBuffer.empty[(Long, Long)]
    runs.foreach { case (succ, times) =>
      val (st2, emitted) = waitStep(st, windowMs, succ, times.toSeq)
      st = st2
      emitted.foreach { case (s, e, v) => if (v) out += ((s, e)) }
    }
    out.toSeq
  }

  /** Carried wait-machine state (WaitAccumState's fields). */
  final case class WaitSt(windowQueue: Vector[(Long, Long)],
                          lastFail: Boolean, lastTime: (Long, Long))
  object WaitSt { val empty: WaitSt = WaitSt(Vector.empty, lastFail = false, (0L, 0L)) }

  /** One WaitAccumState.updated call (reference WaitPattern.scala:41-87):
    * consume a closed inner run (`succ` over `times` = that run's (idx, ms)
    * pairs) and emit at most one (startIdx, endIdx, isSucc) interval.
    * Shared by the batch [[waitMerge]] loop and the streaming evaluator,
    * which feeds runs as they close.
    */
  def waitStep(st: WaitSt, windowMs: Long, succ: Boolean,
               times: Seq[(Long, Long)]): (WaitSt, Option[(Long, Long, Boolean)]) = {
    if (times.isEmpty) return (st, None)
    val start = if (st.lastFail) times.head._2 - windowMs else times.head._2
    val end = if (!succ) times.last._2 - windowMs else times.last._2
    var wq = st.windowQueue ++ times
    while (wq.length > 1 && wq(1)._2 < start) wq = wq.tail
    val (outputs, remaining) = wq.span(_._2 <= end)
    val waitStart =
      if (st.lastTime._2 != 0L && outputs.nonEmpty &&
        outputs.head._2 + windowMs <= outputs.last._2) outputs.headOption
      else Some(remaining.lastOption.getOrElse(st.lastTime))
    val waitEnd = outputs.lastOption
    val emitted = for {
      s <- waitStart; e <- waitEnd; if s._1 <= e._1
    } yield (s._1, e._1, succ)
    (WaitSt(remaining, lastFail = !succ, times.last), emitted)
  }

  /** UDF wrapper: rows are structs (idx, ms, cond) sorted by idx. Retained as
    * the whole-part oracle for the streaming [[WaitMachine]] (differential
    * spec); the production path no longer materializes per-event arrays.
    */
  val waitUdf = udf { (windowMs: Long, evs: Seq[Row]) =>
    waitMerge(windowMs,
      evs.map(r => (r.getLong(0), r.getLong(1), r.getBoolean(2))))
  }

  /** Memory-bounded streaming form of [[waitMerge]]: feed events of one
    * (key, gap-run) group in (idx, ms) order, read the emitted success
    * intervals from [[finish]]. Produces bit-identical output to
    * `waitMerge(w, events)` (asserted by the randomized differential spec)
    * while holding only the reference machine's own state:
    * the windowQueue — which [[waitStep]] caps at the events within
    * `windowMs` of a fail-run frontier (`span(_.ms <= lastMs - w)` leaves
    * at most a window's worth) — plus O(1) per-run bookkeeping. Succ runs
    * buffer nothing at all: their step needs only the cleaned queue head and
    * the run's first/last event, and leaves an empty queue behind.
    *
    * Derivation from [[waitStep]] (each run `(succ, times)`):
    *  - `start` depends only on `times.head` → known when the run opens, so
    *    the carried-queue clean (`while len>1 && q(1).ms < start`) runs
    *    eagerly; run events never satisfy `ms < start`, so cleaning the
    *    carried queue alone is equivalent to cleaning `carried ++ times`.
    *  - succ runs: `end = times.last.ms` ≥ every queued ms, so
    *    `outputs` = everything and `remaining` = ∅; only `outputs.head`
    *    (cleaned head or run-first) and `outputs.last` (= run-last) matter.
    *  - fail runs: `end = times.last.ms - w`; evicting the queue front at
    *    `ms <= current - w` as events stream in reaches exactly the final
    *    span point at run close, and the first/last evicted elements are
    *    `outputs.head`/`outputs.last`.
    */
  final class WaitMachine(w: Long) {
    private val dq = scala.collection.mutable.ArrayDeque.empty[(Long, Long)]
    private var lastFail = false
    private var lastTime: (Long, Long) = (0L, 0L)
    private var runOpen = false
    private var runCond = false
    private var runFirst: (Long, Long) = null
    private var runLast: (Long, Long) = null
    private var firstOut: (Long, Long) = null // outputs.head
    private var lastOut: (Long, Long) = null  // outputs.last
    private val emitted = ArrayBuffer.empty[(Long, Long)]

    def feed(idx: Long, ms: Long, cond: Boolean): Unit = {
      if (runOpen && cond != runCond) closeRun()
      if (!runOpen) openRun(cond, idx, ms)
      runLast = (idx, ms)
      if (!runCond) {
        dq.append((idx, ms))
        while (dq.nonEmpty && dq.head._2 <= ms - w) {
          val e = dq.removeHead()
          if (firstOut == null) firstOut = e
          lastOut = e
        }
      }
    }

    private def openRun(cond: Boolean, idx: Long, ms: Long): Unit = {
      runOpen = true; runCond = cond
      runFirst = (idx, ms); runLast = runFirst
      firstOut = null; lastOut = null
      val start = if (lastFail) ms - w else ms
      while (dq.length > 1 && dq(1)._2 < start) dq.removeHead()
      if (cond) firstOut = if (dq.nonEmpty) dq.head else runFirst
    }

    private def closeRun(): Unit = {
      if (runCond) {
        // outputs = whole queue ++ run events; remaining = empty
        lastOut = runLast
        val s =
          if (lastTime._2 != 0L && firstOut._2 + w <= lastOut._2) firstOut
          else lastTime // remaining.lastOption.getOrElse(lastTime), remaining = ∅
        if (s._1 <= lastOut._1) emitted += ((s._1, lastOut._1))
        dq.clear()
      } else {
        // final span drain at end = lastMs - w (same threshold the last
        // feed() used, so this is a no-op unless the run had one event)
        val end = runLast._2 - w
        while (dq.nonEmpty && dq.head._2 <= end) {
          val e = dq.removeHead()
          if (firstOut == null) firstOut = e
          lastOut = e
        }
        // fail intervals are never emitted (waitMerge keeps v=true only)
      }
      lastFail = !runCond
      lastTime = runLast
      runOpen = false
    }

    def finish(): Seq[(Long, Long)] = {
      if (runOpen) closeRun()
      emitted.toSeq
    }
  }
}
