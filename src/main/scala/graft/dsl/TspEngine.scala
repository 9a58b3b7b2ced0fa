package graft.dsl

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Public API of the pattern engine — the Spark analogue of the reference's
  * job pipeline (reference: streaming/.../PatternsSearchJob.scala:89-160):
  * parse -> compile to columns -> per-key windowed evaluation -> segments ->
  * incident sessionization.
  */
object TspEngine {

  /** Reference: core/.../RawPattern.scala — id + DSL source + per-pattern
    * subunit and metadata, both carried verbatim into every incident.
    */
  final case class RawPattern(id: String, sourceCode: String, subunit: Int = 0,
                              metadata: Map[String, String] = Map.empty)

  /** Incidents for one pattern: `(keys..., seg_from, seg_to, from_ms, to_ms,
    * n_events)`, one row per merged incident.
    */
  def incidents(df: DataFrame, pattern: String, cfg: PatternConfig): DataFrame = {
    val ast = Parser.parse(pattern, cfg.toleranceFraction) match {
      case Right(a)  => a
      case Left(err) => throw err
    }
    new PatternCompiler(df, cfg).incidents(ast)
  }

  /** All patterns over one source frame; output gains `pattern_id`.
    * Each pattern compiles to its own column pipeline over the same scan;
    * Spark reuses the exchange because every pipeline shuffles on the same
    * keys.
    */
  def incidentsAll(df: DataFrame, patterns: Seq[RawPattern], cfg: PatternConfig): DataFrame =
    patterns
      .map(p => incidents(df, p.sourceCode, cfg).transform(tagIncidents(p)))
      .reduce(_ unionByName _)

  /** Per-pattern incident attributes (reference ToIncidentsMapper.scala:9-33:
    * pattern id, RawPattern.subunit, RawPattern.metadata on every incident).
    */
  private def tagIncidents(p: RawPattern)(incidents: DataFrame): DataFrame =
    incidents
      .withColumn("pattern_id", lit(p.id))
      .withColumn("subunit", lit(p.subunit))
      .withColumn("meta", typedLit(p.metadata))

  /** All patterns in ONE pass over the events: a single compiler accumulates
    * every pattern's success column on one frame (one scan, one window
    * exchange + sort shared by all patterns — the reference likewise
    * evaluates the whole pattern set per chunk,
    * ProcessorCombinator.scala:16-29), which is cached once; per-pattern
    * incident extraction then aggregates the compact cached frame. At fleet
    * scale this turns N scans of the events table into one.
    */
  def incidentsAllShared(df: DataFrame, patterns: Seq[RawPattern], cfg: PatternConfig): DataFrame = {
    val compiler = new PatternCompiler(df, cfg)
    val compiled = patterns.map { p =>
      val ast = Parser.parse(p.sourceCode, cfg.toleranceFraction) match {
        case Right(a)  => a
        case Left(err) => throw err
      }
      p -> compiler.compile(ast)._2
    }
    // localCheckpoint rather than persist: each per-pattern extraction
    // branch would otherwise re-run Catalyst over the full stacked-window
    // lineage before hitting the cache — at fleet pattern counts that
    // planning is quadratic in patterns. Checkpointing truncates the
    // lineage so every branch plans against a flat scan of the compact
    // evaluated frame. (Tradeoff: blocks are not recomputable on executor
    // loss; acceptable for a deterministic batch job, and the frame is
    // one row per event with only key/ts/success columns.)
    val cached = compiler.currentFrame.localCheckpoint()
    compiled
      .map { case (p, res) =>
        compiler.extractIncidents(cached, res).transform(tagIncidents(p))
      }
      .reduce(_ unionByName _)
  }

  /** Compile a pattern for the streaming evaluator: the scalar condition as
    * a window-free Column plus the timer duration (for a top-level
    * `X for T`). Window-dependent constructs (aggregates, andThen, wait,
    * for-ranges) are not stream-compilable with per-event columns and are
    * rejected with a clear error — they belong to the stateful evaluator's
    * roadmap, not to silent wrong answers.
    */
  def streamingCondition(pattern: String): (org.apache.spark.sql.Column, Long) = {
    import org.apache.spark.sql.functions.{coalesce, lit}
    val ast = Parser.parse(pattern) match {
      case Right(a)  => a
      case Left(err) => throw err
    }
    def scalar(a: Ast): org.apache.spark.sql.Column = a match {
      case Const(v)           => lit(v)
      case Ident(n)           => org.apache.spark.sql.functions.col(n)
      case CastAst(inner, to) =>
        val t = to match {
          case "int32" => "int"; case "int64" => "bigint"
          case "float64" => "double"; case "boolean" => "boolean"
          case "string" => "string"
        }
        scalar(inner).cast(t)
      case Call(fn, args)  => ScalarFunctions.call(fn, args.map(scalar))
      case r: ReducerCall  => ScalarFunctions.reducer(r, scalar)
      case AssertAst(b)    => coalesce(scalar(b), lit(false))
      case UntilAst(c, b)  => scalar(c) && coalesce(!scalar(b), lit(false))
      case other => throw Parser.ParseError(
        s"construct not supported in the streaming evaluator: ${other.productPrefix}", 0)
    }
    ast match {
      case TimerAst(cond, _, maxMs) => (scalar(cond), maxMs)
      case other                    => (scalar(other), 0L)
    }
  }

  /** Streaming incidents for a DSL pattern over a watermarked frame.
    * Window-free conditions (plus a top-level timer) compile to a Column
    * and take the fast path; patterns with trailing aggregates / lag /
    * nested timers / `for W <range>` truth statistics run through the
    * incremental per-key evaluator (graft.dsl.StreamingEval); a top-level
    * left-associated `A1 andThen ... andThen An` chain runs the exact batch
    * queue-merge recursion as an incremental cascade over closed condition
    * runs, and a top-level `wait(T, X)` runs the exact WaitAccumState
    * machine over closing inner runs. Arbitrary *nesting* of the two
    * forward-looking operators (right-nested parenthesized `andThen`,
    * `wait` as an `andThen` operand, `andThen` under `wait`) runs through
    * the recursive tree evaluator
    * ([[graft.streaming.StreamingPatterns.incidentsTree]]) — the streaming
    * analogue of the reference's recursive pattern compilation
    * (ASTPatternGenerator.scala:47-200). Only a forward-looking operator
    * under a *scalar* operator (e.g. `not (A andThen B)`,
    * `wait(T, X) + 1`) stays unsupported — there the operator's
    * boolean output re-enters value arithmetic, which the reference
    * rejects at type level too.
    */
  def incidentsStream(df: DataFrame, pattern: String, cfg: PatternConfig,
      forceFinalizeAcc: Option[org.apache.spark.util.LongAccumulator] = None,
      maxUndecidedEvents: Int = 1 << 20):
      org.apache.spark.sql.Dataset[graft.streaming.StreamingPatterns.StreamIncident] = {
    val ast = Parser.parse(pattern, cfg.toleranceFraction) match {
      case Right(a)  => a
      case Left(err) => throw err
    }
    val sCfg = graft.streaming.StreamingPatterns.StreamConfig(
      eventsMaxGapMs = cfg.eventsMaxGapMs,
      sessionGapMs = cfg.sessionGapMs,
      minDurationMs = 0L,
      maxUndecidedEvents = maxUndecidedEvents,
      forceFinalizeAcc = forceFinalizeAcc)
    def fieldSplit: (Vector[String], Vector[String]) = {
      val fs = fields(ast)
      val strF = fs.filter(f => df.schema.fields.exists(sf =>
        sf.name == f && sf.dataType == org.apache.spark.sql.types.StringType))
        .toVector.sorted
      ((fs -- strF).toVector.sorted, strF)
    }
    // does the AST contain a forward-looking operator anywhere below?
    def hasForward(a: Ast): Boolean = a match {
      case _: AndThenAst | _: WaitAst => true
      case other => other.productIterator.exists {
        case c: Ast    => hasForward(c)
        case s: Seq[_] => s.exists { case c: Ast => hasForward(c); case _ => false }
        case _         => false
      }
    }
    def toTree(a: Ast, numF: Vector[String], strF: Vector[String])
        : graft.streaming.StreamingPatterns.StreamTree = {
      import graft.streaming.StreamingPatterns._
      a match {
        case AndThenAst(l, r)  => SAndThen(toTree(l, numF, strF), toTree(r, numF, strF))
        case WaitAst(w, inner) => SWait(w, toTree(inner, numF, strF))
        case leaf => SLeaf(
          StreamingEval.compile(leaf, numF, strF, stripTimer = false))
      }
    }
    ast match {
      case at: AndThenAst =>
        // the parser builds andThen left-deep, so a chain flattens along
        // the left spine: A1 andThen A2 andThen ... andThen An. Each level
        // of the streaming cascade replays the same queue-merge recursion
        // the batch compiler applies to the nested tree.
        def spine(x: Ast): List[Ast] = x match {
          case AndThenAst(l, r) => spine(l) :+ r
          case other            => List(other)
        }
        val operands = spine(at)
        val (numF, strF) = fieldSplit
        if (operands.exists(hasForward)) {
          // a right-nested andThen / wait operand: the general tree path
          graft.streaming.StreamingPatterns.incidentsTree(
            df, cfg.keys, cfg.tsCol, toTree(at, numF, strF), sCfg)
        } else {
          // operands keep their timers as nested ops
          val progs = operands.map(o =>
            StreamingEval.compile(o, numF, strF, stripTimer = false))
          graft.streaming.StreamingPatterns.incidentsChain(
            df, cfg.keys, cfg.tsCol, progs, sCfg)
        }
      case WaitAst(windowMs, inner) =>
        val (numF, strF) = fieldSplit
        if (hasForward(inner)) {
          graft.streaming.StreamingPatterns.incidentsTree(
            df, cfg.keys, cfg.tsCol,
            graft.streaming.StreamingPatterns.SWait(
              windowMs, toTree(inner, numF, strF)), sCfg)
        } else {
          val p = StreamingEval.compile(inner, numF, strF, stripTimer = false)
          graft.streaming.StreamingPatterns.incidentsWait(
            df, cfg.keys, cfg.tsCol, windowMs, p, sCfg)
        }
      case _ =>
        val scalarPath =
          try Some(streamingCondition(pattern))
          catch {
            case e: Parser.ParseError
              if e.getMessage.contains("not supported in the streaming evaluator") => None
          }
        scalarPath match {
          case Some((cond, timerMs)) =>
            graft.streaming.StreamingPatterns.incidents(df, cfg.keys, cfg.tsCol,
              cond, sCfg.copy(minDurationMs = timerMs))
          case None =>
            val (numF, strF) = fieldSplit
            // throws the same clear error for wait / nested andThen
            val program = StreamingEval.compile(ast, numF, strF)
            graft.streaming.StreamingPatterns.incidentsEval(df, cfg.keys,
              cfg.tsCol, program, sCfg.copy(minDurationMs = program.timerMs))
        }
    }
  }

  /** [[incidentsStream]] over a NARROW (key-value) source — the
    * reference's Kafka narrow corpus shape (SimpleCasesTest narrow confs:
    * NarrowDataUnfolding inside the stream). The unfold accumulator rides
    * inside the evaluator's own state
    * ([[graft.streaming.StreamingUnfold]]); dispatch mirrors
    * [[incidentsStream]] minus the scalar Column fast path (a Column
    * cannot evaluate against a narrow schema — the eval program covers
    * scalar conditions too).
    *
    * @param sensors the configured sensor list (the batch `sensors`
    *   param): every row of a listed sensor is a wide evaluation point,
    *   referenced by the pattern or not.
    */
  def incidentsStreamNarrow(df: DataFrame, pattern: String, cfg: PatternConfig,
      narrow: graft.streaming.StreamingUnfold.NarrowStreamConfig,
      sensors: Seq[String],
      maxUndecidedEvents: Int = 1 << 20):
      org.apache.spark.sql.Dataset[graft.streaming.StreamingPatterns.StreamIncident] = {
    import graft.streaming.{StreamingPatterns => SP, StreamingUnfold => SU}
    val ast = Parser.parse(pattern, cfg.toleranceFraction) match {
      case Right(a)  => a
      case Left(err) => throw err
    }
    val sCfg = SP.StreamConfig(
      eventsMaxGapMs = cfg.eventsMaxGapMs,
      sessionGapMs = cfg.sessionGapMs,
      minDurationMs = 0L,
      maxUndecidedEvents = maxUndecidedEvents)
    val (numF, strF) = SU.fieldSplit(df, fields(ast), narrow)
    def hasForward(a: Ast): Boolean = a match {
      case _: AndThenAst | _: WaitAst => true
      case other => other.productIterator.exists {
        case c: Ast    => hasForward(c)
        case s: Seq[_] => s.exists { case c: Ast => hasForward(c); case _ => false }
        case _         => false
      }
    }
    def toTree(a: Ast): SP.StreamTree = a match {
      case AndThenAst(l, r)  => SP.SAndThen(toTree(l), toTree(r))
      case WaitAst(w, inner) => SP.SWait(w, toTree(inner))
      case leaf => SP.SLeaf(StreamingEval.compile(leaf, numF, strF, stripTimer = false))
    }
    ast match {
      case at: AndThenAst =>
        def spine(x: Ast): List[Ast] = x match {
          case AndThenAst(l, r) => spine(l) :+ r
          case other            => List(other)
        }
        val operands = spine(at)
        if (operands.exists(hasForward))
          SU.incidentsTreeNarrow(df, cfg.keys, cfg.tsCol, narrow, sensors,
            toTree(at), sCfg)
        else
          SU.incidentsChainNarrow(df, cfg.keys, cfg.tsCol, narrow, sensors,
            operands.map(o => StreamingEval.compile(o, numF, strF, stripTimer = false)),
            sCfg)
      case WaitAst(windowMs, inner) =>
        if (hasForward(inner))
          SU.incidentsTreeNarrow(df, cfg.keys, cfg.tsCol, narrow, sensors,
            SP.SWait(windowMs, toTree(inner)), sCfg)
        else
          SU.incidentsWaitNarrow(df, cfg.keys, cfg.tsCol, narrow, sensors,
            windowMs, StreamingEval.compile(inner, numF, strF, stripTimer = false),
            sCfg)
      case _ =>
        val program = StreamingEval.compile(ast, numF, strF)
        SU.incidentsEvalNarrow(df, cfg.keys, cfg.tsCol, narrow, sensors,
          program, sCfg.copy(minDurationMs = program.timerMs))
    }
  }

  /** [[incidentsStream]] over a WIDE SPARSE source with in-stream timed
    * forward fill — streaming `WideDataFilling`
    * ([[graft.operators.PatternOps.forwardFill]] run as evaluator state,
    * same wrapper architecture as [[incidentsStreamNarrow]]). `fillCols`
    * are the filled columns (the reference fills the configured sensor
    * set; unfilled referenced columns read their row value or missing).
    */
  def incidentsStreamFilled(df: DataFrame, pattern: String, cfg: PatternConfig,
      fillCols: Set[String], timeoutMs: Option[Long],
      maxUndecidedEvents: Int = 1 << 20):
      org.apache.spark.sql.Dataset[graft.streaming.StreamingPatterns.StreamIncident] = {
    import graft.streaming.{StreamingPatterns => SP, StreamingUnfold => SU}
    val ast = Parser.parse(pattern, cfg.toleranceFraction) match {
      case Right(a)  => a
      case Left(err) => throw err
    }
    val sCfg = SP.StreamConfig(
      eventsMaxGapMs = cfg.eventsMaxGapMs,
      sessionGapMs = cfg.sessionGapMs,
      minDurationMs = 0L,
      maxUndecidedEvents = maxUndecidedEvents)
    val fs = fields(ast)
    val strF = fs.filter(f => df.schema.fields.exists(sf =>
      sf.name == f && sf.dataType == org.apache.spark.sql.types.StringType))
      .toVector.sorted
    val numF = (fs -- strF).toVector.sorted
    def hasForward(a: Ast): Boolean = a match {
      case _: AndThenAst | _: WaitAst => true
      case other => other.productIterator.exists {
        case c: Ast    => hasForward(c)
        case s: Seq[_] => s.exists { case c: Ast => hasForward(c); case _ => false }
        case _         => false
      }
    }
    def toTree(a: Ast): SP.StreamTree = a match {
      case AndThenAst(l, r)  => SP.SAndThen(toTree(l), toTree(r))
      case WaitAst(w, inner) => SP.SWait(w, toTree(inner))
      case leaf => SP.SLeaf(StreamingEval.compile(leaf, numF, strF, stripTimer = false))
    }
    ast match {
      case at: AndThenAst =>
        def spine(x: Ast): List[Ast] = x match {
          case AndThenAst(l, r) => spine(l) :+ r
          case other            => List(other)
        }
        val operands = spine(at)
        if (operands.exists(hasForward))
          SU.incidentsTreeFilled(df, cfg.keys, cfg.tsCol, fillCols, timeoutMs,
            toTree(at), sCfg)
        else
          SU.incidentsChainFilled(df, cfg.keys, cfg.tsCol, fillCols, timeoutMs,
            operands.map(o => StreamingEval.compile(o, numF, strF, stripTimer = false)),
            sCfg)
      case WaitAst(windowMs, inner) =>
        if (hasForward(inner))
          SU.incidentsTreeFilled(df, cfg.keys, cfg.tsCol, fillCols, timeoutMs,
            SP.SWait(windowMs, toTree(inner)), sCfg)
        else
          SU.incidentsWaitFilled(df, cfg.keys, cfg.tsCol, fillCols, timeoutMs,
            windowMs, StreamingEval.compile(inner, numF, strF, stripTimer = false),
            sCfg)
      case _ =>
        val program = StreamingEval.compile(ast, numF, strF)
        SU.incidentsEvalFilled(df, cfg.keys, cfg.tsCol, fillCols, timeoutMs,
          program, sCfg.copy(minDurationMs = program.timerMs))
    }
  }

  /** Parse-only validation — the `/patterns/validate` endpoint analogue
    * (reference: dsl/.../PatternsValidator.scala:9-37): for each pattern,
    * either the AST's referenced fields or a parse error.
    */
  def validate(patterns: Seq[String]): Seq[Either[String, Set[String]]] =
    patterns.map { p =>
      Parser.parse(p) match {
        case Right(ast) => Right(fields(ast))
        case Left(err)  => Left(err.getMessage)
      }
    }

  /** Referenced fields — PatternMetadata.fields (reference:
    * dsl/.../PatternMetadata.scala:4-18). Drives source-side column pruning.
    */
  def fields(ast: Ast): Set[String] = ast match {
    case Ident(n)                  => Set(n)
    case Const(_)                  => Set.empty
    case Call(_, args)             => args.flatMap(fields).toSet
    case ReducerCall(_, _, args)   => args.flatMap(fields).toSet
    case Agg(_, a, _)              => fields(a)
    case CastAst(a, _)             => fields(a)
    case AssertAst(a)              => fields(a)
    case TimerAst(a, _, _)         => fields(a)
    case AndThenAst(a, b)          => fields(a) ++ fields(b)
    case WaitAst(_, a)             => fields(a)
    case UntilAst(a, b)            => fields(a) ++ fields(b)
    case ForWithIntervalAst(a, _, _, _) => fields(a)
  }

  /** Total window time the pattern needs — PatternMetadata.sumWindowsMs,
    * used for state sizing (reference: PatternMetadata.scala:4-18).
    */
  def sumWindowsMs(ast: Ast): Long = ast match {
    case Agg(_, a, w)              => sumWindowsMs(a) + w
    case TimerAst(a, _, mx)        => sumWindowsMs(a) + mx
    case WaitAst(w, a)             => sumWindowsMs(a) + w
    case ForWithIntervalAst(a, _, w, _) => sumWindowsMs(a) + w
    case Call(_, args)             => args.map(sumWindowsMs).sum
    case ReducerCall(_, _, args)   => args.map(sumWindowsMs).sum
    case CastAst(a, _)             => sumWindowsMs(a)
    case AssertAst(a)              => sumWindowsMs(a)
    case AndThenAst(a, b)          => sumWindowsMs(a) + sumWindowsMs(b)
    case UntilAst(a, b)            => sumWindowsMs(a) + sumWindowsMs(b)
    case _                         => 0L
  }
}
