package graft.dsl

import scala.collection.mutable.ArrayBuffer

/** Incremental per-key evaluation of the backward-looking DSL subset for
  * the streaming engine.
  *
  * The batch compiler expresses windowed constructs as window functions,
  * which a streaming frame cannot run; here each windowed node (trailing
  * aggregates `sum/count/avg/lag(x, T)` and `X for W <range>` truth
  * statistics) carries a bounded deque of its recent inputs in the
  * flatMapGroupsWithState state, updated once per event — the Spark-native
  * analogue of the reference's per-key accumulator state machines
  * (GroupPattern.scala:20-99, PreviousValue.scala:12-74,
  * WindowStatistic.scala:45-104). Every supported construct depends only on
  * events at or before the current one, so each event's truth value is
  * final on arrival and flows straight into the run/session machine.
  *
  * Forward-looking operators at the top level (left-associated
  * `A1 andThen ... andThen An` chains, `wait(T, X)`) are handled by
  * dedicated stateful pipelines
  * ([[graft.streaming.StreamingPatterns.incidentsChain]] /
  * `incidentsWait`) that consume this evaluator for their operands; only
  * *nested* occurrences (`wait` under another operator, a right-nested
  * parenthesized `andThen`, `andThen` under another operator) are rejected
  * here — their consume/rewind semantics need cross-run queues that decide
  * retroactively at arbitrary depth.
  *
  * Numeric missing data is NaN (the reference's decode convention), which
  * under Scala arithmetic/comparison semantics reproduces the batch
  * engine's NULL-collapsing comparisons for free. One documented
  * divergence: a *computed* NaN (e.g. 0.0/0.0) is indistinguishable from
  * missing here, while the batch column pipeline keeps NULL and NaN as
  * separate values inside `count`.
  */
object StreamingEval {

  /** One deque entry: (eventMs, numericValue, stringValue). The string
    * slot is null except for `lag` over a string-typed field, where the
    * lagged value itself is the string (`lag(status) = 'FAILURE'` must
    * compare the real string, not a NaN-coerced double); the numeric slot
    * is NaN there. One shared tuple shape keeps the
    * flatMapGroupsWithState state encoders identical across all op kinds.
    */
  type Ent = (Long, Double, String)

  sealed trait OpSpec extends Serializable {
    def id: Int
    def node: Ast
    def windowMs: Long
  }
  final case class AggSpec(id: Int, fn: String, arg: Ast, windowMs: Long,
                           node: Ast) extends OpSpec
  final case class ForSpec(id: Int, inner: Ast, exactly: Boolean,
                           windowMs: Long, interval: IntervalSpec,
                           node: Ast) extends OpSpec

  /** Nested `X for T` timer (non-top-level): success once the current
    * cond-run has lasted `windowMs` (TimerPattern.scala:63-109; same rule
    * the batch `timer()` column encodes). State: the current run's start.
    */
  final case class TimerSpec(id: Int, inner: Ast, windowMs: Long,
                             node: Ast) extends OpSpec

  /** A compiled streaming pattern: the (timer-stripped) condition AST, its
    * windowed ops in children-first order, and the top-level timer window.
    */
  final case class Program(
    cond: Ast,
    ops: Vector[OpSpec],
    opOf: Map[Ast, Int],
    timerMs: Long,
    numFields: Vector[String],
    strFields: Vector[String]) extends Serializable {

    def numIdx(n: String): Int = numFields.indexOf(n)

    /** Index into `strs` when `a` is a string-typed field reference (the
      * string-lag deque mode), -1 otherwise.
      */
    private def strArgIdx(a: Ast): Int = a match {
      case Ident(n) => strFields.indexOf(n)
      case _        => -1
    }

    /** Evaluate one event; `deques` is the per-key op state (mutated in
      * place — the caller persists it back into the group state).
      */
    def eval(deques: Array[ArrayBuffer[Ent]], t: Long,
             nums: Array[Double], strs: Array[String]): Boolean = {
      val opVals = new Array[Any](ops.size)
      val opBools = new Array[Boolean](ops.size)

      def anyOf(a: Ast): Any = a match {
        case Const(v)   => v
        case Ident(n)   =>
          val i = numFields.indexOf(n)
          if (i >= 0) nums(i)
          else {
            val j = strFields.indexOf(n)
            if (j >= 0) strs(j) else Double.NaN
          }
        case agg: Agg                => opVals(opOf(agg))
        case f: ForWithIntervalAst   => opBools(opOf(f))
        case tm: TimerAst            => opBools(opOf(tm))
        case CastAst(inner, to) =>
          val v = anyOf(inner)
          to match {
            case "int32" | "int64" =>
              val d = toD(v); if (d.isNaN) d else d.toLong.toDouble
            case "float64" => toD(v)
            case "boolean" =>
              // missing (NaN) casts to false, matching the batch engine's
              // cast(NULL as boolean) -> NULL -> collapsed false; a
              // *computed* NaN also lands here (documented divergence above)
              val d = toD(v); !d.isNaN && d != 0.0
            case "string"  => if (v == null) null else v.toString
          }
        case r: ReducerCall => reduce(r)
        case AssertAst(b)   => toB(anyOf(b))
        case UntilAst(c, b) => toB(anyOf(c)) && !toB(anyOf(b))
        case Call(fn, args) => callFn(fn, args)
        case other => throw Parser.ParseError(
          s"construct not supported in the streaming evaluator: ${other.productPrefix}", 0)
      }

      def callFn(fn: String, args: Seq[Ast]): Any = fn match {
        case "and" => toB(anyOf(args(0))) && toB(anyOf(args(1)))
        case "or"  => toB(anyOf(args(0))) || toB(anyOf(args(1)))
        case "xor" | "neq" => toB(anyOf(args(0))) != toB(anyOf(args(1)))
        case "not" => !toB(anyOf(args(0)))
        case "eq" | "ne" =>
          val (l, r) = (anyOf(args(0)), anyOf(args(1)))
          // both strings: string equality; mixed string/number: Spark casts
          // the string side to double, so compare numerically (toD parses)
          val isStr = l.isInstanceOf[String] && r.isInstanceOf[String]
          val same =
            if (isStr) l == r
            else toD(l) == toD(r) // NaN == x is false, matching the batch coalesce
          if (fn == "eq") same
          else if (isStr) l != r
          else toD(l) != toD(r) // NaN != x is true, matching the batch `ne`
        case "lt" => toD(anyOf(args(0))) < toD(anyOf(args(1)))
        case "le" => toD(anyOf(args(0))) <= toD(anyOf(args(1)))
        case "gt" => toD(anyOf(args(0))) > toD(anyOf(args(1)))
        case "ge" => toD(anyOf(args(0))) >= toD(anyOf(args(1)))
        case "add" => toD(anyOf(args(0))) + toD(anyOf(args(1)))
        case "sub" => toD(anyOf(args(0))) - toD(anyOf(args(1)))
        case "mul" => toD(anyOf(args(0))) * toD(anyOf(args(1)))
        case "div" => toD(anyOf(args(0))) / toD(anyOf(args(1)))
        case "abs" => math.abs(toD(anyOf(args(0))))
        case "sin" => math.sin(toD(anyOf(args(0))))
        case "cos" => math.cos(toD(anyOf(args(0))))
        case "tan" | "tg" => math.tan(toD(anyOf(args(0))))
        case "cot" | "ctg" => 1.0 / math.tan(toD(anyOf(args(0))))
        case "sind" => math.sin(math.toRadians(toD(anyOf(args(0)))))
        case "cosd" => math.cos(math.toRadians(toD(anyOf(args(0)))))
        case "tand" | "tgd" => math.tan(math.toRadians(toD(anyOf(args(0)))))
        case "cotd" | "ctgd" => 1.0 / math.tan(math.toRadians(toD(anyOf(args(0)))))
        case "exp" => math.exp(toD(anyOf(args(0))))
        case "ln" | "log" => math.log(toD(anyOf(args(0))))
        case "sigmoid" => 1.0 / (1.0 + math.exp(-toD(anyOf(args(0)))))
        case other => throw Parser.ParseError(s"unknown function '$other'", 0)
      }

      // mirror of ScalarFunctions.reducer: filter-failing args excluded,
      // a Fail (NaN) arg that passes the filter fails the whole reducer,
      // fold inits match the batch columns exactly
      def reduce(r: ReducerCall): Any = {
        val vals = r.args.map(a => toD(anyOf(a)))
        val passNaN = r.cond.forall(u => UExpr.eval(u, Double.NaN))
        if (vals.exists(_.isNaN) && passNaN) return Double.NaN
        val pass = vals.map(v => !v.isNaN && r.cond.forall(u => UExpr.eval(u, v)))
        def fold(init: Double, f: (Double, Double) => Double): Double =
          vals.zip(pass).foldLeft(init) { case (acc, (v, p)) =>
            if (p) f(acc, v) else acc
          }
        r.fn match {
          case "sumof"   => fold(0.0, _ + _)
          case "minof"   => fold(Double.MaxValue, math.min)
          case "maxof"   => fold(Double.MinValue, math.max)
          case "countof" => fold(0.0, (acc, _) => acc + 1.0)
          case "avgof" =>
            val c = fold(0.0, (acc, _) => acc + 1.0)
            if (c > 0) fold(0.0, _ + _) / c else Double.NaN
          case other => throw Parser.ParseError(s"unknown reducer '$other'", 0)
        }
      }

      ops.foreach {
        case AggSpec(id, fn, arg, w, _) =>
          val dq = deques(id)
          fn match {
            case "lag" if strArgIdx(arg) >= 0 =>
              // lag over a string-typed field: carry the STRING through the
              // deque (batch: last(strCol, ignoreNulls) over (unbounded, -w])
              // so `lag(status) = 'FAILURE'` compares real strings
              val s = strs(strArgIdx(arg))
              if (s != null) dq += ((t, Double.NaN, s))
              while (dq.length >= 2 && dq(1)._1 <= t - w) dq.remove(0)
              opVals(id) =
                if (dq.nonEmpty && dq.head._1 <= t - w) dq.head._3
                else Double.NaN
            case "lag" =>
              // last non-missing value at or before t - w (batch:
              // last(x, ignoreNulls) over (unbounded, -w])
              val v = toD(anyOf(arg))
              if (!v.isNaN) dq += ((t, v, null))
              while (dq.length >= 2 && dq(1)._1 <= t - w) dq.remove(0)
              opVals(id) =
                if (dq.nonEmpty && dq.head._1 <= t - w) dq.head._2 else Double.NaN
            case _ =>
              // open-left window (t-w, t]; a missing current arg fails the
              // aggregate at this event without poisoning the window
              val v = toD(anyOf(arg))
              if (!v.isNaN) dq += ((t, v, null))
              while (dq.nonEmpty && dq.head._1 <= t - w) dq.remove(0)
              opVals(id) =
                if (v.isNaN) Double.NaN
                else fn match {
                  case "sum"   => dq.iterator.map(_._2).sum
                  case "count" => dq.length.toDouble
                  case "avg"   => dq.iterator.map(_._2).sum / dq.length
                }
          }
        case ForSpec(id, inner, exactly, w, interval, _) =>
          val dq = deques(id)
          val c = toB(anyOf(inner))
          dq += ((t, if (c) 1.0 else 0.0, null))
          // keep one entry before the closed [t-w, t] window: interval
          // durations attribute to the previous event and clip at t-w
          while (dq.length >= 2 && dq(1)._1 < t - w) dq.remove(0)
          var succCnt = 0L
          var succMs = 0L
          var failMs = 0L
          var k = 0
          while (k < dq.length) {
            val (ms, cv, _) = dq(k)
            if (ms >= t - w && cv == 1.0) succCnt += 1
            if (k > 0) {
              val (pms, pcv, _) = dq(k - 1)
              if (ms >= t - w) {
                val d = ms - math.max(pms, t - w)
                if (pcv == 1.0) succMs += d else failMs += d
              }
            }
            k += 1
          }
          val in = interval match {
            case TimeIv(mn, mx)   => succMs >= mn && succMs <= mx
            case CountIv(s, end)  => succCnt >= s && end.forall(succCnt <= _)
          }
          opBools(id) = in && (!exactly || (succMs + failMs) >= w)
        case TimerSpec(id, inner, w, _) =>
          val dq = deques(id)
          val c = toB(anyOf(inner))
          if (!c) dq.clear()
          else if (dq.isEmpty) dq += ((t, 0.0, null))
          opBools(id) = c && t >= dq.head._1 + w
      }

      toB(anyOf(cond))
    }
  }

  private def toD(v: Any): Double = v match {
    case d: Double  => d
    case b: Boolean => if (b) 1.0 else 0.0
    case null       => Double.NaN
    case s: String  =>
      try s.toDouble catch { case _: NumberFormatException => Double.NaN }
    case other => Double.NaN
  }

  private def toB(v: Any): Boolean = v match {
    case b: Boolean => b
    case d: Double  => !d.isNaN && d != 0.0
    case null       => false
    case _          => false
  }

  /** Compile an AST for streaming evaluation. Throws ParseError for
    * forward-looking constructs (`andThen`, `wait`) anywhere in the tree —
    * top-level occurrences are peeled off by TspEngine's routing before
    * this is called, so a throw here means a genuinely nested one. Nested
    * timers become
    * [[TimerSpec]] ops; a top-level timer is stripped into the run-duration
    * rule when `stripTimer` (matching the batch max-window compilation,
    * ASTPatternGenerator.scala:160-162). `numFields`/`strFields` partition
    * the referenced fields by source column type.
    */
  def compile(ast0: Ast, numFields: Vector[String],
              strFields: Vector[String], stripTimer: Boolean = true): Program = {
    val (cond, timerMs) = ast0 match {
      case TimerAst(c, _, maxMs) if stripTimer => (c, maxMs)
      case other                               => (other, 0L)
    }
    val ops = Vector.newBuilder[OpSpec]
    val opOf = scala.collection.mutable.LinkedHashMap.empty[Ast, Int]

    def walk(a: Ast): Unit = a match {
      case _: AndThenAst | _: WaitAst =>
        throw Parser.ParseError(
          s"construct not supported in the streaming evaluator: ${a.productPrefix}", 0)
      case tm @ TimerAst(inner, _, maxMs) =>
        walk(inner)
        if (!opOf.contains(tm)) {
          val id = opOf.size
          opOf(tm) = id
          ops += TimerSpec(id, inner, maxMs, tm)
        }
      case agg @ Agg(fn, arg, w) =>
        walk(arg)
        if (!opOf.contains(agg)) {
          val id = opOf.size
          opOf(agg) = id
          ops += AggSpec(id, fn, arg, math.max(w, 1L), agg)
        }
      case f @ ForWithIntervalAst(inner, exactly, w, iv) =>
        walk(inner)
        if (!opOf.contains(f)) {
          val id = opOf.size
          opOf(f) = id
          ops += ForSpec(id, inner, exactly, w, iv, f)
        }
      case Call(_, args)           => args.foreach(walk)
      case ReducerCall(_, _, args) => args.foreach(walk)
      case CastAst(inner, _)       => walk(inner)
      case AssertAst(b)            => walk(b)
      case UntilAst(c, b)          => walk(c); walk(b)
      case _: Ident | _: Const     => ()
    }
    walk(cond)
    Program(cond, ops.result(), opOf.toMap, timerMs, numFields, strFields)
  }
}
