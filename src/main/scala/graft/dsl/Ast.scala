package graft.dsl

/** Typed AST for the pattern DSL.
  *
  * Mirrors the node set of the reference grammar (reference:
  * dsl/src/main/scala/ru/itclover/tsp/dsl/AST.scala) but is deliberately
  * minimal: type checking happens at compile time against the DataFrame
  * schema, not at parse time, because Spark already knows the column types.
  *
  * Time quantities are always epoch-milliseconds (`Long`), matching the
  * reference's `Window(toMillis)`.
  */
sealed trait Ast extends Product with Serializable

/** Literal constant: Double, Boolean or String. */
final case class Const(value: Any) extends Ast

/** Column reference (bare or double-quoted identifier). */
final case class Ident(name: String) extends Ast

/** Scalar function / operator call: arithmetic, comparison, logical, trig.
  * Trilean `and`/`or`/`xor` over pattern results are also Calls (reference:
  * ASTBuilder.scala:29-38 lowers them to FunctionCall).
  */
final case class Call(fn: String, args: Seq[Ast]) extends Ast

/** Reducer call `sumOf/minOf/maxOf/countOf/avgOf(x1..xn [; _ cond])` with an
  * optional per-argument filter predicate (reference:
  * FunctionRegistry.scala:456-518, underscore grammar ASTBuilder.scala:189-255).
  */
final case class ReducerCall(fn: String, cond: Option[UExpr], args: Seq[Ast]) extends Ast

/** Windowed aggregate `sum/count/avg/lag(x, T)`; `lag(x)` is windowMs=1
  * (reference: AST.scala:141-167, ASTBuilder.scala:386-388).
  */
final case class Agg(fn: String, arg: Ast, windowMs: Long) extends Ast

/** `expr as int32|int64|float64|boolean|string`. */
final case class CastAst(inner: Ast, to: String) extends Ast

/** Boolean expression lifted to trilean: true -> Succ, false -> Fail
  * (reference: AST.scala:120-124, generator ASTPatternGenerator.scala:191-196).
  */
final case class AssertAst(cond: Ast) extends Ast

/** `X for T` (no range): condition holds continuously for at least `maxMs`
  * (reference: Timer AST.scala:104-109 -> TimerPattern; only interval.max is
  * used as the window, ASTPatternGenerator.scala:161-162).
  */
final case class TimerAst(cond: Ast, minMs: Long, maxMs: Long) extends Ast

/** `A andThen B` (reference: AST.scala:94-100 -> AndThenPattern). */
final case class AndThenAst(first: Ast, second: Ast) extends Ast

/** `wait(T, X)`: stretches each success interval of X left by up to T
  * (reference: AST.scala:113-118 -> WaitPattern).
  */
final case class WaitAst(windowMs: Long, inner: Ast) extends Ast

/** `X until B [range]`: sugar for `Timer(X, inf) and not B` (reference:
  * ASTBuilder.scala:48-56). The infinite timer degenerates to X itself.
  */
final case class UntilAst(cond: Ast, stop: Ast) extends Ast

/** `X for [exactly] W <range>` — sliding-window truth statistics with an
  * interval constraint on success-millis or success-count (reference:
  * AST.scala:126-137 -> WindowStatistic + interval check,
  * ASTPatternGenerator.scala:165-179).
  */
final case class ForWithIntervalAst(
  inner: Ast,
  exactly: Boolean,
  windowMs: Long,
  interval: IntervalSpec
) extends Ast

sealed trait IntervalSpec extends Product with Serializable

/** Inclusive [minMs, maxMs] bound on success-millis (reference:
  * Intervals.scala TimeInterval.contains: w >= min && w <= max).
  */
final case class TimeIv(minMs: Long, maxMs: Long) extends IntervalSpec
object TimeIv { val MaxMs: Long = Long.MaxValue }

/** Bound on success-count: >= start and (if set) <= end (reference:
  * Intervals.scala NumericInterval).
  */
final case class CountIv(start: Long, end: Option[Long]) extends IntervalSpec

/** Underscore-lambda constraint mini-AST for reducer filters, e.g.
  * `_ > 0 and _ < 10` (reference: ASTBuilder.scala:189-255 compiles these to
  * Double => Boolean closures; we keep the tree so it can compile to both a
  * Catalyst Column and a Scala closure).
  */
sealed trait UExpr extends Product with Serializable
final case class UNum(value: Double) extends UExpr
case object UHole extends UExpr // the `_`
final case class UBin(op: String, l: UExpr, r: UExpr) extends UExpr // + - * /
final case class UCmp(op: String, l: UExpr, r: UExpr) extends UExpr // < <= > >= = !=
final case class UAnd(l: UExpr, r: UExpr) extends UExpr
final case class UOr(l: UExpr, r: UExpr) extends UExpr
final case class UXor(l: UExpr, r: UExpr) extends UExpr
final case class UNot(e: UExpr) extends UExpr
final case class UBool(value: Boolean) extends UExpr

object UExpr {

  /** Evaluate on a plain Double with Scala (not SQL) NaN semantics — used to
    * decide how a Fail (null/NaN) argument interacts with the filter, where
    * SQL's NaN ordering (NaN greater than everything) would diverge from the
    * reference's `Double.NaN > 0 == false`.
    */
  def eval(e: UExpr, x: Double): Boolean = e match {
    case UBool(b)       => b
    case UNot(i)        => !eval(i, x)
    case UAnd(l, r)     => eval(l, x) && eval(r, x)
    case UOr(l, r)      => eval(l, x) || eval(r, x)
    case UXor(l, r)     => eval(l, x) != eval(r, x)
    case UCmp(op, l, r) =>
      val (a, b) = (evalD(l, x), evalD(r, x))
      op match {
        case "<"  => a < b
        case "<=" => a <= b
        case ">"  => a > b
        case ">=" => a >= b
        case "="  => a == b
        case "!=" => a != b
      }
    case other => sys.error(s"not a boolean underscore-expression: $other")
  }

  def evalD(e: UExpr, x: Double): Double = e match {
    case UNum(v)        => v
    case UHole          => x
    case UBin(op, l, r) =>
      val (a, b) = (evalD(l, x), evalD(r, x))
      op match {
        case "+" => a + b
        case "-" => a - b
        case "*" => a * b
        case "/" => a / b
      }
    case other => sys.error(s"not a numeric underscore-expression: $other")
  }
}
