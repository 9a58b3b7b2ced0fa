package graft.dsl

import org.scalatest.funsuite.AnyFunSuite

class ParserSpec extends AnyFunSuite {

  private def parseOk(s: String): Ast = Parser.parse(s) match {
    case Right(a)  => a
    case Left(err) => fail(s"parse failed for <$s>: $err")
  }

  test("simple comparison") {
    assert(parseOk("PowerPolling > 20") ==
      AssertAst(Call("gt", Seq(Ident("PowerPolling"), Const(20.0)))))
  }

  test("comparison with no space before number") {
    assert(parseOk("SpeedThrustMin =51") ==
      AssertAst(Call("eq", Seq(Ident("SpeedThrustMin"), Const(51.0)))))
  }

  test("boolean and / or precedence: or binds looser") {
    val ast = parseOk("a = 1 or b = 2 and c = 3")
    assert(ast == AssertAst(Call("or", Seq(
      Call("eq", Seq(Ident("a"), Const(1.0))),
      Call("and", Seq(
        Call("eq", Seq(Ident("b"), Const(2.0))),
        Call("eq", Seq(Ident("c"), Const(3.0)))))))))
  }

  test("arithmetic precedence and parens") {
    val ast = parseOk("abs(a + b * 2) > 40")
    assert(ast == AssertAst(Call("gt", Seq(
      Call("abs", Seq(Call("add", Seq(Ident("a"),
        Call("mul", Seq(Ident("b"), Const(2.0))))))),
      Const(40.0)))))
  }

  test("timer: X for T") {
    assert(parseOk("x > 1 for 2 sec") ==
      TimerAst(AssertAst(Call("gt", Seq(Ident("x"), Const(1.0)))), 2000L, 2000L))
  }

  test("timer with compound time: 2 min 30 sec") {
    val TimerAst(_, mn, mx) = parseOk("x > 1 for 2 min 30 sec"): @unchecked
    assert(mn == 150000L && mx == 150000L)
  }

  test("timer with tolerance: T +- t") {
    val TimerAst(_, mn, mx) = parseOk("x > 1 for 10 sec +- 2 sec"): @unchecked
    assert(mn == 8000L && mx == 12000L)
  }

  test("timer with percent tolerance") {
    val TimerAst(_, mn, mx) = parseOk("x > 1 for 10 sec +- 10 %"): @unchecked
    assert(mn == 9000L && mx == 11000L)
  }

  test("for with repetition range") {
    val ForWithIntervalAst(_, exactly, w, iv) =
      parseOk("x > 1 for 1 sec 2 to 2 times"): @unchecked
    assert(w == 1000L && iv == CountIv(2, Some(2)) && exactly)
  }

  test("for with open repetition range is not exact") {
    val ForWithIntervalAst(_, exactly, w, iv) =
      parseOk("x > 1 for 2 sec > 2 times"): @unchecked
    assert(w == 2000L && iv == CountIv(3, None) && !exactly)
  }

  test("for with time range") {
    val ForWithIntervalAst(_, _, w, iv) =
      parseOk("x = 1 for 2 min > 1 min"): @unchecked
    assert(w == 120000L && iv == TimeIv(60000L, TimeIv.MaxMs))
  }

  test("until") {
    assert(parseOk("a < 9.50 until b > 51") ==
      UntilAst(
        AssertAst(Call("lt", Seq(Ident("a"), Const(9.5)))),
        Call("gt", Seq(Ident("b"), Const(51.0)))))
  }

  test("andThen chain is left-associative") {
    val ast = parseOk("a = 1 andThen b = 2 andThen c = 3")
    assert(ast match {
      case AndThenAst(AndThenAst(_, _), _) => true
      case _                               => false
    })
  }

  test("wait, case-insensitive") {
    val WaitAst(w, TimerAst(_, _, mx)) =
      parseOk("Wait(3 sec, POilDieselOut < 9.50 for 3 sec)"): @unchecked
    assert(w == 3000L && mx == 3000L)
  }

  test("windowed aggregate vs reducer vs plain function") {
    assert(parseOk("avg(x, 2 sec) = 22") ==
      AssertAst(Call("eq", Seq(Agg("avg", Ident("x"), 2000L), Const(22.0)))))
    assert(parseOk("avgOf(a, b) > 0") ==
      AssertAst(Call("gt", Seq(ReducerCall("avgof", None, Seq(Ident("a"), Ident("b"))), Const(0.0)))))
    assert(parseOk("abs(a) > 0") ==
      AssertAst(Call("gt", Seq(Call("abs", Seq(Ident("a"))), Const(0.0)))))
  }

  test("lag single-argument and windowed") {
    assert(parseOk("lag(x) < 0") ==
      AssertAst(Call("lt", Seq(Agg("lag", Ident("x"), 1L), Const(0.0)))))
    assert(parseOk("lag(x, 5 sec) < 0") ==
      AssertAst(Call("lt", Seq(Agg("lag", Ident("x"), 5000L), Const(0.0)))))
  }

  test("nested lag") {
    assert(parseOk("lag(lag(x)) > 1") ==
      AssertAst(Call("gt", Seq(Agg("lag", Agg("lag", Ident("x"), 1L), 1L), Const(1.0)))))
  }

  test("reducer with underscore constraint") {
    val ReducerCall(fn, Some(cond), args) = (parseOk("sumOf(a, b; _ > 0) > 1"): @unchecked) match {
      case AssertAst(Call("gt", Seq(r: ReducerCall, _))) => r
      case other => fail(s"unexpected $other")
    }
    assert(fn == "sumof" && args.length == 2)
    assert(UExpr.eval(cond, 1.0) && !UExpr.eval(cond, -1.0) && !UExpr.eval(cond, Double.NaN))
  }

  test("string literal comparison") {
    assert(parseOk("SOC_2_UKV1_UOVS = 'OFF'") ==
      AssertAst(Call("eq", Seq(Ident("SOC_2_UKV1_UOVS"), Const("OFF")))))
  }

  test("string with doubled quote escape") {
    assert(parseOk("s = 'it''s'") ==
      AssertAst(Call("eq", Seq(Ident("s"), Const("it's")))))
  }

  test("quoted identifier") {
    assert(parseOk("\"weird field\" > 1") ==
      AssertAst(Call("gt", Seq(Ident("weird field"), Const(1.0)))))
  }

  test("cast") {
    assert(parseOk("x as int32 > 1") ==
      AssertAst(Call("gt", Seq(CastAst(Ident("x"), "int32"), Const(1.0)))))
  }

  test("parenthesized trilean under wait") {
    val ast = parseOk("wait(1 sec, a = 0 for 1 sec andThen b > 40)")
    assert(ast match {
      case WaitAst(1000L, AndThenAst(TimerAst(_, _, 1000L), AssertAst(_))) => true
      case _ => false
    })
  }

  test("every core corpus pattern parses") {
    val bad = CorpusFixtures.patterns("core").flatMap { c =>
      Parser.parse(c.sourceCode).left.toOption.map(e => s"#${c.id}: $e")
    }
    assert(bad.isEmpty, s"unparsed corpus patterns: ${bad.mkString("; ")}")
  }

  test("every ivolga corpus pattern parses") {
    val bad = CorpusFixtures.patterns("ivolga").flatMap { c =>
      Parser.parse(c.sourceCode).left.toOption.map(e => s"#${c.id}: $e")
    }
    assert(bad.isEmpty, s"unparsed corpus patterns: ${bad.mkString("; ")}")
  }

  test("validate reports fields and errors") {
    val res = TspEngine.validate(Seq("a > 1 and b < 2", "a >>> nope"))
    assert(res.head == Right(Set("a", "b")))
    assert(res(1).isLeft)
  }
}
