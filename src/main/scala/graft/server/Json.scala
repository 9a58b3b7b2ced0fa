package graft.server

import scala.collection.mutable

/** Minimal JSON parser/printer for the HTTP transport — no external
  * dependency is available offline, and the payloads (job requests, status
  * responses) are small control-plane messages, never data-plane rows.
  *
  * The AST is deliberately tiny: objects preserve insertion order (stable
  * responses for tests and humans), numbers are doubles (the reference's
  * JSON layer — circe — does the same for unannotated numbers).
  */
object Json {

  sealed trait Value {
    def asObj: Map[String, Value] = this match {
      case Obj(fields) => fields.toMap
      case other       => throw ParseError(s"expected object, got $other")
    }
    def asArr: Seq[Value] = this match {
      case Arr(items) => items
      case other      => throw ParseError(s"expected array, got $other")
    }
    def asStr: String = this match {
      case Str(s) => s
      case other  => throw ParseError(s"expected string, got $other")
    }
    def asNum: Double = this match {
      case Num(n) => n
      case other  => throw ParseError(s"expected number, got $other")
    }
    def asBool: Boolean = this match {
      case Bool(b) => b
      case other   => throw ParseError(s"expected boolean, got $other")
    }
  }
  final case class Obj(fields: Seq[(String, Value)]) extends Value {
    def apply(key: String): Value = get(key).getOrElse(
      throw ParseError(s"missing field '$key'"))
    def get(key: String): Option[Value] = fields.collectFirst {
      case (k, v) if k == key && v != Null => v
    }
  }
  object Obj { def of(fields: (String, Value)*): Obj = Obj(fields) }
  final case class Arr(items: Seq[Value]) extends Value
  final case class Str(s: String) extends Value
  final case class Num(n: Double) extends Value
  final case class Bool(b: Boolean) extends Value
  case object Null extends Value

  final case class ParseError(msg: String) extends RuntimeException(msg)

  def parse(s: String): Value = {
    val p = new Parser(s)
    val v = p.value()
    p.skipWs()
    if (!p.eof) throw ParseError(s"trailing content at ${p.pos}")
    v
  }

  private final class Parser(s: String) {
    var pos = 0
    def eof: Boolean = pos >= s.length
    def skipWs(): Unit =
      while (!eof && Character.isWhitespace(s.charAt(pos))) pos += 1
    private def fail(what: String): Nothing =
      throw ParseError(s"$what at offset $pos")
    private def expect(c: Char): Unit = {
      if (eof || s.charAt(pos) != c) fail(s"expected '$c'")
      pos += 1
    }

    def value(): Value = {
      skipWs()
      if (eof) fail("unexpected end")
      s.charAt(pos) match {
        case '{' => obj()
        case '[' => arr()
        case '"' => Str(string())
        case 't' => literal("true", Bool(true))
        case 'f' => literal("false", Bool(false))
        case 'n' => literal("null", Null)
        case _   => number()
      }
    }

    private def literal(lit: String, v: Value): Value = {
      if (!s.startsWith(lit, pos)) fail(s"expected $lit")
      pos += lit.length; v
    }

    private def obj(): Value = {
      expect('{'); skipWs()
      val fields = mutable.ArrayBuffer.empty[(String, Value)]
      if (!eof && s.charAt(pos) == '}') { pos += 1; return Obj(fields.toSeq) }
      while (true) {
        skipWs()
        val k = string()
        skipWs(); expect(':')
        fields += ((k, value()))
        skipWs()
        if (eof) fail("unterminated object")
        s.charAt(pos) match {
          case ',' => pos += 1
          case '}' => pos += 1; return Obj(fields.toSeq)
          case _   => fail("expected ',' or '}'")
        }
      }
      Obj(fields.toSeq)
    }

    private def arr(): Value = {
      expect('['); skipWs()
      val items = mutable.ArrayBuffer.empty[Value]
      if (!eof && s.charAt(pos) == ']') { pos += 1; return Arr(items.toSeq) }
      while (true) {
        items += value()
        skipWs()
        if (eof) fail("unterminated array")
        s.charAt(pos) match {
          case ',' => pos += 1
          case ']' => pos += 1; return Arr(items.toSeq)
          case _   => fail("expected ',' or ']'")
        }
      }
      Arr(items.toSeq)
    }

    private def string(): String = {
      expect('"')
      val sb = new StringBuilder
      while (true) {
        if (eof) fail("unterminated string")
        s.charAt(pos) match {
          case '"' => pos += 1; return sb.toString
          case '\\' =>
            pos += 1
            if (eof) fail("unterminated escape")
            s.charAt(pos) match {
              case '"'  => sb += '"';  pos += 1
              case '\\' => sb += '\\'; pos += 1
              case '/'  => sb += '/';  pos += 1
              case 'b'  => sb += '\b'; pos += 1
              case 'f'  => sb += '\f'; pos += 1
              case 'n'  => sb += '\n'; pos += 1
              case 'r'  => sb += '\r'; pos += 1
              case 't'  => sb += '\t'; pos += 1
              case 'u' =>
                if (pos + 5 > s.length) fail("bad unicode escape")
                sb += Integer.parseInt(s.substring(pos + 1, pos + 5), 16).toChar
                pos += 5
              case _ => fail("bad escape")
            }
          case c => sb += c; pos += 1
        }
      }
      sb.toString
    }

    private def number(): Value = {
      val start = pos
      if (!eof && (s.charAt(pos) == '-' || s.charAt(pos) == '+')) pos += 1
      while (!eof && (s.charAt(pos).isDigit || "eE+-.".contains(s.charAt(pos))))
        pos += 1
      if (pos == start) fail("expected value")
      try Num(s.substring(start, pos).toDouble)
      catch { case _: NumberFormatException => fail("bad number") }
    }
  }

  def write(v: Value): String = {
    val sb = new StringBuilder
    writeTo(v, sb)
    sb.toString
  }

  private def writeTo(v: Value, sb: StringBuilder): Unit = v match {
    case Obj(fields) =>
      sb += '{'
      var first = true
      fields.foreach { case (k, fv) =>
        if (!first) sb += ','
        first = false
        writeString(k, sb); sb += ':'; writeTo(fv, sb)
      }
      sb += '}'
    case Arr(items) =>
      sb += '['
      var first = true
      items.foreach { i =>
        if (!first) sb += ','
        first = false
        writeTo(i, sb)
      }
      sb += ']'
    case Str(s)  => writeString(s, sb)
    case Num(n)  =>
      if (n.isWhole && math.abs(n) < 1e15) sb ++= n.toLong.toString
      else sb ++= n.toString
    case Bool(b) => sb ++= b.toString
    case Null    => sb ++= "null"
  }

  private def writeString(s: String, sb: StringBuilder): Unit = {
    sb += '"'
    s.foreach {
      case '"'  => sb ++= "\\\""
      case '\\' => sb ++= "\\\\"
      case '\b' => sb ++= "\\b"
      case '\f' => sb ++= "\\f"
      case '\n' => sb ++= "\\n"
      case '\r' => sb ++= "\\r"
      case '\t' => sb ++= "\\t"
      case c if c < ' ' => sb ++= f"\\u${c.toInt}%04x"
      case c => sb += c
    }
    sb += '"'
  }
}
