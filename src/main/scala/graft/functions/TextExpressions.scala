package graft.functions

import org.apache.spark.sql.{Column, GraftSqlShim}
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, ImplicitCastInputTypes}
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Native kernel for T5-style span corruption
  * ([[graft.operators.Sampling.spanCorruptText]]).
  *
  * The portable formulation is a single `aggregate` HOF fold — correct and
  * relationally replayable, but higher-order functions are interpreted
  * (CodegenFallback) per STEP: every token pays a Catalyst lambda
  * invocation, an md5 Column-expression evaluation, and a fresh struct +
  * string concatenation allocation for the accumulator. This expression
  * runs the whole document in one JVM call — two StringBuilders, one
  * thread-local MessageDigest, O(doc) — and returns the full
  * (n_masked, n_spans, input, target) struct at once. Still
  * CodegenFallback at the EXPRESSION level (string building has no
  * profitable codegen form), but one interpreted call per ROW instead of
  * five per token: the [[graft.operators.TextDedup.minhashBandRows]]
  * precedent, with the HOF fold retained as the in-test differential
  * oracle.
  *
  * Mask decision per position i (0-based): the first two md5 bytes of
  * UTF-8 `"<docId>:<i>"` read big-endian, mod 100, compared to `maskPct` —
  * exactly `conv(substring(md5(concat(id, ':', i)), 1, 4), 16, 10) % 100`,
  * the [[graft.operators.Sampling.hashBucket]] arithmetic every external
  * replay uses.
  */
case class SpanCorrupt(words: Expression, docId: Expression, maskPct: Int)
    extends BinaryExpression with ImplicitCastInputTypes with CodegenFallback {

  override def left: Expression = words
  override def right: Expression = docId
  override def inputTypes: Seq[GraftSqlShim.AbstractType] =
    Seq(ArrayType(StringType), LongType)
  override def dataType: DataType = StructType(Seq(
    StructField("n_masked", LongType, nullable = false),
    StructField("n_spans", LongType, nullable = false),
    StructField("input", StringType, nullable = false),
    StructField("target", StringType, nullable = false)))
  override def nullIntolerant: Boolean = true
  override def prettyName: String = "span_corrupt"

  override def nullSafeEval(w: Any, id: Any): Any = {
    val ws = w.asInstanceOf[ArrayData]
    val doc = id.asInstanceOf[Long]
    val n = ws.numElements()
    val md = SpanCorrupt.digest.get()
    val inp = new java.lang.StringBuilder
    val tgt = new java.lang.StringBuilder
    var nMasked = 0L
    var spans = 0L
    var prevMasked = false
    var i = 0
    while (i < n) {
      val word = ws.getUTF8String(i)
      md.reset()
      md.update(s"$doc:$i".getBytes(java.nio.charset.StandardCharsets.UTF_8))
      val d = md.digest()
      val bucket = (((d(0) & 0xff) << 8) | (d(1) & 0xff)) % 100
      if (bucket < maskPct) {
        nMasked += 1
        if (!prevMasked) {
          val sentinel = s"<extra_id_$spans>"
          spans += 1
          if (inp.length > 0) inp.append(' ')
          inp.append(sentinel)
          if (tgt.length > 0) tgt.append(' ')
          tgt.append(sentinel)
        }
        tgt.append(' ').append(word.toString)
        prevMasked = true
      } else {
        if (inp.length > 0) inp.append(' ')
        inp.append(word.toString)
        prevMasked = false
      }
      i += 1
    }
    InternalRow(nMasked, spans,
      UTF8String.fromString(inp.toString), UTF8String.fromString(tgt.toString))
  }

  override protected def withNewChildrenInternal(newLeft: Expression,
                                                 newRight: Expression): SpanCorrupt =
    copy(words = newLeft, docId = newRight)
}

object SpanCorrupt {
  private[functions] val digest = new ThreadLocal[java.security.MessageDigest] {
    override def initialValue(): java.security.MessageDigest =
      java.security.MessageDigest.getInstance("MD5")
  }

  /** Column wrapper: struct(n_masked, n_spans, input, target). */
  def spanCorrupt(words: Column, docId: Column, maskPct: Int): Column =
    GraftSqlShim.column(SpanCorrupt(GraftSqlShim.expression(words),
      GraftSqlShim.expression(docId), maskPct))
}

/** Native kernel for the 64-bit SimHash signature
  * ([[graft.operators.TextDedup.simhashSignatures]]).
  *
  * The relational formulation explodes one row per word, parses the md5
  * prefix into two integer halves, and runs a 64-column partial aggregate —
  * map-side combinable, but it pays a word-row materialization, 64
  * shift/mask Column evaluations per word row, and a hash exchange on the
  * doc id to finish the votes. This expression computes the whole document
  * in one JVM call — one thread-local MessageDigest per word, a 64-int
  * vote array, O(doc) — turning the signature step into a pure narrow map
  * with NO shuffle at all. CodegenFallback at the expression level (the
  * digest call dominates; same stance as [[SpanCorrupt]]), with the
  * relational frame retained as the in-test differential oracle.
  *
  * Bit layout is EXACTLY [[graft.operators.TextDedup.simhashSignatures]]'s
  * (locked by the differential spec): bit j of the signature reads bit
  * (j % 4) of hex digit (j / 4) of the word's md5, digits indexed from the
  * hex string's first character; a bit is set when strictly more than half
  * the words vote 1 (`2·sum > n`).
  */
case class SimHash64(words: Expression)
    extends org.apache.spark.sql.catalyst.expressions.UnaryExpression
    with ImplicitCastInputTypes with CodegenFallback {

  override def child: Expression = words
  override def inputTypes: Seq[GraftSqlShim.AbstractType] =
    Seq(ArrayType(StringType))
  override def dataType: DataType = LongType
  override def nullIntolerant: Boolean = true
  override def prettyName: String = "simhash64"

  override def nullSafeEval(w: Any): Any = {
    val ws = w.asInstanceOf[ArrayData]
    val n = ws.numElements()
    val votes = new Array[Int](64)
    val md = SpanCorrupt.digest.get()
    var i = 0
    while (i < n) {
      md.reset()
      md.update(ws.getUTF8String(i).getBytes)
      val d = md.digest()
      // hex digit k = high nibble of byte k/2 (k even) else low nibble
      var j = 0
      while (j < 64) {
        val digit = j >> 2
        val b = d(digit >> 1) & 0xff
        val nib = if ((digit & 1) == 0) b >> 4 else b & 0xf
        votes(j) += (nib >> (j & 3)) & 1
        j += 1
      }
      i += 1
    }
    var sig = 0L
    var j = 0
    while (j < 64) {
      if (2 * votes(j) > n) sig |= 1L << j
      j += 1
    }
    sig
  }

  override protected def withNewChildInternal(newChild: Expression): SimHash64 =
    copy(words = newChild)
}

object SimHash64 {
  /** Column wrapper: 64-bit signature of a word array. */
  def simhash64(words: Column): Column =
    GraftSqlShim.column(SimHash64(GraftSqlShim.expression(words)))
}
