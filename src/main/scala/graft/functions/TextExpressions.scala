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

/** Native kernel for HTML main-content extraction — the tag-stripping /
  * boilerplate-block removal step every crawl-curation funnel runs before
  * any text analysis (the trafilatura/jusText role, reduced to its
  * deterministic core so external SQL can replay it).
  *
  * The kernel is defined as the EXACT single-pass equivalent of a fixed
  * regex chain (retained as the relational differential oracle in
  * [[graft.operators.TextAnalysis.htmlExtractRelational]]):
  *
  *   1. `(?s)<!--.*?-->` → '' (comments)
  *   2. `(?is)<head[^>]*>.*?</head[^>]*>` → '' (head block)
  *   3. `(?is)<script[^>]*>.*?</script[^>]*>` → '' (script blocks)
  *   4. `(?is)<style[^>]*>.*?</style[^>]*>` → '' (style blocks)
  *   5. remaining `<[^>]*>` → ' ' (tags separate words, counting
  *      `(?i)<a[ \t\n\r\f>]` anchors along the way)
  *   6. entity decode, non-recursive single pass: the fixed table (&lt;
  *      &gt; &quot; &apos; &#39; &nbsp;(→space) &amp;) plus NUMERIC
  *      character references `&#NNN;` / `&#xHH;` for BMP non-surrogate
  *      code points (1..0xFFFF \ 0xD800..0xDFFF; ≤6 decimal / ≤5 hex
  *      digits) — unknown, malformed, astral, surrogate, or NUL refs pass
  *      through as literal text. The chain spells this stage as ONE
  *      split-on-'&' + per-part transform (not a per-entity replace
  *      fold), so fixed and numeric rules share a single left-to-right
  *      pass on both engines
  *   7. whitespace-collapse + trim
  *
  * `title` is the raw inner text of the first `(?is)<title[^>]*>(.*?)
  * </title[^>]*>` match on the ORIGINAL input ('' when absent).
  *
  * Malformed-input behavior mirrors the chain: an unclosed comment/block
  * leaves `<` as literal text or falls back to the bare-tag rule, exactly
  * as the regexes fail to match. Out of scope (documented, not detected),
  * because the chain applies stages globally while the kernel reads in
  * document order: block closers hidden inside comments
  * (`<script><!-- </script> -->`), a stray text `<` standing
  * immediately before a removable block (`5 < 6 <script>…`), and
  * INTERLEAVED removable blocks whose open/close tags cross
  * (`<style>A<script>B</style>C</script>`: the chain removes script
  * globally before style, keeping 'A'; the kernel skips the style block
  * first in document order, keeping 'C' — hand cases in HtmlExtractSpec
  * pin both behaviors). Real HTML escapes all three.
  *
  * One JVM call per document, O(doc), two StringBuilders — the same
  * CodegenFallback stance as [[SpanCorrupt]] (string building has no
  * profitable codegen form; the win is one interpreted call per ROW versus
  * seven regex passes over the full document).
  */
case class HtmlExtract(html: Expression)
    extends org.apache.spark.sql.catalyst.expressions.UnaryExpression
    with ImplicitCastInputTypes with CodegenFallback {

  override def child: Expression = html
  override def inputTypes: Seq[GraftSqlShim.AbstractType] = Seq(StringType)
  override def dataType: DataType = StructType(Seq(
    StructField("title", StringType, nullable = false),
    StructField("text", StringType, nullable = false),
    StructField("n_links", LongType, nullable = false)))
  override def nullIntolerant: Boolean = true
  override def prettyName: String = "html_extract"

  import HtmlExtract._

  override def nullSafeEval(h: Any): Any = {
    val s = h.asInstanceOf[UTF8String].toString
    val n = s.length
    val raw = new java.lang.StringBuilder(n)
    var nLinks = 0L
    var i = 0
    while (i < n) {
      val c = s.charAt(i)
      if (c == '<') {
        if (s.startsWith("<!--", i)) {
          val j = s.indexOf("-->", i + 4)
          if (j < 0) { raw.append('<'); i += 1 } else i = j + 3
        } else if (regionMatchesCi(s, i, "<script")) {
          i = skipBlock(s, i, "</script", raw)
        } else if (regionMatchesCi(s, i, "<style")) {
          i = skipBlock(s, i, "</style", raw)
        } else if (regionMatchesCi(s, i, "<head")) {
          i = skipBlock(s, i, "</head", raw)
        } else {
          if (i + 2 < n && (s.charAt(i + 1) == 'a' || s.charAt(i + 1) == 'A')
              && isWsOrGt(s.charAt(i + 2))) nLinks += 1
          val j = s.indexOf('>', i)
          if (j < 0) { raw.append('<'); i += 1 }
          else { raw.append(' '); i = j + 1 }
        }
      } else if (c == '&') {
        var matched = false
        var e = 0
        while (!matched && e < entities.length) {
          val (ent, rep) = entities(e)
          if (s.startsWith(ent, i)) {
            raw.append(rep); i += ent.length; matched = true
          }
          e += 1
        }
        if (!matched) {
          val adv = numericRef(s, i, raw)
          if (adv > 0) i += adv else { raw.append('&'); i += 1 }
        }
      } else { raw.append(c); i += 1 }
    }
    // whitespace collapse + trim (chain step 7; \s there is the RE2 class,
    // which excludes \x0B — keep that exact set)
    val out = new java.lang.StringBuilder(raw.length)
    var k = 0
    var pendingSpace = false
    while (k < raw.length) {
      val c = raw.charAt(k)
      if (isWs(c)) pendingSpace = out.length > 0
      else { if (pendingSpace) out.append(' '); pendingSpace = false; out.append(c) }
      k += 1
    }
    InternalRow(UTF8String.fromString(title(s)),
      UTF8String.fromString(out.toString), nLinks)
  }

  override protected def withNewChildInternal(newChild: Expression): HtmlExtract =
    copy(html = newChild)
}

object HtmlExtract {

  /** Entity table, longest-prefix-unambiguous; &amp; decodes non-recursively
    * (single left-to-right pass = the non-overlapping global regex replace).
    */
  private val entities: Array[(String, Char)] = Array(
    "&lt;" -> '<', "&gt;" -> '>', "&quot;" -> '"', "&apos;" -> '\'',
    "&#39;" -> '\'', "&nbsp;" -> ' ', "&amp;" -> '&')

  /** Numeric character reference at `s(i) == '&'`: `&#NNN;` (1-6 decimal
    * digits) or `&#xHH;`/`&#XHH;` (1-5 hex digits), decoded iff the code
    * point is BMP and not a surrogate (1..0xFFFF \ 0xD800..0xDFFF) —
    * astral-plane refs, the surrogate range, NUL, overlong digit runs, and
    * anything malformed pass through as literal text, exactly like the
    * chain's failed regex. Returns chars consumed (0 = no reference here);
    * appends the decoded char on success. Single pass: the decoded char is
    * never rescanned, matching the split-on-'&' chain stage.
    */
  private def numericRef(s: String, i: Int, raw: java.lang.StringBuilder): Int = {
    val n = s.length
    if (i + 1 >= n || s.charAt(i + 1) != '#') return 0
    val hex = i + 2 < n && (s.charAt(i + 2) == 'x' || s.charAt(i + 2) == 'X')
    val d0 = if (hex) i + 3 else i + 2
    val maxDigits = if (hex) 5 else 6
    // ASCII-only digit classes, exactly the chain's [0-9] / [0-9a-fA-F]
    // (Character.digit would also accept Unicode digits the regex rejects)
    def digit(c: Char): Int =
      if (c >= '0' && c <= '9') c - '0'
      else if (hex && c >= 'a' && c <= 'f') c - 'a' + 10
      else if (hex && c >= 'A' && c <= 'F') c - 'A' + 10
      else -1
    var j = d0
    var code = 0
    while (j < n && j - d0 < maxDigits && digit(s.charAt(j)) >= 0) {
      code = code * (if (hex) 16 else 10) + digit(s.charAt(j))
      j += 1
    }
    if (j == d0 || j >= n || s.charAt(j) != ';') return 0
    if (code < 1 || code > 0xFFFF || (code >= 0xD800 && code <= 0xDFFF)) return 0
    raw.append(code.toChar)
    j + 1 - i
  }

  /** The RE2/Java-common `\s` subset used by the chain's `[ \t\n\r\f>]`
    * link anchor and `\s+` collapse (no \x0B — RE2 excludes it).
    */
  private def isWs(c: Char): Boolean =
    c == ' ' || c == '\t' || c == '\n' || c == '\r' || c == '\f'

  private def isWsOrGt(c: Char): Boolean = isWs(c) || c == '>'

  private def regionMatchesCi(s: String, at: Int, pat: String): Boolean =
    s.regionMatches(true, at, pat, 0, pat.length)

  /** `(?is)<open[^>]*>.*?</close[^>]*>` → '': the opening tag ends at the
    * first '>', the body runs to the earliest close marker after it, the
    * block ends at the first '>' after that marker. If any piece is
    * missing the block regex cannot match, so fall back to exactly what
    * the chain's later stages do: bare-tag rule for the opening tag alone
    * (emit ' ', skip past its '>'), or literal '<' when not even a tag.
    */
  private def skipBlock(s: String, i: Int, closeCi: String,
                        raw: java.lang.StringBuilder): Int = {
    val gt = s.indexOf('>', i)
    if (gt < 0) { raw.append('<'); return i + 1 }
    val close = indexOfCi(s, closeCi, gt + 1)
    val end = if (close < 0) -1 else s.indexOf('>', close + closeCi.length)
    if (end >= 0) end + 1
    else { raw.append(' '); gt + 1 }
  }

  private def indexOfCi(s: String, pat: String, from: Int): Int = {
    var i = math.max(from, 0)
    val limit = s.length - pat.length
    while (i <= limit) {
      if (s.regionMatches(true, i, pat, 0, pat.length)) return i
      i += 1
    }
    -1
  }

  /** First `(?is)<title[^>]*>(.*?)</title[^>]*>` group on the raw input. */
  private def title(s: String): String = {
    val open = indexOfCi(s, "<title", 0)
    if (open < 0) return ""
    val gt = s.indexOf('>', open + 6)
    if (gt < 0) return ""
    val close = indexOfCi(s, "</title", gt + 1)
    if (close < 0) return ""
    if (s.indexOf('>', close + 7) < 0) return ""
    s.substring(gt + 1, close)
  }

  /** Column wrapper: struct(title, text, n_links). */
  def htmlExtract(html: Column): Column =
    GraftSqlShim.column(HtmlExtract(GraftSqlShim.expression(html)))
}

/** Native kernel for the Gopher/MassiveText quality statistics
  * ([[graft.operators.TextAnalysis.gopherFrame]]).
  *
  * The portable formulation is a stack of interpreted higher-order
  * functions over the lines/words/bigram arrays — an `aggregate` fold for
  * the word-length sum, three `filter` lambdas (one with `rlike`), an
  * `array_sort` + `aggregate` run-length fold for the dominant bigram, an
  * `array_distinct`, and a `transform` building every bigram string through
  * per-element Catalyst lambda evaluation. All of those are CodegenFallback
  * per ELEMENT. This expression computes the full feature struct in one JVM
  * call per document — one word split, one line scan, one HashMap bigram
  * census (max multiplicity == the sorted array's longest equal run), O(doc)
  * — the [[SpanCorrupt]]/[[HtmlExtract]] stance, with the HOF frame
  * retained as the in-test differential oracle
  * ([[graft.operators.TextAnalysis.gopherFrameHof]]).
  *
  * Bit-compatibility notes (locked by the differential spec):
  *  - words = `split(text, "\\s+")` with Spark's limit -1 (leading AND
  *    trailing empty strings kept) — replicated via Java's
  *    `Pattern.split(s, -1)`, the same regex engine Spark's `split` calls;
  *  - lines = `split(text, "\n")`, limit -1, same engine (literal '\n');
  *  - word length counts CODE POINTS (`length()` == UTF8String.numChars);
  *  - every fraction rounds exactly like Spark's `round(x, 6)`:
  *    `BigDecimal.valueOf(x).setScale(6, HALF_UP)` (NaN/Inf pass through).
  */
case class GopherStats(text: Expression)
    extends org.apache.spark.sql.catalyst.expressions.UnaryExpression
    with ImplicitCastInputTypes with CodegenFallback {

  override def child: Expression = text
  override def inputTypes: Seq[GraftSqlShim.AbstractType] = Seq(StringType)
  override def dataType: DataType = StructType(Seq(
    StructField("n_words", LongType, nullable = false),
    StructField("mean_word_len", DoubleType, nullable = false),
    StructField("frac_alpha_words", DoubleType, nullable = false),
    StructField("dup_line_frac", DoubleType, nullable = false),
    StructField("bullet_line_frac", DoubleType, nullable = false),
    StructField("ellipsis_line_frac", DoubleType, nullable = false),
    StructField("top_bigram_frac", DoubleType, nullable = false)))
  override def nullIntolerant: Boolean = true
  override def prettyName: String = "gopher_stats"

  import GopherStats._

  override def nullSafeEval(t: Any): Any = {
    val s = t.asInstanceOf[UTF8String].toString

    // ---- lines: split(text, "\n"), limit -1 (trailing empties kept)
    var nLines = 0L
    var nBullet = 0L
    var nEllipsis = 0L
    val seen = new java.util.HashSet[String]()
    var dup = 0L
    var from = 0
    var done = false
    while (!done) {
      val nl = s.indexOf('\n', from)
      val line = if (nl < 0) s.substring(from) else s.substring(from, nl)
      nLines += 1
      if (!seen.add(line)) dup += 1
      if (line.startsWith("- ")) nBullet += 1
      if (line.endsWith("...")) nEllipsis += 1
      if (nl < 0) done = true else from = nl + 1
    }

    // ---- words: split(text, "\s+"), limit -1 (leading/trailing empties kept)
    val ws = wsPattern.split(s, -1)
    val nWords = ws.length.toLong
    var lenSum = 0L
    var alpha = 0L
    var i = 0
    while (i < ws.length) {
      val w = ws(i)
      lenSum += w.codePointCount(0, w.length)
      var j = 0
      var hasAlpha = false
      while (!hasAlpha && j < w.length) {
        val c = w.charAt(j)
        hasAlpha = (c >= 'A' && c <= 'Z') || (c >= 'a' && c <= 'z')
        j += 1
      }
      if (hasAlpha) alpha += 1
      i += 1
    }

    // ---- dominant bigram: max multiplicity == longest equal run of the
    // sorted bigram array the HOF formulation folds over
    var topBigram = 0L
    if (ws.length >= 2) {
      val counts = new java.util.HashMap[String, Long]()
      i = 0
      while (i < ws.length - 1) {
        val bg = ws(i) + " " + ws(i + 1)
        val c = counts.merge(bg, 1L, (a, b) => a + b)
        if (c > topBigram) topBigram = c
        i += 1
      }
    }

    InternalRow(nWords,
      round6(lenSum.toDouble / nWords),
      round6(alpha.toDouble / nWords),
      round6(dup.toDouble / nLines),
      round6(nBullet.toDouble / nLines),
      round6(nEllipsis.toDouble / nLines),
      if (nWords < 2L) 0.0 else round6(topBigram.toDouble / (nWords - 1)))
  }

  override protected def withNewChildInternal(newChild: Expression): GopherStats =
    copy(text = newChild)
}

/** Native kernel for the word n-gram window array
  * ([[graft.operators.TextAnalysis.ngramsOfWords]]).
  *
  * The portable formulation is `transform(sequence(0, greatest(size-n, 0)),
  * i => concat_ws(" ", slice(ws, i+1, n)))` — an interpreted Catalyst
  * lambda + a fresh `slice` array allocation + a `concat_ws` evaluation PER
  * WINDOW POSITION. This expression emits the whole gram array in one JVM
  * call per row, reusing one StringBuilder. Exact window semantics
  * replicated (locked by the differential spec): `max(size-n, 0) + 1`
  * windows — a row shorter than `n` words yields its single truncated
  * window, and an empty array yields one empty-string gram, exactly like
  * the `slice` form; `concat_ws` skips NULL elements.
  */
case class WordNgrams(words: Expression, n: Int)
    extends org.apache.spark.sql.catalyst.expressions.UnaryExpression
    with ImplicitCastInputTypes with CodegenFallback {
  require(n >= 1, s"need n >= 1, got $n")

  override def child: Expression = words
  override def inputTypes: Seq[GraftSqlShim.AbstractType] =
    Seq(ArrayType(StringType))
  override def dataType: DataType = ArrayType(StringType, containsNull = false)
  override def nullIntolerant: Boolean = true
  override def prettyName: String = "word_ngrams"

  override def nullSafeEval(w: Any): Any = {
    val ws = w.asInstanceOf[ArrayData]
    val sz = ws.numElements()
    val m = math.max(sz - n, 0)
    val out = new Array[Any](m + 1)
    val sb = new java.lang.StringBuilder
    var i = 0
    while (i <= m) {
      sb.setLength(0)
      val end = math.min(i + n, sz)
      var j = i
      var first = true
      while (j < end) {
        if (!ws.isNullAt(j)) { // concat_ws skips NULLs
          if (!first) sb.append(' ')
          sb.append(ws.getUTF8String(j).toString)
          first = false
        }
        j += 1
      }
      out(i) = UTF8String.fromString(sb.toString)
      i += 1
    }
    new GenericArrayData(out)
  }

  override protected def withNewChildInternal(newChild: Expression): WordNgrams =
    copy(words = newChild)
}

object WordNgrams {
  /** Column wrapper: array of space-joined n-gram strings. */
  def wordNgrams(words: Column, n: Int): Column =
    GraftSqlShim.column(WordNgrams(GraftSqlShim.expression(words), n))
}

/** Native kernel for the adjacent-bigram struct array
  * ([[graft.operators.TextAnalysis]]'s `bigramGrams` /
  * [[graft.operators.TextAnalysis.collocations]]): the portable
  * `transform(sequence(...), i => struct(element_at(ws, i+1),
  * element_at(ws, i+2)))` pays an interpreted lambda + struct allocation
  * per pair; this emits the whole pair array in one call, referencing the
  * input's UTF8Strings without copying. A row with fewer than 2 words
  * yields an empty array (the `when(size >= 2, ...)` guard folded in).
  */
case class WordBigrams(words: Expression)
    extends org.apache.spark.sql.catalyst.expressions.UnaryExpression
    with ImplicitCastInputTypes with CodegenFallback {

  override def child: Expression = words
  override def inputTypes: Seq[GraftSqlShim.AbstractType] =
    Seq(ArrayType(StringType))
  override def dataType: DataType = ArrayType(StructType(Seq(
    StructField("w1", StringType), StructField("w2", StringType))),
    containsNull = false)
  override def nullIntolerant: Boolean = true
  override def prettyName: String = "word_bigrams"

  override def nullSafeEval(w: Any): Any = {
    val ws = w.asInstanceOf[ArrayData]
    val sz = ws.numElements()
    if (sz < 2) return new GenericArrayData(Array.empty[Any])
    val out = new Array[Any](sz - 1)
    var prev = if (ws.isNullAt(0)) null else ws.getUTF8String(0)
    var i = 1
    while (i < sz) {
      val cur = if (ws.isNullAt(i)) null else ws.getUTF8String(i)
      out(i - 1) = InternalRow(prev, cur)
      prev = cur
      i += 1
    }
    new GenericArrayData(out)
  }

  override protected def withNewChildInternal(newChild: Expression): WordBigrams =
    copy(words = newChild)
}

object WordBigrams {
  /** Column wrapper: array<struct<w1,w2>> of adjacent word pairs. */
  def wordBigrams(words: Column): Column =
    GraftSqlShim.column(WordBigrams(GraftSqlShim.expression(words)))
}

object GopherStats {
  private val wsPattern = java.util.regex.Pattern.compile("\\s+")

  /** Exactly Spark's `round(x, 6)` on DoubleType (HALF_UP via the
    * `BigDecimal.valueOf` decimal rendering; NaN/Inf unchanged).
    */
  private def round6(v: Double): Double =
    if (java.lang.Double.isNaN(v) || java.lang.Double.isInfinite(v)) v
    else java.math.BigDecimal.valueOf(v)
      .setScale(6, java.math.RoundingMode.HALF_UP).doubleValue()

  /** Column wrapper: struct(n_words, mean_word_len, frac_alpha_words,
    * dup_line_frac, bullet_line_frac, ellipsis_line_frac, top_bigram_frac).
    */
  def gopherStats(text: Column): Column =
    GraftSqlShim.column(GopherStats(GraftSqlShim.expression(text)))
}
