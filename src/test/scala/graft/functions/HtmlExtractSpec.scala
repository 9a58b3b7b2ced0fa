package graft.functions

import graft.SparkSpec
import graft.operators.TextAnalysis
import org.apache.spark.sql.functions._

import scala.util.Random

/** The native single-pass HTML kernel against its defining regex chain
  * ([[TextAnalysis.htmlExtractRelational]]) — hand-built stage cases,
  * malformed-input fallbacks, and a randomized assembly differential.
  */
class HtmlExtractSpec extends SparkSpec {
  import spark.implicits._

  private def kernel(html: String): (String, String, Long) =
    Seq(Tuple1(html)).toDF("h")
      .select(HtmlExtract.htmlExtract(col("h")).as("e"))
      .select("e.title", "e.text", "e.n_links")
      .as[(String, String, Long)].head()

  private def chain(html: String): (String, String, Long) =
    Seq(Tuple1(html)).toDF("h")
      .select(TextAnalysis.htmlExtractRelational(col("h")).as("e"))
      .select("e.title", "e.text", "e.n_links")
      .as[(String, String, Long)].head()

  test("full document: title, body text, links, entities, boilerplate") {
    val html = "<html><!-- c --><head><title>My Page</title>" +
      "<style>p{x}</style></head><body><h1>Head</h1>" +
      "<p>See <a href=\"/x\">this link</a> &amp; <A HREF='/y'>that</A>" +
      " &lt;raw&gt;&nbsp;&quot;q&quot; &#39;s&#39;</p>" +
      "<script>var a = 1 < 2;</script>tail</body></html>"
    val got = kernel(html)
    assert(got == (("My Page",
      "Head See this link & that <raw> \"q\" 's' tail", 2L)))
    assert(got == chain(html))
  }

  test("no title, no links, plain text passes through collapsed") {
    val html = "plain  text\n\twith   runs"
    val got = kernel(html)
    assert(got == (("", "plain text with runs", 0L)))
    assert(got == chain(html))
  }

  test("malformed fallbacks match the chain's failed-regex behavior") {
    val cases = Seq(
      "<!-- unclosed comment eats nothing",      // '<' stays literal
      "a<script>xx",                             // unclosed block -> bare tag
      "a<script>b</script",                      // close marker without '>'
      "a < b and c > d",                         // bare angle brackets
      "<title>no close",                         // title regex can't match
      "<a",                                      // anchor prefix at EOF
      "x<a>y",                                   // bare anchor still counts
      "&amp;lt; &unknown; &&amp;",               // non-recursive decode
      "<header>h</header>text",                  // '<head' prefix eats header
      "<div unclosed")
    for (h <- cases) assert(kernel(h) == chain(h), s"input: $h")
  }

  /** The third documented out-of-scope class (kernel scaladoc): removable
    * blocks whose open/close tags CROSS. The chain applies stages globally
    * in head→script→style order, so the earlier-stage block wins even when
    * it opens later in the document; the kernel takes whichever block
    * opens first. These hand cases pin BOTH behaviors so the divergence is
    * stated, not latent. Real HTML never nests these blocks at all.
    */
  test("interleaved removable blocks: documented kernel-vs-chain divergence") {
    // style opens first, script closes last: chain's script stage removes
    // <script>B</style>C</script> first (keeps A); the kernel skips the
    // style block <style>A<script>B</style> first (keeps C)
    val styleFirst = "<style>A<script>B</style>C</script>"
    assert(kernel(styleFirst) == (("", "C", 0L)))
    assert(chain(styleFirst) == (("", "A", 0L)))
    // head opens later but its stage runs first: chain keeps A, kernel C
    val headCross = "<script>A<head>B</script>C</head>"
    assert(kernel(headCross) == (("", "C", 0L)))
    assert(chain(headCross) == (("", "A", 0L)))
    // script opens first: stage order and document order agree — no
    // divergence even though the tags cross
    val scriptFirst = "<script>A<style>B</script>C</style>"
    assert(kernel(scriptFirst) == (("", "C", 0L)))
    assert(kernel(scriptFirst) == chain(scriptFirst))
  }

  /** Numeric character references: the decode window is BMP non-surrogate
    * (1..0xFFFF \ D800..DFFF); everything else passes through as literal
    * text. Each case asserts the exact kernel output AND kernel == chain
    * (which replays in DuckDB with chr()).
    */
  test("numeric character references: decode window and pass-through classes") {
    val cases = Seq(
      "a &#246; b"     -> "a ö b",      // decimal BMP
      "a &#xE9; b"     -> "a é b",      // hex BMP
      "a &#X2013; b"   -> "a – b",      // uppercase X
      "&#65;&#x42;"    -> "AB",              // adjacent refs, no separators
      "&#0246;"        -> "ö",          // leading zeros count as digits
      "&#999999;"      -> "&#999999;",       // > 0xFFFF: literal
      "&#xD800; &#xDFFF;" -> "&#xD800; &#xDFFF;", // surrogates: literal
      "&#0;"           -> "&#0;",            // NUL: literal
      "&#x110000;"     -> "&#x110000;",      // 6 hex digits: overlong, literal
      "&#1114112;"     -> "&#1114112;",      // 7 decimal digits: overlong, literal
      "&#x;"           -> "&#x;",            // no digits
      "&#12"           -> "&#12",            // no ';'
      "&#38;lt;"       -> "&lt;",            // decoded '&' is NOT rescanned
      "&amp;#38;"      -> "&#38;")           // fixed-table '&' not rescanned either
    for ((in, out) <- cases) {
      assert(kernel(in) == (("", out, 0L)), s"input: $in")
      assert(kernel(in) == chain(in), s"chain diverged on: $in")
    }
  }

  test("randomized assembly differential: kernel == chain") {
    val rnd = new Random(47)
    // stray '<' immediately before a removable block is the documented
    // out-of-scope divergence (chain removes blocks before the tag stage,
    // the kernel reads in document order) — keep fuzz text '<'-free; bare
    // brackets are covered by the hand cases where order cannot differ
    val words = Seq("alpha", "beta", "&amp;", "&lt;x&gt;", "&bad;", "7 > 6",
      // numeric character references: valid decimal/hex and every
      // pass-through class (out-of-range, surrogate, NUL, overlong,
      // missing digits, missing ';', decode-then-literal tails)
      "&#246;", "&#xE9;", "&#X2013;", "&#65;Z", "&#999999;", "&#xD800;",
      "&#0;", "&#x110000;", "&#x;", "&#", "&#38;lt;", "&amp;#38;", "&#12")
    val pieces = Seq(
      () => words(rnd.nextInt(words.size)),
      () => s"<!-- ${words(rnd.nextInt(words.size))} -->",
      () => s"<p class='c${rnd.nextInt(9)}'>",
      () => "</p>",
      () => s"<a href='/l${rnd.nextInt(9)}'>link</a>",
      () => s"<script>var x = ${rnd.nextInt(99)};</script>",
      () => s"<style>.s{k:${rnd.nextInt(99)}}</style>",
      () => s"<title>T${rnd.nextInt(9)}</title>",
      () => "\n  \t ")
    val docs = Seq.fill(200) {
      Seq.fill(1 + rnd.nextInt(12))(pieces(rnd.nextInt(pieces.size))())
        .mkString(" ")
    }
    val both = docs.toDF("h").select(
        HtmlExtract.htmlExtract(col("h")).as("k"),
        TextAnalysis.htmlExtractRelational(col("h")).as("c"))
      .as[((String, String, Long), (String, String, Long))].collect()
    both.zip(docs).foreach { case ((k, c), d) => assert(k == c, s"input: $d") }
  }

  test("SQL functions html_extract / span_corrupt are registered via GraftExtensions") {
    // html_extract: 1-arg struct round-trip matches the Column kernel
    val viaSql = spark.sql(
      "SELECT html_extract('<title>T</title><p>a &#246; <a href=\"/x\">l</a></p>') AS e")
      .select("e.title", "e.text", "e.n_links")
      .as[(String, String, Long)].head()
    assert(viaSql == kernel("<title>T</title><p>a &#246; <a href=\"/x\">l</a></p>"))
    val e1 = intercept[org.apache.spark.sql.AnalysisException] {
      spark.sql("SELECT html_extract('a', 'b')").collect()
    }
    assert(e1.getMessage.contains("html_extract"), e1.getMessage)

    // span_corrupt: the maskPct argument must be a foldable INT literal
    val viaSql2 = spark.sql(
      "SELECT span_corrupt(split('a b c d e f g h', ' '), 7L, 30) AS s")
      .select("s.n_masked").as[Long].head()
    val viaCol = Seq((7L, "a b c d e f g h")).toDF("doc_id", "text")
      .select(SpanCorrupt.spanCorrupt(
        split(col("text"), " "), col("doc_id"), 30).as("s"))
      .select("s.n_masked").as[Long].head()
    assert(viaSql2 == viaCol)
    // widened integral literals configure the kernel identically (a LONG
    // or SMALLINT literal is the same maskPct, not an arity error)
    val viaLong = spark.sql(
      "SELECT span_corrupt(split('a b c d e f g h', ' '), 7L, 30L) AS s")
      .select("s.n_masked").as[Long].head()
    val viaShort = spark.sql(
      "SELECT span_corrupt(split('a b c d e f g h', ' '), 7L, CAST(30 AS SMALLINT)) AS s")
      .select("s.n_masked").as[Long].head()
    assert(viaLong == viaCol && viaShort == viaCol)
    val e2 = intercept[org.apache.spark.sql.AnalysisException] {
      spark.sql("SELECT span_corrupt(split('a b', ' '), 1L)").collect()
    }
    assert(e2.getMessage.contains("span_corrupt"), e2.getMessage)
    val e3 = intercept[org.apache.spark.sql.AnalysisException] {
      // non-foldable maskPct: a column reference cannot configure the
      // kernel — reported as a DATATYPE_MISMATCH (a type problem), not a
      // wrong-number-of-arguments one
      spark.sql(
        "SELECT span_corrupt(split('a b', ' '), 1L, CAST(id AS INT)) FROM range(1)")
        .collect()
    }
    assert(e3.getMessage.contains("span_corrupt"), e3.getMessage)
    assert(e3.getCondition != null && e3.getCondition.startsWith("DATATYPE_MISMATCH"),
      s"expected a type-oriented error class, got ${e3.getCondition}")
    val e4 = intercept[org.apache.spark.sql.AnalysisException] {
      // wrong TYPE: a string literal is a type mismatch, same class
      spark.sql("SELECT span_corrupt(split('a b', ' '), 1L, 'x')").collect()
    }
    assert(e4.getCondition != null && e4.getCondition.startsWith("DATATYPE_MISMATCH"),
      s"expected a type-oriented error class, got ${e4.getCondition}")
  }

  test("plan: extractContent is a pure narrow map — zero exchanges") {
    val df = Seq((1L, "<p>a</p>")).toDF("doc_id", "html")
    val p = TextAnalysis.extractContent(df, "doc_id", "html")
      .queryExecution.executedPlan.toString()
    assert(!p.contains("Exchange"), s"expected no shuffle:\n$p")
  }
}
