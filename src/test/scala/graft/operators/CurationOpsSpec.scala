package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

import scala.util.Random

/** Round-10 curation operators: URL canonicalization dedup, T5-style span
  * corruption, and the IVF-cell corpus map. Each is locked by an
  * independent in-test replica (plus the DuckDB oracles at catalog level).
  */
class CurationOpsSpec extends SparkSpec {

  import spark.implicits._

  // ---------------------------------------------------------------- urls

  private def canon(u: String): String =
    Seq((1L, u)).toDF("id", "url")
      .select(TextAnalysis.canonicalizeUrl(col("url")).as("c"))
      .as[String].head()

  test("canonicalizeUrl: scheme/host case, www, default ports, fragments") {
    assert(canon("HTTPS://WWW.Ex.COM:443/A/b?x=1#frag") ===
      "https://ex.com/A/b?x=1")
    assert(canon("http://ex.com:80/p") === "http://ex.com/p")
    // non-default port is KEPT
    assert(canon("http://ex.com:8080/p") === "http://ex.com:8080/p")
    assert(canon("https://ex.com:80/p") === "https://ex.com:80/p")
    // path case survives (paths are case-sensitive by spec)
    assert(canon("https://Ex.com/CaseSensitive") ===
      "https://ex.com/CaseSensitive")
  }

  test("canonicalizeUrl: utm params dropped, the rest sorted, lone ? dropped") {
    assert(canon("https://ex.com/p?b=2&a=1&utm_source=x&utm_c=y") ===
      "https://ex.com/p?a=1&b=2")
    assert(canon("https://ex.com/p?utm_source=x") === "https://ex.com/p")
    assert(canon("https://ex.com/p?") === "https://ex.com/p")
    assert(canon("https://ex.com/p") === "https://ex.com/p")
  }

  test("URL dedup collapses link variants of the same page") {
    val variants = Seq(
      "https://ex.com/page?a=1&b=2",
      "HTTPS://WWW.ex.com:443/page?b=2&a=1#top",
      "https://ex.com/page?utm_campaign=c&a=1&b=2",
      "https://other.com/page?a=1&b=2")
    val df = variants.zipWithIndex.map { case (u, i) => (i.toLong, u) }
      .toDF("doc_id", "url")
    val groups = df
      .groupBy(TextAnalysis.canonicalizeUrl(col("url")).as("c"))
      .agg(count(lit(1)).as("n"), min(col("doc_id")).as("keep"))
      .as[(String, Long, Long)].collect()
      .map { case (k, n, keep) => k -> ((n, keep)) }.toMap
    assert(groups("https://ex.com/page?a=1&b=2") == ((3L, 0L)))
    assert(groups("https://other.com/page?a=1&b=2") == ((1L, 3L)))
  }

  test("canonicalizeUrl: schemeless/unparseable inputs stay distinct") {
    // Without the scheme fallback these all collapsed to "://" and the
    // min-doc_id dedup silently merged unrelated documents.
    assert(canon("example.com/a") === "example.com/a")
    assert(canon("other.org/b") === "other.org/b")
    assert(canon("/relative/path?x=1") === "/relative/path?x=1")
    assert(canon("not a url at all") === "not a url at all")
    // fragment still stripped on the fallback path
    assert(canon("example.com/a#frag") === "example.com/a")
    // schemeless variants of DIFFERENT pages never share a dedup key
    val ids = Seq("example.com/a", "other.org/b", "plain text")
      .zipWithIndex.map { case (u, i) => (i.toLong, u) }.toDF("doc_id", "url")
      .groupBy(TextAnalysis.canonicalizeUrl(col("url")).as("c"))
      .count().as[(String, Long)].collect().toMap
    assert(ids.size === 3 && ids.values.forall(_ == 1L))
  }

  test("outlinks: document-order hrefs, canonicalized, relative kept verbatim") {
    val html = "<p>a</p><a href=\"HTTPS://WWW.Ex.COM:443/A?b=2&a=1&utm_s=x\">x</a>" +
      " mid <A class=\"k\" HREF=\"/rel/7#frag\">y</A><a name=\"no-href\">z</a>"
    val got = Seq((5L, html)).toDF("doc_id", "html")
    val rows = TextAnalysis.outlinks(got, "doc_id", "html")
      .select("link_idx", "href", "canon_url")
      .as[(Int, String, String)].collect().sortBy(_._1)
    assert(rows.toSeq == Seq(
      (0, "HTTPS://WWW.Ex.COM:443/A?b=2&a=1&utm_s=x", "https://ex.com/A?a=1&b=2"),
      (1, "/rel/7#frag", "/rel/7"))) // fallback: fragment-stripped verbatim
  }

  test("outlinks: single-quoted and unquoted hrefs; paired-quote strip never rescans") {
    val html = "<a href='/sq'>a</a>" +          // single-quoted
      "<a class=m href=/uq>b</a>" +             // unquoted, '>'-terminated
      "<a href=/ws next=1>c</a>" +              // unquoted, space-terminated
      "<a href=\"'/dq'\">d</a>" +               // double-quoted, inner single
      "<a href=''>e</a>" +                      // single-quoted empty
      "<a href= >f</a>" +                       // empty unquoted: no match
      "<a href='x\"y'>g</a>"                    // single-quoted, inner double
    val rows = TextAnalysis.outlinks(
        Seq((1L, html)).toDF("doc_id", "html"), "doc_id", "html")
      .select("link_idx", "href").as[(Int, String)].collect().sortBy(_._1)
    assert(rows.toSeq == Seq(
      (0, "/sq"), (1, "/uq"), (2, "/ws"),
      (3, "'/dq'"),  // ONE strip: the inner quotes are content
      (4, ""), (5, "x\"y")))
  }

  test("outlinks: a quoted href spanning a newline still strips its quotes (DOTALL)") {
    // the extraction classes "[^"]*" / '[^']*' admit newlines, so the
    // paired strip must too — without (?s) these fell through both strip
    // branches and kept their literal quotes
    val html = "<a href=\"/nl\na\">x</a><a href='/nl\nb'>y</a>" +
      "<a href=\"/tail\n\">z</a>" // quoted href ENDING in a newline
    val rows = TextAnalysis.outlinks(
        Seq((1L, html)).toDF("doc_id", "html"), "doc_id", "html")
      .select("link_idx", "href").as[(Int, String)].collect().sortBy(_._1)
    assert(rows.toSeq == Seq((0, "/nl\na"), (1, "/nl\nb"), (2, "/tail\n")))
  }

  test("blocklistFilter: domain, label-boundary suffix, and path-prefix rules") {
    val docs = Seq(
      (0L, "https://WWW.AlphaNews.com/a/0"), // lookalike: must SURVIVE
      (1L, "http://beta-site.ORG/p/1"),      // exact domain: blocked
      (2L, "https://cdn.news.com/x/2"),      // suffix via subdomain: blocked
      (3L, "https://news.com/y/3"),          // suffix exact: blocked
      (4L, "https://deep.a.b.news.com/z/4"), // 3-deep subdomain: blocked
      (5L, "https://gamma.io/private/5"),    // path prefix: blocked
      (6L, "https://gamma.io/public/6"),     // same host, other path: survives
      (7L, "/relative/7")                    // schemeless '' domain: survives
    ).toDF("doc_id", "url")
    val bl = Seq(
      ("domain", "beta-site.org", ""),
      ("suffix", "news.com", ""),
      ("prefix", "gamma.io", "https://gamma.io/private/")
    ).toDF("kind", "domain", "pattern")
    val got = TextAnalysis.blocklistFilter(docs, "doc_id", "url", bl)
      .select("doc_id").as[Long].collect().toSet
    assert(got == Set(0L, 6L, 7L))
    // a NULL url matches no rule, so the row SURVIVES (the three-valued
    // filter must not silently swallow it — coalesce guards each probe)
    val withNull = docs.select(col("doc_id"),
      when(col("doc_id") === 0L, lit(null: String)).otherwise(col("url")).as("url"))
    val gotNull = TextAnalysis.blocklistFilter(withNull, "doc_id", "url", bl)
      .select("doc_id").as[Long].collect().toSet
    assert(gotNull == Set(0L, 6L, 7L), "null-URL rows must pass the gate")
    // an empty blocklist blocks nothing
    val none = TextAnalysis.blocklistFilter(docs, "doc_id", "url",
        bl.filter(col("kind") === "nope"))
      .select("doc_id").as[Long].collect().toSet
    assert(none == (0L to 7L).toSet)
    // narrow plan: the only join is the broadcast one-row blocklist
    val plan = TextAnalysis.blocklistFilter(docs, "doc_id", "url", bl)
      .queryExecution.executedPlan.toString()
    assert(!plan.contains("SortMergeJoin") && !plan.contains("ShuffledHashJoin"),
      s"the corpus must not shuffle:\n$plan")
  }

  test("anchorLinks: text to the first nested tag, normalized; anchorIndex argmax") {
    val html =
      "<a href=\"https://Ex.com/t\">  Read\n  MORE </a>" + // case+ws collapse
        "<a href='https://ex.com/t'>read more</a>" +       // same target+anchor
        "<a href=/t2>u<b>bold</b></a>" +                   // stops at first '<'
        "<a href=\"/t2\"></a>" +                           // empty anchor
        "<a name=x>no href</a>"                            // no href: no row
    val links = TextAnalysis.anchorLinks(
        Seq((1L, html), (2L, html)).toDF("doc_id", "html"), "doc_id", "html")
    val got = links.select("doc_id", "link_idx", "canon_url", "anchor")
      .as[(Long, Int, String, String)].collect().sortBy(r => (r._1, r._2))
    assert(got.filter(_._1 == 1L).map(r => (r._3, r._4)).toSeq == Seq(
      ("https://ex.com/t", "read more"), ("https://ex.com/t", "read more"),
      ("/t2", "u"), ("/t2", "")))
    val idx = TextAnalysis.anchorIndex(links, "doc_id")
      .select("canon_url", "n_refs", "n_docs", "top_anchor", "top_refs")
      .as[(String, Long, Long, String, Long)].collect()
      .map(r => r._1 -> r).toMap
    assert(idx("https://ex.com/t") ==
      (("https://ex.com/t", 4L, 2L, "read more", 4L)))
    // /t2 ties 'u' (2 refs) with '' (2 refs): tie breaks lexicographically
    assert(idx("/t2") == (("/t2", 4L, 2L, "", 2L)))
    // the extraction is a pure narrow map — no exchange before the rollup
    val plan = links.queryExecution.executedPlan.toString()
    assert(!plan.contains("Exchange"), s"anchorLinks must not shuffle:\n$plan")
  }

  test("anchorLinks fuzz: randomized anchor soup equals a JVM regex replica") {
    // random documents assembled from anchor fragments in all three
    // quotings, malformed tags, nested tags inside anchor text, newlines
    // inside quoted hrefs, and plain-text noise — the operator must equal
    // an independent JVM application of its own defining regex contract
    val pat = ("(?i)<a[^>]*?href=(\"[^\"]*\"|'[^']*'|[^\"' \\t\\n\\r\\f>]+)" +
      "[^>]*>([^<]*)").r
    def jvmReplica(html: String): Seq[(String, String)] =
      pat.findAllMatchIn(html).map { m =>
        val hr0 = m.group(1)
        val href =
          if (hr0.length >= 2 && hr0.head == '"' && hr0.last == '"')
            hr0.substring(1, hr0.length - 1)
          else if (hr0.length >= 2 && hr0.head == '\'' && hr0.last == '\'')
            hr0.substring(1, hr0.length - 1)
          else hr0
        val anchor = m.group(2).replaceAll("[ \\t\\n\\r\\f]+", " ")
          .trim.toLowerCase
        (href, anchor)
      }.toSeq
    val rnd = new scala.util.Random(59)
    def frag(): String = rnd.nextInt(10) match {
      case 0 => s"""<a href="/d/${rnd.nextInt(9)}">Text ${rnd.nextInt(9)}</a>"""
      case 1 => s"""<a class=x href='/s/${rnd.nextInt(9)}'>  A  B </a>"""
      case 2 => s"""<a href=/u/${rnd.nextInt(9)} id=k>u<b>inner</b></a>"""
      case 3 => s"""<a href="/n/${rnd.nextInt(9)}\n2">n</a>"""
      case 4 => s"""<a name=no>plain anchor</a>"""
      case 5 => s"""<a href=>empty</a>"""
      case 6 => "just text < with a stray bracket "
      case 7 => s"""<a href="/e/${rnd.nextInt(9)}"></a>"""
      case 8 => s"""<A HREF="/C/${rnd.nextInt(9)}">CAPS</A>"""
      case _ => s" filler ${rnd.nextInt(99)} "
    }
    val docs = (0L until 60L).map(i =>
      (i, Seq.fill(3 + rnd.nextInt(8))(frag()).mkString))
    val got = TextAnalysis.anchorLinks(docs.toDF("doc_id", "html"),
        "doc_id", "html")
      .select("doc_id", "link_idx", "href", "anchor")
      .as[(Long, Int, String, String)].collect()
      .groupBy(_._1).view
      .mapValues(_.sortBy(_._2).map(r => (r._3, r._4)).toSeq).toMap
    val htmlOf = docs.toMap
    for ((id, html) <- docs) {
      val want = jvmReplica(html)
      assert(got.getOrElse(id, Seq.empty) == want,
        s"doc $id diverged on: ${htmlOf(id).take(200)}")
    }
  }

  // -------------------------------------------------------- span corrupt

  /** Parse '<extra_id_k> tok…' runs out of a target stream. */
  private def parseTargets(tgt: String): Map[Int, Seq[String]] = {
    if (tgt.isEmpty) return Map.empty
    val sentinel = "<extra_id_(\\d+)>".r
    val parts = tgt.split(" ").toSeq
    val out = collection.mutable.Map.empty[Int, Vector[String]]
    var cur = -1
    parts.foreach {
      case sentinel(k) => cur = k.toInt; out(cur) = Vector.empty
      case w           => out(cur) = out(cur) :+ w
    }
    out.toMap
  }

  test("spanCorrupt: inputs+targets reconstruct the original token stream") {
    val rnd = new Random(3)
    val docs = (0L until 40L).map { i =>
      (i, (0 until 1 + rnd.nextInt(30))
        .map(_ => s"w${rnd.nextInt(9)}").mkString(" "))
    }.toDF("doc_id", "text")
    val out = Sampling.spanCorruptText(docs, "doc_id", "text", maskPct = 30)
      .select("doc_id", "n_tokens", "n_masked", "n_spans",
        "input_text", "target_text")
      .as[(Long, Long, Long, Long, String, String)].collect()
    assert(out.length == 40)
    val texts = docs.as[(Long, String)].collect().toMap
    val sentinel = "<extra_id_(\\d+)>".r
    out.foreach { case (id, nTok, nMask, nSpan, inp, tgt) =>
      val orig = texts(id).split("\\s+").filter(_.nonEmpty).toSeq
      assert(nTok == orig.size, s"doc $id")
      val spans = parseTargets(tgt)
      assert(spans.keySet == (0 until nSpan.toInt).toSet, s"doc $id")
      assert(spans.values.map(_.size).sum == nMask, s"doc $id")
      // sentinels in the input appear once each, in order
      val inputParts = if (inp.isEmpty) Seq.empty[String] else inp.split(" ").toSeq
      val sentinelsSeen = inputParts.collect { case sentinel(k) => k.toInt }
      assert(sentinelsSeen == (0 until nSpan.toInt), s"doc $id")
      // splice the spans back in -> the original stream
      val rebuilt = inputParts.flatMap {
        case sentinel(k) => spans(k.toInt)
        case w           => Seq(w)
      }
      assert(rebuilt == orig, s"doc $id")
    }
    // determinism: a re-run produces identical rows
    val again = Sampling.spanCorruptText(docs, "doc_id", "text", maskPct = 30)
      .select("doc_id", "n_tokens", "n_masked", "n_spans",
        "input_text", "target_text")
      .as[(Long, Long, Long, Long, String, String)].collect()
    assert(out.sortBy(_._1).toSeq == again.sortBy(_._1).toSeq)
  }

  test("spanCorrupt: 0% masks nothing, 100% masks one whole-document span") {
    val docs = Seq((7L, "a b c d e")).toDF("doc_id", "text")
    val none = Sampling.spanCorruptText(docs, "doc_id", "text", maskPct = 0)
      .select("n_masked", "n_spans", "input_text", "target_text")
      .as[(Long, Long, String, String)].head()
    assert(none == ((0L, 0L, "a b c d e", "")))
    val all = Sampling.spanCorruptText(docs, "doc_id", "text", maskPct = 100)
      .select("n_masked", "n_spans", "input_text", "target_text")
      .as[(Long, Long, String, String)].head()
    assert(all == ((5L, 1L, "<extra_id_0>", "<extra_id_0> a b c d e")))
  }

  test("native span-corrupt kernel is bit-identical to the HOF fold oracle") {
    val rnd = new Random(29)
    val docs = ((0L until 60L).map { i =>
      (i, (0 until rnd.nextInt(40)).map(_ => s"tok${rnd.nextInt(12)}")
        .mkString(" "))
    } :+ (99L, "")).toDF("doc_id", "text")
    Seq(0, 15, 55, 100).foreach { pct =>
      val native = Sampling.spanCorruptText(docs, "doc_id", "text", pct)
        .collect().map(_.toSeq).toSet
      val hof = Sampling.spanCorruptTextHof(docs, "doc_id", "text", pct)
        .collect().map(_.toSeq).toSet
      assert(native == hof, s"maskPct=$pct diverged")
    }
  }

  test("spanCorrupt: empty and null text keep a zero row") {
    val docs = Seq((1L, ""), (2L, null.asInstanceOf[String]), (3L, "  "))
      .toDF("doc_id", "text")
    val out = Sampling.spanCorrupt(docs, "doc_id", "text", maskPct = 50)
      .select("doc_id", "n_tokens", "n_masked", "n_spans")
      .as[(Long, Long, Long, Long)].collect().toSet
    assert(out == Set((1L, 0L, 0L, 0L), (2L, 0L, 0L, 0L), (3L, 0L, 0L, 0L)))
  }

  // --------------------------------------------------- quality filter

  test("quality_nb weights and scores match a hand replica incl. OOV") {
    val docs = Seq(
      (1L, "good good data", true), // reference class
      (2L, "good data", true),
      (3L, "spam spam spam data", false),
      (4L, "spam junk", false)).toDF("doc_id", "text", "ref")
    val model = QualityFilter.nbModel(docs, "text", col("ref"))
    // counts: good cp=3 cn=0; data cp=2 cn=1; spam cp=0 cn=4; junk cp=0 cn=1
    // totPos=5 totNeg=6 V=4 -> t = 1e6*10/9 = 1111111
    assert((model.totPos, model.totNeg, model.vocab) == ((5L, 6L, 4L)))
    val t = 1111111L
    assert(model.defaultWeight == t)
    val w = model.weights.as[(String, Long)].collect().toMap
    assert(w("good") == 4 * t / 1)
    assert(w("data") == 3 * t / 2)
    assert(w("spam") == 1 * t / 5)
    assert(w("junk") == 1 * t / 2)
    val got = QualityFilter.nbScoresWith(docs, "doc_id", "text", model)
      .as[(Long, Long, Long, Long)].collect().map(r => r._1 -> r).toMap
    val d1 = 2 * w("good") + w("data")
    assert(got(1L) == ((1L, 3L, d1, d1 / 3)))
    val d3 = 3 * w("spam") + w("data")
    assert(got(3L) == ((3L, 4L, d3, d3 / 4)))
    // reference docs score above crawl docs
    assert(got(1L)._4 > got(3L)._4 && got(2L)._4 > got(4L)._4)
    // OOV scoring: unseen words take the class-neutral default weight;
    // a wordless doc keeps a row with NULL mean
    val oov = QualityFilter.nbScoresWith(
      Seq((9L, "unseen tokens"), (10L, "")).toDF("doc_id", "text"),
      "doc_id", "text", model)
      .select("doc_id", "n_scored", "quality_score")
      .as[(Long, Long, Long)].collect()
      .map { case (k, a, b) => k -> ((a, b)) }.toMap
    assert(oov(9L) == ((2L, 2 * t)))
    assert(oov(10L) == ((0L, 0L)))
    model.release()
  }

  test("quality_nb model save/load round-trip scores identically") {
    val docs = Seq(
      (1L, "alpha beta beta", true), (2L, "gamma gamma delta", false))
      .toDF("doc_id", "text", "ref")
    val model = QualityFilter.nbModel(docs, "text", col("ref"))
    val dir = java.nio.file.Files.createTempDirectory("nbmodel").toString
    model.save(dir)
    val reloaded = QualityFilter.loadNbModel(spark, dir)
    val a = QualityFilter.nbScoresWith(docs, "doc_id", "text", model)
      .collect().map(_.toSeq).toSet
    val b = QualityFilter.nbScoresWith(docs, "doc_id", "text", reloaded)
      .collect().map(_.toSeq).toSet
    assert(a == b)
    model.release(); reloaded.release()
  }

  // ------------------------------------------------------- cluster map

  test("clusterAssign matches an independent max-cosine replica") {
    val rnd = new Random(11)
    val vecs = (0L until 100L).map { i =>
      (i, Array.fill(4)(rnd.nextDouble() - 0.3))
    }
    val df = vecs.map { case (i, v) => (i, v.toSeq) }
      .toDF("vec_id", "embedding")
    val got = VectorOps.clusterAssign(df, "vec_id", "embedding", minStride = 25)
      .select("cid", "n_members", "min_id", "sum_norm_q6")
      .as[(Long, Long, Long, Long)].collect().sortBy(_._1).toSeq

    // replica: centroids = ids 0,25,50,75 (stride 25); max cosine, tie to
    // the smaller centroid id; norm sums as floor(x*1e6) integers
    def nrm(v: Array[Double]) = math.sqrt(v.map(x => x * x).sum)
    val cents = Seq(0L, 25L, 50L, 75L).map(i => (i, vecs(i.toInt)._2))
    val assigned = vecs.map { case (i, v) =>
      val best = cents.map { case (cid, cv) =>
        val dot = v.zip(cv).map { case (a, b) => a * b }.sum
        (cid, dot / (nrm(v) * nrm(cv)))
      }.minBy { case (cid, s) => (-s, cid) }._1
      (best, i, math.floor(nrm(v) * 1e6).toLong)
    }
    val expect = assigned.groupBy(_._1).map { case (cid, g) =>
      (cid, g.size.toLong, g.map(_._2).min, g.map(_._3).sum)
    }.toSeq.sortBy(_._1)
    assert(got == expect)
    assert(got.map(_._2).sum == 100L)
  }
}
