package graft.queries

import graft.Tables
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Text-analysis and deduplication queries over `documents`
  * (doc_id, text, lang, source, n_chars). First wave: exact dedup and
  * cheap per-document statistics; MinHash/SimHash waves follow in
  * graft.dedup.
  */
object TextQueries {

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    // Exact dedup: hash-groupBy on content digest; keeper = lowest doc_id.
    // Map-side partial agg makes this one small shuffle of (digest, id).
    "dedup_exact" -> { (s, d) =>
      Tables.documents(s, d)
        .groupBy(md5(col("text")).as("digest"))
        .agg(count(lit(1)).as("n_dups"), min(col("doc_id")).as("keep_id"))
    },

    // Token / character statistics per document (whitespace tokenization).
    "text_stats" -> { (s, d) =>
      Tables.documents(s, d).select(
        col("doc_id"),
        size(split(trim(col("text")), "\\s+")).cast("long").as("n_tokens"),
        length(col("text")).cast("long").as("len"),
        round(
          (length(col("text")) -
            length(regexp_replace(col("text"), " ", ""))).cast("double") /
            length(col("text")), 4).as("space_ratio"))
    },

    // Corpus rollup by (lang, source): the partition-pruning shape a crawl
    // pipeline uses to budget per-language shards.
    // avg is integer-quantized to centi-chars: `round(avg(bigint), 2)` can
    // land EXACTLY on a .005 tie (sum 99189 / 360 docs = 275.525 — hit at
    // the sf1 sweep), where Spark rounds the decimal string (275.53) and
    // DuckDB the binary double (275.52). `(100*sum) div count` is integer
    // end to end — bit-stable on any engine, the text_lm stance.
    "text_by_lang" -> { (s, d) =>
      Tables.documents(s, d)
        .groupBy(col("lang"), col("source"))
        .agg(count(lit(1)).as("n_docs"),
          sum(col("n_chars")).as("sum_chars"),
          expr("(100 * sum(n_chars)) div count(1)").as("avg_centichars"))
    },

    // Intra-document repetition (duplicated bigram fraction): the cheap
    // looping-text / boilerplate-stuffing filter. Pure narrow map (split
    // and gram array pinned behind collapse barriers — see repetitionFrame).
    "text_repetition" -> { (s, d) =>
      graft.operators.TextAnalysis.repetitionFrame(
        Tables.documents(s, d), "doc_id", "text", n = 2)
    },

    // Corpus boilerplate mining: top-20 most frequent 3-grams with document
    // reach. One map-side-combined shuffle + TakeOrderedAndProject.
    "text_boilerplate" -> { (s, d) =>
      graft.operators.TextAnalysis.boilerplateNgrams(
        Tables.documents(s, d), "doc_id", "text")
    },

    // Collocation mining: top-20 adjacent bigrams by integer LIFT
    // (c(ab)·T / (c(a)·c(b)) — the monotone twin of PMI = ln(lift), so
    // the ranking is the PMI ranking with zero libm in the row). Two
    // vocab-sized map-side aggs, word-keyed joins, DECIMAL-widened ppm,
    // TakeOrderedAndProject.
    "text_collocations" -> { (s, d) =>
      graft.operators.TextAnalysis.collocations(
        Tables.documents(s, d), "text", minCount = 5L, k = 20)
    },

    // PII detection + redaction. The synthetic corpus contains no PII, so
    // the query PLANTS a deterministic email/IP/phone per document (the same
    // expression the oracle SQL builds) — the driver's hash compare then
    // genuinely cross-verifies the Java-regex vs RE2 dialects on both the
    // match counts and the byte-exact redacted text (digested: the full
    // redaction is corpus-sized). Pure narrow map.
    // Gopher/MassiveText quality rules. The synthetic corpus has no line
    // structure, so the query SYNTHESIZES it deterministically (the same
    // expression the oracle SQL builds): reflow onto 7-word lines, double
    // every 6th document's lines (duplicate-line rule), bullet every 3rd
    // document's lines (bullet rule), ellipsis-suffix every 4th (ellipsis
    // rule) — every rule fires on a real slice of the corpus and the hash
    // compare cross-verifies the full signal set. Pure narrow map.
    "text_gopher" -> { (s, d) =>
      val id = col("doc_id")
      val l0 = regexp_replace(col("text"), "((?:\\S+ ){6}\\S+) ", "$1\n")
      val l1 = when(id % 6 === 0, concat(l0, lit("\n"), l0)).otherwise(l0)
      val l2 = when(id % 3 === 0,
        concat(lit("- "), regexp_replace(l1, "\n", "\n- "))).otherwise(l1)
      val lined = when(id % 4 === 0,
        concat(regexp_replace(l2, "\n", "...\n"), lit("..."))).otherwise(l2)
      graft.operators.TextAnalysis.gopherFrame(
        Tables.documents(s, d).select(id, lined.as("text")), "doc_id", "text")
    },

    // Trained-BPE token statistics: a real byte-pair tokenizer (trained on
    // the corpus's own word-frequency table, 50 merges) replaces the
    // text_tokens regex heuristic. The merge loop is iterative, but with a
    // FIXED merge budget the whole training run replays in SQL: the oracle
    // chains one (pair-count → argmax → apply-until-exhausted) CTE block
    // per merge step (see bpeTrainCtes), and because applying a merge never
    // creates a lower-rank pair, the training loop's final word states ARE
    // the greedy tokenization — so one catalog row hash-checks training and
    // encode together (BpeSpec's independent reference implementation
    // remains as the unit-level lock).
    "text_bpe" -> { (s, d) =>
      val docs = Tables.documents(s, d)
      val model = graft.operators.Bpe.train(docs, "text", numMerges = 50)
      graft.operators.Bpe.tokenStatsPortable(docs, "doc_id", "text", model)
    },

    // The trained artifact itself — the ordered merge table a deployment
    // persists via BpeModel.save. Verified against the oracle's own
    // training replay: a wrong argmax ANYWHERE shifts every later rank.
    "text_bpe_merges" -> { (s, d) =>
      import s.implicits._
      val model = graft.operators.Bpe.train(
        Tables.documents(s, d), "text", numMerges = 50)
      model.merges.zipWithIndex
        .map { case ((a, b), r) => (r + 1, a, b) }
        .toDF("merge_rank", "lhs", "rhs")
    },

    // Pretrained-BPE encode: the production tokenizer shape — a FROZEN
    // merge artifact (Bpe.pretrained, trained once and embedded as a
    // literal) encodes the corpus in one narrow broadcast-rank pass. Unlike
    // the self-training text_bpe, the literal merges let the DuckDB oracle
    // replay the greedy lowest-rank encode EXACTLY (a recursive CTE applies
    // one leftmost merge occurrence per step — provably equal to the
    // operator's greedy loop: applying a merge never creates a pair of
    // lower rank, so rank-ascending one-at-a-time = globally-greedy; a
    // replace-all formulation is NOT equivalent on self-overlapping pairs
    // like (d,d) in 'ddddd' and was rejected by fuzzing). The digest is a
    // portable md5 of the space-joined token stream.
    "text_bpe_encode" -> { (s, d) =>
      graft.operators.Bpe.tokenStatsPortable(
        Tables.documents(s, d), "doc_id", "text",
        graft.operators.Bpe.BpeModel(graft.operators.Bpe.pretrained))
    },

    // HTML main-content extraction: the crawl funnel's entry step. The
    // synthetic corpus is plain text, so the query PLANTS a deterministic
    // HTML document around it (the text_gopher/text_pii stance): comment,
    // head with title+style, h1, body paragraph with anchor tags wrapped
    // around every 'join' and an entity sampler, trailing script block —
    // every kernel stage fires on every row, and the driver hash
    // cross-verifies the native single-pass kernel against DuckDB's replay
    // of the defining regex chain.
    "html_extract" -> { (s, d) =>
      val docId = col("doc_id").cast("string")
      val linked = regexp_replace(coalesce(col("text"), lit("")), "join",
        "<a href=\"https://ex.com/join\">join</a>")
      val html = concat(
        lit("<html><!-- docid "), docId,
        lit(" --><head><title>Doc "), docId,
        lit("</title><style>p { color: #333; }</style></head><body><h1>Doc "),
        docId,
        lit("</h1><p>"), linked,
        lit(" &lt;b&gt; &amp; &quot;q&quot;&nbsp;&#39;s&#39;" +
          // numeric character references: valid decimal + hex (incl.
          // uppercase X), then the pass-through classes — out-of-range,
          // surrogate, NUL, overlong hex, empty, and a bare '&#'
          " &#246;&#xE9;&#X2013; &#999999;&#xD800;&#0;&#x110000;bad&#x;&#</p>" +
          "<script type=\"text/javascript\">var d = "), docId,
        lit(";</script></body></html>"))
      graft.operators.TextAnalysis.extractContent(
        Tables.documents(s, d).select(col("doc_id"), html.as("html")),
        "doc_id", "html")
    },

    // Outlink extraction + crawl-frontier rollup. Plants one absolute
    // anchor per 'join' occurrence (host case noise + a utm param +
    // unsorted params — the canonicalizer must collapse five targets per
    // id-class), one RELATIVE double-quoted anchor (schemeless verbatim
    // fallback: /rel/0../rel/2 stay distinct frontier entries), one
    // SINGLE-QUOTED anchor, and one UNQUOTED anchor terminated by
    // whitespace — all three quoting shapes real crawl HTML ships.
    "html_links" -> { (s, d) =>
      val id = col("doc_id")
      val html = concat(
        regexp_replace(coalesce(col("text"), lit("")), lit("join"),
          concat(lit("<a href=\"https://Ex.com/j/"), (id % 5).cast("string"),
            lit("?utm_x=1&b=2&a=1\">join</a>"))),
        lit("<a href=\"/rel/"), (id % 3).cast("string"), lit("\">rel</a>"),
        lit("<a class=m href='/sq/"), (id % 2).cast("string"), lit("'>s</a>"),
        lit("<a href=/uq/"), (id % 4).cast("string"), lit(" id=u>u</a>"),
        // a quoted href WITH an embedded newline: the "[^"]*" class admits
        // it, so the (?s) paired strip must still fire (pre-fix, the strip
        // fell through and the literal quotes polluted canon_url)
        lit("<a href=\"/nl/"), (id % 2).cast("string"), lit("\n2\">n</a>"))
      graft.operators.TextAnalysis.outlinks(
          Tables.documents(s, d).select(id, html.as("html")),
          "doc_id", "html")
        .groupBy(col("canon_url"))
        .agg(count(lit(1)).as("n_refs"),
          count_distinct(col("doc_id")).as("n_docs"),
          min(col("doc_id")).as("first_doc"))
    },

    // URL blocklist gate (C4/CCNet frontier hygiene): planted URLs across
    // six classes probe all three rule kinds — the suffix rule must catch
    // the subdomain and the bare domain but NEVER the lookalike
    // ('alphanews.com' vs 'news.com' is the label-boundary trap), the
    // prefix rule splits one host into blocked and surviving paths.
    "url_blocklist" -> { (s, d) =>
      import s.implicits._
      val id = col("doc_id")
      val url = when(id % 6 === 0,
          concat(lit("https://WWW.AlphaNews.com/a/"), id.cast("string")))
        .when(id % 6 === 1,
          concat(lit("http://beta-site.ORG/p/"), id.cast("string")))
        .when(id % 6 === 2,
          concat(lit("https://cdn.news.com/x/"), id.cast("string")))
        .when(id % 6 === 3,
          concat(lit("https://news.com/y/"), id.cast("string")))
        .when(id % 6 === 4,
          concat(lit("https://gamma.io/private/"), id.cast("string")))
        .otherwise(concat(lit("https://gamma.io/public/"), id.cast("string")))
      val blocklist = Seq(
        ("domain", "beta-site.org", ""),
        ("suffix", "news.com", ""),
        ("prefix", "gamma.io", "https://gamma.io/private/")
      ).toDF("kind", "domain", "pattern")
      graft.operators.TextAnalysis.blocklistFilter(
          Tables.documents(s, d).select(id, url.as("url")),
          "doc_id", "url", blocklist)
        .select(col("doc_id"), col("domain"), col("canon_url"))
    },

    // Anchor-text index (the web-retrieval relevance signal): how other
    // pages describe a target, rolled up per canonicalized URL with the
    // dominant anchor text. Plants per-target anchors with case/whitespace
    // noise, a frequency split ('join now' vs the rarer 'Read  More'), a
    // nested-tag anchor (text stops at the first '<'), and empty anchors.
    "link_anchors" -> { (s, d) =>
      val id = col("doc_id")
      val html = concat(
        regexp_replace(coalesce(col("text"), lit("")), lit("join"),
          concat(lit("<a href=\"https://Ex.com/j/"), (id % 5).cast("string"),
            lit("?utm_x=1&b=2&a=1\">"),
            when(id % 3 === 0, lit("Read  More")).otherwise(lit("join now")),
            lit("</a>"))),
        lit("<a class=m href='/sq/"), (id % 2).cast("string"),
        lit("'>  Spaced   Anchor </a>"),
        lit("<a href=/uq/"), (id % 4).cast("string"),
        lit(" id=u>u<b>bold</b></a>"),
        lit("<a href=\"/empty/"), (id % 3).cast("string"), lit("\"></a>"))
      graft.operators.TextAnalysis.anchorIndex(
        graft.operators.TextAnalysis.anchorLinks(
          Tables.documents(s, d).select(id, html.as("html")),
          "doc_id", "html"),
        "doc_id")
    },

    // Integer-quantized TF-IDF keywords: top-3 most distinctive words per
    // document (quantized idf keeps the score integer-exact — bit-stable
    // across engines, like text_lm). Ties break by word.
    "text_tfidf" -> { (s, d) =>
      graft.operators.TextAnalysis.tfidfKeywords(
        Tables.documents(s, d), "doc_id", "text", k = 3)
    },

    // Cross-document duplicated-line removal (RefinedWeb paragraph dedup).
    // The synthetic corpus has no line structure or shared boilerplate, so
    // the query SYNTHESIZES both deterministically (the same expression the
    // oracle SQL builds): reflow onto 7-word lines, append a subscribe
    // prompt to every 3rd document and prepend a cookie banner to every
    // 4th — the two planted lines reach df >= minDocs and must be cut from
    // every carrier, while the reflowed content lines stay.
    "text_line_dedup" -> { (s, d) =>
      val id = col("doc_id")
      val l0 = regexp_replace(col("text"), "((?:\\S+ ){6}\\S+) ", "$1\n")
      val l1 = when(id % 3 === 0,
        concat(l0, lit("\nSubscribe to our newsletter today"))).otherwise(l0)
      val lined = when(id % 4 === 0,
        concat(lit("Cookie notice: this site uses cookies\n"), l1)).otherwise(l1)
      graft.operators.TextAnalysis.lineDedup(
        Tables.documents(s, d).select(id, lined.as("text")),
        "doc_id", "text", minDocs = 3)
    },

    // URL-level dedup (C4 / crawl-frontier shape): canonicalize, then one
    // map-side-combinable groupBy on the canonical string. The corpus has
    // no URL column, so the query SYNTHESIZES one per document (same
    // expression as the oracle) with every normalization hazard planted:
    // case noise in scheme/host, a www. prefix + default :443 port on even
    // ids, a unique utm_content tracking param (so all RAW urls are
    // distinct and the collapse is real work), unsorted params, and a
    // fragment on every 5th id. Canonical groups = source x 7 x 3.
    // Every 11th id is SCHEMELESS (crawl frontiers carry relative/bare
    // links): the fallback must keep them verbatim (fragment-stripped) —
    // each one its own canonical group, never collapsed to a shared key.
    "dedup_url" -> { (s, d) =>
      val id = col("doc_id")
      val raw = concat(
        when(id % 11 === 0, lit(""))
          .otherwise(when(id % 2 === 0, lit("HTTPS://WWW."))
            .otherwise(lit("https://"))),
        col("source"), lit(".Example.COM"),
        when(id % 2 === 0, lit(":443")).otherwise(lit("")),
        lit("/Docs/p"), (id % 7).cast("string"), lit("/"),
        lit("?utm_content=u"), id.cast("string"),
        lit("&id="), (id % 3).cast("string"), lit("&b=2&a=1"),
        when(id % 5 === 0, lit("#frag")).otherwise(lit("")))
      Tables.documents(s, d)
        .select(id, raw.as("url"))
        .groupBy(graft.operators.TextAnalysis.canonicalizeUrl(col("url"))
          .as("canon_url"))
        .agg(count(lit(1)).as("n_dups"),
          min(col("doc_id")).as("keep_id"),
          count_distinct(col("url")).as("n_variants"))
    },

    "text_pii" -> { (s, d) =>
      import graft.operators.TextAnalysis.{piiCounts, redactPii}
      val planted = concat(
        col("text"), lit(" contact user"), col("doc_id").cast("string"),
        lit("@example.com or 10.0."), (col("doc_id") % 256).cast("string"),
        lit(".7 ssn 123-45-67"), lpad((col("doc_id") % 100).cast("string"), 2, "0"),
        lit(" pay 4111 1111 1111 1111 call +1 555 01"),
        lpad((col("doc_id") % 100).cast("string"), 2, "0"))
      Tables.documents(s, d).select(
        col("doc_id") +:
          piiCounts(planted).map { case (n, c) => c.as(n) } :+
          md5(redactPii(planted)).as("redacted_digest"): _*)
    },

    // RAG-shaped sliding-window chunking: 64-word windows, 16-word overlap
    // (stride 48), digests instead of chunk text. Pure narrow explode —
    // zero exchanges; the chunk count is exactly what covers the last word.
    "doc_chunks" -> { (s, d) =>
      graft.operators.TextAnalysis.chunkDocuments(
        Tables.documents(s, d), "doc_id", "text",
        chunkWords = 64, overlapWords = 16)
    },

    // Corpus vocabulary head: top-10 words per language — ONE map-side
    // combinable (lang, word) count (the exploded words never reach the
    // reduce side un-combined), then the GroupTopK heap selects winners
    // without sorting the vocabulary. The word-frequency profile a
    // tokenizer-training or stopword-mining pass reads first.
    "frequent_terms" -> { (s, d) =>
      val words = Tables.documents(s, d)
        .select(col("lang"),
          explode(split(lower(col("text")), "\\s+")).as("word"))
        .filter(col("word") =!= "")
      val counts = words.groupBy(col("lang"), col("word"))
        .agg(count(lit(1)).as("n"))
      graft.plans.GroupTopK.topK(counts, Seq("lang"),
        Seq("n" -> false, "word" -> true), k = 10)
    })

  val oracle: Map[String, String] = Map(
    "dedup_exact" ->
      """SELECT md5(text) AS digest, count(*) AS n_dups,
        | min(doc_id) AS keep_id
        |FROM documents GROUP BY md5(text)""".stripMargin,
    "text_stats" ->
      """SELECT doc_id,
        | CAST(length(regexp_split_to_array(trim(text), '\s+')) AS BIGINT) AS n_tokens,
        | CAST(length(text) AS BIGINT) AS len,
        | round(CAST(length(text) - length(replace(text, ' ', '')) AS DOUBLE)
        |   / length(text), 4) AS space_ratio
        |FROM documents""".stripMargin,
    "text_by_lang" ->
      """SELECT lang, source, count(*) AS n_docs,
        | CAST(sum(n_chars) AS BIGINT) AS sum_chars,
        | CAST(sum(n_chars) * 100 // count(*) AS BIGINT) AS avg_centichars
        |FROM documents GROUP BY lang, source""".stripMargin,
    "text_repetition" ->
      """WITH w AS (SELECT doc_id, string_split_regex(lower(text), '\s+') AS w
        |           FROM documents),
        |g AS (SELECT doc_id,
        |        list_transform(range(0, greatest(len(w) - 2, 0) + 1),
        |          i -> array_to_string(list_slice(w, i + 1, i + 2), ' ')) AS grams
        |      FROM w)
        |SELECT doc_id, CAST(len(grams) AS BIGINT) AS n_grams,
        |  CAST(len(list_distinct(grams)) AS BIGINT) AS n_distinct,
        |  round(1.0 - CAST(len(list_distinct(grams)) AS DOUBLE) / len(grams), 6)
        |    AS rep_ratio
        |FROM g""".stripMargin,
    "text_gopher" ->
      """WITH l0 AS (SELECT doc_id,
        |    regexp_replace(text, '((?:\S+ ){6}\S+) ', '\1' || chr(10), 'g') AS t
        |  FROM documents),
        |l1 AS (SELECT doc_id,
        |    CASE WHEN doc_id % 6 = 0 THEN t || chr(10) || t ELSE t END AS t FROM l0),
        |l2 AS (SELECT doc_id,
        |    CASE WHEN doc_id % 3 = 0
        |         THEN '- ' || replace(t, chr(10), chr(10) || '- ') ELSE t END AS t
        |  FROM l1),
        |l3 AS (SELECT doc_id,
        |    CASE WHEN doc_id % 4 = 0
        |         THEN replace(t, chr(10), '...' || chr(10)) || '...' ELSE t END AS t
        |  FROM l2),
        |f AS (SELECT doc_id, string_split(t, chr(10)) AS ls,
        |        string_split_regex(t, '\s+') AS ws FROM l3),
        |bg AS (SELECT doc_id,
        |         unnest(list_transform(generate_series(1, len(ws) - 1),
        |           i -> ws[i] || ' ' || ws[i + 1])) AS g
        |       FROM f WHERE len(ws) >= 2),
        |top AS (SELECT doc_id, max(c) AS topc FROM
        |         (SELECT doc_id, g, count(*) AS c FROM bg GROUP BY doc_id, g)
        |        GROUP BY doc_id),
        |m AS (SELECT f.doc_id, CAST(len(ws) AS BIGINT) AS n_words,
        |  round(CAST(list_sum(list_transform(ws, x -> length(x))) AS DOUBLE)
        |    / len(ws), 6) AS mean_word_len,
        |  round(CAST(len(list_filter(ws, x -> regexp_matches(x, '[A-Za-z]')))
        |    AS DOUBLE) / len(ws), 6) AS frac_alpha_words,
        |  round(CAST(len(ls) - len(list_distinct(ls)) AS DOUBLE) / len(ls), 6)
        |    AS dup_line_frac,
        |  round(CAST(len(list_filter(ls, x -> starts_with(x, '- ')))
        |    AS DOUBLE) / len(ls), 6) AS bullet_line_frac,
        |  round(CAST(len(list_filter(ls, x -> ends_with(x, '...')))
        |    AS DOUBLE) / len(ls), 6) AS ellipsis_line_frac,
        |  round(CASE WHEN len(ws) < 2 THEN 0.0
        |        ELSE CAST(coalesce(topc, 0) AS DOUBLE) / (len(ws) - 1) END, 6)
        |    AS top_bigram_frac
        |  FROM f LEFT JOIN top ON f.doc_id = top.doc_id)
        |SELECT *,
        |  (n_words BETWEEN 50 AND 100000 AND
        |   mean_word_len BETWEEN 3 AND 10 AND
        |   frac_alpha_words >= 0.8 AND dup_line_frac <= 0.3 AND
        |   bullet_line_frac <= 0.9 AND ellipsis_line_frac <= 0.3 AND
        |   top_bigram_frac <= 0.2) AS gopher_pass
        |FROM m""".stripMargin,
    "text_tfidf" ->
      """WITH w AS (SELECT doc_id, unnest(string_split_regex(lower(text), '\s+')) AS word
        |           FROM documents),
        |tf AS (SELECT doc_id, word, count(*) AS tf FROM w GROUP BY doc_id, word),
        |df AS (SELECT word, count(*) AS df FROM tf GROUP BY word),
        |n AS (SELECT count(*) AS n FROM documents),
        |s AS (SELECT tf.doc_id, tf.word, tf.tf,
        |        tf.tf * ((1000000 * n.n) // df.df) AS score
        |      FROM tf JOIN df USING (word) CROSS JOIN n),
        |r AS (SELECT *, row_number() OVER
        |        (PARTITION BY doc_id ORDER BY score DESC, word ASC) AS rank
        |      FROM s)
        |SELECT doc_id, word, CAST(tf AS BIGINT) AS tf,
        |  CAST(score AS BIGINT) AS score, CAST(rank AS BIGINT) AS rank
        |FROM r WHERE rank <= 3""".stripMargin,
    "text_line_dedup" ->
      """WITH l0 AS (SELECT doc_id,
        |    regexp_replace(text, '((?:\S+ ){6}\S+) ', '\1' || chr(10), 'g') AS t
        |  FROM documents),
        |p AS (SELECT doc_id,
        |    (CASE WHEN doc_id % 4 = 0
        |          THEN 'Cookie notice: this site uses cookies' || chr(10) ELSE '' END) ||
        |    (CASE WHEN doc_id % 3 = 0
        |          THEN t || chr(10) || 'Subscribe to our newsletter today' ELSE t END) AS t
        |  FROM l0),
        |f AS (SELECT doc_id, string_split(t, chr(10)) AS ls FROM p),
        |ln AS (SELECT doc_id, unnest(ls) AS line FROM f),
        |dup AS (SELECT line FROM ln GROUP BY line
        |        HAVING count(DISTINCT doc_id) >= 3),
        |dl AS (SELECT coalesce(list(line), []) AS dl FROM dup),
        |k AS (SELECT doc_id, ls,
        |        list_filter(ls, x -> NOT list_contains(dl, x)) AS kept
        |      FROM f CROSS JOIN dl)
        |SELECT doc_id, CAST(len(ls) AS BIGINT) AS n_lines,
        |  CAST(len(ls) - len(kept) AS BIGINT) AS n_removed,
        |  md5(coalesce(array_to_string(kept, chr(10)), '')) AS clean_digest
        |FROM k""".stripMargin,
    "dedup_url" ->
      """WITH u AS (SELECT doc_id,
        |    (CASE WHEN doc_id % 11 = 0 THEN ''
        |          WHEN doc_id % 2 = 0 THEN 'HTTPS://WWW.'
        |          ELSE 'https://' END) ||
        |    source || '.Example.COM' ||
        |    (CASE WHEN doc_id % 2 = 0 THEN ':443' ELSE '' END) ||
        |    '/Docs/p' || (doc_id % 7) || '/' ||
        |    '?utm_content=u' || doc_id ||
        |    '&id=' || (doc_id % 3) || '&b=2&a=1' ||
        |    (CASE WHEN doc_id % 5 = 0 THEN '#frag' ELSE '' END) AS url
        |  FROM documents),
        |nf AS (SELECT doc_id, url, regexp_replace(url, '#.*$', '') AS u FROM u),
        |p AS (SELECT doc_id, url, u,
        |    lower(regexp_extract(u, '^([A-Za-z][A-Za-z0-9+.\-]*)://', 1)) AS scheme,
        |    regexp_extract(u, '^[A-Za-z][A-Za-z0-9+.\-]*://([^/?#]*)', 1) AS hostport,
        |    regexp_extract(u, '^[A-Za-z][A-Za-z0-9+.\-]*://[^/?#]*([^?#]*)', 1) AS path,
        |    regexp_extract(u, '\?([^#]*)', 1) AS q
        |  FROM nf),
        |c AS (SELECT doc_id, url,
        |    CASE WHEN scheme = '' THEN u ELSE
        |    scheme || '://' ||
        |    regexp_replace(lower(regexp_extract(hostport, '^([^:]*)', 1)),
        |                   '^www\.', '') ||
        |    (CASE WHEN regexp_extract(hostport, ':([0-9]+)$', 1) = '' OR
        |               (scheme = 'https' AND
        |                regexp_extract(hostport, ':([0-9]+)$', 1) = '443') OR
        |               (scheme = 'http' AND
        |                regexp_extract(hostport, ':([0-9]+)$', 1) = '80')
        |          THEN '' ELSE ':' || regexp_extract(hostport, ':([0-9]+)$', 1) END) ||
        |    path ||
        |    (CASE WHEN array_to_string(list_sort(list_filter(string_split(q, '&'),
        |                 x -> NOT starts_with(x, 'utm_') AND x <> '')), '&') = ''
        |          THEN ''
        |          ELSE '?' || array_to_string(list_sort(list_filter(string_split(q, '&'),
        |                 x -> NOT starts_with(x, 'utm_') AND x <> '')), '&') END)
        |    END AS canon_url
        |  FROM p)
        |SELECT canon_url, count(*) AS n_dups, min(doc_id) AS keep_id,
        |       count(DISTINCT url) AS n_variants
        |FROM c GROUP BY canon_url""".stripMargin,

    "text_pii" ->
      """WITH p AS (SELECT doc_id,
        |    text || ' contact user' || doc_id || '@example.com or 10.0.' ||
        |    (doc_id % 256) || '.7 ssn 123-45-67' ||
        |    lpad((doc_id % 100)::VARCHAR, 2, '0') ||
        |    ' pay 4111 1111 1111 1111 call +1 555 01' ||
        |    lpad((doc_id % 100)::VARCHAR, 2, '0') AS t
        |  FROM documents)
        |SELECT doc_id,
        |  CAST(len(regexp_extract_all(t, '[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}')) AS BIGINT) AS n_emails,
        |  CAST(len(regexp_extract_all(t, '\b[0-9]{1,3}\.[0-9]{1,3}\.[0-9]{1,3}\.[0-9]{1,3}\b')) AS BIGINT) AS n_ipv4,
        |  CAST(len(regexp_extract_all(t, '\b[0-9]{3}-[0-9]{2}-[0-9]{4}\b')) AS BIGINT) AS n_ssns,
        |  CAST(len(regexp_extract_all(t, '\b[0-9]{4}[- ][0-9]{4}[- ][0-9]{4}[- ][0-9]{4}\b')) AS BIGINT) AS n_cards,
        |  CAST(len(regexp_extract_all(t, '\+[0-9][0-9()\- ]{6,}[0-9]')) AS BIGINT) AS n_phones,
        |  md5(regexp_replace(regexp_replace(regexp_replace(regexp_replace(regexp_replace(t,
        |    '[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}', '<EMAIL>', 'g'),
        |    '\b[0-9]{1,3}\.[0-9]{1,3}\.[0-9]{1,3}\.[0-9]{1,3}\b', '<IP>', 'g'),
        |    '\b[0-9]{3}-[0-9]{2}-[0-9]{4}\b', '<SSN>', 'g'),
        |    '\b[0-9]{4}[- ][0-9]{4}[- ][0-9]{4}[- ][0-9]{4}\b', '<CARD>', 'g'),
        |    '\+[0-9][0-9()\- ]{6,}[0-9]', '<PHONE>', 'g')) AS redacted_digest
        |FROM p""".stripMargin,
    "text_boilerplate" ->
      """WITH g AS (SELECT doc_id,
        |    unnest(list_transform(range(0, greatest(len(w) - 3, 0) + 1),
        |      i -> array_to_string(list_slice(w, i + 1, i + 3), ' '))) AS gram
        |  FROM (SELECT doc_id, string_split_regex(lower(text), '\s+') AS w
        |        FROM documents))
        |SELECT gram, count(*) AS n_occurrences,
        |  count(DISTINCT doc_id) AS n_docs
        |FROM g GROUP BY gram
        |ORDER BY n_occurrences DESC, gram ASC LIMIT 20""".stripMargin,

    // Same tokenization, same integer lift through HUGEINT (Spark side
    // widens through DECIMAL(38,0)); `//` == `div` on these nonnegative
    // values; ties ranked by (lift desc, w1, w2) on both engines.
    "text_collocations" ->
      """WITH d AS (SELECT string_split(lower(text), ' ') AS w FROM documents),
        |un AS (SELECT t, count(*)::BIGINT AS n
        |       FROM (SELECT unnest(w) AS t FROM d) GROUP BY t),
        |tot AS (SELECT CAST(sum(n) AS BIGINT) AS tot FROM un),
        |p AS (SELECT p.w1 AS w1, p.w2 AS w2 FROM
        |       (SELECT unnest([{'w1': w[i], 'w2': w[i+1]}
        |                       for i in range(1, len(w))]) AS p FROM d)),
        |pc AS (SELECT w1, w2, count(*)::BIGINT AS n_pair FROM p
        |       GROUP BY 1, 2 HAVING count(*) >= 5),
        |sc AS (SELECT pc.w1, pc.w2, pc.n_pair, a.n AS n_w1, b.n AS n_w2,
        |         CAST((1000000::HUGEINT * pc.n_pair * (SELECT tot FROM tot)) //
        |              (a.n::HUGEINT * b.n) AS BIGINT) AS lift_ppm
        |       FROM pc JOIN un a ON a.t = pc.w1 JOIN un b ON b.t = pc.w2)
        |SELECT w1, w2, n_pair, n_w1, n_w2, lift_ppm,
        |  CAST(rank AS INTEGER) AS rank FROM (
        |  SELECT *, row_number() OVER (ORDER BY lift_ppm DESC, w1, w2) AS rank
        |  FROM sc)
        |WHERE rank <= 20""".stripMargin,

    "text_bpe_encode" -> bpeEncodeOracle,

    "text_bpe" -> bpeTrainOracle,

    "text_bpe_merges" -> bpeTrainMergesOracle,

    // Replays the planted anchors, the href regex, and the dedup_url
    // canonicalization (with the schemeless verbatim fallback), then the
    // same frontier rollup.
    "html_links" ->
      """WITH h AS (SELECT doc_id,
        |    regexp_replace(coalesce(text, ''), 'join',
        |      '<a href="https://Ex.com/j/' || (doc_id % 5) ||
        |      '?utm_x=1&b=2&a=1">join</a>', 'g')
        |    || '<a href="/rel/' || (doc_id % 3) || '">rel</a>'
        |    || '<a class=m href=''/sq/' || (doc_id % 2) || '''>s</a>'
        |    || '<a href=/uq/' || (doc_id % 4) || ' id=u>u</a>'
        |    || '<a href="/nl/' || (doc_id % 2) || chr(10) || '2">n</a>' AS html
        |  FROM documents),
        |l0 AS (SELECT doc_id,
        |    unnest(regexp_extract_all(html,
        |      '(?i)<a[^>]*?href=("[^"]*"|''[^'']*''|[^"'' \t\n\r\f>]+)', 1)) AS hr
        |  FROM h),
        |l AS (SELECT doc_id,
        |    CASE WHEN regexp_matches(hr, '(?s)^".*"$')
        |           THEN regexp_replace(hr, '(?s)^"(.*)"$', '\1')
        |         WHEN regexp_matches(hr, '(?s)^''.*''$')
        |           THEN regexp_replace(hr, '(?s)^''(.*)''$', '\1')
        |         ELSE hr END AS href
        |  FROM l0),
        |nf AS (SELECT doc_id, regexp_replace(href, '#.*$', '') AS u FROM l),
        |p AS (SELECT doc_id, u,
        |    lower(regexp_extract(u, '^([A-Za-z][A-Za-z0-9+.\-]*)://', 1)) AS scheme,
        |    regexp_extract(u, '^[A-Za-z][A-Za-z0-9+.\-]*://([^/?#]*)', 1) AS hostport,
        |    regexp_extract(u, '^[A-Za-z][A-Za-z0-9+.\-]*://[^/?#]*([^?#]*)', 1) AS path,
        |    regexp_extract(u, '\?([^#]*)', 1) AS q
        |  FROM nf),
        |c AS (SELECT doc_id,
        |    CASE WHEN scheme = '' THEN u ELSE
        |    scheme || '://' ||
        |    regexp_replace(lower(regexp_extract(hostport, '^([^:]*)', 1)),
        |                   '^www\.', '') ||
        |    (CASE WHEN regexp_extract(hostport, ':([0-9]+)$', 1) = '' OR
        |               (scheme = 'https' AND
        |                regexp_extract(hostport, ':([0-9]+)$', 1) = '443') OR
        |               (scheme = 'http' AND
        |                regexp_extract(hostport, ':([0-9]+)$', 1) = '80')
        |          THEN '' ELSE ':' || regexp_extract(hostport, ':([0-9]+)$', 1) END) ||
        |    path ||
        |    (CASE WHEN array_to_string(list_sort(list_filter(string_split(q, '&'),
        |                 x -> NOT starts_with(x, 'utm_') AND x <> '')), '&') = ''
        |          THEN ''
        |          ELSE '?' || array_to_string(list_sort(list_filter(string_split(q, '&'),
        |                 x -> NOT starts_with(x, 'utm_') AND x <> '')), '&') END)
        |    END AS canon_url
        |  FROM p)
        |SELECT canon_url, count(*) AS n_refs,
        |  count(DISTINCT doc_id) AS n_docs, min(doc_id) AS first_doc
        |FROM c GROUP BY canon_url""".stripMargin,

    // Blocklist replay: the planted URL build, the canonicalizer's host
    // derivation, then three NOT EXISTS probes — suffix as equality OR
    // ends_with('.' || pattern), the exact label-boundary contract.
    "url_blocklist" ->
      """WITH u AS (SELECT doc_id,
        |    CASE WHEN doc_id % 6 = 0
        |           THEN 'https://WWW.AlphaNews.com/a/' || CAST(doc_id AS VARCHAR)
        |         WHEN doc_id % 6 = 1
        |           THEN 'http://beta-site.ORG/p/' || CAST(doc_id AS VARCHAR)
        |         WHEN doc_id % 6 = 2
        |           THEN 'https://cdn.news.com/x/' || CAST(doc_id AS VARCHAR)
        |         WHEN doc_id % 6 = 3
        |           THEN 'https://news.com/y/' || CAST(doc_id AS VARCHAR)
        |         WHEN doc_id % 6 = 4
        |           THEN 'https://gamma.io/private/' || CAST(doc_id AS VARCHAR)
        |         ELSE 'https://gamma.io/public/' || CAST(doc_id AS VARCHAR) END AS url
        |  FROM documents),
        |bl AS (SELECT * FROM (VALUES
        |    ('domain', 'beta-site.org', ''),
        |    ('suffix', 'news.com', ''),
        |    ('prefix', 'gamma.io', 'https://gamma.io/private/'))
        |  AS t(kind, dom, pat)),
        |c AS (SELECT doc_id, url,
        |    lower(regexp_extract(url, '^([A-Za-z][A-Za-z0-9+.\-]*)://', 1)) ||
        |    '://' ||
        |    regexp_replace(lower(regexp_extract(
        |      regexp_extract(url, '^[A-Za-z][A-Za-z0-9+.\-]*://([^/?#]*)', 1),
        |      '^([^:]*)', 1)), '^www\.', '') ||
        |    regexp_extract(url, '^[A-Za-z][A-Za-z0-9+.\-]*://[^/?#]*([^?#]*)', 1)
        |      AS canon_url,
        |    regexp_replace(lower(regexp_extract(
        |      regexp_extract(url, '^[A-Za-z][A-Za-z0-9+.\-]*://([^/?#]*)', 1),
        |      '^([^:]*)', 1)), '^www\.', '') AS domain
        |  FROM u)
        |SELECT doc_id, domain, canon_url FROM c
        |WHERE NOT EXISTS (SELECT 1 FROM bl
        |        WHERE kind = 'domain' AND c.domain = bl.dom)
        |  AND NOT EXISTS (SELECT 1 FROM bl
        |        WHERE kind = 'suffix' AND (c.domain = bl.dom OR
        |          ends_with(c.domain, '.' || bl.dom)))
        |  AND NOT EXISTS (SELECT 1 FROM bl
        |        WHERE kind = 'prefix' AND c.domain = bl.dom AND
        |          starts_with(c.canon_url, bl.pat))""".stripMargin,

    // Anchor-index replay: the same single-regex extraction (group 0 per
    // element, groups 1/2 re-extracted), quote strip, canonicalization
    // CTEs as html_links, then (url, anchor) counts, the row_number argmax
    // and the per-url stats join.
    "link_anchors" ->
      """WITH h AS (SELECT doc_id,
        |    regexp_replace(coalesce(text, ''), 'join',
        |      '<a href="https://Ex.com/j/' || (doc_id % 5) ||
        |      '?utm_x=1&b=2&a=1">' ||
        |      CASE WHEN doc_id % 3 = 0 THEN 'Read  More' ELSE 'join now' END ||
        |      '</a>', 'g')
        |    || '<a class=m href=''/sq/' || (doc_id % 2) || '''>  Spaced   Anchor </a>'
        |    || '<a href=/uq/' || (doc_id % 4) || ' id=u>u<b>bold</b></a>'
        |    || '<a href="/empty/' || (doc_id % 3) || '"></a>' AS html
        |  FROM documents),
        |l0 AS (SELECT doc_id,
        |    unnest(regexp_extract_all(html,
        |      '(?i)<a[^>]*?href=("[^"]*"|''[^'']*''|[^"'' \t\n\r\f>]+)[^>]*>([^<]*)', 0)) AS el
        |  FROM h),
        |l1 AS (SELECT doc_id,
        |    regexp_extract(el,
        |      '(?i)<a[^>]*?href=("[^"]*"|''[^'']*''|[^"'' \t\n\r\f>]+)[^>]*>([^<]*)', 1) AS hr,
        |    lower(trim(regexp_replace(regexp_extract(el,
        |      '(?i)<a[^>]*?href=("[^"]*"|''[^'']*''|[^"'' \t\n\r\f>]+)[^>]*>([^<]*)', 2),
        |      '[ \t\n\r\f]+', ' ', 'g'))) AS anchor
        |  FROM l0),
        |l AS (SELECT doc_id, anchor,
        |    CASE WHEN regexp_matches(hr, '(?s)^".*"$')
        |           THEN regexp_replace(hr, '(?s)^"(.*)"$', '\1')
        |         WHEN regexp_matches(hr, '(?s)^''.*''$')
        |           THEN regexp_replace(hr, '(?s)^''(.*)''$', '\1')
        |         ELSE hr END AS href
        |  FROM l1),
        |nf AS (SELECT doc_id, anchor, regexp_replace(href, '#.*$', '') AS u FROM l),
        |p AS (SELECT doc_id, anchor, u,
        |    lower(regexp_extract(u, '^([A-Za-z][A-Za-z0-9+.\-]*)://', 1)) AS scheme,
        |    regexp_extract(u, '^[A-Za-z][A-Za-z0-9+.\-]*://([^/?#]*)', 1) AS hostport,
        |    regexp_extract(u, '^[A-Za-z][A-Za-z0-9+.\-]*://[^/?#]*([^?#]*)', 1) AS path,
        |    regexp_extract(u, '\?([^#]*)', 1) AS q
        |  FROM nf),
        |c AS (SELECT doc_id, anchor,
        |    CASE WHEN scheme = '' THEN u ELSE
        |    scheme || '://' ||
        |    regexp_replace(lower(regexp_extract(hostport, '^([^:]*)', 1)),
        |                   '^www\.', '') ||
        |    (CASE WHEN regexp_extract(hostport, ':([0-9]+)$', 1) = '' OR
        |               (scheme = 'https' AND
        |                regexp_extract(hostport, ':([0-9]+)$', 1) = '443') OR
        |               (scheme = 'http' AND
        |                regexp_extract(hostport, ':([0-9]+)$', 1) = '80')
        |          THEN '' ELSE ':' || regexp_extract(hostport, ':([0-9]+)$', 1) END) ||
        |    path ||
        |    (CASE WHEN array_to_string(list_sort(list_filter(string_split(q, '&'),
        |                 x -> NOT starts_with(x, 'utm_') AND x <> '')), '&') = ''
        |          THEN ''
        |          ELSE '?' || array_to_string(list_sort(list_filter(string_split(q, '&'),
        |                 x -> NOT starts_with(x, 'utm_') AND x <> '')), '&') END)
        |    END AS canon_url
        |  FROM p),
        |cnt AS (SELECT canon_url, anchor, count(*) AS a_refs
        |        FROM c GROUP BY 1, 2),
        |top AS (SELECT canon_url, anchor AS top_anchor, a_refs AS top_refs,
        |          row_number() OVER (PARTITION BY canon_url
        |            ORDER BY a_refs DESC, anchor) AS rn
        |        FROM cnt),
        |st AS (SELECT canon_url, count(*) AS n_refs,
        |         count(DISTINCT doc_id) AS n_docs
        |       FROM c GROUP BY 1)
        |SELECT st.canon_url, n_refs, n_docs, top_anchor, top_refs
        |FROM st JOIN top ON st.canon_url = top.canon_url AND top.rn = 1""".stripMargin,

    // Replays the planted-HTML build, then the kernel's defining regex
    // chain stage by stage (comments → head → script → style → tag→space +
    // anchor count → entity decode → collapse). The [ \t\n\r\f] class is
    // the RE2/Java common \s subset the kernel pins. The entity stage is
    // the chain's single left-to-right pass: split on '&', transform each
    // part through the fixed table then the BMP-bounded numeric-reference
    // rules (chr() here, hex→unhex→UTF-16BE on the Spark side), restore
    // the '&' verbatim otherwise.
    "html_extract" ->
      """WITH h AS (SELECT doc_id,
        |    '<html><!-- docid ' || CAST(doc_id AS VARCHAR)
        |    || ' --><head><title>Doc ' || CAST(doc_id AS VARCHAR)
        |    || '</title><style>p { color: #333; }</style></head><body><h1>Doc '
        |    || CAST(doc_id AS VARCHAR)
        |    || '</h1><p>'
        |    || regexp_replace(coalesce(text, ''), 'join',
        |         '<a href="https://ex.com/join">join</a>', 'g')
        |    || ' &lt;b&gt; &amp; &quot;q&quot;&nbsp;&#39;s&#39; &#246;&#xE9;&#X2013; &#999999;&#xD800;&#0;&#x110000;bad&#x;&#</p><script type="text/javascript">var d = '
        |    || CAST(doc_id AS VARCHAR) || ';</script></body></html>' AS html
        |  FROM documents),
        |s1 AS (SELECT doc_id, html,
        |         regexp_replace(html, '(?s)<!--.*?-->', '', 'g') AS x FROM h),
        |s2 AS (SELECT doc_id, html,
        |         regexp_replace(x, '(?is)<head[^>]*>.*?</head[^>]*>', '', 'g') AS x FROM s1),
        |s3 AS (SELECT doc_id, html,
        |         regexp_replace(x, '(?is)<script[^>]*>.*?</script[^>]*>', '', 'g') AS x FROM s2),
        |s4 AS (SELECT doc_id, html,
        |         regexp_replace(x, '(?is)<style[^>]*>.*?</style[^>]*>', '', 'g') AS x FROM s3),
        |t AS (SELECT doc_id,
        |        regexp_extract(html, '(?is)<title[^>]*>(.*?)</title[^>]*>', 1) AS title,
        |        len(regexp_extract_all(x, '(?i)<a[ \t\n\r\f>]')) AS n_links,
        |        regexp_replace(x, '<[^>]*>', ' ', 'g') AS x
        |      FROM s4),
        |e AS (SELECT doc_id, title, n_links,
        |        trim(regexp_replace(
        |          string_split(x, '&')[1] ||
        |          array_to_string(list_transform(string_split(x, '&')[2:], p ->
        |            CASE
        |              WHEN starts_with(p, 'lt;')   THEN '<' || p[4:]
        |              WHEN starts_with(p, 'gt;')   THEN '>' || p[4:]
        |              WHEN starts_with(p, 'quot;') THEN '"' || p[6:]
        |              WHEN starts_with(p, 'apos;') THEN '''' || p[6:]
        |              WHEN starts_with(p, '#39;')  THEN '''' || p[5:]
        |              WHEN starts_with(p, 'nbsp;') THEN ' ' || p[6:]
        |              WHEN starts_with(p, 'amp;')  THEN '&' || p[5:]
        |              WHEN regexp_extract(p, '^#([0-9]{1,6});', 1) <> ''
        |                   AND CAST(regexp_extract(p, '^#([0-9]{1,6});', 1) AS BIGINT)
        |                       BETWEEN 1 AND 65535
        |                   AND CAST(regexp_extract(p, '^#([0-9]{1,6});', 1) AS BIGINT)
        |                       NOT BETWEEN 55296 AND 57343
        |                THEN chr(CAST(regexp_extract(p, '^#([0-9]{1,6});', 1) AS INT))
        |                     || p[len(regexp_extract(p, '^#([0-9]{1,6});', 1)) + 3:]
        |              WHEN regexp_extract(p, '^#[xX]([0-9a-fA-F]{1,5});', 1) <> ''
        |                   AND CAST('0x' || regexp_extract(p, '^#[xX]([0-9a-fA-F]{1,5});', 1) AS BIGINT)
        |                       BETWEEN 1 AND 65535
        |                   AND CAST('0x' || regexp_extract(p, '^#[xX]([0-9a-fA-F]{1,5});', 1) AS BIGINT)
        |                       NOT BETWEEN 55296 AND 57343
        |                THEN chr(CAST('0x' || regexp_extract(p, '^#[xX]([0-9a-fA-F]{1,5});', 1) AS INT))
        |                     || p[len(regexp_extract(p, '^#[xX]([0-9a-fA-F]{1,5});', 1)) + 4:]
        |              ELSE '&' || p
        |            END), ''),
        |          '[ \t\n\r\f]+', ' ', 'g')) AS text
        |      FROM t)
        |SELECT doc_id, title, n_links,
        |  CAST(length(text) AS BIGINT) AS n_chars, md5(text) AS text_digest
        |FROM e""".stripMargin,

    // Same cover-the-last-word chunk count and 1-based inclusive slice
    // bounds (DuckDB list_slice stop == Spark slice start+len-1).
    "doc_chunks" ->
      """WITH w AS (SELECT doc_id,
        |             list_filter(string_split_regex(text, '\s+'),
        |                         x -> length(x) > 0) AS ws
        |           FROM documents),
        |n AS (SELECT doc_id, ws, len(ws) AS nw FROM w WHERE len(ws) > 0),
        |c AS (SELECT doc_id, ws, nw,
        |        unnest(range(0, 1 + greatest(0, (nw - 64 + 47) // 48))) AS ci
        |      FROM n)
        |SELECT doc_id, CAST(ci AS BIGINT) AS chunk_idx,
        |  CAST(least(64, nw - ci * 48) AS BIGINT) AS n_words,
        |  md5(array_to_string(list_slice(ws, ci * 48 + 1, ci * 48 + 64), ' '))
        |    AS chunk_digest
        |FROM c""".stripMargin,

    "frequent_terms" ->
      """WITH w AS (SELECT lang,
        |             unnest(string_split_regex(lower(text), '\s+')) AS word
        |           FROM documents),
        |c AS (SELECT lang, word, count(*) AS n FROM w
        |      WHERE word <> '' GROUP BY lang, word)
        |SELECT lang, word, n
        |FROM (SELECT lang, word, n,
        |       row_number() OVER (PARTITION BY lang
        |         ORDER BY n DESC, word) AS rn
        |      FROM c) WHERE rn <= 10""".stripMargin)

  /** Exact SQL replay of the pretrained-BPE greedy encode. The recursive
    * CTE walks each distinct word through the merge ranks in order,
    * applying ONE leftmost occurrence per step (`position` + `substr`
    * splice on the space-delimited symbol string) — one-at-a-time is
    * required: replace-all diverges from the greedy loop on
    * self-overlapping pairs. Merges come from the same
    * [[graft.operators.Bpe.pretrained]] literal the query uses.
    */
  /** CTE prefix replaying [[graft.operators.Bpe.train]] end-to-end in SQL.
    *
    * The merge-loop argmax is iterative, but the merge BUDGET is a fixed
    * literal (50), so the whole training run unrolls into `n` chained CTE
    * blocks: `p{k}` counts adjacent symbol pairs weighted by word frequency
    * (every adjacent position, overlapping included — same as the scan in
    * `trainOnCounts`), `m{k}` takes the argmax with the same
    * (count desc, pair lex asc) tiebreak, the recursive `a{k}` applies that
    * merge ONE leftmost occurrence per step until exhausted (replace-all
    * diverges on self-overlapping pairs — see bpeEncodeOracle), and `w{k}`
    * keeps each word's final state. If pair counts run dry early, `m{k}` is
    * empty and every later step is a no-op — matching the early stop in
    * `trainOnCounts`. `MATERIALIZED` is required: each `w{k}` is referenced
    * twice, and DuckDB's default CTE inlining would expand the chain 2^n×.
    *
    * Applying merges in training order ALMOST equals the greedy
    * lowest-rank-first encode — so `w{n}` holds the trained tokenization
    * of every distinct word with no separate encode phase. The usual
    * justification ("applying a merge never creates a pair of lower
    * rank") has one exception: a later merge can re-form an earlier
    * symbol's STRING via a different bracketing (e.g. the symbol string
    * "aaa" arising as (aa,a) after a rank-j "a a"→"aa" merge, when rank-i
    * (i < j) merged "aa a"→"aaa"), recreating a lower-rank adjacency that
    * greedy encode would apply but the training replay leaves unmerged.
    * That needs a repeated-unit run whose merges interleave in rank order
    * just so; `BpeSpec`'s repeated-char-run differential pins the class,
    * so a future corpus change that trips it diagnoses as this known
    * divergence, not an operator bug.
    */
  private def bpeTrainCtes(n: Int): String = {
    val head =
      """WITH RECURSIVE
        |words AS (SELECT word, count(*) AS c FROM (
        |    SELECT unnest(string_split_regex(lower(text), '\s+')) AS word
        |    FROM documents) WHERE length(word) > 0 GROUP BY word),
        |w0 AS (SELECT word, c,
        |         ' ' || regexp_replace(word, '(.)', '\1 ', 'g') AS spaced
        |       FROM words)""".stripMargin
    val steps = (1 to n).map { k =>
      val p = k - 1
      s"""p$k AS (SELECT s[i] AS l, s[i+1] AS rt, sum(c) AS pc
         |  FROM (SELECT c, s, unnest(generate_series(1, len(s)-1)) AS i
         |        FROM (SELECT c, string_split(trim(spaced), ' ') AS s FROM w$p))
         |  GROUP BY 1, 2),
         |m$k AS MATERIALIZED (SELECT l, rt FROM p$k
         |  ORDER BY pc DESC, l ASC, rt ASC LIMIT 1),
         |a$k(word, c, spaced, it) AS (
         |  SELECT word, c, spaced, 0 FROM w$p
         |  UNION ALL
         |  SELECT word, c,
         |    substr(spaced, 1, pos - 1) || rep || substr(spaced, pos + length(pat)),
         |    it + 1
         |  FROM (SELECT a.word, a.c, a.spaced, a.it,
         |          ' ' || m.l || ' ' || m.rt || ' ' AS pat,
         |          ' ' || m.l || m.rt || ' ' AS rep,
         |          position(' ' || m.l || ' ' || m.rt || ' ' IN a.spaced) AS pos
         |        FROM a$k a CROSS JOIN m$k m)
         |  WHERE pos > 0),
         |w$k AS MATERIALIZED (SELECT word, c, arg_max(spaced, it) AS spaced
         |  FROM a$k GROUP BY word, c)""".stripMargin
    }
    (head +: steps).mkString(",\n")
  }

  /** text_bpe oracle: train (bpeTrainCtes), then aggregate the final word
    * tokenizations back onto documents — same doc rollup as
    * bpeEncodeOracle, same portable md5 token-stream digest.
    */
  private def bpeTrainOracle: String = {
    val n = 50
    s"""${bpeTrainCtes(n)},
       |tok AS (SELECT word, trim(spaced) AS toks,
       |          len(string_split(trim(spaced), ' ')) AS n FROM w$n),
       |dws AS (SELECT doc_id,
       |          list_filter(string_split_regex(lower(text), '\\s+'),
       |                      w -> length(w) > 0) AS ws
       |        FROM documents),
       |dw AS (SELECT doc_id, g AS ord, ws[g] AS word
       |       FROM (SELECT doc_id, ws,
       |               unnest(generate_series(1, len(ws))) AS g FROM dws)),
       |agg AS (SELECT doc_id, count(*) AS n_words, sum(n) AS n_tokens,
       |          string_agg(toks, ' ' ORDER BY ord) AS toks
       |        FROM dw JOIN tok USING (word) GROUP BY doc_id)
       |SELECT d.doc_id,
       |  CAST(coalesce(a.n_words, 0) AS BIGINT) AS n_words,
       |  CAST(coalesce(a.n_tokens, 0) AS BIGINT) AS n_tokens,
       |  md5(coalesce(a.toks, '')) AS token_digest
       |FROM documents d LEFT JOIN agg a ON d.doc_id = a.doc_id""".stripMargin
  }

  /** text_bpe_merges oracle: the replayed training's own merge decisions,
    * ranked. Early-stopped steps contribute no row (empty m{k}).
    */
  private def bpeTrainMergesOracle: String = {
    val n = 50
    val union = (1 to n).map { k =>
      s"SELECT CAST($k AS INTEGER) AS merge_rank, l AS lhs, rt AS rhs FROM m$k"
    }.mkString("\nUNION ALL ")
    s"""${bpeTrainCtes(n)}
       |SELECT * FROM ($union)""".stripMargin
  }

  private def bpeEncodeOracle: String = {
    val merges = graft.operators.Bpe.pretrained
    val vals = merges.zipWithIndex
      .map { case ((a, b), r) => s"($r,'$a','$b')" }.mkString(", ")
    val n = merges.length
    s"""WITH RECURSIVE merges(r, l, rt) AS (SELECT * FROM (VALUES $vals)),
       |words AS (SELECT DISTINCT word FROM (
       |    SELECT unnest(string_split_regex(lower(text), '\\s+')) AS word
       |    FROM documents) WHERE length(word) > 0),
       |enc(word, spaced, r) AS (
       |  SELECT word, ' ' || regexp_replace(word, '(.)', '\\1 ', 'g'), 0
       |  FROM words
       |  UNION ALL
       |  SELECT word,
       |    CASE WHEN pos > 0 THEN substr(spaced, 1, pos - 1) || rep ||
       |         substr(spaced, pos + length(pat)) ELSE spaced END,
       |    CASE WHEN pos > 0 THEN r ELSE r + 1 END
       |  FROM (SELECT e.word, e.spaced, e.r,
       |          ' ' || m.l || ' ' || m.rt || ' ' AS pat,
       |          ' ' || m.l || m.rt || ' ' AS rep,
       |          position(' ' || m.l || ' ' || m.rt || ' ' IN e.spaced) AS pos
       |        FROM enc e JOIN merges m ON m.r = e.r)),
       |tok AS (SELECT word, trim(spaced) AS toks,
       |          len(string_split(trim(spaced), ' ')) AS n
       |        FROM enc WHERE r = $n),
       |dws AS (SELECT doc_id,
       |          list_filter(string_split_regex(lower(text), '\\s+'),
       |                      w -> length(w) > 0) AS ws
       |        FROM documents),
       |dw AS (SELECT doc_id, g AS ord, ws[g] AS word
       |       FROM (SELECT doc_id, ws,
       |               unnest(generate_series(1, len(ws))) AS g FROM dws)),
       |agg AS (SELECT doc_id, count(*) AS n_words, sum(n) AS n_tokens,
       |          string_agg(toks, ' ' ORDER BY ord) AS toks
       |        FROM dw JOIN tok USING (word) GROUP BY doc_id)
       |SELECT d.doc_id,
       |  CAST(coalesce(a.n_words, 0) AS BIGINT) AS n_words,
       |  CAST(coalesce(a.n_tokens, 0) AS BIGINT) AS n_tokens,
       |  md5(coalesce(a.toks, '')) AS token_digest
       |FROM documents d LEFT JOIN agg a ON d.doc_id = a.doc_id""".stripMargin
  }
}
