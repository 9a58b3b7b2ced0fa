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
    "text_by_lang" -> { (s, d) =>
      Tables.documents(s, d)
        .groupBy(col("lang"), col("source"))
        .agg(count(lit(1)).as("n_docs"),
          sum(col("n_chars")).as("sum_chars"),
          round(avg(col("n_chars")), 2).as("avg_chars"))
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
    // text_tokens regex heuristic. The merge-loop argmax is inherently
    // iterative, so this is the ONE catalog entry without a DuckDB oracle
    // (driver records the weaker rows-only check); the algorithm is locked
    // by BpeSpec's independent reference implementation instead.
    "text_bpe" -> { (s, d) =>
      val docs = Tables.documents(s, d)
      val model = graft.operators.Bpe.train(docs, "text", numMerges = 50)
      graft.operators.Bpe.tokenStats(docs, "doc_id", "text", model)
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
        | round(avg(n_chars), 2) AS avg_chars
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
        |ORDER BY n_occurrences DESC, gram ASC LIMIT 20""".stripMargin)
}
