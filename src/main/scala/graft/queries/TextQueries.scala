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
        |FROM documents GROUP BY lang, source""".stripMargin)
}
