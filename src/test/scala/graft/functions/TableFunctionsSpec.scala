package graft.functions

import graft.{SparkSpec, Tables}
import org.apache.spark.sql.{AnalysisException, DataFrame}
import org.apache.spark.sql.functions._

/** The SQL TVF surface: each `graft_*` table function must round-trip to
  * EXACTLY the library call's output (the TVF builds the same logical
  * plan), and argument mistakes must fail at analysis with a message
  * naming the function.
  */
class TableFunctionsSpec extends SparkSpec {

  private val sf = "/root/testdata/sf0.001"

  private def canon(df: DataFrame): Seq[String] =
    df.select(concat_ws("|",
        df.columns.sorted.map(c => col(c).cast("string")): _*))
      .collect().map(_.getString(0)).sorted.toSeq

  test("graft_dedup_minhash('t', id, text) == TextDedup.minhashDuplicates") {
    Tables.documents(spark, sf).createOrReplaceTempView("tvf_docs")
    val viaSql = spark.sql(
      "SELECT * FROM graft_dedup_minhash('tvf_docs', 'doc_id', 'text')")
    val viaLib = graft.operators.TextDedup.minhashDuplicates(
      spark.table("tvf_docs"), "doc_id", "text")
    assert(canon(viaSql) == canon(viaLib))
  }

  test("graft_quantile_group == Stats.histogramQuantiles, multi-group multi-pct") {
    Tables.documents(spark, sf).createOrReplaceTempView("tvf_docs")
    val viaSql = spark.sql("SELECT * FROM graft_quantile_group(" +
      "'tvf_docs', 'lang,source', 'n_chars', '25,50,75')")
    val viaLib = graft.operators.Stats.histogramQuantiles(
      spark.table("tvf_docs"), Seq("lang", "source"), "n_chars", Seq(25, 50, 75))
    assert(canon(viaSql).nonEmpty && canon(viaSql) == canon(viaLib))
  }

  test("graft_topk_group == GroupTopK.topK (heap plan via SQL)") {
    Tables.documents(spark, sf).createOrReplaceTempView("tvf_docs")
    val viaSql = spark.sql("SELECT * FROM graft_topk_group(" +
      "'tvf_docs', 'lang,source', 'n_chars desc,doc_id asc', 3)")
    val viaLib = graft.plans.GroupTopK.topK(spark.table("tvf_docs"),
      Seq("lang", "source"), Seq("n_chars" -> false, "doc_id" -> true), 3)
    assert(canon(viaSql).nonEmpty && canon(viaSql) == canon(viaLib))
  }

  test("graft_bloom_join == JoinPrune.bloomPrunedJoin == the plain join") {
    Tables.lineitem(spark, sf).select("l_orderkey", "l_extendedprice")
      .createOrReplaceTempView("tvf_fact")
    Tables.orders(spark, sf).filter(col("o_orderpriority") === "1-URGENT")
      .select("o_orderkey", "o_orderstatus")
      .createOrReplaceTempView("tvf_dim")
    val viaSql = spark.sql("SELECT * FROM graft_bloom_join(" +
      "'tvf_fact', 'tvf_dim', 'l_orderkey', 'o_orderkey')")
    val plain = spark.table("tvf_fact").join(spark.table("tvf_dim"),
      col("l_orderkey") === col("o_orderkey"))
    assert(canon(viaSql).nonEmpty && canon(viaSql) == canon(plain))
  }

  test("graft_domain_cap == Sampling.domainCap") {
    Tables.documents(spark, sf)
      .select(col("doc_id"),
        concat(lit("https://h"), (col("doc_id") % 5).cast("string"),
          lit(".org/p/"), col("doc_id").cast("string")).as("url"))
      .createOrReplaceTempView("tvf_pages")
    val viaSql = spark.sql(
      "SELECT * FROM graft_domain_cap('tvf_pages', 'doc_id', 'url', 7)")
    val viaLib = graft.operators.Sampling.domainCap(
      spark.table("tvf_pages"), "doc_id", "url", 7)
    assert(canon(viaSql).nonEmpty && canon(viaSql) == canon(viaLib))
    // the cap actually bit: 5 domains x 7
    assert(viaSql.count() == 35)
  }

  test("TVFs compose with plain SQL around them") {
    Tables.documents(spark, sf).createOrReplaceTempView("tvf_docs")
    val n = spark.sql("SELECT lang, count(*) AS n FROM graft_topk_group(" +
      "'tvf_docs', 'lang', 'n_chars desc,doc_id asc', 2) GROUP BY lang")
    assert(n.collect().forall(_.getLong(1) <= 2) && n.count() >= 2)
  }

  test("argument errors fail analysis naming the function") {
    Tables.documents(spark, sf).createOrReplaceTempView("tvf_docs")
    val arity = intercept[AnalysisException] {
      spark.sql("SELECT * FROM graft_dedup_minhash('tvf_docs', 'doc_id')")
        .collect()
    }
    assert(arity.getMessage.contains("graft_dedup_minhash"))
    val badType = intercept[Exception] {
      spark.sql("SELECT * FROM graft_topk_group(" +
        "'tvf_docs', 'lang', 'n_chars sideways', 3)").collect()
    }
    assert(badType.getMessage.contains("asc"))
  }
}
