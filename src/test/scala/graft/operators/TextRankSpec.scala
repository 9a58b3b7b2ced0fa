package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

class TextRankSpec extends SparkSpec {
  import spark.implicits._

  // tiny corpus with controlled tf/dl/df structure
  private val docs = Seq(
    (0L, "apple banana apple cherry"),          // tf(apple)=2, dl=4
    (1L, "apple banana banana banana banana"),  // tf(banana)=4, dl=5
    (2L, "cherry cherry cherry"),               // no query term if Q=apple
    (3L, "apple"),                              // tf(apple)=1, dl=1 (short!)
    (4L, "durian fig grape durian fig grape durian fig grape durian fig grape")
  )

  test("bm25TopK matches a hand-computed reference score") {
    val got = TextRank.bm25TopK(docs.toDF("doc_id", "text"), "doc_id", "text",
        Seq("apple"), k = 5)
      .select("doc_id", "score").as[(Long, Double)].collect().toMap
    // N=5, T=4+5+3+1+12=25, avgdl=5; df(apple)=3
    val idf = math.log((5 - 3 + 0.5) / (3 + 0.5) + 1)
    def w(tf: Long, dl: Long) =
      idf * tf * 2.2 / (tf + 1.2 * (0.25 + 0.75 * dl / 5.0))
    assert(got.keySet == Set(0L, 1L, 3L))
    assert(math.abs(got(0L) - w(2, 4)) < 1e-12)
    assert(math.abs(got(1L) - w(1, 5)) < 1e-12)
    assert(math.abs(got(3L) - w(1, 1)) < 1e-12)
    // BM25 shape: the short doc outranks the long one at equal tf, and
    // tf=2 beats tf=1 at comparable length
    assert(got(3L) > got(1L) && got(0L) > got(1L))
  }

  test("portable integer scores replay on the JVM and rank like the double path") {
    val df = docs.toDF("doc_id", "text")
    val q = Seq("apple", "banana")
    val got = TextRank.bm25TopKPortable(df, "doc_id", "text", q, k = 5)
      .select("doc_id", "score_scaled", "rank")
      .as[(Long, Long, Int)].collect()
    // JVM replay of the documented integer arithmetic
    val toks = docs.map { case (id, t) => id -> t.split(" ", -1).toSeq }
    val n = toks.size.toLong
    val tTot = toks.map(_._2.size.toLong).sum
    val dfm = q.map(t => t -> toks.count(_._2.contains(t)).toLong).toMap
    def idfQ(df0: Long) = math.floor(math.log(
      (2.0 * n - 2.0 * df0 + 1.0) / (2.0 * df0 + 1.0) + 1.0) * (1L << 20)).toLong
    val want = toks.map { case (id, ws) =>
      id -> q.map { t =>
        val tf = ws.count(_ == t).toLong
        val dl = ws.size.toLong
        if (tf == 0) 0L
        else (idfQ(dfm(t)) * 22L * tTot * tf) /
          (10L * tTot * tf + 3L * tTot + 9L * dl * n)
      }.sum
    }.filter(_._2 > 0).toMap
    assert(got.map(r => r._1 -> r._2).toMap == want)
    // ranking agrees with the double path (no near-ties in this fixture)
    val dbl = TextRank.bm25TopK(df, "doc_id", "text", q, k = 5)
      .select("doc_id").as[Long].collect().toSeq
    assert(got.sortBy(_._3).map(_._1).toSeq == dbl)
  }

  test("top-k ranks deterministically and runs on a bounded-heap top-k plan") {
    val big = (0 until 2000).map(i =>
      (i.toLong, if (i % 7 == 0) "hit miss hit" else "miss miss miss"))
      .toDF("doc_id", "text").repartition(5)
    val r = TextRank.bm25TopKPortable(big, "doc_id", "text", Seq("hit"), k = 10)
    val rows = r.select("doc_id", "rank").as[(Long, Int)].collect()
    // identical scores everywhere → rank order must be doc_id order
    assert(rows.sortBy(_._2).map(_._1).toSeq ==
      (0 until 70 by 7).map(_.toLong).toSeq)
    val plan = r.queryExecution.executedPlan.toString()
    assert(plan.contains("TakeOrderedAndProject"),
      s"top-k must be a bounded heap, not a global sort:\n$plan")
  }

  test("indexed path == direct path, including through a parquet round-trip") {
    val df = docs.toDF("doc_id", "text")
    val q = Seq("apple", "banana")
    val direct = TextRank.bm25TopKPortable(df, "doc_id", "text", q, k = 5)
      .as[(Long, Long, Int)].collect().toSet
    val idx = TextRank.bm25Index(df, "doc_id", "text")
    assert(TextRank.bm25TopKIndexed(idx, q, k = 5)
      .as[(Long, Long, Int)].collect().toSet == direct)
    // the index is a set of plain relations: persist + reload (the query-
    // service lifecycle) and the ranking must still be identical
    val dir = java.nio.file.Files.createTempDirectory("bm25-idx").toString
    idx.postings.write.parquet(s"$dir/postings")
    idx.termDf.write.parquet(s"$dir/df")
    idx.stats.write.parquet(s"$dir/stats")
    val reloaded = TextRank.Bm25Index(
      spark.read.parquet(s"$dir/postings"),
      spark.read.parquet(s"$dir/df"),
      spark.read.parquet(s"$dir/stats"))
    assert(TextRank.bm25TopKIndexed(reloaded, q, k = 5)
      .as[(Long, Long, Int)].collect().toSet == direct)
    // the reloaded query's posting filter reaches the parquet scan
    val plan = TextRank.bm25TopKIndexed(reloaded, q, k = 5)
      .queryExecution.executedPlan.toString()
    assert(plan.contains("PushedFilters: [In(term"),
      s"term filter must push into the postings scan:\n$plan")
  }

  test("rrfFuse: exact scaled contributions, n_lists, and absence handling") {
    val a = Seq((10L, 1), (11L, 2), (12L, 3)).toDF("id", "rank")
    val b = Seq((11L, 1), (10L, 2), (13L, 3)).toDF("id", "rank")
    val m = TextRank.rrfFuse(Seq(a, b), Seq("id"))
      .select("id", "rrf_score", "n_lists")
      .as[(Long, Long, Long)].collect().map(r => r._1 -> ((r._2, r._3))).toMap
    def c(rank: Int) = 1000000000L / (60 + rank)
    assert(m(10L) == ((c(1) + c(2), 2L)))
    assert(m(11L) == ((c(2) + c(1), 2L)))
    assert(m(12L) == ((c(3), 1L))) // only in list a
    assert(m(13L) == ((c(3), 1L))) // only in list b
  }

  test("rrfFuse fuses per query with composite keys") {
    val a = Seq((1L, 100L, 1), (1L, 101L, 2), (2L, 100L, 1)).toDF("qid", "id", "rank")
    val b = Seq((1L, 101L, 1), (2L, 102L, 1)).toDF("qid", "id", "rank")
    val m = TextRank.rrfFuse(Seq(a, b), Seq("qid", "id"))
      .select("qid", "id", "rrf_score")
      .as[(Long, Long, Long)].collect().map(r => (r._1, r._2) -> r._3).toMap
    def c(rank: Int) = 1000000000L / (60 + rank)
    assert(m((1L, 101L)) == c(2) + c(1)) // fused within qid 1 only
    assert(m((2L, 100L)) == c(1))        // qid 2's list a entry stands alone
    assert(m((2L, 102L)) == c(1))
  }
}
