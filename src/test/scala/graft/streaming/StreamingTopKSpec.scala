package graft.streaming

import graft.SparkSpec
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._

import scala.util.Random

/** Streaming leaderboard: the final emitted ranking per group must equal
  * the batch GroupTopK over the whole feed — under ANY delivery order and
  * chunking (the retained set is a pure function of the row set), and
  * re-delivery must re-emit the identical ranking.
  */
class StreamingTopKSpec extends SparkSpec
    with org.scalatest.BeforeAndAfterAll {

  protected def stateStoreProvider: Option[String] = None

  override protected def beforeAll(): Unit = {
    super.beforeAll()
    stateStoreProvider.foreach(
      spark.conf.set("spark.sql.streaming.stateStore.providerClass", _))
  }

  override protected def afterAll(): Unit = {
    if (stateStoreProvider.isDefined)
      spark.conf.unset("spark.sql.streaming.stateStore.providerClass")
    super.afterAll()
  }

  import spark.implicits._

  private val k = 5

  /** group -> ranked (v, id) list from the batch operator. */
  private def batchTopK(rows: Seq[(String, Long, Long)]): Map[String, Seq[(Long, Long)]] =
    graft.plans.GroupTopK.topK(rows.toDF("group", "v", "id"),
        Seq("group"), Seq("v" -> false, "id" -> true), k)
      .select("group", "v", "id").as[(String, Long, Long)]
      .collect().toSeq.groupBy(_._1)
      .map { case (g, rs) =>
        g -> rs.map(r => (r._2, r._3))
          .sortBy { case (v, id) => (-v, id) }
      }

  /** group -> ranked (v, id) list of each group's LAST emission. The memory
    * sink appends per batch; each update for a group emits its full ranking
    * with ranks 1..n, so the last emission is the trailing run whose length
    * is the group's final (= maximal) rank count.
    */
  private def lastEmission(table: String): Map[String, Seq[(Long, Long)]] =
    spark.table(table)
      .withColumn("_i", monotonically_increasing_id())
      .as[(String, Int, Long, Long, Long)].collect().toSeq
      .groupBy(_._1).map { case (g, rs) =>
        val n = rs.map(_._2).max
        g -> rs.sortBy(_._5).takeRight(n)
          .sortBy(_._2).map(r => (r._3, r._4))
      }

  test("final leaderboard equals batch top-k for any chunking of a shuffled feed") {
    val rng = new Random(43)
    val rows = rng.shuffle(Seq.tabulate(4000) { i =>
      (s"g${rng.nextInt(4)}", rng.nextInt(1000).toLong, i.toLong)
    })
    val want = batchTopK(rows)
    implicit val sqlCtx = spark.sqlContext
    for (chunks <- Seq(1, 6, 19)) {
      val ms = MemoryStream[(String, Long, Long)]
      val q = StreamingTopK.topKStream(
          ms.toDF().toDF("group", "v", "id"), k)
        .writeStream.format("memory").queryName("topk_out")
        .outputMode("update").start()
      try {
        rows.grouped(rows.size / chunks + 1).foreach { chunk =>
          ms.addData(chunk: _*); q.processAllAvailable()
        }
        assert(lastEmission("topk_out") == want, s"chunks=$chunks")
      } finally {
        q.stop()
        spark.sql("DROP TABLE IF EXISTS topk_out")
      }
    }
  }

  test("score update for an existing id keeps one rank at the best score") {
    implicit val sqlCtx = spark.sqlContext
    val ms = MemoryStream[(String, Long, Long)]
    val q = StreamingTopK.topKStream(ms.toDF().toDF("group", "v", "id"), 3)
      .writeStream.format("memory").queryName("topk_upd")
      .outputMode("update").start()
    try {
      ms.addData(("g", 10L, 1L), ("g", 5L, 2L)); q.processAllAvailable()
      // id=1 re-delivered with a HIGHER score: upgrades in place, one rank
      ms.addData(("g", 30L, 1L)); q.processAllAvailable()
      // id=2 re-delivered with a LOWER score: best-ever wins, no downgrade
      ms.addData(("g", 3L, 2L)); q.processAllAvailable()
      // final emission: each id exactly once, ranked by best-ever score —
      // no duplicate ranks for id=1, no downgrade for id=2
      assert(lastEmission("topk_upd") ==
        Map("g" -> Seq((30L, 1L), (5L, 2L))))
    } finally {
      q.stop()
      spark.sql("DROP TABLE IF EXISTS topk_upd")
    }
  }

  test("duplicate re-delivery re-emits the identical ranking") {
    implicit val sqlCtx = spark.sqlContext
    val rows = Seq(("g", 10L, 1L), ("g", 20L, 2L), ("g", 20L, 3L))
    val ms = MemoryStream[(String, Long, Long)]
    val q = StreamingTopK.topKStream(ms.toDF().toDF("group", "v", "id"), 2)
      .writeStream.format("memory").queryName("topk_dup")
      .outputMode("update").start()
    try {
      ms.addData(rows: _*); q.processAllAvailable()
      val first = spark.table("topk_dup").count()
      ms.addData(rows: _*); q.processAllAvailable() // full replay
      val ranks = spark.table("topk_dup")
        .select("rank", "v", "id").as[(Int, Long, Long)].collect().toSet
      // ties break on id: (1, 20, 2), (2, 20, 3); 10 never ranks at k=2
      assert(ranks == Set((1, 20L, 2L), (2, 20L, 3L)))
      assert(spark.table("topk_dup").count() == first * 2)
    } finally {
      q.stop()
      spark.sql("DROP TABLE IF EXISTS topk_dup")
    }
  }
}
