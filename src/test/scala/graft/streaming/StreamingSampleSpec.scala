package graft.streaming

import graft.SparkSpec
import graft.operators.Sampling
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._

import scala.util.Random

/** Streaming domain cap: the latest emitted survivor set per domain must
  * equal the batch [[Sampling.domainCap]] over the prefix under any
  * chunking, delivery order, or duplicate re-delivery (the survivor set
  * is a pure function of the document set — the KMV stance).
  */
class StreamingSampleSpec extends SparkSpec
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

  private val cap = 5

  private def batchSurvivors(rows: Seq[(Long, String)]): Map[String, Set[Long]] =
    Sampling.domainCap(rows.toDF("doc_id", "url"), "doc_id", "url", cap)
      .select("domain", "doc_id").as[(String, Long)].collect()
      .groupBy(_._1).map { case (d, rs) => d -> rs.map(_._2).toSet }

  /** Latest emission per domain from the update-mode memory sink: each
    * emission writes the full ranked list (1..n in order), so reading a
    * domain's rows newest-first, the final emission is the maximal
    * descending-rank run (n, n-1, ..., 1) at the head.
    */
  private def latestStream(table: String): Map[String, Set[Long]] = {
    val byDomain = spark.table(table)
      .withColumn("_i", monotonically_increasing_id())
      .orderBy(col("_i").desc)
      .select("domain", "rank", "doc_id").as[(String, Int, Long)].collect()
      .groupBy(_._1)
    byDomain.map { case (d, rows) =>
      val lastSet = scala.collection.mutable.Set.empty[Long]
      var expect = rows.head._2
      var i = 0
      while (i < rows.length && rows(i)._2 == expect) {
        lastSet += rows(i)._3; expect -= 1; i += 1
      }
      d -> lastSet.toSet
    }
  }

  test("stream equals batch domainCap across chunkings, disorder, and replay") {
    val rnd = new Random(89)
    val hosts = Seq("https://a.com/p", "http://b.org/q", "/rel")
    val rows = (0L until 400L).map(i => (i, s"${hosts(rnd.nextInt(3))}/$i"))
    val want = batchSurvivors(rows)
    implicit val sqlCtx = spark.sqlContext
    for ((chunks, shuffled, replay) <- Seq((1, false, false), (7, true, false), (7, true, true))) {
      val feed0 = if (shuffled) rnd.shuffle(rows) else rows
      val feed = if (replay) feed0 ++ feed0.take(100) else feed0
      val ms = MemoryStream[(Long, String)]
      val q = StreamingSample.domainCapStream(
          ms.toDF().toDF("doc_id", "url"), "doc_id", "url", cap)
        .writeStream.format("memory").queryName("cap_out")
        .outputMode("update").start()
      try {
        feed.grouped(feed.size / chunks + 1).foreach { c =>
          ms.addData(c: _*); q.processAllAvailable()
        }
        assert(latestStream("cap_out") == want,
          s"chunks=$chunks shuffled=$shuffled replay=$replay")
      } finally {
        q.stop()
        spark.sql("DROP TABLE IF EXISTS cap_out")
      }
    }
  }

  test("weighted-sample stream equals batch across chunkings, disorder, replay") {
    val rnd = new Random(31)
    val rows = (0L until 500L).map(i =>
      (s"g${i % 3}", i, 1L + rnd.nextInt(2000).toLong))
    val k = 8
    val want = Sampling.weightedSample(rows.toDF("g", "doc_id", "w"),
        "doc_id", Seq("g"), "w", k)
      .select("g", "doc_id", "weight", "w_hat")
      .as[(String, Long, Long, Long)].collect()
      .groupBy(_._1).map { case (g, xs) =>
        g -> xs.map(x => (x._2, x._3, x._4)).toSet
      }
    implicit val sqlCtx = spark.sqlContext
    for ((chunks, shuffled, replay) <- Seq((1, false, false), (9, true, false), (9, true, true))) {
      val feed0 = if (shuffled) rnd.shuffle(rows) else rows
      val feed = if (replay) feed0 ++ feed0.take(120) else feed0
      val ms = MemoryStream[(String, Long, Long)]
      val q = StreamingSample.weightedSampleStream(
          ms.toDF().toDF("g", "doc_id", "w"), "doc_id", "g", "w", k)
        .writeStream.format("memory").queryName("ws_out")
        .outputMode("update").start()
      try {
        feed.grouped(feed.size / chunks + 1).foreach { c =>
          ms.addData(c: _*); q.processAllAvailable()
        }
        // latest emission per group: newest-first, the maximal descending-
        // rank run (n..1) at the head is the final ranked list
        val byGroup = spark.table("ws_out")
          .withColumn("_i", monotonically_increasing_id())
          .orderBy(col("_i").desc)
          .select("group", "rank", "id", "weight", "w_hat")
          .as[(String, Int, Long, Long, Long)].collect()
          .groupBy(_._1)
        val got = byGroup.map { case (g, rs) =>
          val picks = scala.collection.mutable.Set.empty[(Long, Long, Long)]
          var expect = rs.head._2
          var i = 0
          while (i < rs.length && rs(i)._2 == expect) {
            picks += ((rs(i)._3, rs(i)._4, rs(i)._5)); expect -= 1; i += 1
          }
          g -> picks.toSet
        }
        assert(got == want, s"chunks=$chunks shuffled=$shuffled replay=$replay")
      } finally {
        q.stop()
        spark.sql("DROP TABLE IF EXISTS ws_out")
      }
    }
  }

  test("weighted-sample: a changed-weight re-delivery keeps one row per id") {
    implicit val sqlCtx = spark.sqlContext
    val rows = (0L until 200L).map(i => ("g", i, 1L + (i * 11 % 300)))
    val k = 6
    val ms = MemoryStream[(String, Long, Long)]
    val q = StreamingSample.weightedSampleStream(
        ms.toDF().toDF("g", "doc_id", "w"), "doc_id", "g", "w", k)
      .writeStream.format("memory").queryName("ws_wchg")
      .outputMode("update").start()
    try {
      ms.addData(rows: _*); q.processAllAvailable()
      // re-deliver a current survivor with a LARGER weight: exactly one
      // row per id in the refreshed sample, carrying the new weight —
      // the batch wsUpdate larger-weight-wins rule
      val survivor = spark.table("ws_wchg")
        .orderBy(org.apache.spark.sql.functions.desc("rank"))
        .select("id").as[Long].head()
      ms.addData(("g", survivor, 16000L)); q.processAllAvailable()
      val latest = spark.table("ws_wchg")
        .withColumn("_i", monotonically_increasing_id())
        .orderBy(col("_i").desc)
        .select("rank", "id", "weight").as[(Int, Long, Long)].collect()
      val picks = scala.collection.mutable.ArrayBuffer.empty[(Int, Long, Long)]
      var expect = latest.head._1
      var i = 0
      while (i < latest.length && latest(i)._1 == expect) {
        picks += latest(i); expect -= 1; i += 1
      }
      assert(picks.count(_._2 == survivor) == 1, "one row per id")
      assert(picks.find(_._2 == survivor).get._3 == 16000L, "larger weight wins")
      // a SMALLER-weight re-delivery changes nothing (no emission)
      val n0 = spark.table("ws_wchg").count()
      ms.addData(("g", survivor, 1L)); q.processAllAvailable()
      assert(spark.table("ws_wchg").count() == n0,
        "a losing weight re-delivery must not emit")
    } finally {
      q.stop()
      spark.sql("DROP TABLE IF EXISTS ws_wchg")
    }
  }

  test("weighted-sample: a k-shrink across a checkpoint truncates state, τ stays live") {
    implicit val sqlCtx = spark.sqlContext
    val ckpt = java.nio.file.Files.createTempDirectory("ws-kchg").toString
    val outDir = java.nio.file.Files.createTempDirectory("ws-kchg-out").toString
    val rows = (0L until 120L).map(i => ("g", i, 1L + (i * 13 % 250)))
    val ms = MemoryStream[(String, Long, Long)]
    def start(k: Int) = StreamingSample.weightedSampleStream(
        ms.toDF().toDF("g", "doc_id", "w"), "doc_id", "g", "w", k)
      .writeStream
      .foreachBatch { (df: org.apache.spark.sql.Dataset[StreamingSample.WsPick],
          bid: Long) =>
        df.withColumn("_b", lit(bid)).write.mode("append").parquet(outDir)
      }
      .outputMode("update")
      .option("checkpointLocation", ckpt).start()
    val q1 = start(k = 8)
    ms.addData(rows.take(100): _*); q1.processAllAvailable()
    q1.stop()
    // restart with a SMALLER k: the 9-row checkpoint state must truncate
    // to the best 6, so the k+1-th priority (τ) is still found and w_hat
    // keeps the estimator property instead of silently collapsing to w
    val q2 = start(k = 5)
    try {
      ms.addData(rows.drop(100): _*); q2.processAllAvailable()
      val log = spark.read.parquet(outDir)
      val lastBatch = log.agg(max("_b")).as[Long].head()
      val picks = log.filter(col("_b") === lastBatch)
        .select("rank", "id", "weight", "w_hat")
        .as[(Int, Long, Long, Long)].collect().toSeq
      assert(picks.size == 5, s"sample size must follow the new k: $picks")
      // 120 rows >> k: the group is oversubscribed, so τ > 0 and at least
      // one pick must carry w_hat > weight (the τ floor)
      assert(picks.exists(p => p._4 > p._3),
        s"τ must survive the k change (w_hat stuck at w): $picks")
    } finally q2.stop()
  }

  test("weighted-sample state persists across a restart; pure replay is silent") {
    implicit val sqlCtx = spark.sqlContext
    val ckpt = java.nio.file.Files.createTempDirectory("ws-ckpt").toString
    val outDir = java.nio.file.Files.createTempDirectory("ws-out").toString
    val rnd = new Random(47)
    val rows = (0L until 300L).map(i => ("g", i, 1L + rnd.nextInt(900).toLong))
    val k = 6
    val want = Sampling.weightedSample(rows.toDF("g", "doc_id", "w"),
        "doc_id", Seq("g"), "w", k)
      .select("doc_id", "w_hat").as[(Long, Long)].collect().toSet
    val (h1, h2) = rows.splitAt(150)
    val ms = MemoryStream[(String, Long, Long)]
    def start() = StreamingSample.weightedSampleStream(
        ms.toDF().toDF("g", "doc_id", "w"), "doc_id", "g", "w", k)
      .writeStream
      .foreachBatch { (df: org.apache.spark.sql.Dataset[StreamingSample.WsPick],
          bid: Long) =>
        df.withColumn("_b", lit(bid)).write.mode("append").parquet(outDir)
      }
      .option("checkpointLocation", ckpt).outputMode("update").start()
    val q1 = start()
    ms.addData(h1: _*); q1.processAllAvailable()
    ms.addData(h1.take(80): _*); q1.processAllAvailable() // pure replay
    q1.stop()
    val q2 = start()
    ms.addData(h2: _*); q2.processAllAvailable()
    try {
      val log = spark.read.parquet(outDir)
      val lastBatch = log.agg(max("_b")).as[Long].head()
      val got = log.filter(col("_b") === lastBatch)
        .select("id", "w_hat").as[(Long, Long)].collect().toSet
      assert(got == want)
      val batches = log.select("_b").distinct().as[Long].collect().toSet
      assert(batches.size == 2, s"replay must not emit: batches=$batches")
    } finally q2.stop()
  }

  test("unchanged domains emit nothing; survivors persist across a restart") {
    implicit val sqlCtx = spark.sqlContext
    val ckpt = java.nio.file.Files.createTempDirectory("cap-ckpt").toString
    val outDir = java.nio.file.Files.createTempDirectory("cap-out").toString
    val rows = (0L until 200L).map(i => (i, s"https://one.com/$i"))
    val want = batchSurvivors(rows)
    val (h1, h2) = rows.splitAt(100)
    val ms = MemoryStream[(Long, String)]
    def start() = StreamingSample.domainCapStream(
        ms.toDF().toDF("doc_id", "url"), "doc_id", "url", cap)
      .writeStream
      .foreachBatch { (df: org.apache.spark.sql.Dataset[StreamingSample.Survivor],
          bid: Long) =>
        df.withColumn("_b", lit(bid)).write.mode("append").parquet(outDir)
      }
      .option("checkpointLocation", ckpt).outputMode("update").start()
    val q1 = start()
    ms.addData(h1: _*); q1.processAllAvailable()
    // replaying the SAME docs must emit nothing (set function)
    ms.addData(h1.take(50): _*); q1.processAllAvailable()
    q1.stop()
    val q2 = start()
    ms.addData(h2: _*); q2.processAllAvailable()
    try {
      val log = spark.read.parquet(outDir)
      val lastBatch = log.agg(max("_b")).as[Long].head()
      val got = log.filter(col("_b") === lastBatch)
        .select("doc_id").as[Long].collect().toSet
      // survivors after everything == batch over everything (state kept
      // the pre-restart survivors; a lost set would re-derive from h2 only)
      assert(got == want("one.com"))
      // the replay batch emitted no rows for the domain
      val batches = log.select("_b").distinct().as[Long].collect().toSet
      assert(batches.size == 2, s"replay must not emit: batches=$batches")
    } finally q2.stop()
  }
}
