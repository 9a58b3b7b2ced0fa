package graft.streaming

import graft.SparkSpec
import graft.operators.Stats
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._

import scala.util.Random

/** Streaming EWMA: the integer fixed-point recursion in state must equal
  * the batch machine after any prefix, for any chunking of an in-order
  * feed (the reorder-buffered ordered variant is differentialed in
  * [[StreamingReorderSpec]]).
  */
class StreamingEwmaSpec extends SparkSpec
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

  private val k = 3

  private def batchEwma(rows: Seq[(Long, Long, Long, Long)]) =
    Stats.ewma(rows.toDF("key", "t_us", "event_id", "vq"),
        Seq("key"), Seq("t_us", "event_id"), "vq", k)
      .select("event_id", "level_q", "resid")
      .as[(Long, Long, Long)].collect()
      .map(r => r._1 -> ((r._2, r._3))).toMap

  test("stream equals the batch machine across chunkings") {
    val rng = new Random(61)
    // negative values included: the arithmetic-shift floor division on a
    // negative delta is exactly the cross-engine hazard the operator pins
    val rows = (1L to 3000L).map { i =>
      (i % 5, i / 5, i, rng.nextInt(4000).toLong - 2000L)
    }
    val want = batchEwma(rows)
    implicit val sqlCtx = spark.sqlContext
    for (chunks <- Seq(1, 7, 31)) {
      val ms = MemoryStream[(Long, Long, Long, Long)]
      val q = StreamingEwma.ewmaStream(
          ms.toDF().toDF("key", "t_us", "event_id", "v"), k)
        .writeStream.format("memory").queryName("ewma_out")
        .outputMode("append").start()
      try {
        rows.grouped(rows.size / chunks + 1).foreach { c =>
          ms.addData(c: _*); q.processAllAvailable()
        }
        val got = spark.table("ewma_out").select("event_id", "level_q", "resid")
          .as[(Long, Long, Long)].collect()
          .map(r => r._1 -> ((r._2, r._3))).toMap
        assert(got == want, s"chunks=$chunks")
      } finally {
        q.stop()
        spark.sql("DROP TABLE IF EXISTS ewma_out")
      }
    }
  }

  test("level survives a query restart through the checkpoint") {
    implicit val sqlCtx = spark.sqlContext
    val rng = new Random(67)
    val rows = (1L to 400L).map(i => (i % 3, i / 3, i, rng.nextInt(1000).toLong))
    val (firstHalf, secondHalf) = rows.splitAt(200)
    val want = batchEwma(rows)

    val ckpt = java.nio.file.Files.createTempDirectory("ewma-ckpt").toString
    val outDir = java.nio.file.Files.createTempDirectory("ewma-out").toString
    val ms = MemoryStream[(Long, Long, Long, Long)]
    def start() = StreamingEwma.ewmaStream(
        ms.toDF().toDF("key", "t_us", "event_id", "v"), k)
      .writeStream.format("parquet").option("path", outDir)
      .option("checkpointLocation", ckpt).outputMode("append").start()

    val q1 = start()
    ms.addData(firstHalf: _*); q1.processAllAvailable(); q1.stop()
    val q2 = start()
    ms.addData(secondHalf: _*); q2.processAllAvailable()
    try {
      val got = spark.read.parquet(outDir).select("event_id", "level_q", "resid")
        .as[(Long, Long, Long)].collect()
        .map(r => r._1 -> ((r._2, r._3))).toMap
      // a lost level would restart the second half as a fresh series
      // (resid 0 at its first row) — the batch map disagrees there
      assert(got == want)
    } finally q2.stop()
  }

  test("jump detection: the residual scores a step change at full size once") {
    implicit val sqlCtx = spark.sqlContext
    val flat = (1L to 50L).map(i => (1L, i, i, 1000L))
    val jump = (51L to 60L).map(i => (1L, i, i, 2000L))
    val ms = MemoryStream[(Long, Long, Long, Long)]
    val q = StreamingEwma.ewmaStream(
        ms.toDF().toDF("key", "t_us", "event_id", "v"), k)
      .writeStream.format("memory").queryName("ewma_jump")
      .outputMode("append").start()
    try {
      ms.addData(flat ++ jump: _*); q.processAllAvailable()
      val resid = spark.table("ewma_jump").orderBy("event_id")
        .select("resid").as[Long].collect()
      // steady state: resid 0 over the flat run (level == value exactly)
      assert(resid.slice(1, 50).forall(_ == 0L))
      // the first post-jump row scores the full step; later rows decay
      assert(resid(50) == 1000L)
      assert(resid(51) < 1000L && resid(51) > 0L)
      assert(resid(59) < resid(51))
    } finally {
      q.stop()
      spark.sql("DROP TABLE IF EXISTS ewma_jump")
    }
  }
}
