package graft.streaming

import graft.SparkSpec
import graft.operators.Stats
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._

import scala.util.Random

/** Streaming CUSUM: the recursion in state must equal the batch closed
  * form after any prefix, for any chunking of an in-order feed.
  */
class StreamingCusumSpec extends SparkSpec
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

  private val slack = 10L

  private def batchCusum(rows: Seq[(Long, Long, Long, Long)]) =
    Stats.cusum(rows.toDF("key", "t_us", "event_id", "x"),
        Seq("key"), Seq("t_us", "event_id"), col("x"), slack)
      .select("event_id", "cusum").as[(Long, Long)].collect().toMap

  test("stream equals the batch closed form across chunkings") {
    val rng = new Random(37)
    val rows = (1L to 3000L).map { i =>
      (i % 5, i / 5, i, rng.nextInt(40).toLong - 12L)
    } // (key, t, id, x): in event-time order per key by construction
    val want = batchCusum(rows)
    implicit val sqlCtx = spark.sqlContext
    for (chunks <- Seq(1, 7, 31)) {
      val ms = MemoryStream[(Long, Long, Long, Long)]
      val q = StreamingCusum.cusumStream(
          ms.toDF().toDF("key", "t_us", "event_id", "x"), slack)
        .writeStream.format("memory").queryName("cusum_out")
        .outputMode("append").start()
      try {
        rows.grouped(rows.size / chunks + 1).foreach { c =>
          ms.addData(c: _*); q.processAllAvailable()
        }
        val got = spark.table("cusum_out").select("event_id", "cusum")
          .as[(Long, Long)].collect().toMap
        assert(got == want, s"chunks=$chunks")
      } finally {
        q.stop()
        spark.sql("DROP TABLE IF EXISTS cusum_out")
      }
    }
  }

  test("state survives a query restart through the checkpoint") {
    implicit val sqlCtx = spark.sqlContext
    val rng = new Random(53)
    val rows = (1L to 400L).map(i => (i % 3, i / 3, i, rng.nextInt(40).toLong - 12L))
    val (firstHalf, secondHalf) = rows.splitAt(200)
    val want = batchCusum(rows)

    val ckpt = java.nio.file.Files.createTempDirectory("cusum-ckpt").toString
    val outDir = java.nio.file.Files.createTempDirectory("cusum-out").toString
    val ms = MemoryStream[(Long, Long, Long, Long)]
    def start() = StreamingCusum.cusumStream(
        ms.toDF().toDF("key", "t_us", "event_id", "x"), slack)
      .writeStream.format("parquet").option("path", outDir)
      .option("checkpointLocation", ckpt).outputMode("append").start()

    val q1 = start()
    ms.addData(firstHalf: _*); q1.processAllAvailable(); q1.stop()
    val q2 = start()
    ms.addData(secondHalf: _*); q2.processAllAvailable()
    try {
      val got = spark.read.parquet(outDir).select("event_id", "cusum")
        .as[(Long, Long)].collect().toMap
      // a lost (p, minP) would restart the second half's statistic at zero
      assert(got == want)
    } finally q2.stop()
  }

  test("statistic resets to zero after a long quiet run, never negative") {
    implicit val sqlCtx = spark.sqlContext
    val ms = MemoryStream[(Long, Long, Long, Long)]
    val q = StreamingCusum.cusumStream(
        ms.toDF().toDF("key", "t_us", "event_id", "x"), slack)
      .writeStream.format("memory").queryName("cusum_reset")
      .outputMode("append").start()
    try {
      ms.addData((1L, 1L, 1L, 100L), (1L, 2L, 2L, 0L), (1L, 3L, 3L, 0L),
        (1L, 4L, 4L, 0L), (1L, 5L, 5L, 0L), (1L, 6L, 6L, 0L),
        (1L, 7L, 7L, 0L), (1L, 8L, 8L, 0L), (1L, 9L, 9L, 0L),
        (1L, 10L, 10L, 0L), (1L, 11L, 11L, 15L))
      q.processAllAvailable()
      val got = spark.table("cusum_reset").select("event_id", "cusum")
        .as[(Long, Long)].collect().toMap
      assert(got(1L) == 90L)               // 100 - 10
      assert(got(10L) == 0L)               // decayed to the floor, not negative
      assert(got(11L) == 5L)               // restarts from zero: 15 - 10
      assert(got.values.forall(_ >= 0L))
    } finally {
      q.stop()
      spark.sql("DROP TABLE IF EXISTS cusum_reset")
    }
  }
}
