package graft.streaming

import graft.SparkSpec
import graft.operators.IntervalJoin
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._

import scala.util.Random

/** Streaming interval join: must match the batch operator exactly when each
  * key's feed arrives in event-time order across micro-batches, with state
  * bounded by the open-window overlap degree.
  */
class StreamingIntervalSpec extends SparkSpec
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

  /** points (event_id, key, t); windows (key, start, end, value). */
  private def batchExpected(points: Seq[(Long, Long, Long)],
                            wins: Seq[(Long, Long, Long, Double)]) =
    IntervalJoin.intervalJoin(
        points.toDF("event_id", "key", "t_us"),
        wins.toDF("key", "start_us", "end_us", "value"),
        Seq("key"), "t_us", "start_us", "end_us", bucketUs = 64L)
      .select(col("event_id"), col("start_us"), col("value"))
      .as[(Long, Long, Double)].collect().toSeq.sorted

  test("stream matches batch across chunkings under in-order feeds") {
    val rnd = new Random(23)
    val keys = Seq(1L, 2L, 3L, 4L)
    // windows: varied lengths incl. heavy overlap; points dense
    val wins = (0 until 120).map { i =>
      val s = rnd.nextInt(5000).toLong
      (keys(rnd.nextInt(keys.size)), s, s + 1 + rnd.nextInt(900).toLong,
        (i % 17).toDouble)
    }
    val points = (1L to 600L).map(i =>
      (i, keys(rnd.nextInt(keys.size)), rnd.nextInt(6000).toLong))
    val want = batchExpected(points, wins)
    assert(want.nonEmpty)

    // one interleaved event-time-ordered feed, split into chunks
    val feed: Seq[Either[(Long, Long, Long), (Long, Long, Long, Double)]] =
      (points.map(p => (p._3, 1, Left(p): Either[(Long, Long, Long), (Long, Long, Long, Double)])) ++
        wins.map(w => (w._2, 0, Right(w): Either[(Long, Long, Long), (Long, Long, Long, Double)])))
        .sortBy(t => (t._1, t._2)).map(_._3)

    implicit val sqlCtx = spark.sqlContext
    for (chunks <- Seq(1, 5, 23)) {
      // ONE tagged source filtered two ways — two independent
      // MemoryStreams race the running trigger between their addData
      // calls, and a batch holding a chunk's points without its windows
      // breaks the in-order-feed contract (see StreamingAsofSpec).
      val ms = MemoryStream[(Int, Long, Long, Long, Long, Double)]
      val all = ms.toDF().toDF("side", "event_id", "key", "a", "b", "value")
      val q = StreamingInterval.intervalJoinStream(
          all.filter(col("side") === 1)
            .select(col("event_id"), col("key"), col("a").as("t_us")),
          all.filter(col("side") === 0)
            .select(col("key"), col("a").as("start_us"),
              col("b").as("end_us"), col("value")))
        .writeStream.format("memory").queryName("iv_out")
        .outputMode("append").start()
      try {
        feed.grouped(feed.size / chunks + 1).foreach { chunk =>
          ms.addData(chunk.map {
            case Left((id, k, t))        => (1, id, k, t, 0L, 0.0)
            case Right((k, s0, e0, v))   => (0, -1L, k, s0, e0, v)
          }: _*)
          q.processAllAvailable()
        }
        val got = spark.table("iv_out")
          .select(col("event_id"), col("start_us"), col("value"))
          .as[(Long, Long, Double)].collect().toSeq.sorted
        assert(got == want, s"chunks=$chunks")
      } finally {
        q.stop()
        spark.sql("DROP TABLE IF EXISTS iv_out")
      }
    }
  }

  test("open-window state survives a query restart through the checkpoint") {
    implicit val sqlCtx = spark.sqlContext
    val ckpt = java.nio.file.Files.createTempDirectory("iv-ckpt").toString
    val outDir = java.nio.file.Files.createTempDirectory("iv-out").toString
    val msP = MemoryStream[(Long, Long, Long)]
    val msW = MemoryStream[(Long, Long, Long, Double)]
    def start() = StreamingInterval.intervalJoinStream(
        msP.toDF().toDF("event_id", "key", "t_us"),
        msW.toDF().toDF("key", "start_us", "end_us", "value"))
      .writeStream.format("parquet").option("path", outDir)
      .option("checkpointLocation", ckpt).outputMode("append").start()

    // open two overlapping windows, match one point, stop mid-window
    val q1 = start()
    msW.addData((1L, 10L, 100L, 5.0), (1L, 20L, 60L, 7.0))
    msP.addData((1L, 1L, 30L))
    q1.processAllAvailable(); q1.stop()

    // restart: points must still see BOTH stored open windows
    val q2 = start()
    msP.addData((2L, 1L, 50L), (3L, 1L, 80L))
    q2.processAllAvailable()
    try {
      val got = spark.read.parquet(outDir)
        .select("event_id", "start_us").as[(Long, Long)].collect().toSeq.sorted
      // point 2 (t=50): both windows; point 3 (t=80): only [10,100)
      assert(got == Seq((1L, 10L), (1L, 20L), (2L, 10L), (2L, 20L), (3L, 10L)))
    } finally q2.stop()
  }

  test("closed windows stop matching; ties at start match, at end do not") {
    implicit val sqlCtx = spark.sqlContext
    val msP = MemoryStream[(Long, Long, Long)]
    val msW = MemoryStream[(Long, Long, Long, Double)]
    val q = StreamingInterval.intervalJoinStream(
        msP.toDF().toDF("event_id", "key", "t_us"),
        msW.toDF().toDF("key", "start_us", "end_us", "value"))
      .writeStream.format("memory").queryName("iv_edge")
      .outputMode("append").start()
    try {
      msW.addData((1L, 10L, 20L, 5.0)); q.processAllAvailable()
      msP.addData((1L, 1L, 10L), (2L, 1L, 19L), (3L, 1L, 20L))
      q.processAllAvailable()
      // frontier is now 20 >= end -> window closed
      msP.addData((4L, 1L, 15L)) // late-ish but >= start; window already closed?
      q.processAllAvailable()
      val got = spark.table("iv_edge").select("event_id")
        .as[Long].collect().toSeq.sorted
      // 1 (t=10 == start) and 2 (t=19 < end) match; 3 (t=20 == end) does
      // not; 4 arrives after the frontier passed end -> window pruned
      assert(got == Seq(1L, 2L))
    } finally {
      q.stop()
      spark.sql("DROP TABLE IF EXISTS iv_edge")
    }
  }
}
