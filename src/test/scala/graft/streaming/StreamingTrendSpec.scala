package graft.streaming

import graft.SparkSpec
import graft.operators.Stats
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._

import scala.util.Random

/** Streaming trend: the moment sums in state must equal the batch
  * aggregation after any prefix of an in-order feed, for any chunking —
  * and the reorder-buffered variant must survive the rebase hazard (a
  * key's true FIRST event arriving late) that silently corrupts any
  * in-order first-seen origin.
  */
class StreamingTrendSpec extends SparkSpec
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

  private type Ev = (Long, Long, Long, Long) // key, t_us, event_id, v
  private type TrendOut = (Long, Long, Long, Long, Long, Option[Long])

  private def batchTrend(rows: Seq[Ev]): Map[Long, TrendOut] =
    Stats.trend(rows.toDF("key", "t_us", "event_id", "vq"),
        Seq("key"), "t_us", "vq")
      .collect().map { r =>
        r.getLong(0) -> ((r.getLong(1), r.getLong(2), r.getLong(3),
          r.getLong(4), r.getLong(5),
          if (r.isNullAt(6)) None else Some(r.getLong(6))))
      }.toMap

  /** Latest emission per key: n grows strictly per emission. */
  private def latest(table: String): Map[Long, TrendOut] =
    spark.table(table)
      .select("key", "n", "sx", "sy", "sxy", "sxx", "slope_ppm")
      .collect().map { r =>
        r.getLong(0) -> ((r.getLong(1), r.getLong(2), r.getLong(3),
          r.getLong(4), r.getLong(5),
          if (r.isNullAt(6)) None else Some(r.getLong(6))))
      }.groupBy(_._1).map { case (k, rs) => k -> rs.map(_._2).maxBy(_._1) }

  test("stream equals the batch aggregation across chunkings") {
    val rng = new Random(71)
    // irregular minute spacing, negative values, a planted negative-slope
    // key — the slope's decimal-div truncation direction matters
    val rows: Seq[Ev] = (1L to 2000L).map { i =>
      val key = i % 4
      (key, (i / 4) * 60000000L + rng.nextInt(50000000),
        i, (50 - key.toInt * 30) * (i / 4) + rng.nextInt(400) - 200)
    }
    val want = batchTrend(rows)
    implicit val sqlCtx = spark.sqlContext
    for (chunks <- Seq(1, 7, 31)) {
      val ms = MemoryStream[Ev]
      val q = StreamingTrend.trendStream(
          ms.toDF().toDF("key", "t_us", "event_id", "v"))
        .writeStream.format("memory").queryName("trend_out")
        .outputMode("update").start()
      try {
        rows.grouped(rows.size / chunks + 1).foreach { c =>
          ms.addData(c: _*); q.processAllAvailable()
        }
        assert(latest("trend_out") == want, s"chunks=$chunks")
      } finally {
        q.stop()
        spark.sql("DROP TABLE IF EXISTS trend_out")
      }
    }
  }

  test("sums survive a query restart through the checkpoint") {
    implicit val sqlCtx = spark.sqlContext
    val rng = new Random(73)
    val rows: Seq[Ev] = (1L to 400L).map(i =>
      (i % 3, (i / 3) * 60000000L, i, rng.nextInt(1000).toLong))
    val (firstHalf, secondHalf) = rows.splitAt(200)
    val want = batchTrend(rows)

    val ckpt = java.nio.file.Files.createTempDirectory("trend-ckpt").toString
    val outDir = java.nio.file.Files.createTempDirectory("trend-out").toString
    val ms = MemoryStream[Ev]
    // update-mode emissions need an update-capable durable sink:
    // foreachBatch appends each batch's refreshed rows (parquet itself
    // only accepts Append); latest-by-n over all emissions is the trend
    def start() = StreamingTrend.trendStream(
        ms.toDF().toDF("key", "t_us", "event_id", "v"))
      .writeStream
      .foreachBatch { (df: org.apache.spark.sql.Dataset[
          StreamingTrend.TrendRow], _: Long) =>
        df.write.mode("append").parquet(outDir)
      }
      .option("checkpointLocation", ckpt).outputMode("update").start()

    val q1 = start()
    ms.addData(firstHalf: _*); q1.processAllAvailable(); q1.stop()
    val q2 = start()
    ms.addData(secondHalf: _*); q2.processAllAvailable()
    try {
      val got = spark.read.parquet(outDir)
        .select("key", "n", "sx", "sy", "sxy", "sxx", "slope_ppm")
        .collect().map { r =>
          r.getLong(0) -> ((r.getLong(1), r.getLong(2), r.getLong(3),
            r.getLong(4), r.getLong(5),
            if (r.isNullAt(6)) None else Some(r.getLong(6))))
        }.groupBy(_._1).map { case (k, rs) => k -> rs.map(_._2).maxBy(_._1) }
      // lost sums would restart the second half as a fresh series: n,
      // and the rebase origin t0, would both disagree with batch
      assert(got == want)
    } finally q2.stop()
  }

  test("ordered: cross-batch disorder including a late first event == batch") {
    // delay generously above the forced displacement (~3-4 s of event
    // time) so the hazard event is disordered, not late-beyond-delay
    val delayMs = 5000L
    val baseUs = 1000000000L
    val rng = new Random(79)
    val rows: Seq[Ev] = (1L to 600L).map { i =>
      (i % 3, baseUs + (i / 3) * 1000000L, i, (i / 3) * 7 + rng.nextInt(100))
    }
    val want = batchTrend(rows)
    // jittered arrival (jitter < delay), then FORCE the rebase hazard:
    // key 1's min-ts event is moved behind its next three events
    val jit = rows.map(e => (e._2 + rng.nextLong(400001L), e))
      .sortBy(_._1).map(_._2)
    val min1 = rows.filter(_._1 == 1L).minBy(_._2)
    val idx = jit.indexOf(min1)
    val later = jit.zipWithIndex.collect {
      case (e, j) if e._1 == 1L && j > idx => j
    }.take(3)
    val arrival =
      if (later.isEmpty) jit
      else {
        val at = later.last
        val without = jit.patch(idx, Nil, 1)
        without.patch(at, Seq(min1), 0)
      }
    val firstArriving1 = arrival.find(_._1 == 1L).get
    assert(firstArriving1 != min1,
      "fixture must present key 1's first event out of order")

    implicit val sqlCtx = spark.sqlContext
    val lateAcc = spark.sparkContext.longAccumulator("trend_late")
    val ms = MemoryStream[Ev]
    val q = StreamingTrend.trendStreamOrdered(
        ms.toDF().toDF("key", "t_us", "event_id", "v"),
        delayMs = delayMs, lateAcc = Some(lateAcc))
      .writeStream.format("memory").queryName("trend_ord")
      .outputMode("update").start()
    try {
      val n = arrival.size
      val cuts = (Seq(0, n) ++ Seq.fill(11)(rng.nextInt(n + 1))).sorted.distinct
      cuts.zip(cuts.tail).map { case (a, b) => arrival.slice(a, b) }
        .filter(_.nonEmpty)
        .foreach { b => ms.addData(b: _*); q.processAllAvailable() }
      val maxUs = rows.map(_._2).max
      ms.addData((9999L, maxUs + 100 * delayMs * 1000L, -7L, 0L))
      q.processAllAvailable()
      ms.addData((9999L, maxUs + 200 * delayMs * 1000L, -8L, 0L))
      q.processAllAvailable()
      val got = latest("trend_ord").filter(_._1 != 9999L)
      assert(got == want)
      assert(lateAcc.value == 0L)
    } finally {
      q.stop()
      spark.sql("DROP TABLE IF EXISTS trend_ord")
    }
  }
}
