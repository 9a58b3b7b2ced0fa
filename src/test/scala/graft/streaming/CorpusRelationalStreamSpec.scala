package graft.streaming

import graft.SparkSpec
import graft.operators.{AsofJoin, IntervalJoin}
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._

import scala.util.Random

/** The relational streams replayed over CORPUS-shaped fixtures — the
  * driver-generated `events` table (sf0.001: 1000 events, 15 users, 5
  * types), not synthetic feeds: signups are the setpoint stream an as-of
  * join carries, error windows are the interval stream points land in.
  * Locks asof/interval streaming == batch on real corpus rows, under both
  * providers (RocksDB subclass in RocksDbSpecs), including the
  * reorder-buffered variant under jittered cross-batch delivery.
  *
  * `ts` goes through [[graft.Tables.normalizeTs]] (the writer's encoding
  * has varied across testdata regenerations) and then integer
  * `unix_micros` — never FP division, which corrupts sub-ms digits.
  */
class CorpusRelationalStreamSpec extends SparkSpec
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

  /** (event_id, user_id, t_us, event_type, value) rows of the sf0.001
    * events table, loaded once per suite.
    */
  private lazy val events: Seq[(Long, Long, Long, String, Double)] =
    graft.Tables.normalizeTs(
        spark.read.parquet("/root/testdata/sf0.001/events.parquet"))
      .select(col("event_id"), col("user_id"),
        unix_micros(col("ts")).as("t_us"), col("event_type"), col("value"))
      .as[(Long, Long, Long, String, Double)].collect().toSeq

  /** Setpoints = signups (user_id, t_us, value); probes = everything else. */
  private def asofFixture = (
    events.filter(_._4 != "signup").map(e => (e._1, e._2, e._3)),
    events.filter(_._4 == "signup").map(e => (e._2, e._3, e._5)))

  private def asofBatch(probes: Seq[(Long, Long, Long)],
                        setp: Seq[(Long, Long, Double)]) =
    AsofJoin.asofJoin(
        probes.toDF("event_id", "key", "t_us"),
        setp.toDF("key", "t_us", "value"),
        keys = Seq("key"), tsCol = "t_us", payload = Seq("value"))
      .select(col("event_id"), col("asof_t_us"), col("asof_value"))
      .as[(Long, Option[Long], Option[Double])].collect()
      .map(r => r._1 -> ((r._2, r._3))).toMap

  test("asof over the events corpus: stream == batch on an in-order chunked feed") {
    val (probes, setp) = asofFixture
    val expected = asofBatch(probes, setp)
    val merged = (setp.map(s => (s._1, s._2, 0, -1L, s._3)) ++
        probes.map(p => (p._2, p._3, 1, p._1, 0.0)))
      .sortBy(e => (e._2, e._3, e._4))
    implicit val sqlCtx = spark.sqlContext
    val ms = MemoryStream[(Long, Long, Int, Long, Double)]
    val all = ms.toDF().toDF("key", "t_us", "side", "event_id", "value")
    val q = StreamingAsof.asofJoinStream(
        all.filter(col("side") === 1).select("event_id", "key", "t_us"),
        all.filter(col("side") === 0).select("key", "t_us", "value"))
      .writeStream.format("memory").queryName("corpus_asof")
      .outputMode("append").start()
    try {
      merged.grouped(merged.size / 7 + 1).foreach { b =>
        ms.addData(b: _*); q.processAllAvailable()
      }
      val got = spark.table("corpus_asof")
        .select("event_id", "asof_ts", "asof_value")
        .as[(Long, Option[Long], Option[Double])].collect()
        .map(r => r._1 -> ((r._2, r._3))).toMap
      assert(got == expected)
      // the fixture is non-trivial: most probes found a signup setpoint
      assert(expected.values.count(_._1.isDefined) > expected.size / 2)
    } finally {
      q.stop()
      spark.sql("DROP TABLE IF EXISTS corpus_asof")
    }
  }

  test("asof ordered over the events corpus: jittered cross-batch delivery == batch") {
    val rnd = new Random(79)
    val (probes, setp) = asofFixture
    val expected = asofBatch(probes, setp)
    val wire = setp.map(s => (s._1, s._2, 0, -1L, s._3)) ++
      probes.map(p => (p._2, p._3, 1, p._1, 0.0))
    // jitter < delay: arrival disorder crosses batch boundaries but stays
    // inside the watermark window (see StreamingReorderSpec's model);
    // corpus spacing is ~minutes, so jitter 8 min / delay 10 min
    val delayMs = 600000L
    val arrival = wire.map(e => (e._2 + rnd.nextLong(480000000L + 1), e))
      .sortBy(_._1).map(_._2)
    val maxUs = wire.map(_._2).max
    implicit val sqlCtx = spark.sqlContext
    val ms = MemoryStream[(Long, Long, Int, Long, Double)]
    val all = ms.toDF().toDF("key", "t_us", "side", "event_id", "value")
    val q = StreamingAsof.asofJoinStreamOrdered(
        all.filter(col("side") === 1).select("event_id", "key", "t_us"),
        all.filter(col("side") === 0).select("key", "t_us", "value"),
        delayMs)
      .writeStream.format("memory").queryName("corpus_asof_ord")
      .outputMode("append").start()
    try {
      arrival.grouped(arrival.size / 9 + 1).foreach { b =>
        ms.addData(b: _*); q.processAllAvailable()
      }
      ms.addData((999L, maxUs + 100 * delayMs * 1000L, 1, -7L, 0.0))
      q.processAllAvailable()
      ms.addData((999L, maxUs + 200 * delayMs * 1000L, 1, -8L, 0.0))
      q.processAllAvailable()
      val got = spark.table("corpus_asof_ord")
        .filter(col("key") =!= 999L)
        .select("event_id", "asof_ts", "asof_value")
        .as[(Long, Option[Long], Option[Double])].collect()
        .map(r => r._1 -> ((r._2, r._3))).toMap
      assert(got == expected)
    } finally {
      q.stop()
      spark.sql("DROP TABLE IF EXISTS corpus_asof_ord")
    }
  }

  test("interval ordered over the events corpus: jittered cross-batch delivery == batch") {
    val rnd = new Random(83)
    val winLenUs = 30L * 60 * 1000000
    val wins = events.filter(_._4 == "error")
      .map(e => (e._2, e._3, e._3 + winLenUs, e._5))
    val points = events.filter(_._4 != "error").map(e => (e._1, e._2, e._3))
    val expected = IntervalJoin.intervalJoin(
        points.toDF("event_id", "key", "t_us"),
        wins.toDF("key", "start_us", "end_us", "value"),
        Seq("key"), "t_us", "start_us", "end_us", bucketUs = winLenUs)
      .select(col("event_id"), col("start_us"), col("value"))
      .as[(Long, Long, Double)].collect().toSeq.sorted
    assert(expected.nonEmpty)

    val delayMs = 600000L
    val wire = points.map(p => (1, p._1, p._2, p._3, 0L, 0.0)) ++
      wins.map(w => (0, -1L, w._1, w._2, w._3, w._4))
    val arrival = wire.map(e => (e._4 + rnd.nextLong(480000000L + 1), e))
      .sortBy(_._1).map(_._2)
    val maxUs = wire.map(e => math.max(e._4, e._5)).max
    implicit val sqlCtx = spark.sqlContext
    val ms = MemoryStream[(Int, Long, Long, Long, Long, Double)]
    val all = ms.toDF().toDF("side", "event_id", "key", "a", "b", "value")
    val q = StreamingInterval.intervalJoinStreamOrdered(
        all.filter(col("side") === 1)
          .select(col("event_id"), col("key"), col("a").as("t_us")),
        all.filter(col("side") === 0)
          .select(col("key"), col("a").as("start_us"),
            col("b").as("end_us"), col("value")),
        delayMs)
      .writeStream.format("memory").queryName("corpus_iv_ord")
      .outputMode("append").start()
    try {
      arrival.grouped(arrival.size / 9 + 1).foreach { b =>
        ms.addData(b: _*); q.processAllAvailable()
      }
      ms.addData((1, -7L, 999L, maxUs + 100 * delayMs * 1000L, 0L, 0.0))
      q.processAllAvailable()
      ms.addData((1, -8L, 999L, maxUs + 200 * delayMs * 1000L, 0L, 0.0))
      q.processAllAvailable()
      val got = spark.table("corpus_iv_ord")
        .filter(col("key") =!= 999L)
        .select(col("event_id"), col("start_us"), col("value"))
        .as[(Long, Long, Double)].collect().toSeq.sorted
      assert(got == expected)
    } finally {
      q.stop()
      spark.sql("DROP TABLE IF EXISTS corpus_iv_ord")
    }
  }

  test("interval over the events corpus: stream == batch on an in-order chunked feed") {
    // windows: each error event opens a 30-minute incident window; points:
    // every non-error event, matched into any open window of its user
    val winLenUs = 30L * 60 * 1000000
    val wins = events.filter(_._4 == "error")
      .map(e => (e._2, e._3, e._3 + winLenUs, e._5))
    val points = events.filter(_._4 != "error").map(e => (e._1, e._2, e._3))
    val expected = IntervalJoin.intervalJoin(
        points.toDF("event_id", "key", "t_us"),
        wins.toDF("key", "start_us", "end_us", "value"),
        Seq("key"), "t_us", "start_us", "end_us", bucketUs = winLenUs)
      .select(col("event_id"), col("start_us"), col("value"))
      .as[(Long, Long, Double)].collect().toSeq.sorted
    assert(expected.nonEmpty)

    val feed = (points.map(p => (1, p._1, p._2, p._3, 0L, 0.0)) ++
        wins.map(w => (0, -1L, w._1, w._2, w._3, w._4)))
      .sortBy(e => (e._4, e._1, e._2))
    implicit val sqlCtx = spark.sqlContext
    val ms = MemoryStream[(Int, Long, Long, Long, Long, Double)]
    val all = ms.toDF().toDF("side", "event_id", "key", "a", "b", "value")
    val q = StreamingInterval.intervalJoinStream(
        all.filter(col("side") === 1)
          .select(col("event_id"), col("key"), col("a").as("t_us")),
        all.filter(col("side") === 0)
          .select(col("key"), col("a").as("start_us"),
            col("b").as("end_us"), col("value")))
      .writeStream.format("memory").queryName("corpus_iv")
      .outputMode("append").start()
    try {
      feed.grouped(feed.size / 7 + 1).foreach { b =>
        ms.addData(b: _*); q.processAllAvailable()
      }
      val got = spark.table("corpus_iv")
        .select(col("event_id"), col("start_us"), col("value"))
        .as[(Long, Long, Double)].collect().toSeq.sorted
      assert(got == expected)
    } finally {
      q.stop()
      spark.sql("DROP TABLE IF EXISTS corpus_iv")
    }
  }
}
