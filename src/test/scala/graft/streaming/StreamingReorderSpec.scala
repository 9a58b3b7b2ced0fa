package graft.streaming

import graft.SparkSpec
import graft.operators.{AsofJoin, IntervalJoin, Stats}
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._

import scala.util.Random

/** The `*Ordered` relational streams (reorder-buffered asof / interval /
  * CUSUM) must match the batch operators under delivery that is shuffled
  * ACROSS micro-batches — not merely within one — as long as every event
  * arrives within the watermark delay; and events later than the delay
  * must be dropped LOUDLY (the numRowsDroppedByWatermark state-operator
  * metric, plus the residual accumulator), never silently mis-joined.
  *
  * Arrival model: each event's arrival key is `ts + jitter` with jitter
  * uniform in [0, J], J < delay — the standard bounded-disorder model.
  * Any event already delivered when e arrives has arrival key <= e's, so
  * its ts <= e.ts + J, hence the watermark (max seen ts - delay) stays
  * below e.ts: nothing is droppable, and stream == batch is exact.
  * The arrival sequence is sliced into many batches, so disorder crosses
  * batch boundaries throughout (the in-order entry points would be wrong
  * on these feeds — that is the contract gap these variants close).
  */
class StreamingReorderSpec extends SparkSpec
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

  private val delayMs = 500L
  private val jitterUs = 400000L // 400 ms < delay
  private val baseUs = 1000000000L // 1000 s epoch; ms-granular watermarks need us >> 1000
  private val sentinelKey = 9999L

  /** Slice an arrival-ordered seq into n batches of random sizes. */
  private def slices[T](rnd: Random, xs: Seq[T], n: Int): Seq[Seq[T]] = {
    val cuts = (Seq(0, xs.size) ++ Seq.fill(n - 1)(rnd.nextInt(xs.size + 1)))
      .sorted.distinct
    cuts.zip(cuts.tail).map { case (a, b) => xs.slice(a, b) }.filter(_.nonEmpty)
  }

  /** Jittered arrival order: sort by ts + uniform jitter in [0, jitterUs].
    * Jitter is PRECOMPUTED per element — a random key function inside
    * sortBy would give each comparison a different key (TimSort's
    * "comparison method violates its general contract").
    */
  private def jittered[T](rnd: Random, xs: Seq[T], tsUs: T => Long): Seq[T] =
    xs.map(e => (tsUs(e) + rnd.nextLong(jitterUs + 1), e))
      .sortBy(_._1).map(_._2)

  test("asof ordered: shuffled cross-batch delivery == batch operator") {
    val rnd = new Random(61)
    val keys = Seq(1L, 2L, 3L)
    val setp = (0 until 40).map(_ => (keys(rnd.nextInt(3)),
        baseUs + rnd.nextInt(4000) * 1000L, rnd.nextDouble))
      .groupBy(r => (r._1, r._2)).map(_._2.head).toSeq // unique (key, ts)
    val probes = (1L to 150L).map(i =>
      (i, keys(rnd.nextInt(3)), baseUs + rnd.nextInt(4000) * 1000L))
    val expected = AsofJoin.asofJoin(
        probes.toDF("event_id", "key", "t_us"),
        setp.toDF("key", "t_us", "value"),
        keys = Seq("key"), tsCol = "t_us", payload = Seq("value"))
      .select(col("event_id"), col("asof_t_us"), col("asof_value"))
      .as[(Long, Option[Long], Option[Double])].collect()
      .map(r => r._1 -> ((r._2, r._3))).toMap

    // (key, t_us, side, event_id, value) wire rows, jitter-shuffled arrival
    val wire = setp.map(s => (s._1, s._2, 0, -1L, s._3)) ++
      probes.map(p => (p._2, p._3, 1, p._1, 0.0))
    val arrival = jittered(rnd, wire, (e: (Long, Long, Int, Long, Double)) => e._2)
    val maxUs = wire.map(_._2).max

    implicit val sqlCtx = spark.sqlContext
    val lateAcc = spark.sparkContext.longAccumulator("asof_late")
    val ms = MemoryStream[(Long, Long, Int, Long, Double)]
    val all = ms.toDF().toDF("key", "t_us", "side", "event_id", "value")
    val q = StreamingAsof.asofJoinStreamOrdered(
        all.filter(col("side") === 1).select("event_id", "key", "t_us"),
        all.filter(col("side") === 0).select("key", "t_us", "value"),
        delayMs, Some(lateAcc))
      .writeStream.format("memory").queryName("asof_ord")
      .outputMode("append").start()
    try {
      slices(rnd, arrival, 12).foreach { b =>
        ms.addData(b: _*); q.processAllAvailable()
      }
      // flush: push the watermark far past everything, twice (second batch
      // fires the event-time timeouts — see StreamingSpec's convention)
      ms.addData((sentinelKey, maxUs + 100 * delayMs * 1000L, 1, -7L, 0.0))
      q.processAllAvailable()
      ms.addData((sentinelKey, maxUs + 200 * delayMs * 1000L, 1, -8L, 0.0))
      q.processAllAvailable()
      val got = spark.table("asof_ord")
        .filter(col("key") =!= sentinelKey)
        .select("event_id", "asof_ts", "asof_value")
        .as[(Long, Option[Long], Option[Double])].collect()
        .map(r => r._1 -> ((r._2, r._3))).toMap
      assert(got.keySet == expected.keySet,
        s"missing=${(expected.keySet -- got.keySet).take(5)} extra=${(got.keySet -- expected.keySet).take(5)}")
      val bad = expected.filter { case (k, v) => got(k) != v }
      assert(bad.isEmpty, s"diverged on ${bad.take(5)}")
      assert(lateAcc.value == 0L, "nothing was droppable within the delay")
    } finally {
      q.stop()
      spark.sql("DROP TABLE IF EXISTS asof_ord")
    }
  }

  test("interval ordered: shuffled cross-batch delivery == batch operator") {
    val rnd = new Random(67)
    val keys = Seq(1L, 2L, 3L, 4L)
    val wins = (0 until 60).map { i =>
      val s = baseUs + rnd.nextInt(4000) * 1000L
      (keys(rnd.nextInt(keys.size)), s, s + (1 + rnd.nextInt(800)) * 1000L,
        (i % 17).toDouble)
    }
    val points = (1L to 300L).map(i =>
      (i, keys(rnd.nextInt(keys.size)), baseUs + rnd.nextInt(5000) * 1000L))
    val expected = IntervalJoin.intervalJoin(
        points.toDF("event_id", "key", "t_us"),
        wins.toDF("key", "start_us", "end_us", "value"),
        Seq("key"), "t_us", "start_us", "end_us", bucketUs = 64000L)
      .select(col("event_id"), col("start_us"), col("value"))
      .as[(Long, Long, Double)].collect().toSeq.sorted
    assert(expected.nonEmpty)

    // (side, event_id, key, a, b, value): a = point ts / window start
    val wire = points.map(p => (1, p._1, p._2, p._3, 0L, 0.0)) ++
      wins.map(w => (0, -1L, w._1, w._2, w._3, w._4))
    val arrival = jittered(rnd, wire, (e: (Int, Long, Long, Long, Long, Double)) => e._4)
    val maxUs = wire.map(e => math.max(e._4, e._5)).max

    implicit val sqlCtx = spark.sqlContext
    val lateAcc = spark.sparkContext.longAccumulator("iv_late")
    val ms = MemoryStream[(Int, Long, Long, Long, Long, Double)]
    val all = ms.toDF().toDF("side", "event_id", "key", "a", "b", "value")
    val q = StreamingInterval.intervalJoinStreamOrdered(
        all.filter(col("side") === 1)
          .select(col("event_id"), col("key"), col("a").as("t_us")),
        all.filter(col("side") === 0)
          .select(col("key"), col("a").as("start_us"),
            col("b").as("end_us"), col("value")),
        delayMs, Some(lateAcc))
      .writeStream.format("memory").queryName("iv_ord")
      .outputMode("append").start()
    try {
      slices(rnd, arrival, 12).foreach { b =>
        ms.addData(b: _*); q.processAllAvailable()
      }
      ms.addData((1, -7L, sentinelKey, maxUs + 100 * delayMs * 1000L, 0L, 0.0))
      q.processAllAvailable()
      ms.addData((1, -8L, sentinelKey, maxUs + 200 * delayMs * 1000L, 0L, 0.0))
      q.processAllAvailable()
      val got = spark.table("iv_ord")
        .filter(col("key") =!= sentinelKey)
        .select(col("event_id"), col("start_us"), col("value"))
        .as[(Long, Long, Double)].collect().toSeq.sorted
      assert(got == expected)
      assert(lateAcc.value == 0L)
    } finally {
      q.stop()
      spark.sql("DROP TABLE IF EXISTS iv_ord")
    }
  }

  test("cusum ordered: shuffled cross-batch delivery == batch closed form") {
    val rnd = new Random(71)
    val slack = 10L
    val rows = (1L to 1200L).map { i =>
      (i % 5, baseUs + (i / 5) * 1000L, i, rnd.nextInt(40).toLong - 12L)
    } // (key, t_us, event_id, x)
    val expected = Stats.cusum(rows.toDF("key", "t_us", "event_id", "x"),
        Seq("key"), Seq("t_us", "event_id"), col("x"), slack)
      .select("event_id", "cusum").as[(Long, Long)].collect().toMap

    val arrival = jittered(rnd, rows, (e: (Long, Long, Long, Long)) => e._2)
    val maxUs = rows.map(_._2).max

    implicit val sqlCtx = spark.sqlContext
    val lateAcc = spark.sparkContext.longAccumulator("cusum_late")
    val ms = MemoryStream[(Long, Long, Long, Long)]
    val q = StreamingCusum.cusumStreamOrdered(
        ms.toDF().toDF("key", "t_us", "event_id", "x"), slack,
        delayMs, Some(lateAcc))
      .writeStream.format("memory").queryName("cusum_ord")
      .outputMode("append").start()
    try {
      slices(rnd, arrival, 15).foreach { b =>
        ms.addData(b: _*); q.processAllAvailable()
      }
      ms.addData((sentinelKey, maxUs + 100 * delayMs * 1000L, -7L, 0L))
      q.processAllAvailable()
      ms.addData((sentinelKey, maxUs + 200 * delayMs * 1000L, -8L, 0L))
      q.processAllAvailable()
      val got = spark.table("cusum_ord")
        .filter(col("key") =!= sentinelKey)
        .select("event_id", "cusum").as[(Long, Long)].collect().toMap
      assert(got == expected)
      assert(lateAcc.value == 0L)
    } finally {
      q.stop()
      spark.sql("DROP TABLE IF EXISTS cusum_ord")
    }
  }

  test("ewma ordered: shuffled cross-batch delivery == batch machine") {
    val rnd = new Random(73)
    val rows = (1L to 1200L).map { i =>
      (i % 5, baseUs + (i / 5) * 1000L, i, rnd.nextInt(4000).toLong - 2000L)
    } // (key, t_us, event_id, v) — negative deltas exercise the arithmetic shift
    val expected = Stats.ewma(rows.toDF("key", "t_us", "event_id", "vq"),
        Seq("key"), Seq("t_us", "event_id"), "vq", k = 3)
      .select("event_id", "level_q", "resid")
      .as[(Long, Long, Long)].collect()
      .map(r => r._1 -> ((r._2, r._3))).toMap

    val arrival = jittered(rnd, rows, (e: (Long, Long, Long, Long)) => e._2)
    val maxUs = rows.map(_._2).max

    implicit val sqlCtx = spark.sqlContext
    val lateAcc = spark.sparkContext.longAccumulator("ewma_late")
    val ms = MemoryStream[(Long, Long, Long, Long)]
    val q = StreamingEwma.ewmaStreamOrdered(
        ms.toDF().toDF("key", "t_us", "event_id", "v"), k = 3,
        delayMs = delayMs, lateAcc = Some(lateAcc))
      .writeStream.format("memory").queryName("ewma_ord")
      .outputMode("append").start()
    try {
      slices(rnd, arrival, 15).foreach { b =>
        ms.addData(b: _*); q.processAllAvailable()
      }
      ms.addData((sentinelKey, maxUs + 100 * delayMs * 1000L, -7L, 0L))
      q.processAllAvailable()
      ms.addData((sentinelKey, maxUs + 200 * delayMs * 1000L, -8L, 0L))
      q.processAllAvailable()
      val got = spark.table("ewma_ord")
        .filter(col("key") =!= sentinelKey)
        .select("event_id", "level_q", "resid")
        .as[(Long, Long, Long)].collect()
        .map(r => r._1 -> ((r._2, r._3))).toMap
      assert(got == expected)
      assert(lateAcc.value == 0L)
    } finally {
      q.stop()
      spark.sql("DROP TABLE IF EXISTS ewma_ord")
    }
  }

  test("beyond-delay events drop loudly: watermark-drop metric counts them, output omits them") {
    implicit val sqlCtx = spark.sqlContext
    val lateAcc = spark.sparkContext.longAccumulator("late_drop")
    val ms = MemoryStream[(Long, Long, Int, Long, Double)]
    val all = ms.toDF().toDF("key", "t_us", "side", "event_id", "value")
    val q = StreamingAsof.asofJoinStreamOrdered(
        all.filter(col("side") === 1).select("event_id", "key", "t_us"),
        all.filter(col("side") === 0).select("key", "t_us", "value"),
        delayMs, Some(lateAcc))
      .writeStream.format("memory").queryName("asof_late_t")
      .outputMode("append").start()
    def droppedByWatermark: Long =
      q.recentProgress.flatMap(_.stateOperators).map(_.numRowsDroppedByWatermark).sum
    try {
      // setpoint + probe, then push the watermark way past them
      ms.addData((1L, baseUs, 0, -1L, 5.5), (1L, baseUs + 1000L, 1, 1L, 0.0))
      q.processAllAvailable()
      ms.addData((sentinelKey, baseUs + 1000 * delayMs * 1000L, 1, -7L, 0.0))
      q.processAllAvailable()
      ms.addData((sentinelKey, baseUs + 2000 * delayMs * 1000L, 1, -8L, 0.0))
      q.processAllAvailable()
      assert(spark.table("asof_late_t").filter(col("event_id") === 1L).count() == 1)
      assert(droppedByWatermark == 0L)
      // this probe's ts is now far behind the watermark: DROPPED — by
      // Spark's own watermark filter in front of the stateful operator
      // (the primary loud channel, numRowsDroppedByWatermark in
      // StateOperatorProgress); the in-function accumulator is the
      // residual net for rows that reach the machine behind a stale
      // per-key frontier, which Spark's global filter subsumes here
      ms.addData((1L, baseUs + 2000L, 1, 2L, 0.0))
      q.processAllAvailable()
      assert(spark.table("asof_late_t").filter(col("event_id") === 2L).count() == 0,
        "a beyond-delay probe must not be silently answered")
      assert(droppedByWatermark == 1L,
        "the drop must surface in numRowsDroppedByWatermark, not be silent")
      assert(lateAcc.value == 0L, "Spark's filter runs before the machine")
    } finally {
      q.stop()
      spark.sql("DROP TABLE IF EXISTS asof_late_t")
    }
  }

  test("interval ordered: the window-lag contract — a beyond-delay window drops LOUDLY") {
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
      .writeStream.format("memory").queryName("ivo_lag")
      .outputMode("append").start()
    def dropped: Long =
      q.recentProgress.flatMap(_.stateOperators).map(_.numRowsDroppedByWatermark).sum
    try {
      val t0 = baseUs
      val dUs = delayMs * 1000L
      // points push the watermark far past t0
      ms.addData((1, 1L, 1L, t0, 0L, 0.0)); q.processAllAvailable()
      ms.addData((1, 2L, 1L, t0 + 10 * dUs, 0L, 0.0)); q.processAllAvailable()
      assert(dropped == 0L)
      // a LONG window stamped at t0 arrives more than delayMs after its
      // start: the documented window-lag contract — window records ride
      // the watermark at their START (stamping at end would fast-forward
      // the watermark past on-time points), so this window is dropped
      // WHOLESALE and counted; its would-be future matches go with it
      ms.addData((0, -1L, 1L, t0, t0 + 1000L * dUs, 7.0))
      q.processAllAvailable()
      assert(dropped == 1L, "the lagged window must drop loudly, not silently")
      ms.addData((1, 3L, 1L, t0 + 12 * dUs, 0L, 0.0)); q.processAllAvailable()
      ms.addData((1, -7L, sentinelKey, t0 + 100L * dUs, 0L, 0.0))
      q.processAllAvailable()
      ms.addData((1, -8L, sentinelKey, t0 + 200L * dUs, 0L, 0.0))
      q.processAllAvailable()
      // no point ever matches the dropped window — documented, not silent
      assert(spark.table("ivo_lag").count() == 0)
    } finally {
      q.stop()
      spark.sql("DROP TABLE IF EXISTS ivo_lag")
    }
  }

  test("interval ordered: windowDelayMs admits a window arriving near its END, == batch") {
    implicit val sqlCtx = spark.sqlContext
    val dUs = delayMs * 1000L
    val t0 = baseUs
    // three real windows; w1 is the LAGGED one — it arrives in a batch
    // AFTER points have pushed the point-side watermark past its start
    // (the single-delay contract drops it wholesale — the test above
    // locks that); with windowDelayMs = 10x delay the window side rides
    // its own watermark and the global (min) watermark stays behind, so
    // w1 is admitted and its match with p2 emits, equal to batch
    val wins = Seq(
      (1L, t0, t0 + 1 * dUs, 1.0),
      (1L, t0 + 2 * dUs, t0 + 7 * dUs, 7.0),
      (1L, t0 + 20 * dUs, t0 + 21 * dUs, 9.0))
    val points = Seq((1L, 1L, t0), (2L, 1L, t0 + 6 * dUs), (3L, 1L, t0 + 20 * dUs))
    val expected = IntervalJoin.intervalJoin(
        points.toDF("event_id", "key", "t_us"),
        wins.toDF("key", "start_us", "end_us", "value"),
        Seq("key"), "t_us", "start_us", "end_us", bucketUs = 64000L)
      .select(col("event_id"), col("start_us"), col("value"))
      .as[(Long, Long, Double)].collect().toSeq.sorted
    assert(expected.size == 3, s"bad fixture: $expected") // p1->w0, p2->w1, p3->w2

    val lateAcc = spark.sparkContext.longAccumulator("ivo_wlag_late")
    val ms = MemoryStream[(Int, Long, Long, Long, Long, Double)]
    val all = ms.toDF().toDF("side", "event_id", "key", "a", "b", "value")
    val q = StreamingInterval.intervalJoinStreamOrdered(
        all.filter(col("side") === 1)
          .select(col("event_id"), col("key"), col("a").as("t_us")),
        all.filter(col("side") === 0)
          .select(col("key"), col("a").as("start_us"),
            col("b").as("end_us"), col("value")),
        delayMs, Some(lateAcc), windowDelayMs = 10 * delayMs)
      .writeStream.format("memory").queryName("ivo_wlag")
      .outputMode("append").start()
    def dropped: Long =
      q.recentProgress.flatMap(_.stateOperators).map(_.numRowsDroppedByWatermark).sum
    try {
      // batch 1: w0 + both early points — the point side watermark runs
      // ahead of w1's start from here on
      ms.addData((0, -1L, 1L, wins(0)._2, wins(0)._3, wins(0)._4),
        (1, 1L, 1L, points(0)._3, 0L, 0.0), (1, 2L, 1L, points(1)._3, 0L, 0.0))
      q.processAllAvailable()
      // batch 2: the lagged window w1, > delayMs of event time behind the
      // point frontier but within windowDelayMs of the window frontier
      ms.addData((0, -1L, 1L, wins(1)._2, wins(1)._3, wins(1)._4))
      q.processAllAvailable()
      assert(dropped == 0L, "windowDelayMs must admit the lagged window")
      // batch 3: advance BOTH sides past everything real
      ms.addData((0, -1L, 1L, wins(2)._2, wins(2)._3, wins(2)._4),
        (1, 3L, 1L, points(2)._3, 0L, 0.0))
      q.processAllAvailable()
      // flush: sentinel traffic on both sides, twice (timeout convention)
      Seq(100L, 200L, 300L).foreach { k =>
        ms.addData((1, -7L - k, sentinelKey, t0 + k * dUs, 0L, 0.0),
          (0, -1L, sentinelKey, t0 + k * dUs, t0 + k * dUs + 1000L, 0.0))
        q.processAllAvailable()
      }
      val got = spark.table("ivo_wlag")
        .filter(col("key") =!= sentinelKey)
        .select(col("event_id"), col("start_us"), col("value"))
        .as[(Long, Long, Double)].collect().toSeq.sorted
      assert(got == expected,
        s"stream != batch under window lag: got=$got expected=$expected")
      assert(dropped == 0L && lateAcc.value == 0L)
    } finally {
      q.stop()
      spark.sql("DROP TABLE IF EXISTS ivo_wlag")
    }
  }

  /** Run the asof idle-TTL scenario; returns probe id 2's answer. */
  private def asofIdleScenario(idleTtlMs: Long, name: String): (Option[Long], Option[Double]) = {
    implicit val sqlCtx = spark.sqlContext
    val dUs = delayMs * 1000L
    val t0 = baseUs
    val ms = MemoryStream[(Long, Long, Int, Long, Double)]
    val all = ms.toDF().toDF("key", "t_us", "side", "event_id", "value")
    val q = StreamingAsof.asofJoinStreamOrdered(
        all.filter(col("side") === 1).select("event_id", "key", "t_us"),
        all.filter(col("side") === 0).select("key", "t_us", "value"),
        delayMs, None, idleTtlMs = idleTtlMs)
      .writeStream.format("memory").queryName(name)
      .outputMode("append").start()
    try {
      // key 1: setpoint then a probe answered from it
      ms.addData((1L, t0, 0, -1L, 5.5), (1L, t0 + 1000L, 1, 1L, 0.0))
      q.processAllAvailable()
      // sentinel traffic marches the watermark far past t0 + idleTtl —
      // several batches so the idle timer (armed once key 1 drained) fires
      Seq(10L, 30L, 40L).foreach { k =>
        ms.addData((sentinelKey, t0 + k * dUs, 1, -7L - k, 0.0))
        q.processAllAvailable()
      }
      // probe id 2 for key 1, on time w.r.t. the current watermark
      ms.addData((1L, t0 + 50 * dUs, 1, 2L, 0.0))
      q.processAllAvailable()
      Seq(60L, 70L).foreach { k =>
        ms.addData((sentinelKey, t0 + k * dUs, 1, -7L - k, 0.0))
        q.processAllAvailable()
      }
      val rows = spark.table(name)
        .filter(col("event_id") === 2L)
        .select("asof_ts", "asof_value")
        .as[(Option[Long], Option[Double])].collect()
      assert(rows.length == 1, s"probe 2 emitted ${rows.length} rows")
      rows.head
    } finally {
      q.stop()
      spark.sql(s"DROP TABLE IF EXISTS $name")
    }
  }

  test("asof ordered: idleTtlMs reclaims an idle key's state; 0 keeps it forever") {
    // with the TTL, key 1 idles past 2s of event time -> state (the
    // carried setpoint) is removed, and the later probe restarts from
    // empty state: NULL answer — the documented TTL tradeoff
    assert(asofIdleScenario(idleTtlMs = 2000L, "asof_ttl_on") == ((None, None)))
    // without it, the setpoint survives any silence
    assert(asofIdleScenario(idleTtlMs = 0L, "asof_ttl_off") ==
      ((Some(baseUs), Some(5.5))))
  }

  test("cusum ordered: idleTtlMs restarts an expired key's statistic from zero") {
    implicit val sqlCtx = spark.sqlContext
    val dUs = delayMs * 1000L
    val t0 = baseUs
    val slack = 0L
    def run(idleTtlMs: Long, name: String): Long = {
      val ms = MemoryStream[(Long, Long, Long, Long)]
      val q = StreamingCusum.cusumStreamOrdered(
          ms.toDF().toDF("key", "t_us", "event_id", "x"), slack, delayMs,
          None, idleTtlMs = idleTtlMs)
        .writeStream.format("memory").queryName(name)
        .outputMode("append").start()
      try {
        ms.addData((1L, t0, 1L, 40L)) // statistic 40 once released
        q.processAllAvailable()
        Seq(10L, 30L, 40L).foreach { k =>
          ms.addData((sentinelKey, t0 + k * dUs, -7L - k, 0L))
          q.processAllAvailable()
        }
        ms.addData((1L, t0 + 50 * dUs, 2L, 2L))
        q.processAllAvailable()
        Seq(60L, 70L).foreach { k =>
          ms.addData((sentinelKey, t0 + k * dUs, -7L - k, 0L))
          q.processAllAvailable()
        }
        val got = spark.table(name).filter(col("event_id") === 2L)
          .select("cusum").as[Long].collect()
        assert(got.length == 1)
        got.head
      } finally {
        q.stop()
        spark.sql(s"DROP TABLE IF EXISTS $name")
      }
    }
    assert(run(2000L, "cusum_ttl_on") == 2L,   // expired: restarts at 0 + 2
      "expired key must restart its statistic")
    assert(run(0L, "cusum_ttl_off") == 42L)    // kept: 40 carried + 2
  }

  test("ordered cusum state survives a query restart through the checkpoint") {
    implicit val sqlCtx = spark.sqlContext
    val rnd = new Random(73)
    val slack = 10L
    val rows = (1L to 400L).map(i =>
      (i % 3, baseUs + (i / 3) * 1000L, i, rnd.nextInt(40).toLong - 12L))
    val expected = Stats.cusum(rows.toDF("key", "t_us", "event_id", "x"),
        Seq("key"), Seq("t_us", "event_id"), col("x"), slack)
      .select("event_id", "cusum").as[(Long, Long)].collect().toMap
    val arrival = jittered(rnd, rows, (e: (Long, Long, Long, Long)) => e._2)
    val maxUs = rows.map(_._2).max
    val (firstHalf, secondHalf) = arrival.splitAt(200)

    val ckpt = java.nio.file.Files.createTempDirectory("cusord-ckpt").toString
    val outDir = java.nio.file.Files.createTempDirectory("cusord-out").toString
    val ms = MemoryStream[(Long, Long, Long, Long)]
    def start() = StreamingCusum.cusumStreamOrdered(
        ms.toDF().toDF("key", "t_us", "event_id", "x"), slack, delayMs)
      .writeStream.format("parquet").option("path", outDir)
      .option("checkpointLocation", ckpt).outputMode("append").start()

    // stop mid-stream with events still PENDING in the reorder buffer —
    // the restart must replay them from state, not lose or re-release them
    val q1 = start()
    ms.addData(firstHalf: _*); q1.processAllAvailable(); q1.stop()
    val q2 = start()
    ms.addData(secondHalf: _*); q2.processAllAvailable()
    ms.addData((sentinelKey, maxUs + 100 * delayMs * 1000L, -7L, 0L))
    q2.processAllAvailable()
    ms.addData((sentinelKey, maxUs + 200 * delayMs * 1000L, -8L, 0L))
    q2.processAllAvailable()
    try {
      val got = spark.read.parquet(outDir)
        .filter(col("key") =!= sentinelKey)
        .select("event_id", "cusum").as[(Long, Long)].collect().toMap
      assert(got == expected)
    } finally q2.stop()
  }
}
