package graft.streaming

import graft.SparkSpec
import graft.operators.AsofJoin
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._

import scala.util.Random

/** Streaming as-of join: must match the batch operator exactly when each
  * key's feed arrives in event-time order across micro-batches (the
  * documented contract), with O(1) per-key state.
  */
class StreamingAsofSpec extends SparkSpec
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

  /** (eventId, key, t) probes and (key, t, v) setpoints. */
  private def batchExpected(probes: Seq[(Long, Long, Long)],
                            setp: Seq[(Long, Long, Double)]) =
    AsofJoin.asofJoin(
        probes.toDF("event_id", "key", "t_us"),
        setp.toDF("key", "t_us", "value"),
        keys = Seq("key"), tsCol = "t_us", payload = Seq("value"))
      .select(col("event_id"), col("asof_t_us"), col("asof_value"))
      .as[(Long, Option[Long], Option[Double])].collect()
      .map(r => r._1 -> ((r._2, r._3))).toMap

  test("stream matches batch across arbitrary event-time-ordered batch splits") {
    val rnd = new Random(41)
    val keys = Seq(1L, 2L, 3L)
    val setp = (0 until 30).map(_ =>
        (keys(rnd.nextInt(3)), rnd.nextInt(1000).toLong, rnd.nextDouble))
      .groupBy(r => (r._1, r._2)).map(_._2.head).toSeq // unique (key, ts)
    val probes = (1L to 120L).map(i =>
      (i, keys(rnd.nextInt(3)), rnd.nextInt(1000).toLong))
    val expected = batchExpected(probes, setp)

    // one merged event-time-ordered feed per key, split into 5 batches
    val merged = (setp.map(s => (s._1, s._2, 0, -1L, s._3)) ++
        probes.map(p => (p._2, p._3, 1, p._1, 0.0)))
      .sortBy(e => (e._2, e._3, e._4)) // (ts, side, id) — global order is
    // a valid per-key event-time order too
    val batches = merged.grouped((merged.size + 4) / 5).toSeq

    implicit val sqlCtx = spark.sqlContext
    // ONE tagged source filtered two ways (the operator's documented
    // one-source shape): two independent MemoryStreams would race the
    // running trigger between their addData calls, and a micro-batch
    // holding a chunk's probes WITHOUT its setpoints violates the per-key
    // event-time-order contract (flaked once under RocksDB timing).
    val ms = MemoryStream[(Long, Long, Int, Long, Double)]
    val all = ms.toDF().toDF("key", "t_us", "side", "event_id", "value")
    val joined = StreamingAsof.asofJoinStream(
      all.filter(col("side") === 1).select("event_id", "key", "t_us"),
      all.filter(col("side") === 0).select("key", "t_us", "value"))
    val query = joined.writeStream.format("memory").queryName("stream_asof")
      .outputMode("append").start()
    try {
      batches.foreach { b =>
        ms.addData(b: _*)
        query.processAllAvailable()
      }
      val got = spark.table("stream_asof")
        .select("event_id", "asof_ts", "asof_value")
        .as[(Long, Option[Long], Option[Double])].collect()
        .map(r => r._1 -> ((r._2, r._3))).toMap
      assert(got.keySet == expected.keySet)
      val bad = expected.filter { case (k, v) => got(k) != v }
      assert(bad.isEmpty, s"diverged on ${bad.take(5)}")
    } finally query.stop()
  }

  test("setpoint carried across batches; ties and late-older setpoints") {
    implicit val sqlCtx = spark.sqlContext
    val msP = MemoryStream[(Long, Long, Long)]
    val msS = MemoryStream[(Long, Long, Double)]
    val joined = StreamingAsof.asofJoinStream(
      msP.toDF().toDF("event_id", "key", "t_us"),
      msS.toDF().toDF("key", "t_us", "value"))
    val query = joined.writeStream.format("memory").queryName("stream_asof2")
      .outputMode("append").start()
    try {
      msS.addData((7L, 100L, 1.5)) // batch 1: setpoint only
      query.processAllAvailable()
      msP.addData((1L, 7L, 100L), (2L, 7L, 250L)) // tie at 100 + later
      query.processAllAvailable()
      msS.addData((7L, 50L, 9.9)) // LATE, OLDER setpoint: must not regress
      msP.addData((3L, 7L, 300L))
      query.processAllAvailable()
      val got = spark.table("stream_asof2")
        .select("event_id", "asof_ts", "asof_value")
        .as[(Long, Option[Long], Option[Double])].collect()
        .map(r => r._1 -> ((r._2, r._3))).toMap
      assert(got(1L) == ((Some(100L), Some(1.5)))) // tie: setpoint applies
      assert(got(2L) == ((Some(100L), Some(1.5)))) // carried across batches
      assert(got(3L) == ((Some(100L), Some(1.5)))) // older setpoint ignored
    } finally query.stop()
  }
}
