package graft.streaming

import graft.SparkSpec
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._

/** Streaming pattern evaluation over a MemoryStream: timer semantics,
  * incident session merge, gap reset and watermark-driven pending flush must
  * match the batch engine.
  *
  * Runs under the default (HDFS-backed, on-heap) state store;
  * [[StreamingRocksDbSpec]] re-runs the whole suite under
  * RocksDBStateStoreProvider — the provider a 100 TB deployment needs,
  * since at production key cardinality the JVM heap can no longer hold the
  * state maps. Suites execute sequentially in the forked test JVM, so the
  * session-level provider conf cannot leak into a concurrently running
  * suite.
  */
class StreamingSpec extends SparkSpec with org.scalatest.BeforeAndAfterAll {

  /** None = Spark's default provider; subclasses override. The conf is
    * read at stream start, so setting it on the shared session between
    * suites re-homes every query the suite starts.
    */
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
  import StreamingPatterns._

  test("timer + session merge + watermark flush over a memory stream") {
    implicit val sqlCtx = spark.sqlContext
    val ms = MemoryStream[(String, Long, Double)]
    val df = ms.toDF().toDF("k", "sec", "v")
      .withColumn("ts", timestamp_seconds(col("sec")))
      .withWatermark("ts", "5 seconds")

    val inc = StreamingPatterns.incidents(df, Seq("k"), "ts", col("v") > 50,
      StreamConfig(eventsMaxGapMs = 60000L, sessionGapMs = 1000L,
        minDurationMs = 2000L))

    val query = inc.writeStream.format("memory").queryName("stream_inc")
      .outputMode("append").start()
    try {
      // run of v>50 at t=0..3 (4s: timer(2s) succeeds from t=2), break at 4
      ms.addData(("a", 10000L, 60.0), ("a", 10001L, 61.0), ("a", 10002L, 62.0),
        ("a", 10003L, 63.0), ("a", 10004L, 10.0))
      query.processAllAvailable()
      // second run 10..11 (too short for the 2s timer: no incident), then a
      // much later event to push the watermark far past pending.to + gap
      ms.addData(("a", 10010L, 70.0), ("a", 10011L, 71.0), ("a", 10012L, 5.0))
      query.processAllAvailable()
      ms.addData(("a", 10500L, 1.0))
      query.processAllAvailable()
      ms.addData(("a", 10600L, 1.0)) // one more batch so the timeout fires
      query.processAllAvailable()

      val got = spark.table("stream_inc")
        .select("key", "fromMs", "toMs", "nEvents")
        .as[(String, Long, Long, Long)].collect().toSet
      assert(got == Set(("a", 10002000L, 10003000L, 2L)),
        s"expected the timer incident [10002s, 10003s], got $got")
    } finally query.stop()
  }

  test("incidents within the session gap merge across runs") {
    implicit val sqlCtx = spark.sqlContext
    val ms = MemoryStream[(String, Long, Double)]
    val df = ms.toDF().toDF("k", "sec", "v")
      .withColumn("ts", timestamp_seconds(col("sec")))
      .withWatermark("ts", "5 seconds")

    // plain segmentization (no timer): runs [10000..10001] and
    // [10003..10004] are 2 s apart, inside the 3 s merge window -> one
    // incident
    val inc = StreamingPatterns.incidents(df, Seq("k"), "ts", col("v") > 50,
      StreamConfig(eventsMaxGapMs = 60000L, sessionGapMs = 3000L,
        minDurationMs = 0L))
    val query = inc.writeStream.format("memory").queryName("stream_inc2")
      .outputMode("append").start()
    try {
      ms.addData(("b", 10000L, 60.0), ("b", 10001L, 60.0), ("b", 10002L, 0.0),
        ("b", 10003L, 60.0), ("b", 10004L, 60.0), ("b", 10005L, 0.0))
      query.processAllAvailable()
      ms.addData(("b", 10500L, 0.0))
      query.processAllAvailable()
      ms.addData(("b", 10600L, 0.0))
      query.processAllAvailable()

      val got = spark.table("stream_inc2")
        .select("fromMs", "toMs", "nEvents").as[(Long, Long, Long)]
        .collect().toSet
      // 3s merge window: run [0,1] and [3,4] are 2s apart -> merged
      assert(got == Set((10000000L, 10004000L, 4L)), s"got $got")
    } finally query.stop()
  }

  test("DSL pattern drives the streaming evaluator end-to-end") {
    implicit val sqlCtx = spark.sqlContext
    val ms = MemoryStream[(String, Long, Double)]
    val df = ms.toDF().toDF("k", "sec", "v")
      .withColumn("ts", timestamp_seconds(col("sec")))
      .withWatermark("ts", "5 seconds")
    val inc = graft.dsl.TspEngine.incidentsStream(df, "v > 50 for 2 sec",
      graft.dsl.PatternConfig(Seq("k"), "ts", eventsMaxGapMs = 60000L,
        sessionGapMs = 1000L))
    val query = inc.writeStream.format("memory").queryName("stream_dsl")
      .outputMode("append").start()
    try {
      ms.addData(("d", 10000L, 60.0), ("d", 10001L, 61.0), ("d", 10002L, 62.0),
        ("d", 10003L, 63.0), ("d", 10004L, 10.0))
      query.processAllAvailable()
      ms.addData(("d", 10500L, 1.0))
      query.processAllAvailable()
      ms.addData(("d", 10600L, 1.0))
      query.processAllAvailable()
      val got = spark.table("stream_dsl")
        .select("fromMs", "toMs").as[(Long, Long)].collect().toSet
      assert(got == Set((10002000L, 10003000L)), s"got $got")
    } finally query.stop()

    // window-dependent constructs are rejected, not silently wrong
    val err = intercept[Exception] {
      graft.dsl.TspEngine.streamingCondition("a > 1 andThen b > 2")
    }
    assert(err.getMessage.contains("not supported in the streaming evaluator"))
  }

  test("state survives a query restart through the checkpoint") {
    implicit val sqlCtx = spark.sqlContext
    val ckpt = java.nio.file.Files.createTempDirectory("graft-ckpt").toString
    val ms = MemoryStream[(String, Long, Double)]
    val df = ms.toDF().toDF("k", "sec", "v")
      .withColumn("ts", timestamp_seconds(col("sec")))
      .withWatermark("ts", "5 seconds")
    val inc = StreamingPatterns.incidents(df, Seq("k"), "ts", col("v") > 50,
      StreamConfig(eventsMaxGapMs = 60000L, sessionGapMs = 1000L,
        minDurationMs = 2000L))

    val outDir = java.nio.file.Files.createTempDirectory("graft-out").toString
    // the memory sink cannot recover from a checkpoint; a file sink can
    def start() = inc.writeStream.format("parquet")
      .option("path", outDir)
      .option("checkpointLocation", ckpt).outputMode("append").start()

    // first half of a qualifying run, then stop mid-pattern
    val q1 = start()
    ms.addData(("e", 10000L, 60.0), ("e", 10001L, 61.0))
    q1.processAllAvailable()
    q1.stop()

    // restart from the checkpoint; the run continues and closes
    val q2 = start()
    ms.addData(("e", 10002L, 62.0), ("e", 10003L, 63.0), ("e", 10004L, 1.0))
    q2.processAllAvailable()
    ms.addData(("e", 10500L, 1.0))
    q2.processAllAvailable()
    ms.addData(("e", 10600L, 1.0))
    q2.processAllAvailable()
    try {
      val got = spark.read.parquet(outDir)
        .select("fromMs", "toMs").as[(Long, Long)].collect().toSet
      // timer(2s) over the stitched run [10000..10003]: success [10002, 10003]
      assert(got == Set((10002000L, 10003000L)), s"got $got")
    } finally q2.stop()
  }

  test("nested-tree state survives a query restart through the checkpoint") {
    // incidentsTree carries the deepest state shape (per-node queues, wait
    // machines, leaf deques) through Encoders.product; a restart
    // mid-pattern must round-trip all of it and continue to the same
    // incidents the batch engine computes over the whole data
    implicit val sqlCtx = spark.sqlContext
    val pattern = "v > 50 andThen (v < 20 andThen v > 80)"
    val cfg = graft.dsl.PatternConfig(Seq("k"), "ts",
      eventsMaxGapMs = 60000L, sessionGapMs = 1000L)
    val ckpt = java.nio.file.Files.createTempDirectory("graft-ckpt-tree").toString
    val ms = MemoryStream[(String, Long, Double)]
    val df = ms.toDF().toDF("k", "sec", "v")
      .withColumn("ts", timestamp_seconds(col("sec")))
      .withWatermark("ts", "5 seconds")
    val inc = graft.dsl.TspEngine.incidentsStream(df, pattern, cfg)
    val outDir = java.nio.file.Files.createTempDirectory("graft-out-tree").toString
    def start() = inc.writeStream.format("parquet")
      .option("path", outDir)
      .option("checkpointLocation", ckpt).outputMode("append").start()

    val firstHalf = Seq(("t", 10000L, 60.0), ("t", 10001L, 10.0))
    val secondHalf = Seq(("t", 10002L, 90.0), ("t", 10003L, 1.0))

    val q1 = start()
    ms.addData(firstHalf: _*)
    q1.processAllAvailable()
    q1.stop()

    val q2 = start()
    ms.addData(secondHalf: _*)
    q2.processAllAvailable()
    ms.addData(("t", 10200L, 1.0)); q2.processAllAvailable()
    ms.addData(("t", 10300L, 1.0)); q2.processAllAvailable()
    try {
      assert(q2.exception.isEmpty, s"query failed: ${q2.exception}")
      val streamed = spark.read.parquet(outDir)
        .select("key", "fromMs", "toMs").as[(String, Long, Long)]
        .collect().toSet

      val all = firstHalf ++ secondHalf ++
        Seq(("t", 10200L, 1.0), ("t", 10300L, 1.0))
      val batchDf = all.toDF("k", "sec", "v")
        .withColumn("ts", timestamp_seconds(col("sec")))
      val batch = graft.dsl.TspEngine.incidents(batchDf, pattern, cfg)
        .select(col("k"), col("from_ms"), col("to_ms"))
        .as[(String, Long, Long)].collect().toSet

      assert(streamed.nonEmpty, "expected the nested pattern to fire")
      assert(streamed == batch,
        s"missing=${batch -- streamed}, extra=${streamed -- batch}")
    } finally q2.stop()
  }

  test("pending incident flushes under continuous per-key traffic") {
    // Regression: a key that keeps receiving data never has its timeout
    // fired by Spark (timeouts only fire for keys with no batch data), and
    // re-arming a timeout below the advancing watermark used to throw
    // IllegalArgumentException and kill the query. The flush must happen
    // inline on the data path, clamped above the watermark.
    implicit val sqlCtx = spark.sqlContext
    val ms = MemoryStream[(String, Long, Double)]
    val df = ms.toDF().toDF("k", "sec", "v")
      .withColumn("ts", timestamp_seconds(col("sec")))
      .withWatermark("ts", "5 seconds")
    val inc = StreamingPatterns.incidents(df, Seq("k"), "ts", col("v") > 50,
      StreamConfig(eventsMaxGapMs = 600000L, sessionGapMs = 1000L,
        minDurationMs = 0L))
    val query = inc.writeStream.format("memory").queryName("stream_inc4")
      .outputMode("append").start()
    try {
      // incident closes at 10002, then the key keeps sending cond=false
      // traffic every batch while the watermark overtakes pendTo+sessionGap
      ms.addData(("f", 10000L, 60.0), ("f", 10001L, 61.0), ("f", 10002L, 0.0))
      query.processAllAvailable()
      ms.addData(("f", 10010L, 0.0))
      query.processAllAvailable()
      ms.addData(("f", 10020L, 0.0))
      query.processAllAvailable()
      ms.addData(("f", 10030L, 0.0))
      query.processAllAvailable()
      assert(query.exception.isEmpty, s"query failed: ${query.exception}")
      val got = spark.table("stream_inc4")
        .select("key", "fromMs", "toMs", "nEvents")
        .as[(String, Long, Long, Long)].collect().toSet
      assert(got == Set(("f", 10000000L, 10001000L, 2L)), s"got $got")
    } finally query.stop()
  }

  test("a key that goes quiet mid-run still emits once the watermark passes") {
    // Divergence fix: the batch engine emits an open qualifying run at end
    // of data; streaming must emit it once the watermark proves no event
    // can extend the run (wm > lastSeen + eventsMaxGap), even if the key
    // never sends another event.
    implicit val sqlCtx = spark.sqlContext
    val ms = MemoryStream[(String, Long, Double)]
    val df = ms.toDF().toDF("k", "sec", "v")
      .withColumn("ts", timestamp_seconds(col("sec")))
      .withWatermark("ts", "5 seconds")
    val inc = StreamingPatterns.incidents(df, Seq("k"), "ts", col("v") > 50,
      StreamConfig(eventsMaxGapMs = 10000L, sessionGapMs = 1000L,
        minDurationMs = 0L))
    val query = inc.writeStream.format("memory").queryName("stream_inc5")
      .outputMode("append").start()
    try {
      ms.addData(("g", 10000L, 60.0), ("g", 10001L, 61.0))
      query.processAllAvailable()
      // only key "h" advances the watermark from here on
      ms.addData(("h", 10100L, 0.0))
      query.processAllAvailable()
      ms.addData(("h", 10200L, 0.0))
      query.processAllAvailable()
      ms.addData(("h", 10300L, 0.0))
      query.processAllAvailable()
      assert(query.exception.isEmpty, s"query failed: ${query.exception}")
      val got = spark.table("stream_inc5")
        .select("key", "fromMs", "toMs", "nEvents")
        .as[(String, Long, Long, Long)].collect().toSet
      assert(got == Set(("g", 10000000L, 10001000L, 2L)), s"got $got")
    } finally query.stop()
  }

  test("windowed patterns stream-evaluate identically to the batch engine") {
    // Differential: trailing aggregates, lag, and for-stats patterns run
    // through the incremental evaluator must produce the same incidents as
    // the batch window pipeline on the same data. Random keyed streams fed
    // in chunks; a dummy key pushes the watermark far past the data so
    // everything flushes.
    val rnd = new scala.util.Random(424242L)
    val events = (1 to 12).flatMap { k =>
      var t = 10000L
      Vector.fill(40 + rnd.nextInt(30)) {
        t += 1 + (if (rnd.nextInt(12) == 0) 120 + rnd.nextInt(60)
                  else rnd.nextInt(20))
        (s"k$k", t, rnd.nextInt(200).toDouble,
          if (rnd.nextInt(4) == 0) "err" else "ok")
      }
    }.sortBy(_._2)
    val cfg = graft.dsl.PatternConfig(Seq("k"), "ts",
      eventsMaxGapMs = 60000L, sessionGapMs = 5000L)
    val patterns = Seq(
      "avg(v, 30 sec) > 110",
      "lag(v) < v",
      "lag(v, 20 sec) < v - 10",
      "v > 100 for 60 sec > 4 times",
      "v > 100 for 60 sec >= 10 sec",
      "sum(v, 40 sec) > 500 until v < 5",
      // string field comparison through the evaluator path
      "sum(v, 40 sec) > 400 until etype = 'err'",
      // string-typed lag: the deque must carry the STRING (regression:
      // toD coerced it to NaN and the comparison never fired)
      "lag(etype) = 'err'",
      "lag(etype, 20 sec) = 'err' and v > 50",
      // andThen: incremental closed-run merge must equal the batch merge
      "v > 120 andThen v < 40",
      "v > 100 for 20 sec andThen v < 50",
      "lag(v) < v andThen v > 150",
      // andThen chains: the streaming cascade must equal the batch
      // engine's nested queue-merge recursion
      "v > 120 andThen v < 40 andThen v > 150",
      "v > 100 andThen v < 80 andThen v > 120 andThen v < 60",
      "v > 100 for 20 sec andThen v < 50 andThen v > 130",
      // wait: incremental WaitAccumState must equal the batch port
      "wait(15 sec, v > 150)",
      "wait(10 sec, v > 100 for 10 sec)",
      // degenerate conditions: constant-false sides exercise unbounded-run
      // buffering and must emit nothing, matching batch
      "wait(20 sec, v > 1000)",
      "v > 1000 andThen v < 40",
      // nested forward-looking trees: the recursive incidentsTree
      // evaluator must equal the batch compiler's nested recursion
      "v > 120 andThen (v < 40 andThen v > 150)",
      "(v > 120 andThen v < 40) andThen (v > 100 andThen v < 60)",
      "wait(15 sec, v > 150) andThen v < 50",
      "v > 120 andThen wait(10 sec, v < 40)",
      "wait(20 sec, v > 120 andThen v < 40)",
      "wait(10 sec, wait(5 sec, v > 150))")

    patterns.foreach { pattern =>
      implicit val sqlCtx = spark.sqlContext
      val ms = MemoryStream[(String, Long, Double, String)]
      val df = ms.toDF().toDF("k", "sec", "v", "etype")
        .withColumn("ts", timestamp_seconds(col("sec")))
        .withWatermark("ts", "5 seconds")
      val inc = graft.dsl.TspEngine.incidentsStream(df, pattern, cfg)
      val name = "stream_diff"
      val query = inc.writeStream.format("memory").queryName(name)
        .outputMode("append").start()
      try {
        events.grouped(events.size / 3 + 1).foreach { chunk =>
          ms.addData(chunk: _*)
          query.processAllAvailable()
        }
        // push the watermark far past everything, twice (second batch fires
        // the timeouts registered by the first)
        ms.addData(("zz", 100000L, 0.0, "ok")); query.processAllAvailable()
        ms.addData(("zz", 200000L, 0.0, "ok")); query.processAllAvailable()
        assert(query.exception.isEmpty, s"<$pattern> failed: ${query.exception}")

        val streamed = spark.table(name)
          .filter(col("key") =!= "zz")
          .select("key", "fromMs", "toMs", "nEvents")
          .as[(String, Long, Long, Long)].collect().toSet

        val batchDf = events.toDF("k", "sec", "v", "etype")
          .withColumn("ts", timestamp_seconds(col("sec")))
        val batch = graft.dsl.TspEngine.incidents(batchDf, pattern, cfg)
          .select(col("k"), col("from_ms"), col("to_ms"), col("n_events"))
          .as[(String, Long, Long, Long)].collect().toSet

        assert(streamed == batch,
          s"<$pattern>: missing=${(batch -- streamed).take(4)}, extra=${(streamed -- batch).take(4)}")
      } finally {
        query.stop()
        spark.catalog.dropTempView(name)
      }
    }
  }

  test("cast on a missing value streams identically to batch (NaN -> false)") {
    // cast(w as boolean) where w is NULL: the batch engine's
    // cast(NULL as boolean) is NULL and collapses to false; the streaming
    // evaluator sees the missing value as NaN and must also yield false
    // (regression: `toD(v) != 0.0` mapped NaN to true). The avg() term
    // forces the pattern through the incremental evaluator path.
    implicit val sqlCtx = spark.sqlContext
    val cfg = graft.dsl.PatternConfig(Seq("k"), "ts",
      eventsMaxGapMs = 60000L, sessionGapMs = 2000L)
    val pattern = "(w as boolean) or avg(v, 20 sec) > 1000000000.0"
    val events: Seq[(String, Long, Double, Option[Double])] = Seq(
      ("m", 10000L, 1.0, Some(1.0)),
      ("m", 10001L, 2.0, None),       // missing w: must break the run
      ("m", 10002L, 3.0, Some(1.0)),
      ("m", 10003L, 4.0, None),
      ("m", 10004L, 5.0, Some(0.0)),  // explicit false
      ("m", 10005L, 6.0, Some(2.0)))

    val ms = MemoryStream[(String, Long, Double, Option[Double])]
    val df = ms.toDF().toDF("k", "sec", "v", "w")
      .withColumn("ts", timestamp_seconds(col("sec")))
      .withWatermark("ts", "5 seconds")
    val inc = graft.dsl.TspEngine.incidentsStream(df, pattern, cfg)
    val query = inc.writeStream.format("memory").queryName("stream_castmiss")
      .outputMode("append").start()
    try {
      ms.addData(events: _*)
      query.processAllAvailable()
      ms.addData(("zz", 100000L, 0.0, Some(0.0))); query.processAllAvailable()
      ms.addData(("zz", 200000L, 0.0, Some(0.0))); query.processAllAvailable()
      assert(query.exception.isEmpty, s"query failed: ${query.exception}")
      val streamed = spark.table("stream_castmiss")
        .filter(col("key") =!= "zz")
        .select("key", "fromMs", "toMs", "nEvents")
        .as[(String, Long, Long, Long)].collect().toSet

      val batchDf = events.toDF("k", "sec", "v", "w")
        .withColumn("ts", timestamp_seconds(col("sec")))
      val batch = graft.dsl.TspEngine.incidents(batchDf, pattern, cfg)
        .select(col("k"), col("from_ms"), col("to_ms"), col("n_events"))
        .as[(String, Long, Long, Long)].collect().toSet

      // each missing/false w is a run break: three single-event true runs,
      // the first and second merge via the 2s session gap
      assert(streamed == batch,
        s"missing=${batch -- streamed}, extra=${streamed -- batch}")
      assert(streamed.nonEmpty && streamed.forall(_._4 <= 2),
        s"expected short runs split at missing w, got $streamed")
    } finally {
      query.stop()
      spark.catalog.dropTempView("stream_castmiss")
    }
  }

  test("Kafka declared-schema path produces batch-identical incidents") {
    // The Kafka source itself cannot run offline (no broker, no connector
    // jar); everything after it — declared fieldsTypes -> from_json ->
    // time normalization -> watermark -> stateful evaluation — runs here
    // against a MemoryStream and must match the batch engine on the same
    // records.
    implicit val sqlCtx = spark.sqlContext
    val conf = graft.io.KafkaSourceConf(
      brokers = "unused:9092", topic = "t", datetimeField = "dt",
      fieldsTypes = Map("k" -> "string", "dt" -> "int64", "v" -> "float64"),
      partitionFields = Seq("k"))
    val lines = Seq(
      """{"k":"a","dt":10000,"v":60.0}""",
      """{"k":"a","dt":10001,"v":61.0}""",
      """{"k":"a","dt":10002,"v":5.0}""",
      """{"k":"a","dt":10004,"v":70.0}""",
      """{"k":"a","dt":10005,"v":1.0}""")

    val ms = MemoryStream[String]
    val events = graft.io.Sources.kafkaEvents(
      ms.toDF().toDF("value"), conf, "5 seconds")
    val inc = StreamingPatterns.incidents(events, Seq("k"), "ts",
      col("v") > 50,
      StreamConfig(eventsMaxGapMs = 60000L, sessionGapMs = 1000L,
        minDurationMs = 0L))
    val query = inc.writeStream.format("memory").queryName("stream_kafka")
      .outputMode("append").start()
    try {
      ms.addData(lines: _*)
      query.processAllAvailable()
      ms.addData("""{"k":"a","dt":10200,"v":1.0}""")
      query.processAllAvailable()
      ms.addData("""{"k":"a","dt":10300,"v":1.0}""")
      query.processAllAvailable()
      assert(query.exception.isEmpty, s"query failed: ${query.exception}")
      val streamed = spark.table("stream_kafka")
        .select("fromMs", "toMs", "nEvents").as[(Long, Long, Long)]
        .collect().toSet

      // batch engine over the SAME value records through the SAME parse path
      val batchEvents = graft.io.Sources.finish(
        graft.io.Sources.parseKafkaJson(
          (lines :+ """{"k":"a","dt":10200,"v":1.0}""" :+ """{"k":"a","dt":10300,"v":1.0}""")
            .toDF("value"), conf.schema), conf)
      val batch = graft.dsl.TspEngine.incidents(batchEvents, "v > 50",
        graft.dsl.PatternConfig(Seq("k"), "ts", eventsMaxGapMs = 60000L,
          sessionGapMs = 1000L))
        .select("from_ms", "to_ms", "n_events").as[(Long, Long, Long)]
        .collect().toSet

      // runs [10000,10001] and [10004] are 3s apart (> 1s session gap)
      assert(streamed == Set((10000000L, 10001000L, 2L), (10004000L, 10004000L, 1L)),
        s"streamed=$streamed")
      assert(streamed == batch, s"streamed=$streamed batch=$batch")
    } finally query.stop()
  }

  test("data gap resets an open run") {
    implicit val sqlCtx = spark.sqlContext
    val ms = MemoryStream[(String, Long, Double)]
    val df = ms.toDF().toDF("k", "sec", "v")
      .withColumn("ts", timestamp_seconds(col("sec")))
      .withWatermark("ts", "5 seconds")
    // timer 3s; condition true continuously but a 120s data gap splits the
    // run: neither half reaches 3s of continuous data
    val inc = StreamingPatterns.incidents(df, Seq("k"), "ts", col("v") > 50,
      StreamConfig(eventsMaxGapMs = 60000L, sessionGapMs = 1000L,
        minDurationMs = 3000L))
    val query = inc.writeStream.format("memory").queryName("stream_inc3")
      .outputMode("append").start()
    try {
      ms.addData(("c", 10000L, 60.0), ("c", 10001L, 60.0),
        ("c", 10121L, 60.0), ("c", 10122L, 60.0), ("c", 10123L, 0.0))
      query.processAllAvailable()
      ms.addData(("c", 10500L, 0.0))
      query.processAllAvailable()
      ms.addData(("c", 10600L, 0.0))
      query.processAllAvailable()
      assert(spark.table("stream_inc3").isEmpty)
    } finally query.stop()
  }

  test("force-finalize cut is counted into the metrics accumulator") {
    // A andThen B with B never true: the decision frontier stalls, the
    // undecided buffer hits the cap, and the machine force-finalizes the
    // part — which must be visible as a METRIC (job status), not only as
    // an executor-log warning
    implicit val sqlCtx = spark.sqlContext
    val acc = spark.sparkContext.longAccumulator("graft.test.forceFinalize")
    val cfg = graft.dsl.PatternConfig(Seq("k"), "ts",
      eventsMaxGapMs = 600000L, sessionGapMs = 1000L)
    val ms = MemoryStream[(String, Long, Double)]
    val df = ms.toDF().toDF("k", "sec", "v")
      .withColumn("ts", timestamp_seconds(col("sec")))
      .withWatermark("ts", "5 seconds")
    val inc = graft.dsl.TspEngine.incidentsStream(df,
      "v > 50 andThen v > 1000000", cfg,
      forceFinalizeAcc = Some(acc), maxUndecidedEvents = 8)
    val query = inc.writeStream.format("memory").queryName("stream_ffcut")
      .outputMode("append").start()
    try {
      // 30 events, condition-A always true, B never: > 8 undecided
      ms.addData((0 until 30).map(i => ("f", 20000L + i, 60.0)): _*)
      query.processAllAvailable()
      assert(query.exception.isEmpty, s"query failed: ${query.exception}")
      assert(acc.value >= 1L,
        s"expected at least one force-finalize cut, accumulator=${acc.value}")
    } finally query.stop()
  }
}
