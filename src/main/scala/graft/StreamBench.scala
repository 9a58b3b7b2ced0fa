package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._

/** Streaming-path throughput bench (dev tool, like [[FlapBench]]): feeds a
  * keyed event stream through `TspEngine.incidentsStream` via MemoryStream
  * in micro-batch chunks and prints end-to-end events/s per pattern shape —
  * the number to hold against the reference's Kafka ingest default of
  * 100k events per 1 s micro-window
  * (reference: streaming/.../PatternsSearchJob.scala:136-143) and its
  * 2.4k-10k rows/s per-pattern batch budgets (BASELINE.md).
  *
  * Four shapes cover the four streaming evaluator paths: a window-free
  * condition + timer (fast column path), a trailing aggregate (fMGWS
  * incremental evaluator), an andThen chain (incremental queue-merge
  * cascade), and a wait tree (recursive tree evaluator).
  *
  *   sbt "runMain graft.StreamBench [nEvents] [nKeys] [nChunks]"
  *
  * `nChunks` controls micro-batch size (nEvents/nChunks per trigger): the
  * per-batch fixed cost (state store load/commit per partition) amortizes
  * with batch size, so throughput rises with larger batches — the
  * Kafka-deployment tuning knob (maxOffsetsPerTrigger).
  */
object StreamBench {
  def main(args: Array[String]): Unit = {
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.extensions", "graft.functions.GraftExtensions")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext

    if (args.headOption.contains("statesize")) {
      runStateSize(spark,
        args.drop(1).filterNot(_ == "rocksdb").map(_.toInt).toSeq match {
          case Nil => Seq(200, 2000, 20000)
          case ks  => ks
        },
        rocksdb = args.contains("rocksdb"))
      spark.stop()
      return
    }

    val nEvents = args.headOption.map(_.toInt).getOrElse(500000)
    val nKeys = args.drop(1).headOption.map(_.toInt).getOrElse(200)
    val chunks = args.drop(2).headOption.map(_.toInt).getOrElse(10)

    val cfg = dsl.PatternConfig(Seq("k"), "ts",
      eventsMaxGapMs = 600000L, sessionGapMs = 5000L)
    val patterns = Seq(
      "timer_fastpath" -> "v > 100 for 30 sec",
      "window_eval"    -> "avg(v, 60 sec) > 120",
      "andthen_chain"  -> "v > 120 andThen v < 40 andThen v > 150",
      "wait_tree"      -> "wait(30 sec, v > 150)")

    // deterministic interleaved stream: key k_i fires every nKeys-th
    // event, 1 s apart per key, values cycling 0..199
    val events: IndexedSeq[(String, Long, Double)] =
      (0 until nEvents).map { i =>
        (s"k${i % nKeys}", 1000000L + (i / nKeys).toLong,
          ((i * 7919) % 200).toDouble)
      }

    patterns.foreach { case (name, pattern) =>
      (1 to 2).foreach { round =>
        val ms = MemoryStream[(String, Long, Double)]
        val df = ms.toDF().toDF("k", "sec", "v")
          .withColumn("ts", timestamp_seconds(col("sec")))
          .withWatermark("ts", "5 seconds")
        val inc = dsl.TspEngine.incidentsStream(df, pattern, cfg)
        val q = inc.writeStream.format("noop").outputMode("append").start()
        try {
          val t0 = System.nanoTime()
          events.grouped(nEvents / chunks + 1).foreach { chunk =>
            ms.addData(chunk: _*)
            q.processAllAvailable()
          }
          // two far-future batches flush pending state + fire timeouts
          ms.addData(("zz", 99000000L, 0.0)); q.processAllAvailable()
          ms.addData(("zz", 99900000L, 0.0)); q.processAllAvailable()
          val sec = (System.nanoTime() - t0) / 1e9
          require(q.exception.isEmpty, s"$name failed: ${q.exception}")
          println(f"[stream] $name%-15s events=$nEvents%-8d keys=$nKeys%-5d " +
            f"chunks=$chunks%-3d round=$round sec=$sec%7.2f " +
            f"rate=${nEvents / sec / 1e3}%8.1fk events/s")
        } finally q.stop()
      }
    }

    // fifth shape: NARROW source — the in-state pivot+fill accumulator
    // (incidentsStreamNarrow) on top of the window_eval path; three
    // sensors rotate per key tick, the pattern reads one and fills from
    // state across the other two's ticks
    val narrowEvents: IndexedSeq[(String, Long, String, Double)] =
      (0 until nEvents).map { i =>
        val tick = (i / nKeys).toLong
        (s"k${i % nKeys}", 1000000L + tick, Seq("a", "b", "c")((tick % 3).toInt),
          ((i * 7919) % 200).toDouble)
      }
    (1 to 2).foreach { round =>
      val ms = MemoryStream[(String, Long, String, Double)]
      val df = ms.toDF().toDF("k", "sec", "sensor", "v")
        .withColumn("ts", timestamp_seconds(col("sec")))
        .withWatermark("ts", "5 seconds")
      val inc = dsl.TspEngine.incidentsStreamNarrow(df, "avg(a, 60 sec) > 120",
        cfg, graft.streaming.StreamingUnfold.NarrowStreamConfig(
          "sensor", "v", timeoutMs = Some(30000L)),
        sensors = Seq("a", "b", "c"))
      val q = inc.writeStream.format("noop").outputMode("append").start()
      try {
        val t0 = System.nanoTime()
        narrowEvents.grouped(nEvents / chunks + 1).foreach { chunk =>
          ms.addData(chunk: _*)
          q.processAllAvailable()
        }
        ms.addData(("zz", 99000000L, "zzs", 0.0)); q.processAllAvailable()
        ms.addData(("zz", 99900000L, "zzs", 0.0)); q.processAllAvailable()
        val sec = (System.nanoTime() - t0) / 1e9
        require(q.exception.isEmpty, s"narrow_unfold failed: ${q.exception}")
        println(f"[stream] narrow_unfold   events=$nEvents%-8d keys=$nKeys%-5d " +
          f"chunks=$chunks%-3d round=$round sec=$sec%7.2f " +
          f"rate=${nEvents / sec / 1e3}%8.1fk events/s")
      } finally q.stop()
    }

    // sixth shape: streaming as-of join — every 10th event is a setpoint,
    // the rest probe it; state is ONE (ts, value) pair per key
    val asofProbes: IndexedSeq[(Long, Long, Long)] =
      (0 until nEvents).filter(_ % 10 != 0).map { i =>
        (i.toLong, (i % nKeys).toLong, 1000000L + (i / nKeys).toLong)
      }.toIndexedSeq
    val asofSets: IndexedSeq[(Long, Long, Double)] =
      (0 until nEvents).filter(_ % 10 == 0).map { i =>
        ((i % nKeys).toLong, 1000000L + (i / nKeys).toLong,
          ((i * 7919) % 200).toDouble)
      }.toIndexedSeq
    (1 to 2).foreach { round =>
      val msP = MemoryStream[(Long, Long, Long)]
      val msS = MemoryStream[(Long, Long, Double)]
      val joined = graft.streaming.StreamingAsof.asofJoinStream(
        msP.toDF().toDF("event_id", "key", "t_us"),
        msS.toDF().toDF("key", "t_us", "value"))
      val q = joined.writeStream.format("noop").outputMode("append").start()
      try {
        val t0 = System.nanoTime()
        val pChunks = asofProbes.grouped(asofProbes.size / chunks + 1).toSeq
        val sChunks = asofSets.grouped(asofSets.size / chunks + 1).toSeq
        pChunks.zipAll(sChunks, IndexedSeq.empty, IndexedSeq.empty)
          .foreach { case (pc, sc) =>
            if (pc.nonEmpty) msP.addData(pc: _*)
            if (sc.nonEmpty) msS.addData(sc: _*)
            q.processAllAvailable()
          }
        val sec = (System.nanoTime() - t0) / 1e9
        require(q.exception.isEmpty, s"asof_stream failed: ${q.exception}")
        println(f"[stream] asof_stream     events=$nEvents%-8d keys=$nKeys%-5d " +
          f"chunks=$chunks%-3d round=$round sec=$sec%7.2f " +
          f"rate=${nEvents / sec / 1e3}%8.1fk events/s " +
          f"batches=${Option(q.lastProgress).map(_.batchId + 1).getOrElse(-1L)}")
      } finally q.stop()
    }

    // seventh shape: streaming interval join — every 10th event opens a
    // 40-tick window; state per key is the live overlap (~4 windows here)
    val ivPoints: IndexedSeq[(Long, Long, Long)] =
      (0 until nEvents).filter(_ % 10 != 0).map { i =>
        (i.toLong, (i % nKeys).toLong, 1000000L + (i / nKeys).toLong)
      }.toIndexedSeq
    val ivWins: IndexedSeq[(Long, Long, Long, Double)] =
      (0 until nEvents).filter(_ % 10 == 0).map { i =>
        val s = 1000000L + (i / nKeys).toLong
        ((i % nKeys).toLong, s, s + 40L, ((i * 7919) % 200).toDouble)
      }.toIndexedSeq
    (1 to 2).foreach { round =>
      val msP = MemoryStream[(Long, Long, Long)]
      val msW = MemoryStream[(Long, Long, Long, Double)]
      val joined = graft.streaming.StreamingInterval.intervalJoinStream(
        msP.toDF().toDF("event_id", "key", "t_us"),
        msW.toDF().toDF("key", "start_us", "end_us", "value"))
      val q = joined.writeStream.format("noop").outputMode("append").start()
      try {
        val t0 = System.nanoTime()
        val pChunks = ivPoints.grouped(ivPoints.size / chunks + 1).toSeq
        val wChunks = ivWins.grouped(ivWins.size / chunks + 1).toSeq
        pChunks.zipAll(wChunks, IndexedSeq.empty, IndexedSeq.empty)
          .foreach { case (pc, wc) =>
            if (wc.nonEmpty) msW.addData(wc: _*)
            if (pc.nonEmpty) msP.addData(pc: _*)
            q.processAllAvailable()
          }
        val sec = (System.nanoTime() - t0) / 1e9
        require(q.exception.isEmpty, s"interval_stream failed: ${q.exception}")
        println(f"[stream] interval_stream events=$nEvents%-8d keys=$nKeys%-5d " +
          f"chunks=$chunks%-3d round=$round sec=$sec%7.2f " +
          f"rate=${nEvents / sec / 1e3}%8.1fk events/s")
      } finally q.stop()
    }

    // eighth shape: the REORDER-BUFFERED as-of join on a jitter-disordered
    // feed — quantifies what the watermark-delay buffer costs over the
    // in-order asof_stream above (state churn: every event writes the
    // pending buffer once and is released ~delay later). One tagged
    // source; ticks are 1 s of event time so a 5 s delay trails ~5 ticks
    // of rows per key; jitter 4 s < delay, so nothing is droppable.
    val ordBase = 1000000000000L
    val ordWire: IndexedSeq[(Long, Long, Int, Long, Double)] =
      (0 until nEvents).map { i =>
        val t = ordBase + (i / nKeys).toLong * 1000000L
        if (i % 10 == 0) ((i % nKeys).toLong, t, 0, -1L, ((i * 7919) % 200).toDouble)
        else ((i % nKeys).toLong, t, 1, i.toLong, 0.0)
      }
    val ordArrival = {
      val rnd = new scala.util.Random(41)
      ordWire.map(e => (e._2 + rnd.nextLong(4000001L) * 1000L, e))
        .sortBy(_._1).map(_._2)
    }
    (1 to 2).foreach { round =>
      val ms = MemoryStream[(Long, Long, Int, Long, Double)]
      val all = ms.toDF().toDF("key", "t_us", "side", "event_id", "value")
      val joined = graft.streaming.StreamingAsof.asofJoinStreamOrdered(
        all.filter(col("side") === 1).select("event_id", "key", "t_us"),
        all.filter(col("side") === 0).select("key", "t_us", "value"),
        delayMs = 5000L)
      val q = joined.writeStream.format("noop").outputMode("append").start()
      try {
        val t0 = System.nanoTime()
        ordArrival.grouped(nEvents / chunks + 1).foreach { chunk =>
          ms.addData(chunk: _*)
          q.processAllAvailable()
        }
        val maxT = ordBase + (nEvents / nKeys).toLong * 1000000L
        ms.addData((9999L, maxT + 600000000L, 1, -7L, 0.0)); q.processAllAvailable()
        ms.addData((9999L, maxT + 900000000L, 1, -8L, 0.0)); q.processAllAvailable()
        val sec = (System.nanoTime() - t0) / 1e9
        require(q.exception.isEmpty, s"asof_ordered failed: ${q.exception}")
        println(f"[stream] asof_ordered    events=$nEvents%-8d keys=$nKeys%-5d " +
          f"chunks=$chunks%-3d round=$round sec=$sec%7.2f " +
          f"rate=${nEvents / sec / 1e3}%8.1fk events/s " +
          f"batches=${Option(q.lastProgress).map(_.batchId + 1).getOrElse(-1L)}")
      } finally q.stop()
    }
    spark.stop()
  }

  /** State-size-vs-keys ladder for the r10 streaming operators — the
    * capacity number a deployment sizes executors by: state BYTES PER KEY,
    * which must stay flat as key cardinality grows 10×/100× (each operator
    * holds a bounded per-key structure: ≤ k pairs for top-k, ≤ k hashes for
    * KMV, 2 longs for CUSUM, the live window set for the interval join).
    *
    *   sbt "runMain graft.StreamBench statesize [keys...] [rocksdb]"
    *
    * Run via sbt or spark-submit, NOT bare `java -cp`: the HDFS provider's
    * size metric uses SizeEstimator, which needs the `--add-opens` module
    * flags on Java 17 — without them every map reflects as an 80-byte stub
    * and the ladder reads a constant (observed: 640 = 8 partitions × 80).
    *
    * Metrics come from the committed batch's StateOperatorProgress:
    * `numRowsTotal` and the provider's current-version size
    * (`stateOnCurrentVersionSizeBytes` for HDFS-backed,
    * `rocksdbSstFileSize` for RocksDB: the provider exposes no
    * total-memory metric, so bytes/key for the RocksDB rows means
    * bytes-on-SSD, which is also what changelog checkpoints ship) — not
    * `memoryUsedBytes`, which counts retained old versions in the HDFS
    * provider.
    */
  private def runStateSize(spark: SparkSession, keyLadder: Seq[Int],
                           rocksdb: Boolean): Unit = {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    if (rocksdb)
      spark.conf.set("spark.sql.streaming.stateStore.providerClass",
        "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider")
    val perKey = 50
    val chunks = 5

    def report(name: String, nKeys: Int,
               q: org.apache.spark.sql.streaming.StreamingQuery): Unit = {
      require(q.exception.isEmpty, s"$name failed: ${q.exception}")
      val ops = q.lastProgress.stateOperators
      val rows = ops.map(_.numRowsTotal).sum
      // HDFS provider: live on-heap size of the current version map.
      // RocksDB: SST bytes on local disk (there is no total-memory metric;
      // pinned block cache is negligible) — the capacity number is
      // bytes-on-SSD there, which is also what changelog checkpoints ship.
      val cur = ops.map { op =>
        val m = op.customMetrics
        val hdfs = m.getOrDefault("stateOnCurrentVersionSizeBytes", 0L)
        if (hdfs > 0L) hdfs.toLong
        else m.getOrDefault("rocksdbSstFileSize", 0L).toLong
      }.sum
      println(f"[statesize] $name%-16s keys=$nKeys%-6d stateRows=$rows%-8d " +
        f"curBytes=$cur%-10d bytes/key=${cur.toDouble / nKeys}%8.1f " +
        f"rows/key=${rows.toDouble / nKeys}%6.2f " +
        f"provider=${if (rocksdb) "rocksdb" else "hdfs"}")
    }

    keyLadder.foreach { nKeys =>
      val n = nKeys * perKey

      // top-k leaderboard: state bounded at k=10 (v, id) pairs per group
      locally {
        val ms = MemoryStream[(String, Long, Long)]
        val q = streaming.StreamingTopK
          .topKStream(ms.toDF().toDF("group", "v", "id"), 10)
          .writeStream.format("noop").outputMode("update").start()
        try {
          (0 until n).map(i => (s"g${i % nKeys}", (i * 7919 % 100000).toLong,
              i.toLong))
            .grouped(n / chunks + 1)
            .foreach { c => ms.addData(c: _*); q.processAllAvailable() }
          report("topk_stream", nKeys, q)
        } finally q.stop()
      }

      // KMV distinct sketch: every value distinct, state capped at k=256
      locally {
        val ms = MemoryStream[(String, Long)]
        val q = streaming.StreamingSketch
          .kmvDistinctStream(ms.toDF().toDF("group", "value"), 256)
          .writeStream.format("noop").outputMode("update").start()
        try {
          (0 until n).map(i => (s"g${i % nKeys}", i.toLong))
            .grouped(n / chunks + 1)
            .foreach { c => ms.addData(c: _*); q.processAllAvailable() }
          report("kmv_stream", nKeys, q)
        } finally q.stop()
      }

      // bottom-k quantile sample: ≤ k (hash, value) pairs per group; at 50
      // events/key the sample IS the group, so rows/key tracks perKey
      locally {
        val ms = MemoryStream[(String, Long, Double)]
        val q = streaming.StreamingQuantile
          .quantileStream(ms.toDF().toDF("group", "id", "value"), 256)
          .writeStream.format("noop").outputMode("update").start()
        try {
          (0 until n).map(i => (s"g${i % nKeys}", i.toLong,
              (i * 7919 % 100000).toDouble))
            .grouped(n / chunks + 1)
            .foreach { c => ms.addData(c: _*); q.processAllAvailable() }
          report("quantile_stream", nKeys, q)
        } finally q.stop()
      }

      // Count-Min sketch: ≤ depth × width counter cells per group; values
      // drawn from a domain >> width so every cell fills — bytes/key is
      // capped at the (4 × 256)-cell grid regardless of value cardinality
      locally {
        val ms = MemoryStream[(String, Long)]
        val q = streaming.StreamingSketch
          .cmsStream(ms.toDF().toDF("group", "value"), depth = 4, width = 256)
          .writeStream.format("noop").outputMode("update").start()
        try {
          (0 until n).map(i => (s"g${i % nKeys}", (i * 7919 % 100000).toLong))
            .grouped(n / chunks + 1)
            .foreach { c => ms.addData(c: _*); q.processAllAvailable() }
          report("cms_stream", nKeys, q)
        } finally q.stop()
      }

      // Bloom filter: ≤ nBits/64 words per group; 50 values × 4 hashes
      // touch ~200 bits, so the word set saturates well under the cap
      locally {
        val ms = MemoryStream[(String, Long)]
        val q = streaming.StreamingSketch
          .bloomStream(ms.toDF().toDF("group", "value"), nBits = 16384, nHashes = 4)
          .writeStream.format("noop").outputMode("update").start()
        try {
          (0 until n).map(i => (s"g${i % nKeys}", (i * 7919 % 100000).toLong))
            .grouped(n / chunks + 1)
            .foreach { c => ms.addData(c: _*); q.processAllAvailable() }
          report("bloom_stream", nKeys, q)
        } finally q.stop()
      }

      // HyperLogLog: ≤ 2^p = 256 registers per group — the tightest FIXED
      // cap of the sketch family; 50 distinct values touch ~50 registers,
      // so rows/key tracks min(perKey, 256) and bytes/key is flat
      locally {
        val ms = MemoryStream[(String, Long)]
        val q = streaming.StreamingSketch
          .hllStream(ms.toDF().toDF("group", "value"), p = 8)
          .writeStream.format("noop").outputMode("update").start()
        try {
          (0 until n).map(i => (s"g${i % nKeys}", (i * 7919 % 100000).toLong))
            .grouped(n / chunks + 1)
            .foreach { c => ms.addData(c: _*); q.processAllAvailable() }
          report("hll_stream", nKeys, q)
        } finally q.stop()
      }

      // EWMA: one long + an init flag per key — same class as CUSUM
      locally {
        val ms = MemoryStream[(Long, Long, Long, Long)]
        val q = streaming.StreamingEwma
          .ewmaStream(ms.toDF().toDF("key", "t_us", "event_id", "v"), k = 3)
          .writeStream.format("noop").outputMode("append").start()
        try {
          (0 until n).map(i => ((i % nKeys).toLong, (i / nKeys).toLong,
              i.toLong, (i * 7919 % 200).toLong))
            .grouped(n / chunks + 1)
            .foreach { c => ms.addData(c: _*); q.processAllAvailable() }
          report("ewma_stream", nKeys, q)
        } finally q.stop()
      }

      // Trend: six longs + a flag per key (the OLS moment sums) —
      // cusum-class flat, independent of events per key
      locally {
        val ms = MemoryStream[(Long, Long, Long, Long)]
        val q = streaming.StreamingTrend
          .trendStream(ms.toDF().toDF("key", "t_us", "event_id", "v"),
            unitUs = 1L)
          .writeStream.format("noop").outputMode("update").start()
        try {
          (0 until n).map(i => ((i % nKeys).toLong, (i / nKeys).toLong,
              i.toLong, (i * 7919 % 200).toLong))
            .grouped(n / chunks + 1)
            .foreach { c => ms.addData(c: _*); q.processAllAvailable() }
          report("trend_stream", nKeys, q)
        } finally q.stop()
      }

      // CUSUM: two longs per key, the flattest possible ladder
      locally {
        val ms = MemoryStream[(Long, Long, Long, Long)]
        val q = streaming.StreamingCusum
          .cusumStream(ms.toDF().toDF("key", "t_us", "event_id", "x"),
            slack = 100L)
          .writeStream.format("noop").outputMode("append").start()
        try {
          (0 until n).map(i => ((i % nKeys).toLong, (i / nKeys).toLong,
              i.toLong, (i * 7919 % 200).toLong))
            .grouped(n / chunks + 1)
            .foreach { c => ms.addData(c: _*); q.processAllAvailable() }
          report("cusum_stream", nKeys, q)
        } finally q.stop()
      }

      // interval join: state = frontier + live windows (40-tick spans at
      // one open per 10 ticks ⇒ ~4 live windows per key, corpus-invariant)
      locally {
        val msP = MemoryStream[(Long, Long, Long)]
        val msW = MemoryStream[(Long, Long, Long, Double)]
        val q = streaming.StreamingInterval.intervalJoinStream(
            msP.toDF().toDF("event_id", "key", "t_us"),
            msW.toDF().toDF("key", "start_us", "end_us", "value"))
          .writeStream.format("noop").outputMode("append").start()
        try {
          val pts = (0 until n).filter(_ % 10 != 0).map(i =>
            (i.toLong, (i % nKeys).toLong, 1000000L + (i / nKeys).toLong))
          val wins = (0 until n).filter(_ % 10 == 0).map { i =>
            val s = 1000000L + (i / nKeys).toLong
            ((i % nKeys).toLong, s, s + 40L, (i * 7919 % 200).toDouble)
          }
          pts.grouped(pts.size / chunks + 1).toSeq
            .zipAll(wins.grouped(wins.size / chunks + 1).toSeq,
              IndexedSeq.empty, IndexedSeq.empty)
            .foreach { case (pc, wc) =>
              if (wc.nonEmpty) msW.addData(wc: _*)
              if (pc.nonEmpty) msP.addData(pc: _*)
              q.processAllAvailable()
            }
          report("interval_stream", nKeys, q)
        } finally q.stop()
      }
    }
    if (rocksdb)
      spark.conf.unset("spark.sql.streaming.stateStore.providerClass")
  }
}
