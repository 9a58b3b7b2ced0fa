package graft.streaming

import graft.SparkSpec
import graft.operators.Sketches
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._

import scala.util.Random

/** Streaming KMV: after any prefix of the stream, the latest emitted
  * estimate per group must equal the BATCH sketch over that prefix —
  * regardless of chunking or duplicate re-delivery (the survivor set is a
  * pure function of the value set seen).
  */
class StreamingSketchSpec extends SparkSpec
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

  private val k = 64

  private def batchSketch(rows: Seq[(String, Long)]) =
    Sketches.kmvDistinct(rows.toDF("group", "value"), Seq("group"),
        col("value"), k)
      .select(col("group"), col("n_kept"), col("kth_hv"), col("est_distinct"))
      .as[(String, Long, Long, Long)].collect()
      .map(r => r._1 -> ((r._2, r._3, r._4))).toMap

  test("stream equals batch after every chunk, for several chunkings") {
    val rng = new Random(17)
    val rows = Seq.tabulate(4000) { _ =>
      (s"g${rng.nextInt(3)}", rng.nextInt(800).toLong)
    }
    implicit val sqlCtx = spark.sqlContext
    for (chunks <- Seq(1, 4, 13)) {
      val ms = MemoryStream[(String, Long)]
      val q = StreamingSketch.kmvDistinctStream(
          ms.toDF().toDF("group", "value"), k)
        .writeStream.format("memory").queryName("kmv_out")
        .outputMode("update").start()
      try {
        var seen = Seq.empty[(String, Long)]
        rows.grouped(rows.size / chunks + 1).foreach { chunk =>
          ms.addData(chunk: _*)
          q.processAllAvailable()
          seen ++= chunk
          // latest emit per group = the rows of the LAST micro-batch that
          // touched the group; compare against the batch sketch of the
          // prefix. spark table keeps all updates; take each group's last.
          val latest = spark.table("kmv_out")
            .withColumn("_i", monotonically_increasing_id())
            .orderBy(col("_i").desc).collect()
            .map(r => (r.getString(0), (r.getLong(1), r.getLong(2), r.getLong(3))))
            .groupBy(_._1).map { case (g, rs) => g -> rs.head._2 }
          assert(latest == batchSketch(seen), s"chunks=$chunks after ${seen.size}")
        }
      } finally {
        q.stop()
        spark.sql("DROP TABLE IF EXISTS kmv_out")
      }
    }
  }

  test("null values in the stream are excluded, not a decode crash") {
    implicit val sqlCtx = spark.sqlContext
    val ms = MemoryStream[(String, String)]
    val q = StreamingSketch.kmvDistinctStream(
        ms.toDF().toDF("group", "value"), k)
      .writeStream.format("memory").queryName("kmv_null")
      .outputMode("update").start()
    try {
      ms.addData(("g", "a"), ("g", null), ("g", "b"), ("g", null))
      q.processAllAvailable()
      val row = spark.table("kmv_null").select("n_kept", "est_distinct")
        .as[(Long, Long)].head()
      assert(row == ((2L, 2L)))
    } finally {
      q.stop()
      spark.sql("DROP TABLE IF EXISTS kmv_null")
    }
  }

  /** CMS: max (= latest, counts are monotone) emission per (group, row,
    * bucket) must equal the batch sketch relation over the prefix, under
    * any chunking AND any delivery order (addition commutes).
    */
  private def batchCms(rows: Seq[(String, Long)], depth: Int, width: Int) =
    rows.groupBy(_._1).toSeq.flatMap { case (g, rs) =>
      Sketches.cmsSketch(rs.map(_._2).toDF("value"), col("value"),
          depth, width)
        .as[(Int, Long, Long)].collect()
        .map { case (r, b, c) => (g, r, b) -> c }.toSeq
    }.toMap

  test("cms stream equals the batch sketch across chunkings and disorder") {
    val rng = new Random(19)
    val depth = 4
    val width = 64
    val rows = Seq.tabulate(3000) { _ =>
      (s"g${rng.nextInt(3)}", rng.nextInt(500).toLong)
    }
    val want = batchCms(rows, depth, width)
    implicit val sqlCtx = spark.sqlContext
    for ((chunks, shuffled) <- Seq((1, false), (7, false), (7, true), (19, true))) {
      val feed = if (shuffled) rng.shuffle(rows) else rows
      val ms = MemoryStream[(String, Long)]
      val q = StreamingSketch.cmsStream(
          ms.toDF().toDF("group", "value"), depth, width)
        .writeStream.format("memory").queryName("cms_out")
        .outputMode("update").start()
      try {
        feed.grouped(feed.size / chunks + 1).foreach { c =>
          ms.addData(c: _*); q.processAllAvailable()
        }
        val got = spark.table("cms_out")
          .groupBy("group", "row", "bucket")
          .agg(max("cnt").as("cnt"))
          .as[(String, Int, Long, Long)].collect()
          .map(r => (r._1, r._2, r._3) -> r._4).toMap
        assert(got == want, s"chunks=$chunks shuffled=$shuffled")
      } finally {
        q.stop()
        spark.sql("DROP TABLE IF EXISTS cms_out")
      }
    }
  }

  test("cms state survives a query restart through the checkpoint") {
    implicit val sqlCtx = spark.sqlContext
    val rng = new Random(29)
    val depth = 4
    val width = 64
    val rows = Seq.tabulate(800)(_ => (s"g${rng.nextInt(2)}", rng.nextInt(300).toLong))
    val want = batchCms(rows, depth, width)
    val (firstHalf, secondHalf) = rows.splitAt(400)

    val ckpt = java.nio.file.Files.createTempDirectory("cms-ckpt").toString
    val outDir = java.nio.file.Files.createTempDirectory("cms-out").toString
    val ms = MemoryStream[(String, Long)]
    // update-mode emissions need an update-capable durable sink:
    // foreachBatch appends each micro-batch's rows (parquet itself only
    // accepts Append); max-per-cell over all emissions is still the sketch
    def start() = StreamingSketch.cmsStream(
        ms.toDF().toDF("group", "value"), depth, width)
      .writeStream
      .foreachBatch { (df: org.apache.spark.sql.Dataset[
          StreamingSketch.CmsCell], _: Long) =>
        df.write.mode("append").parquet(outDir)
      }
      .option("checkpointLocation", ckpt).outputMode("update").start()

    val q1 = start()
    ms.addData(firstHalf: _*); q1.processAllAvailable(); q1.stop()
    val q2 = start()
    ms.addData(secondHalf: _*); q2.processAllAvailable()
    try {
      val got = spark.read.parquet(outDir)
        .groupBy("group", "row", "bucket").agg(max("cnt").as("cnt"))
        .as[(String, Int, Long, Long)].collect()
        .map(r => (r._1, r._2, r._3) -> r._4).toMap
      // lost counter state would restart the second half's cells at zero
      assert(got == want)
    } finally q2.stop()
  }

  test("cms null values are excluded; sketch cells replay cmsEstimate") {
    implicit val sqlCtx = spark.sqlContext
    val ms = MemoryStream[(String, String)]
    val q = StreamingSketch.cmsStream(
        ms.toDF().toDF("group", "value"), depth = 4, width = 64)
      .writeStream.format("memory").queryName("cms_null")
      .outputMode("update").start()
    try {
      ms.addData(("g", "a"), ("g", null), ("g", "b"), ("g", "a"), ("g", null))
      q.processAllAvailable()
      val sketch = spark.table("cms_null")
        .groupBy("row", "bucket").agg(max("cnt").as("cnt"))
      val est = Sketches.cmsEstimate(sketch,
          Seq("a", "b", "z").toDF("v"), "v", depth = 4, width = 64)
        .as[(String, Long)].collect().toMap
      assert(est("a") == 2L && est("b") == 1L)
      assert(est("z") <= 1L) // never-seen: 0 unless a collision overcounts
    } finally {
      q.stop()
      spark.sql("DROP TABLE IF EXISTS cms_null")
    }
  }

  /** Bloom: latest (= max under OR-monotonicity) emission per
    * (group, word_idx) must equal the batch filter over the prefix.
    */
  private def batchBloom(rows: Seq[(String, String)], nBits: Int, nHashes: Int) =
    rows.groupBy(_._1).toSeq.flatMap { case (g, rs) =>
      Sketches.bloomSketch(rs.map(_._2).toDF("value"), col("value"),
          nBits, nHashes)
        .as[(Long, Long)].collect().map { case (w, b) => (g, w) -> b }.toSeq
    }.toMap

  test("bloom stream equals the batch filter across chunkings and disorder") {
    val rng = new Random(31)
    val rows = Seq.tabulate(2000)(_ => (s"g${rng.nextInt(3)}", s"u${rng.nextInt(600)}"))
    val want = batchBloom(rows, 4096, 4)
    implicit val sqlCtx = spark.sqlContext
    for ((chunks, shuffled) <- Seq((1, false), (9, false), (9, true))) {
      val feed = if (shuffled) rng.shuffle(rows) else rows
      val ms = MemoryStream[(String, String)]
      val q = StreamingSketch.bloomStream(
          ms.toDF().toDF("group", "value"), nBits = 4096, nHashes = 4)
        .writeStream.format("memory").queryName("bloom_out")
        .outputMode("update").start()
      try {
        feed.grouped(feed.size / chunks + 1).foreach { c =>
          ms.addData(c: _*); q.processAllAvailable()
        }
        // LAST emission per word, not max(): OR-monotone is not numeric
        // max once bit 63 makes the long negative
        val got = spark.table("bloom_out")
          .withColumn("_i", monotonically_increasing_id())
          .orderBy(col("_i").desc)
          .as[(String, Long, Long, Long)].collect()
          .groupBy(r => (r._1, r._2)).map { case (k, rs) => k -> rs.head._3 }
        assert(got == want, s"chunks=$chunks shuffled=$shuffled")
      } finally {
        q.stop()
        spark.sql("DROP TABLE IF EXISTS bloom_out")
      }
    }
  }

  test("raw emission logs probe correctly: stale rows are compacted by the probes") {
    implicit val sqlCtx = spark.sqlContext
    // two batches hitting overlapping words → the memory sink holds STALE
    // rows (an earlier, lower/leaner emission per word) alongside the
    // latest; bloomProbe/cmsEstimate must compact, not min over the stale
    val b1 = (0 until 150).map(i => ("g", s"u$i"))
    val b2 = (100 until 250).map(i => ("g", s"u$i"))
    val msB = MemoryStream[(String, String)]
    val qB = StreamingSketch.bloomStream(
        msB.toDF().toDF("group", "value"), nBits = 2048, nHashes = 4)
      .writeStream.format("memory").queryName("bloom_log")
      .outputMode("update").start()
    val msC = MemoryStream[(String, String)]
    val qC = StreamingSketch.cmsStream(
        msC.toDF().toDF("group", "value"), depth = 4, width = 64)
      .writeStream.format("memory").queryName("cms_log")
      .outputMode("update").start()
    try {
      msB.addData(b1: _*); qB.processAllAvailable()
      msB.addData(b2: _*); qB.processAllAvailable()
      msC.addData(b1: _*); qC.processAllAvailable()
      msC.addData(b2: _*); qC.processAllAvailable()
      val bloomLog = spark.table("bloom_log").select("word_idx", "bits")
      // duplicates really exist, or the test proves nothing
      assert(bloomLog.count() >
        bloomLog.select("word_idx").distinct().count())
      val probed = Sketches.bloomProbe(bloomLog,
          (0 until 250).map(i => s"u$i").toDF("v"), "v",
          nBits = 2048, nHashes = 4)
        .as[(String, Boolean)].collect().toMap
      assert(probed.values.forall(identity),
        "stale emission rows caused a false negative")
      val cmsLog = spark.table("cms_log").select("row", "bucket", "cnt")
      val exact = (b1 ++ b2).groupBy(_._2).view.mapValues(_.size.toLong).toMap
      val est = Sketches.cmsEstimate(cmsLog,
          exact.keys.toSeq.toDF("v"), "v", depth = 4, width = 64)
        .as[(String, Long)].collect().toMap
      exact.foreach { case (v, n) =>
        assert(est(v) >= n, s"stale emission rows undercut CMS on $v")
      }
    } finally {
      qB.stop(); qC.stop()
      spark.sql("DROP TABLE IF EXISTS bloom_log")
      spark.sql("DROP TABLE IF EXISTS cms_log")
    }
  }

  test("bloom re-delivery is a no-op: nothing emitted, state untouched") {
    implicit val sqlCtx = spark.sqlContext
    val rows = Seq.tabulate(300)(i => ("g", s"u${i % 120}"))
    val ms = MemoryStream[(String, String)]
    val q = StreamingSketch.bloomStream(
        ms.toDF().toDF("group", "value"), nBits = 4096, nHashes = 4)
      .writeStream.format("memory").queryName("bloom_dup")
      .outputMode("update").start()
    try {
      ms.addData(rows: _*); q.processAllAvailable()
      val afterFirst = spark.table("bloom_dup").count()
      assert(afterFirst > 0)
      ms.addData(rows: _*); q.processAllAvailable() // full replay: OR no-op
      assert(spark.table("bloom_dup").count() == afterFirst,
        "a pure replay must emit nothing (idempotent OR)")
      val prog = q.recentProgress.flatMap(_.stateOperators)
      assert(prog.nonEmpty)
    } finally {
      q.stop()
      spark.sql("DROP TABLE IF EXISTS bloom_dup")
    }
  }

  test("hll stream equals the batch registers across chunkings and disorder") {
    val rng = new Random(47)
    val rows = Seq.tabulate(3000)(_ => (s"g${rng.nextInt(3)}", s"u${rng.nextInt(900)}"))
    val want = Sketches.hllRegisters(rows.toDF("group", "value"),
        Seq("group"), col("value"), p = 8)
      .as[(String, Long, Int)].collect()
      .map(r => (r._1, r._2) -> r._3.toLong).toMap
    implicit val sqlCtx = spark.sqlContext
    for ((chunks, shuffled) <- Seq((1, false), (9, false), (9, true))) {
      val feed = if (shuffled) rng.shuffle(rows) else rows
      val ms = MemoryStream[(String, String)]
      val q = StreamingSketch.hllStream(
          ms.toDF().toDF("group", "value"), p = 8)
        .writeStream.format("memory").queryName("hll_out")
        .outputMode("update").start()
      try {
        feed.grouped(feed.size / chunks + 1).foreach { c =>
          ms.addData(c: _*); q.processAllAvailable()
        }
        // ranks are monotone: MAX per (group, reg) over the emission log
        // IS the sketch
        val got = spark.table("hll_out")
          .groupBy("group", "reg").agg(max("max_rank").as("r"))
          .as[(String, Long, Long)].collect()
          .map(r => (r._1, r._2) -> r._3).toMap
        assert(got == want, s"chunks=$chunks shuffled=$shuffled")
      } finally {
        q.stop()
        spark.sql("DROP TABLE IF EXISTS hll_out")
      }
    }
  }

  test("hll re-delivery is a no-op; the emission log estimates directly") {
    implicit val sqlCtx = spark.sqlContext
    val rows = Seq.tabulate(1200)(i => ("g", s"u${i % 400}"))
    val ms = MemoryStream[(String, String)]
    val q = StreamingSketch.hllStream(
        ms.toDF().toDF("group", "value"), p = 8)
      .writeStream.format("memory").queryName("hll_dup")
      .outputMode("update").start()
    try {
      ms.addData(rows.take(700): _*); q.processAllAvailable()
      ms.addData(rows.drop(700): _*); q.processAllAvailable()
      val afterAll = spark.table("hll_dup").count()
      assert(afterAll > 0)
      ms.addData(rows: _*); q.processAllAvailable() // full replay: MAX no-op
      assert(spark.table("hll_dup").count() == afterAll,
        "a pure replay must emit nothing (idempotent MAX)")
      // the raw emission log (stale lower-rank rows included) estimates
      // exactly like the batch sketch: hllEstimate max-compacts itself
      val log = spark.table("hll_dup")
        .select(col("group").as("g"), col("reg"),
          col("max_rank").cast("int").as("max_rank"))
      val fromLog = Sketches.hllEstimate(log, Seq("g"), 8)
        .select("n_regs", "sum_scaled", "hll_est").as[(Long, Long, Long)].head()
      val fromBatch = Sketches.hllEstimate(
          Sketches.hllRegisters(rows.toDF("g", "value"), Seq("g"),
            col("value"), 8), Seq("g"), 8)
        .select("n_regs", "sum_scaled", "hll_est").as[(Long, Long, Long)].head()
      assert(fromLog == fromBatch)
    } finally {
      q.stop()
      spark.sql("DROP TABLE IF EXISTS hll_dup")
    }
  }

  test("duplicate re-delivery does not move the estimate") {
    implicit val sqlCtx = spark.sqlContext
    val rows = Seq.tabulate(500)(i => ("g", (i % 200).toLong))
    val ms = MemoryStream[(String, Long)]
    val q = StreamingSketch.kmvDistinctStream(
        ms.toDF().toDF("group", "value"), k)
      .writeStream.format("memory").queryName("kmv_dup")
      .outputMode("update").start()
    try {
      ms.addData(rows: _*); q.processAllAvailable()
      ms.addData(rows: _*); q.processAllAvailable() // full replay
      val ests = spark.table("kmv_dup").select("est_distinct")
        .as[Long].collect().distinct
      assert(ests.length == 1, s"estimate moved on replay: ${ests.toSeq}")
      assert(ests.head == batchSketch(rows)("g")._3)
    } finally {
      q.stop()
      spark.sql("DROP TABLE IF EXISTS kmv_dup")
    }
  }
}
