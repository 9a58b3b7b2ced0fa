package graft.streaming

import graft.SparkSpec
import graft.operators.Stats
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._

import scala.util.Random

/** Streaming bottom-k quantile sample: after any prefix of the stream, the
  * latest emitted quartet per group must equal the BATCH sampleQuantiles
  * over that prefix — regardless of chunking or duplicate re-delivery (the
  * survivor set is a pure function of the row set seen).
  */
class StreamingQuantileSpec extends SparkSpec
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

  private def batchQuartet(rows: Seq[(String, Long, Double)]) =
    Stats.sampleQuantiles(rows.toDF("group", "id", "value"), Seq("group"),
        col("id"), "value", Seq(25, 50, 90, 99), k)
      .select(col("group"), col("n_sample"),
        col("p25"), col("p50"), col("p90"), col("p99"))
      .as[(String, Long, Double, Double, Double, Double)].collect()
      .map(r => r._1 -> ((r._2, r._3, r._4, r._5, r._6))).toMap

  test("stream equals batch after every chunk, for several chunkings") {
    val rng = new Random(29)
    val rows = Seq.tabulate(3000) { i =>
      (s"g${rng.nextInt(3)}", i.toLong, rng.nextDouble() * 100)
    }
    implicit val sqlCtx = spark.sqlContext
    for (chunks <- Seq(1, 4, 11)) {
      val ms = MemoryStream[(String, Long, Double)]
      val q = StreamingQuantile.quantileStream(
          ms.toDF().toDF("group", "id", "value"), k)
        .writeStream.format("memory").queryName("q_out")
        .outputMode("update").start()
      try {
        var seen = Seq.empty[(String, Long, Double)]
        rows.grouped(rows.size / chunks + 1).foreach { chunk =>
          ms.addData(chunk: _*)
          q.processAllAvailable()
          seen ++= chunk
          val latest = spark.table("q_out")
            .withColumn("_i", monotonically_increasing_id())
            .orderBy(col("_i").desc).collect()
            .map(r => (r.getString(0), (r.getLong(1), r.getDouble(2),
              r.getDouble(3), r.getDouble(4), r.getDouble(5))))
            .groupBy(_._1).map { case (g, rs) => g -> rs.head._2 }
          assert(latest == batchQuartet(seen), s"chunks=$chunks after ${seen.size}")
        }
      } finally {
        q.stop()
        spark.sql("DROP TABLE IF EXISTS q_out")
      }
    }
  }

  test("duplicate re-delivery does not move the estimates") {
    implicit val sqlCtx = spark.sqlContext
    val rows = Seq.tabulate(400)(i => ("g", i.toLong, (i * 37 % 500).toDouble))
    val ms = MemoryStream[(String, Long, Double)]
    val q = StreamingQuantile.quantileStream(
        ms.toDF().toDF("group", "id", "value"), k)
      .writeStream.format("memory").queryName("q_dup")
      .outputMode("update").start()
    try {
      ms.addData(rows: _*); q.processAllAvailable()
      ms.addData(rows: _*); q.processAllAvailable() // full replay
      val quads = spark.table("q_dup")
        .select("p25", "p50", "p90", "p99")
        .as[(Double, Double, Double, Double)].collect().distinct
      assert(quads.length == 1, s"estimates moved on replay: ${quads.toSeq}")
      val want = batchQuartet(rows)("g")
      assert(quads.head == ((want._2, want._3, want._4, want._5)))
    } finally {
      q.stop()
      spark.sql("DROP TABLE IF EXISTS q_dup")
    }
  }

  test("sample state survives a query restart through the checkpoint") {
    implicit val sqlCtx = spark.sqlContext
    val rng = new Random(43)
    val rows = Seq.tabulate(1200) { i =>
      (s"g${i % 2}", i.toLong, rng.nextDouble() * 50)
    }
    val (firstHalf, secondHalf) = rows.splitAt(600)
    val want = batchQuartet(rows)

    val ckpt = java.nio.file.Files.createTempDirectory("q-ckpt").toString
    val outDir = java.nio.file.Files.createTempDirectory("q-out").toString
    val ms = MemoryStream[(String, Long, Double)]
    // update-mode emissions need an update-capable durable sink:
    // foreachBatch appends each micro-batch's rows (parquet itself only
    // accepts Append)
    def start() = StreamingQuantile.quantileStream(
        ms.toDF().toDF("group", "id", "value"), k)
      .writeStream
      .foreachBatch { (df: org.apache.spark.sql.Dataset[
          StreamingQuantile.QuantileEstimate], _: Long) =>
        df.write.mode("append").parquet(outDir)
      }
      .option("checkpointLocation", ckpt).outputMode("update").start()

    val q1 = start()
    ms.addData(firstHalf: _*); q1.processAllAvailable(); q1.stop()
    val q2 = start()
    ms.addData(secondHalf: _*); q2.processAllAvailable()
    try {
      // two batches → exactly two emissions per group: batch-over-half,
      // then batch-over-all. Lost survivor state across the restart would
      // make the second emission batch-over-SECOND-half instead.
      val wantHalf = batchQuartet(firstHalf)
      val got = spark.read.parquet(outDir)
        .select("group", "n_sample", "p25", "p50", "p90", "p99")
        .as[(String, Long, Double, Double, Double, Double)].collect()
        .groupBy(_._1).map { case (g, rs) =>
          g -> rs.map(r => (r._2, r._3, r._4, r._5, r._6)).toSet
        }
      want.keys.foreach { g =>
        assert(got(g) == Set(wantHalf(g), want(g)), s"group $g")
      }
    } finally q2.stop()
  }

  test("small groups are exact: the sample is the whole group") {
    implicit val sqlCtx = spark.sqlContext
    val rows = (1 to 20).map(i => ("g", i.toLong, i.toDouble))
    val ms = MemoryStream[(String, Long, Double)]
    val q = StreamingQuantile.quantileStream(
        ms.toDF().toDF("group", "id", "value"), k)
      .writeStream.format("memory").queryName("q_small")
      .outputMode("update").start()
    try {
      ms.addData(rows: _*); q.processAllAvailable()
      val (n, p25, p50, p90, p99) = spark.table("q_small")
        .select("n_sample", "p25", "p50", "p90", "p99")
        .as[(Long, Double, Double, Double, Double)].head()
      // exact percentile_disc over 1..20 under the ceil-rank convention
      assert((n, p25, p50, p90, p99) == ((20L, 5.0, 10.0, 18.0, 20.0)))
    } finally {
      q.stop()
      spark.sql("DROP TABLE IF EXISTS q_small")
    }
  }
}
