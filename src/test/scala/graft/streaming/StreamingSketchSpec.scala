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
