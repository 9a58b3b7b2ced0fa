package graft.io

import graft.SparkSpec
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._

import java.util.concurrent.atomic.AtomicBoolean

/** The idempotent streaming JDBC sink: a micro-batch replayed after a
  * failure BETWEEN the sink write and the checkpoint commit (Spark
  * re-runs the batch under the same batchId) must overwrite its own
  * earlier rows, never append a duplicate copy. The failure is forced
  * for real: the foreachBatch hook writes, then throws once, the query
  * dies, and a restart from the checkpoint replays the batch.
  */
class IdempotentSinkSpec extends SparkSpec {

  import spark.implicits._

  private val url = "jdbc:derby:memory:graftsink;create=true"
  private val driver = "org.apache.derby.iapi.jdbc.AutoloadedDriver"

  private def readBack(table: String): Seq[(Long, Double)] =
    spark.read.format("jdbc")
      .option("url", url).option("dbtable", table).option("driver", driver)
      .load()
      .select(col("event_id").cast("long"), col("value").cast("double"))
      .as[(Long, Double)].collect().toSeq.sorted

  /** Stream 2 chunks through foreachBatch with `write`; the hook throws
    * once right after writing the second chunk's batch, the query is
    * restarted from the checkpoint, and the batch replays. Returns what
    * landed in the sink.
    */
  private def runWithForcedReplay(table: String,
      write: (DataFrame, Long) => Unit): Seq[(Long, Double)] = {
    implicit val sqlCtx = spark.sqlContext
    val ckpt = java.nio.file.Files.createTempDirectory("sink-ckpt").toString
    val failOnce = new AtomicBoolean(true)
    val ms = MemoryStream[(Long, Double)]
    def start() = ms.toDF().toDF("event_id", "value")
      .writeStream
      .foreachBatch { (df: DataFrame, batchId: Long) =>
        write(df, batchId)
        // die AFTER the sink write, BEFORE Spark commits the batch to the
        // checkpoint — the exact at-least-once window
        if (batchId >= 1 && failOnce.getAndSet(false))
          throw new RuntimeException("forced post-write pre-commit failure")
      }
      .option("checkpointLocation", ckpt)
      .start()

    val q1 = start()
    ms.addData((1L, 1.5), (2L, 2.5))
    q1.processAllAvailable()
    ms.addData((3L, 3.5), (4L, 4.5))
    // the second batch's write lands, then the hook throws: the query
    // fails with the checkpoint still pointing at batch 1
    intercept[Exception] { q1.processAllAvailable() }
    q1.stop()
    val q2 = start() // replays batch 1 under the SAME batchId
    q2.processAllAvailable()
    q2.stop()
    readBack(table)
  }

  test("writeJdbcBatch: a forced micro-batch replay does not duplicate rows") {
    val conf = JdbcSinkConf("sink_idem", RowSchema(Map.empty), url, driver)
    val got = runWithForcedReplay("sink_idem",
      (df, bid) => Sinks.writeJdbcBatch(df, conf, jobId = "jobA", batchId = bid))
    assert(got == Seq((1L, 1.5), (2L, 2.5), (3L, 3.5), (4L, 4.5)),
      s"replay must overwrite, not duplicate: $got")
  }

  test("plain writeJdbc under the same forced replay DOES duplicate (the gap being closed)") {
    val conf = JdbcSinkConf("sink_atleast", RowSchema(Map.empty), url, driver)
    val got = runWithForcedReplay("sink_atleast",
      (df, _) => Sinks.writeJdbc(df, conf))
    assert(got == Seq((1L, 1.5), (2L, 2.5), (3L, 3.5), (3L, 3.5), (4L, 4.5), (4L, 4.5)),
      s"the at-least-once control must show the duplicate: $got")
  }

  test("writeJdbcBatch scopes the overwrite to its own (job, batch) tag") {
    val conf = JdbcSinkConf("sink_scope", RowSchema(Map.empty), url, driver)
    val b0 = Seq((1L, 1.5)).toDF("event_id", "value")
    val b1 = Seq((2L, 2.5)).toDF("event_id", "value")
    Sinks.writeJdbcBatch(b0, conf, "jobA", 0L)
    Sinks.writeJdbcBatch(b1, conf, "jobA", 1L)
    Sinks.writeJdbcBatch(b0, conf, "jobB", 0L) // another job, same batch id
    // replay jobA/0 with different content: only jobA/0's rows are replaced
    Sinks.writeJdbcBatch(Seq((9L, 9.5)).toDF("event_id", "value"), conf, "jobA", 0L)
    assert(readBack("sink_scope") == Seq((1L, 1.5), (2L, 2.5), (9L, 9.5)))
  }
}
