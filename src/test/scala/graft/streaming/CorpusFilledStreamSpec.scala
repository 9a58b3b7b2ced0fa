package graft.streaming

import graft.SparkSpec
import graft.dsl.{CorpusFixtures, PatternConfig, TspEngine}
import graft.operators.PatternOps
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._

/** Golden-corpus streaming replay with IN-STREAM WideDataFilling: the
  * ivolga wide table streams UNFILLED (sparse sensor cells) through
  * `TspEngine.incidentsStreamFilled`, whose in-state timed forward fill
  * must reproduce the batch `forwardFill` frame — so streamed incidents
  * must equal the batch engine's on the batch-filled frame (itself locked
  * to the golden fixtures by the ivolga wide suite). This closes the
  * fourth table shape in streaming: wide, narrow, unfolded, and now
  * filled all run through the evaluator end to end.
  */
class CorpusFilledStreamSpec extends SparkSpec {

  import spark.implicits._

  private val ivolgaNumeric = Seq(
    "car_2_TCU_out_E_Bog", "car_2_BCU_out_Indirect_Brake_Active",
    "car_4_TCU_out_E_Bog", "car_4_BCU_out_Indirect_Brake_Active",
    "PSN_1_HV_OUTPUT_VOLTAGE", "PSN_1_is_working", "PSN_1_HV_INPUT_VOLTAGE",
    "PSN_1_CHARGER_CHARGER_CURRENT", "ABKM_Brake_Pos", "ABKM_Brake_Fail")

  private lazy val cfg = PatternConfig(
    keys = Seq("stock_num", "upload_id"), tsCol = "ts",
    eventsMaxGapMs = 60000L, sessionGapMs = 1000L)

  /** Typed but UNFILLED — what a sparse wide feed delivers. */
  private lazy val sparseFrame: DataFrame = {
    val path = CorpusFixtures.tableResource("cases-wide-ivolga.csv")
    val raw0 = spark.read.option("header", "true").option("nullValue", "\\N").csv(path)
    val raw = raw0.columns.foldLeft(raw0)((d, c) => d.withColumnRenamed(c, c.trim))
    ivolgaNumeric.foldLeft(
      raw.withColumn("ts", timestamp_seconds(col("ts").cast("double").cast("long")))
    )((d, c) => d.withColumn(c, col(c).cast("float").cast("double")))
      .withColumn("SOC_2_UKV1_UOVS", coalesce(col("SOC_2_UKV1_UOVS"), lit("")))
      .cache()
  }

  private lazy val batchFilled: DataFrame =
    PatternOps.forwardFill(sparseFrame, cfg.keys, "ts", ivolgaNumeric,
      timeoutMs = Some(15000L)).cache()

  private def replayFilled(id: Int, pattern: String): Unit = {
    implicit val sqlCtx = spark.sqlContext
    val schema = sparseFrame.schema
    val rows = sparseFrame.orderBy("ts").toJSON.collect()
    val flushKeys = cfg.keys.map(k => s""""$k":"zz"""").mkString(",")
    def flush(ts: String) = s"""{$flushKeys,"ts":"$ts"}"""

    val ms = MemoryStream[String]
    val src = ms.toDF()
      .select(from_json(col("value"), schema).as("r")).select("r.*")
      .withWatermark("ts", "5 seconds")

    val inc = TspEngine.incidentsStreamFilled(src, pattern, cfg,
      ivolgaNumeric.toSet, timeoutMs = Some(15000L))
    val name = s"corpus_fstream_$id"
    val query = inc.writeStream.format("memory").queryName(name)
      .outputMode("append").start()
    try {
      rows.grouped(rows.length / 3 + 1).foreach { chunk =>
        ms.addData(chunk.toIndexedSeq: _*)
        query.processAllAvailable()
      }
      ms.addData(flush("2100-01-01T00:00:00.000Z")); query.processAllAvailable()
      ms.addData(flush("2101-01-01T00:00:00.000Z")); query.processAllAvailable()
      assert(query.exception.isEmpty, s"case $id <$pattern>: ${query.exception}")

      val streamed = spark.table(name)
        .filter(col("key") =!= cfg.keys.map(_ => "zz").mkString("|"))
        .select("key", "fromMs", "toMs", "nEvents")
        .as[(String, Long, Long, Long)].collect().toSet

      val batch = TspEngine.incidents(batchFilled, pattern, cfg)
        .select(concat_ws("|", cfg.keys.map(col): _*), col("from_ms"),
          col("to_ms"), col("n_events"))
        .as[(String, Long, Long, Long)].collect().toSet

      assert(streamed == batch,
        s"case $id <$pattern>: missing=${(batch -- streamed).take(4)}, " +
          s"extra=${(streamed -- batch).take(4)}")
    } finally {
      query.stop()
      spark.catalog.dropTempView(name)
    }
  }

  CorpusFixtures.patterns("ivolga").foreach { c =>
    test(s"filled stream replay, ivolga case ${c.id}: ${c.sourceCode.take(60)}") {
      replayFilled(c.id, c.sourceCode)
    }
  }
}
