package graft.streaming

import graft.SparkSpec
import graft.dsl.{CorpusFixtures, PatternConfig, TspEngine}
import graft.operators.PatternOps
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._

/** Golden-corpus STREAMING replay — the reference's Kafka corpus case
  * (reference: integration/correctness/.../SimpleCasesTest.scala:447-613
  * drives the same fixtures through a Kafka source) re-expressed over a
  * MemoryStream: every wide-table corpus pattern runs through
  * `TspEngine.incidentsStream` fed the fixture rows in event-time order
  * across several micro-batches, and must emit EXACTLY the incidents the
  * batch engine computes on the same frame — and the batch engine is
  * itself locked to the golden fixture counts/timestamps by
  * CorpusWideSpec / CorpusIvolgaWideSpec, so transitively the stream
  * replays the golden expectations.
  *
  * The narrow-table corpus groups stream through their own replay suite
  * ([[CorpusNarrowStreamSpec]]): the unfold accumulator runs INSIDE the
  * evaluator's state (`TspEngine.incidentsStreamNarrow`), so the narrow
  * cases exercise the streaming pivot+fill, not just the batch
  * transformer.
  *
  * Rows travel as JSON (`toJSON` -> MemoryStream[String] -> `from_json`
  * with the frame's schema), so one helper replays any corpus shape
  * without a per-schema tuple encoder. Two far-future dummy-key batches
  * push the watermark past everything so pending state flushes (the second
  * fires the timeouts the first registered).
  */
class CorpusStreamSpec extends SparkSpec {

  import spark.implicits._

  /** Patterns the streaming evaluator rejects by contract (a
    * forward-looking operator under a *scalar* operator re-enters value
    * arithmetic — the reference's type system rejects those too). Asserted
    * exactly: a new member or a lost member both fail the suite.
    */
  private val expectedUnsupported: Set[(String, Int)] = Set.empty

  private def replayCase(group: String, frame: DataFrame, keys: Seq[String],
                         cfg: PatternConfig, id: Int, pattern: String): Unit = {
    implicit val sqlCtx = spark.sqlContext
    val schema = frame.schema
    val rows = frame.orderBy("ts").toJSON.collect()
    val flushKeys = keys.map(k => s""""$k":"zz"""").mkString(",")
    def flush(ts: String) = s"""{$flushKeys,"ts":"$ts"}"""

    val ms = MemoryStream[String]
    val src = ms.toDF()
      .select(from_json(col("value"), schema).as("r"))
      .select("r.*")
      .withWatermark("ts", "5 seconds")

    val streamedEither =
      try Right(TspEngine.incidentsStream(src, pattern, cfg))
      catch { case e: graft.dsl.Parser.ParseError => Left(e) }

    streamedEither match {
      case Left(err) =>
        assert(expectedUnsupported.contains((group, id)),
          s"case $group/$id <$pattern> unexpectedly unsupported: ${err.getMessage}")
      case Right(inc) =>
        assert(!expectedUnsupported.contains((group, id)),
          s"case $group/$id is marked unsupported but compiled")
        val name = s"corpus_stream_${group}_$id"
        val query = inc.writeStream.format("memory").queryName(name)
          .outputMode("append").start()
        try {
          rows.grouped(rows.length / 3 + 1).foreach { chunk =>
            ms.addData(chunk.toIndexedSeq: _*)
            query.processAllAvailable()
          }
          ms.addData(flush("2100-01-01T00:00:00.000Z")); query.processAllAvailable()
          ms.addData(flush("2101-01-01T00:00:00.000Z")); query.processAllAvailable()
          assert(query.exception.isEmpty,
            s"case $group/$id <$pattern> failed: ${query.exception}")

          val streamed = spark.table(name)
            .filter(col("key") =!= keys.map(_ => "zz").mkString("|"))
            .select("key", "fromMs", "toMs", "nEvents")
            .as[(String, Long, Long, Long)].collect().toSet

          val batch = TspEngine.incidents(frame, pattern, cfg)
            .select(concat_ws("|", keys.map(col): _*), col("from_ms"),
              col("to_ms"), col("n_events"))
            .as[(String, Long, Long, Long)].collect().toSet

          assert(streamed == batch,
            s"case $group/$id <$pattern>: missing=${(batch -- streamed).take(4)}, " +
              s"extra=${(streamed -- batch).take(4)}")
        } finally {
          query.stop()
          spark.catalog.dropTempView(name)
        }
    }
  }

  // ---------------------------------------------------------------- core

  private lazy val wideCfg = PatternConfig(
    keys = Seq("loco_num", "section", "upload_id"), tsCol = "ts",
    eventsMaxGapMs = 60000L, sessionGapMs = 1000L)

  private lazy val wideFrame: DataFrame = {
    val path = CorpusFixtures.tableResource("cases-wide-new.csv")
    val raw = spark.read.option("header", "true").option("nullValue", "\\N").csv(path)
    raw
      .withColumn("ts", timestamp_seconds(col("ts").cast("long")))
      .withColumn("POilDieselOut", col("POilDieselOut").cast("float").cast("double"))
      .withColumn("SpeedThrustMin", col("SpeedThrustMin").cast("float").cast("double"))
      .withColumn("PowerPolling", col("PowerPolling").cast("float").cast("double"))
      .cache()
  }

  CorpusFixtures.patterns("core").foreach { c =>
    test(s"stream replay, core case ${c.id}: ${c.sourceCode.take(60)}") {
      replayCase("core", wideFrame, wideCfg.keys, wideCfg, c.id, c.sourceCode)
    }
  }

  // -------------------------------------------------------------- ivolga

  private val ivolgaNumeric = Seq(
    "car_2_TCU_out_E_Bog", "car_2_BCU_out_Indirect_Brake_Active",
    "car_4_TCU_out_E_Bog", "car_4_BCU_out_Indirect_Brake_Active",
    "PSN_1_HV_OUTPUT_VOLTAGE", "PSN_1_is_working", "PSN_1_HV_INPUT_VOLTAGE",
    "PSN_1_CHARGER_CHARGER_CURRENT", "ABKM_Brake_Pos", "ABKM_Brake_Fail")

  private lazy val ivolgaCfg = PatternConfig(
    keys = Seq("stock_num", "upload_id"), tsCol = "ts",
    eventsMaxGapMs = 60000L, sessionGapMs = 1000L)

  private lazy val ivolgaFrame: DataFrame = {
    val path = CorpusFixtures.tableResource("cases-wide-ivolga.csv")
    val raw0 = spark.read.option("header", "true").option("nullValue", "\\N").csv(path)
    val raw = raw0.columns.foldLeft(raw0)((d, c) => d.withColumnRenamed(c, c.trim))
    val typed = ivolgaNumeric.foldLeft(
      raw.withColumn("ts", timestamp_seconds(col("ts").cast("double").cast("long")))
    )((d, c) => d.withColumn(c, col(c).cast("float").cast("double")))
      .withColumn("SOC_2_UKV1_UOVS", coalesce(col("SOC_2_UKV1_UOVS"), lit("")))
    PatternOps.forwardFill(typed, Seq("stock_num", "upload_id"), "ts",
      ivolgaNumeric, timeoutMs = Some(15000L))
      .cache()
  }

  CorpusFixtures.patterns("ivolga").foreach { c =>
    test(s"stream replay, ivolga case ${c.id}: ${c.sourceCode.take(60)}") {
      replayCase("ivolga", ivolgaFrame, ivolgaCfg.keys, ivolgaCfg, c.id, c.sourceCode)
    }
  }
}
