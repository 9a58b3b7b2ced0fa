package graft.streaming

import graft.SparkSpec
import graft.dsl.{CorpusFixtures, PatternConfig, TspEngine}
import graft.operators.PatternOps
import graft.streaming.StreamingUnfold.NarrowStreamConfig
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._

/** Golden-corpus streaming replay over the NARROW (key-value) tables —
  * the reference's Kafka narrow corpus cases (SimpleCasesTest narrow
  * confs run NarrowDataUnfolding inside the stream): every pattern runs
  * through `TspEngine.incidentsStreamNarrow`, whose in-state unfold
  * accumulator must synthesize exactly the wide frame the batch
  * `unfoldNarrow` (pivot + timed fill, locked to the golden fixtures by
  * CorpusNarrowSpec / the ivolga narrow suite) produces — so streamed
  * incidents must equal the batch engine's on the batch-unfolded frame.
  *
  * Micro-batch boundaries align with event-time ticks (a same-ts sensor
  * group never splits across batches): the accumulator merges same-ts
  * rows into ONE wide evaluation point like the batch pivot, so a split
  * group would re-emit the point at that ts with the fuller values — a
  * documented delivery-shape boundary, not an engine divergence.
  */
class CorpusNarrowStreamSpec extends SparkSpec
    with org.scalatest.BeforeAndAfterAll {

  /** Override to re-run under another state store (RocksDB variant). */
  protected def stateStoreProvider: Option[String] = None

  /** Override to restrict the replayed cases (the RocksDB variant runs a
    * representative subset — the encoder round-trip is per-state-class,
    * not per-case).
    */
  protected def caseFilter: (String, Int) => Boolean = (_, _) => true

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

  private def replayNarrow(group: String, raw: DataFrame, keys: Seq[String],
                           cfg: PatternConfig, narrow: NarrowStreamConfig,
                           sensors: Seq[String], batchWide: DataFrame,
                           id: Int, pattern: String,
                           splitAt: Long => Boolean = _ => false): Unit = {
    implicit val sqlCtx = spark.sqlContext
    val schema = raw.schema
    // chunk on ts boundaries: ~3 batches by default (or wherever `splitAt`
    // says — the fuzz test derives random boundaries), never splitting a
    // ts group
    val collected = raw.orderBy("ts")
      .select(to_json(struct(raw.columns.map(col): _*)).as("j"),
        col("ts").cast("long").as("t"))
      .collect().map(r => (r.getString(0), r.getLong(1)))
    val target = collected.length / 3 + 1
    val chunks = scala.collection.mutable.ArrayBuffer(
      scala.collection.mutable.ArrayBuffer.empty[String])
    collected.zipWithIndex.foreach { case ((j, t), i) =>
      val tsBoundary = i > 0 && collected(i - 1)._2 != t
      if (tsBoundary && (chunks.last.length >= target || splitAt(t)))
        chunks += scala.collection.mutable.ArrayBuffer.empty[String]
      chunks.last += j
    }
    val flushKeys = keys.map(k => s""""$k":"zz"""").mkString(",")
    def flush(ts: String) =
      s"""{$flushKeys,"${narrow.sensorCol}":"zzsensor","ts":"$ts"}"""

    val ms = MemoryStream[String]
    val src = ms.toDF()
      .select(from_json(col("value"), schema).as("r"))
      .select("r.*")
      .withWatermark("ts", "5 seconds")

    val inc = TspEngine.incidentsStreamNarrow(src, pattern, cfg, narrow, sensors)
    val name = s"corpus_nstream_${group}_$id"
    val query = inc.writeStream.format("memory").queryName(name)
      .outputMode("append").start()
    try {
      chunks.foreach { chunk =>
        ms.addData(chunk.toIndexedSeq: _*)
        query.processAllAvailable()
      }
      ms.addData(flush("2100-01-01T00:00:00.000Z")); query.processAllAvailable()
      ms.addData(flush("2101-01-01T00:00:00.000Z")); query.processAllAvailable()
      assert(query.exception.isEmpty,
        s"case $group/$id <$pattern> failed: ${query.exception}")

      val streamed = spark.table(name)
        .select("key", "fromMs", "toMs", "nEvents")
        .as[(String, Long, Long, Long)].collect().toSet

      val batch = TspEngine.incidents(batchWide, pattern, cfg)
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

  // ---------------------------------------------------------------- core

  private val coreSensors = Seq("POilDieselOut", "SpeedThrustMin", "PowerPolling")

  private lazy val coreCfg = PatternConfig(
    keys = Seq("loco_num", "section", "upload_id"), tsCol = "ts",
    eventsMaxGapMs = 60000L, sessionGapMs = 1000L)

  private val coreNarrow = NarrowStreamConfig(
    sensorCol = "sensor_id", defaultValueCol = "value_float",
    timeoutMs = Some(1000L))

  private lazy val coreRaw: DataFrame = {
    val path = CorpusFixtures.tableResource("cases-narrow-new.csv")
    spark.read.option("header", "true").option("nullValue", "\\N").csv(path)
      .withColumn("ts", timestamp_seconds(col("dt").cast("double").cast("long")))
      .withColumn("value_float", col("value_float").cast("float").cast("double"))
      .cache()
  }

  private lazy val coreWide: DataFrame =
    PatternOps.unfoldNarrow(coreRaw, coreCfg.keys, "ts", "sensor_id",
      "value_float", coreSensors, timeoutMs = Some(1000L)).cache()

  CorpusFixtures.patterns("core").filter(c => caseFilter("core", c.id)).foreach { c =>
    test(s"narrow stream replay, core case ${c.id}: ${c.sourceCode.take(60)}") {
      replayNarrow("core", coreRaw, coreCfg.keys, coreCfg, coreNarrow,
        coreSensors, coreWide, c.id, c.sourceCode)
    }
  }

  // -------------------------------------------------------------- ivolga

  private val ivolgaNumeric = Seq(
    "car_2_TCU_out_E_Bog", "car_2_BCU_out_Indirect_Brake_Active",
    "car_4_TCU_out_E_Bog", "car_4_BCU_out_Indirect_Brake_Active",
    "PSN_1_HV_OUTPUT_VOLTAGE", "PSN_1_is_working", "PSN_1_HV_INPUT_VOLTAGE",
    "PSN_1_CHARGER_CHARGER_CURRENT", "ABKM_Brake_Pos", "ABKM_Brake_Fail")
  private val ivolgaString = Seq("SOC_2_UKV1_UOVS")

  private lazy val ivolgaCfg = PatternConfig(
    keys = Seq("stock_num", "upload_id"), tsCol = "ts",
    eventsMaxGapMs = 60000L, sessionGapMs = 1000L)

  private val ivolgaNarrow = NarrowStreamConfig(
    sensorCol = "sensor_id", defaultValueCol = "value_float",
    valueColumnMapping = Map("SOC_2_UKV1_UOVS" -> "value_str"),
    timeoutMs = Some(15000L))

  private lazy val ivolgaRaw: DataFrame = {
    val path = CorpusFixtures.tableResource("cases-narrow-ivolga.csv")
    spark.read.option("header", "true").option("nullValue", "\\N").csv(path)
      .withColumn("ts", timestamp_seconds(col("dt").cast("double").cast("long")))
      .withColumn("value_float", col("value_float").cast("float").cast("double"))
      .cache()
  }

  private lazy val ivolgaWide: DataFrame =
    PatternOps.unfoldNarrow(ivolgaRaw, ivolgaCfg.keys, "ts", "sensor_id",
      "value_float", ivolgaNumeric ++ ivolgaString,
      valueColumnMapping = Map("SOC_2_UKV1_UOVS" -> "value_str"),
      timeoutMs = Some(15000L)).cache()

  CorpusFixtures.patterns("ivolga").filter(c => caseFilter("ivolga", c.id)).foreach { c =>
    test(s"narrow stream replay, ivolga case ${c.id}: ${c.sourceCode.take(60)}") {
      replayNarrow("ivolga", ivolgaRaw, ivolgaCfg.keys, ivolgaCfg, ivolgaNarrow,
        ivolgaNumeric ++ ivolgaString, ivolgaWide, c.id, c.sourceCode)
    }
  }

  if (caseFilter("fuzz", 0)) {
    test("narrow replay is chunk-boundary invariant (random ts-aligned micro-batches)") {
      // micro-batch boundaries must not change results as long as they
      // align with event-time ticks; fuzz random boundary sets over
      // representative shapes (timer, lag/string, andThen)
      val rnd = new scala.util.Random(23)
      val cases = Seq(
        ("core", 8, CorpusFixtures.patterns("core").find(_.id == 8).get.sourceCode),
        ("core", 50, CorpusFixtures.patterns("core").find(_.id == 50).get.sourceCode),
        ("ivolga", 40, CorpusFixtures.patterns("ivolga").find(_.id == 40).get.sourceCode))
      (1 to 3).foreach { trial =>
        cases.foreach { case (group, id, pattern) =>
          val split: Long => Boolean = _ => rnd.nextDouble() < 0.3
          if (group == "core")
            replayNarrow("core", coreRaw, coreCfg.keys, coreCfg, coreNarrow,
              coreSensors, coreWide, id + trial * 1000, pattern, split)
          else
            replayNarrow("ivolga", ivolgaRaw, ivolgaCfg.keys, ivolgaCfg,
              ivolgaNarrow, ivolgaNumeric ++ ivolgaString, ivolgaWide,
              id + trial * 1000, pattern, split)
        }
      }
    }
  }
}

/** A representative slice of the narrow replay under RocksDB state
  * storage (see [[StreamingRocksDbSpec]]): one case per wrapped state
  * class — eval (core 2), chain (core 50), wait/tree (core 46, 48), and
  * the string-sensor accumulator entries (ivolga 40) — RocksDB
  * round-trips `NarrowState[S]` through UnsafeRow serialization on every
  * access, so a generic-encoder or null-handling gap surfaces here.
  */
class CorpusNarrowStreamRocksDbSpec extends CorpusNarrowStreamSpec {
  override protected def stateStoreProvider: Option[String] =
    Some("org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider")
  override protected def caseFilter: (String, Int) => Boolean = {
    case ("core", id)   => Set(2, 46, 48, 50)(id)
    case ("ivolga", id) => id == 40
    case _              => false
  }
}
