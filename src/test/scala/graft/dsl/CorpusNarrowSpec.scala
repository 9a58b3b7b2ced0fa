package graft.dsl

import graft.SparkSpec
import graft.operators.PatternOps
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Golden corpus, narrow (key-value) table: the same 27 core patterns over
  * `math_test`-shaped data routed through NarrowDataUnfolding — pivot +
  * timed forward-fill (reference: SimpleCasesTest.scala:203-208 narrow conf:
  * NarrowDataUnfolding(sensor_id, value_float, timeout 1000), assertions
  * "Cases 1-17, 43-53 should work in narrow table").
  *
  * Expected incidents are identical to the wide table — the transformer must
  * reconstruct the same wide frame.
  */
class CorpusNarrowSpec extends SparkSpec {

  private val sensors = Seq("POilDieselOut", "SpeedThrustMin", "PowerPolling")

  private lazy val cfg = PatternConfig(
    keys = Seq("loco_num", "section", "upload_id"),
    tsCol = "ts",
    eventsMaxGapMs = 60000L,
    sessionGapMs = 1000L
  )

  private lazy val unfolded: DataFrame = {
    val path = CorpusFixtures.tableResource("cases-narrow-new.csv")
    val raw = spark.read
      .option("header", "true")
      .option("nullValue", "\\N")
      .csv(path)
      .withColumn("ts", timestamp_seconds(col("dt").cast("double").cast("long")))
      .withColumn("value_float", col("value_float").cast("float").cast("double"))
    val wide = PatternOps.unfoldNarrow(
      raw,
      keys = Seq("loco_num", "section", "upload_id"),
      tsCol = "ts",
      sensorCol = "sensor_id",
      defaultValueCol = "value_float",
      sensors = sensors,
      timeoutMs = Some(1000L))
    wide.cache()
  }

  private def run(sourceCode: String): Seq[(Long, Long)] =
    TspEngine.incidents(unfolded, sourceCode, cfg)
      .select((col("from_ms") / 1000).cast("long"), (col("to_ms") / 1000).cast("long"))
      .collect()
      .map(r => (r.getLong(0), r.getLong(1)))
      .sorted
      .toSeq

  private lazy val patterns = CorpusFixtures.patterns("core").map(c => c.id -> c.sourceCode).toMap
  private lazy val counts = CorpusFixtures.expectedCounts("core")
  private lazy val stamps = CorpusFixtures.expectedTimestamps("core")

  /** Hand-traced expectations where the fixture is stale (as in
    * CorpusWideSpec) or where the narrow fixture *data* drifted from the wide
    * table: cases-narrow-new.csv has POilDieselOut = 4.0 at both 1553545425
    * and ...426 (wide: 4.01/4.0) and SpeedThrustMin = 12 through ...428
    * (wide: 11 at 427-428), which legitimately changes cases 50-52's tails
    * and leaves 51 with no `SpeedThrustMin = 11` match at all.
    */
  private val knownDivergent: Map[Int, Seq[(Long, Long)]] = Map(
    // same trace as CorpusWideSpec case 46: WaitAccumState's span guard
    // fails and waitStart falls back to the previous run's last event 404
    46 -> Seq((1553545404L, 1553545405L), (1553545420L, 1553545423L)),
    47 -> Seq((1553545405L, 1553545410L)),
    48 -> Seq((1553545410L, 1553545416L)),
    50 -> Seq((1553545423L, 1553545428L)),
    51 -> Seq.empty,
    52 -> Seq((1553545421L, 1553545428L))
  )

  CorpusFixtures.patterns("core").foreach { c =>
    test(s"narrow case ${c.id}: ${c.sourceCode.take(70)}") {
      val got = run(patterns(c.id))
      val expected = knownDivergent.getOrElse(c.id, stamps(c.id))
      val expectedCount = knownDivergent.get(c.id).map(_.length).getOrElse(counts(c.id))
      assert(got.length == expectedCount,
        s"case ${c.id}: expected $expectedCount incidents, got ${got.length}: $got")
      assert(got == expected.sorted, s"case ${c.id}: expected $expected, got $got")
    }
  }
}
