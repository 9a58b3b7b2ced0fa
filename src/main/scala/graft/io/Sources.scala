package graft.io

import graft.operators.PatternOps
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{DataType, StructField, StructType}

/** Source configuration — the Spark analogue of the reference's input confs
  * (reference: streaming/.../io/JDBCInputConf.scala:24-49,
  * KafkaInputConf.scala:6-28, SourceDataTransformation.scala:9-24).
  *
  * A config fully describes how to obtain the *event frame*: connection,
  * time column (numeric-seconds x multiplier -> timestamp), partition
  * fields, and an optional narrow-unfolding / wide-filling transformation.
  */
sealed trait SourceConf {
  def datetimeField: String

  /** Numeric time values are multiplied by this to get epoch millis
    * (reference default 1000.0: seconds -> millis, JDBCInputConf.scala:43).
    */
  def timestampMultiplier: Double
  def partitionFields: Seq[String]
  def unitIdField: Option[String]
  def eventsMaxGapMs: Long
  def defaultEventsGapMs: Long
  def dataTransformation: Option[SourceTransformation]
}

sealed trait SourceTransformation

/** Narrow (key-value) rows pivoted to wide with timed forward-fill
  * (reference: SourceDataTransformation.scala:9-18).
  */
final case class NarrowDataUnfolding(
  keyColumn: String,
  defaultValueColumn: String,
  sensors: Seq[String],
  valueColumnMapping: Map[String, String] = Map.empty,
  defaultTimeoutMs: Option[Long] = None
) extends SourceTransformation

/** Sparse wide rows forward-filled with timeout
  * (reference: SourceDataTransformation.scala:20-24).
  */
final case class WideDataFilling(
  fillColumns: Seq[String],
  defaultTimeoutMs: Option[Long] = None
) extends SourceTransformation

/** JDBC batch source: arbitrary SQL pushed to the database
  * (reference: JDBCInputConf + JdbcSource, StreamSource.scala:136-315).
  *
  * `parallelism` + `splitColumn` enable a PARTITIONED read — `parallelism`
  * concurrent range-split scans of the query instead of one task reading
  * everything (the reference streams a single doobie cursor; at cluster
  * scale a single reader is the ingest bottleneck). Split bounds come from
  * `splitLower`/`splitUpper`, or are probed with one min/max round trip
  * when absent. The split column must be numeric (the usual id or epoch
  * column).
  */
final case class JdbcSourceConf(
  jdbcUrl: String,
  query: String,
  driverName: String,
  datetimeField: String,
  userName: Option[String] = None,
  password: Option[String] = None,
  timestampMultiplier: Double = 1000.0,
  partitionFields: Seq[String] = Nil,
  unitIdField: Option[String] = None,
  eventsMaxGapMs: Long = 60000L,
  defaultEventsGapMs: Long = 2000L,
  dataTransformation: Option[SourceTransformation] = None,
  parallelism: Option[Int] = None,
  splitColumn: Option[String] = None,
  splitLower: Option[Long] = None,
  splitUpper: Option[Long] = None
) extends SourceConf

/** Kafka JSON source (reference: KafkaInputConf.scala:6-28: user-declared
  * field types because there is no schema registry).
  * Note: needs the spark-sql-kafka connector on the classpath at runtime;
  * the declared `fieldsTypes` drive `from_json` exactly like the
  * reference's deserializer (serialization/Deserializer.scala:1-38).
  */
final case class KafkaSourceConf(
  brokers: String,
  topic: String,
  datetimeField: String,
  fieldsTypes: Map[String, String],
  /** Explicit consumer group. Leave unset in normal use: Structured
    * Streaming wants a unique group per query (it manages offsets itself),
    * and the reference likewise defaults to a fresh random UUID group per
    * job (KafkaService.scala:32-36) — a shared static group would make two
    * concurrent jobs interfere broker-side.
    */
  group: Option[String] = None,
  /** "earliest", "latest", or a per-partition offset JSON — passed through
    * to the connector's `startingOffsets`. Defaults to "earliest" to match
    * the reference: it pairs `auto.offset.reset=earliest` with a fresh
    * random group (KafkaService.scala:34), so a new reference job replays
    * the topic from the start.
    */
  startingOffsets: String = "earliest",
  timestampMultiplier: Double = 1000.0,
  partitionFields: Seq[String] = Nil,
  unitIdField: Option[String] = None,
  eventsMaxGapMs: Long = 60000L,
  defaultEventsGapMs: Long = 2000L,
  dataTransformation: Option[SourceTransformation] = None
) extends SourceConf {
  def schema: StructType = StructType(fieldsTypes.toSeq.map { case (n, t) =>
    StructField(n, DataType.fromDDL(astTypeToDdl(t)))
  })
  private def astTypeToDdl(t: String): String = t.toLowerCase match {
    case "int8"            => "tinyint"
    case "int16"           => "smallint"
    case "int32"           => "int"
    case "int64"           => "bigint"
    case "float32"         => "float"
    case "float64"         => "double"
    case "boolean"         => "boolean"
    case "string"          => "string"
    case other             => other
  }
}

object Sources {

  /** The one-row min/max bounds-probe SQL a partitioned read issues when
    * the caller gave no explicit split bounds. The split column is quoted
    * by the url's JDBC dialect (the sink writes quoted, hence
    * case-sensitive, identifiers; Spark quotes `partitionColumn` itself
    * for the range scans): PostgreSQL and ClickHouse urls get ANSI double
    * quotes (ClickHouse has no Spark dialect, and the default dialect's
    * double-quoting is exactly ClickHouse's ANSI identifier syntax), MySQL
    * gets backticks. Factored out so the per-dialect SQL text is
    * unit-testable without a server — see `IoSpec`.
    */
  def boundsProbeSql(jdbcUrl: String, query: String, split: String): String = {
    val q = org.apache.spark.sql.jdbc.JdbcDialects.get(jdbcUrl)
      .quoteIdentifier(split)
    s"SELECT MIN($q) AS mn, MAX($q) AS mx FROM ($query) AS graft_probe"
  }

  /** Read a source conf into the canonical event frame: all configured
    * transformations applied, `ts` as a TimestampType column.
    */
  def read(spark: SparkSession, conf: SourceConf): DataFrame = conf match {
    case c: JdbcSourceConf =>
      def reader = {
        var r = spark.read.format("jdbc")
          .option("url", c.jdbcUrl)
          .option("driver", c.driverName)
        c.userName.foreach(u => r = r.option("user", u))
        c.password.foreach(p => r = r.option("password", p))
        r
      }
      val frame = (c.parallelism, c.splitColumn) match {
        case (Some(n), Some(split)) if n > 1 =>
          // Spark's jdbc partitioning wants `dbtable` (a subquery alias it
          // can wrap with range predicates), not `query`
          val table = s"(${c.query}) graft_src"
          val (lo, hi) = (c.splitLower, c.splitUpper) match {
            case (Some(l), Some(u)) => (l, u)
            case _ =>
              // one-row bounds probe; pennies next to the partitioned scan
              // it unlocks
              val b = reader
                .option("query", boundsProbeSql(c.jdbcUrl, c.query, split))
                .load().head()
              if (b.isNullAt(0)) (0L, 0L)
              else (b.getAs[Number](0).longValue(), b.getAs[Number](1).longValue())
          }
          if (lo >= hi) reader.option("query", c.query).load()
          else reader
            .option("dbtable", table)
            .option("partitionColumn", split)
            .option("lowerBound", lo)
            .option("upperBound", hi)
            .option("numPartitions", n)
            .load()
        case _ => reader.option("query", c.query).load()
      }
      finish(frame, c)
    case c: KafkaSourceConf =>
      val reader0 = spark.readStream.format("kafka")
        .option("kafka.bootstrap.servers", c.brokers)
        .option("subscribe", c.topic)
        .option("startingOffsets", c.startingOffsets)
      // only pin a group when the caller asked for one — the connector
      // otherwise generates a unique group per query, which is what
      // Structured Streaming's own offset tracking expects
      val raw = c.group.fold(reader0)(g => reader0.option("kafka.group.id", g))
        .load()
      finish(parseKafkaJson(raw, c.schema), c)
  }

  /** JSON value bytes -> typed columns (shared by batch tests and the real
    * stream path).
    */
  def parseKafkaJson(raw: DataFrame, schema: StructType): DataFrame =
    raw.select(from_json(col("value").cast("string"), schema).as("j"))
      .select(col("j.*"))

  /** Everything [[read]] wires AFTER the broker read, over any
    * `value`-bearing frame: declared-schema JSON parse -> time
    * normalization / transformation -> watermark. Factored out so the whole
    * Kafka event path is drivable from a MemoryStream (no broker ships in
    * this environment); the real `read(KafkaSourceConf)` differs only in
    * the source operator.
    */
  def kafkaEvents(raw: DataFrame, conf: KafkaSourceConf,
                  watermark: String): DataFrame =
    finish(parseKafkaJson(raw, conf.schema), conf).withWatermark("ts", watermark)

  /** Time normalization + optional narrow/wide transformation. */
  def finish(df: DataFrame, conf: SourceConf): DataFrame = {
    val tsMs = (col(conf.datetimeField).cast("double") * conf.timestampMultiplier)
      .cast("long")
    val timed = df.withColumn("ts", timestamp_millis(tsMs))
    conf.dataTransformation match {
      case None => timed
      case Some(w: WideDataFilling) =>
        PatternOps.forwardFill(timed, conf.partitionFields, "ts",
          w.fillColumns, w.defaultTimeoutMs)
      case Some(n: NarrowDataUnfolding) =>
        PatternOps.unfoldNarrow(timed, conf.partitionFields, "ts",
          n.keyColumn, n.defaultValueColumn, n.sensors, n.valueColumnMapping,
          n.defaultTimeoutMs)
    }
  }
}
