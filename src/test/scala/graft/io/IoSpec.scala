package graft.io

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** JDBC round-trip against embedded Derby (the in-memory stand-in for the
  * reference's ClickHouse/PostgreSQL deployments) plus the $-macro sink
  * mapper.
  */
class IoSpec extends SparkSpec {

  import spark.implicits._

  private val url = "jdbc:derby:memory:graftdb;create=true"
  private val driver = "org.apache.derby.iapi.jdbc.AutoloadedDriver"

  test("sink mapper expands $-macros per the reference row schema") {
    val incidents = Seq(
      ("p1", 7, 1, java.sql.Timestamp.valueOf("2024-01-01 00:00:00"),
        java.sql.Timestamp.valueOf("2024-01-01 00:10:00"), Map("sev" -> "high"))
    ).toDF("pattern_id", "unit", "subunit", "seg_from", "seg_to", "meta")

    val schema = RowSchema(Map(
      "id" -> ColumnSpec("string", "$PatternID"),
      "series_storage" -> ColumnSpec("int32", "$Unit"),
      "subunit" -> ColumnSpec("int32", "$Subunit"),
      "from" -> ColumnSpec("timestamp", "$IncidentStart"),
      "to" -> ColumnSpec("timestamp", "$IncidentEnd"),
      "app" -> ColumnSpec("int32", "2"),
      "note" -> ColumnSpec("string", "sev=$PatternMetadata@sev unit=$Unit")))

    val row = Sinks.toSinkRows(incidents, schema).collect().head
    val byName = schema.columns.keys.toSeq.zipWithIndex.toMap
    assert(row.getString(byName("id")) == "p1")
    assert(row.getInt(byName("series_storage")) == 7)
    assert(row.getInt(byName("subunit")) == 1)
    assert(row.getTimestamp(byName("from")).toString.startsWith("2024-01-01 00:00"))
    assert(row.getInt(byName("app")) == 2)
    assert(row.getString(byName("note")) == "sev=high unit=7")
  }

  test("bounds-probe SQL is dialect-quoted for ClickHouse / PostgreSQL / MySQL") {
    val q = "SELECT * FROM sensors WHERE ts > 0"
    // ClickHouse has no Spark dialect: the default dialect's ANSI double
    // quotes are exactly ClickHouse's quoted-identifier syntax
    assert(Sources.boundsProbeSql("jdbc:clickhouse://ch:8123/db", q, "Idx") ==
      s"""SELECT MIN("Idx") AS mn, MAX("Idx") AS mx FROM ($q) AS graft_probe""")
    assert(Sources.boundsProbeSql("jdbc:postgresql://pg:5432/db", q, "Idx") ==
      s"""SELECT MIN("Idx") AS mn, MAX("Idx") AS mx FROM ($q) AS graft_probe""")
    assert(Sources.boundsProbeSql("jdbc:mysql://my:3306/db", q, "Idx") ==
      s"SELECT MIN(`Idx`) AS mn, MAX(`Idx`) AS mx FROM ($q) AS graft_probe")
  }

  test("partitioned JDBC read splits the query across range scans") {
    val events = (1L to 97L).map(i => (i, i * 1.5, s"u${i % 3}", 1704067200L + i))
      .toDF("event_id", "value", "user_id", "dt")
    Sinks.writeJdbc(events, JdbcSinkConf(
      tableName = "events_part",
      rowSchema = RowSchema(Map.empty),
      jdbcUrl = url,
      driverName = driver))
    val conf = JdbcSourceConf(
      jdbcUrl = url,
      query = "SELECT * FROM events_part",
      driverName = driver,
      datetimeField = "dt",
      partitionFields = Seq("user_id"),
      parallelism = Some(4),
      splitColumn = Some("event_id")) // bounds probed, not supplied
    val got = Sources.read(spark, conf)
    assert(got.rdd.getNumPartitions == 4,
      s"expected 4 range scans, got ${got.rdd.getNumPartitions}")
    assert(got.count() == 97)
    assert(got.agg(sum(col("event_id"))).head().getLong(0) == (1L to 97L).sum)
  }

  test("JDBC sink + source round-trip through embedded Derby") {
    val events = Seq(
      (1L, 100.5, "u1", 1704067200L),
      (2L, 250.0, "u1", 1704067260L),
      (3L, 17.25, "u2", 1704067320L)
    ).toDF("event_id", "value", "user_id", "dt")

    Sinks.writeJdbc(events, JdbcSinkConf(
      tableName = "events_rt",
      rowSchema = RowSchema(Map.empty), // writing a prepared frame directly
      jdbcUrl = url,
      driverName = driver))

    val conf = JdbcSourceConf(
      jdbcUrl = url,
      query = "SELECT * FROM events_rt",
      driverName = driver,
      datetimeField = "dt",
      partitionFields = Seq("user_id"))
    val back = Sources.read(spark, conf)

    assert(back.count() == 3)
    // ts column synthesized from dt * 1000 (seconds -> millis)
    val ts = back.filter(col("event_id") === 1)
      .select(unix_millis(col("ts"))).as[Long].head()
    assert(ts == 1704067200000L)
    val vals = back.select("event_id", "value").as[(Long, Double)].collect().toMap
    assert(vals == Map(1L -> 100.5, 2L -> 250.0, 3L -> 17.25))
  }

  test("narrow unfolding applies from source conf") {
    val kv = Seq(
      ("u1", 10L, "temp", 20.0),
      ("u1", 10L, "rpm", 900.0),
      ("u1", 11L, "temp", 21.0)
    ).toDF("user_id", "dt", "sensor_id", "v")

    val conf = JdbcSourceConf(
      jdbcUrl = url, query = "unused", driverName = driver,
      datetimeField = "dt", partitionFields = Seq("user_id"),
      dataTransformation = Some(NarrowDataUnfolding(
        "sensor_id", "v", Seq("temp", "rpm"), defaultTimeoutMs = Some(5000L))))
    val wide = Sources.finish(kv, conf)
    val rows = wide.orderBy("ts").select("temp", "rpm").as[(Double, Double)].collect()
    assert(rows.toSeq == Seq((20.0, 900.0), (21.0, 900.0))) // rpm forward-filled
  }

  test("kafka JSON payload parses with declared field types") {
    val raw = Seq("""{"dt": 1.5, "loco": "L1", "speed": 42.5}""")
      .toDF("value").select(col("value").cast("binary").as("value"))
    val conf = KafkaSourceConf(
      brokers = "unused:9092", topic = "t", datetimeField = "dt",
      fieldsTypes = Map("dt" -> "float64", "loco" -> "string", "speed" -> "float64"))
    val parsed = Sources.parseKafkaJson(raw, conf.schema)
    val r = Sources.finish(parsed, conf)
      .select("loco", "speed", "ts").collect().head
    assert(r.getString(0) == "L1" && r.getDouble(1) == 42.5)
    assert(r.getTimestamp(2).getTime == 1500L)
  }

  test("kafka sink payload round-trips through the kafka source parser") {
    // sink rows -> to_json value column -> from_json with the declared
    // schema: the write and read sides must agree on the wire format (the
    // broker itself is the only untestable hop offline)
    val sinkRows = Seq((1L, "unit7", 1000L, 2000L), (2L, "unit9", 5000L, 9000L))
      .toDF("incident_id", "unit", "from_ms", "to_ms")
    val payload = Sinks.kafkaPayload(sinkRows)
    assert(payload.columns.toSeq == Seq("value"))
    val conf = KafkaSourceConf(
      brokers = "unused:9092", topic = "t", datetimeField = "from_ms",
      fieldsTypes = Map("incident_id" -> "int64", "unit" -> "string",
        "from_ms" -> "int64", "to_ms" -> "int64"))
    val back = Sources.parseKafkaJson(payload, conf.schema)
      .select("incident_id", "unit", "from_ms", "to_ms")
      .as[(Long, String, Long, Long)].collect().toSet
    assert(back == Set((1L, "unit7", 1000L, 2000L), (2L, "unit9", 5000L, 9000L)))
  }

  test("normalizeTs yields identical epoch-millis for every ts encoding") {
    // The driver has regenerated events.parquet with a different writer in
    // three separate rounds (TIMESTAMP(NANOS) -> legacy long, then
    // timestamp[us] without TZ -> TIMESTAMP_NTZ, which killed 20 queries in
    // round 7). This pins every encoding to the same normalized axis.
    import graft.Tables
    // realistic epochs: the long-encoding disambiguation is by magnitude
    // (nanos > 1e17 for any date past 1973), so values must be plausible
    // event times, not toy millis
    val millis = Seq(1577836800000L, 1704067200123L, 1893456000999L)
    val dir = java.nio.file.Files.createTempDirectory("ts-drift").toString

    // 1. TimestampType (µs, adjusted-to-UTC parquet annotation)
    millis.toDF("ms").select(timestamp_millis(col("ms")).as("ts"))
      .write.mode("overwrite").parquet(s"$dir/tz")
    // 2. TIMESTAMP_NTZ as round 7 saw it: NTZ-annotated parquet read with
    //    NTZ inference ON (our builders turn it off; a hosting app's session
    //    may not, so the Tables-level cast must cope on its own)
    millis.toDF("ms")
      .select(timestamp_millis(col("ms")).cast("timestamp_ntz").as("ts"))
      .write.mode("overwrite").parquet(s"$dir/ntz")
    // 3. Long epoch-nanos (TIMESTAMP(NANOS) under legacy nanosAsLong)
    millis.toDF("ms").select((col("ms") * 1000000L).as("ts"))
      .write.mode("overwrite").parquet(s"$dir/nanos")
    // 4. Long epoch-micros
    millis.toDF("ms").select((col("ms") * 1000L).as("ts"))
      .write.mode("overwrite").parquet(s"$dir/micros")
    // 4b. Long epoch-millis (a unix-ms writer, the one long encoding the
    //     magnitude ladder had not yet seen: < 1e14 until year ~5138)
    millis.toDF("ms").select(col("ms").as("ts"))
      .write.mode("overwrite").parquet(s"$dir/longms")

    def readNorm(sub: String, ntzInference: Boolean = false): Seq[Long] = {
      val key = "spark.sql.parquet.inferTimestampNTZ.enabled"
      val saved = spark.conf.get(key)
      spark.conf.set(key, ntzInference.toString)
      try {
        val df = Tables.normalizeTs(spark.read.parquet(s"$dir/$sub"))
        assert(df.schema("ts").dataType ==
          org.apache.spark.sql.types.TimestampType, s"$sub not normalized")
        df.select(unix_millis(col("ts"))).as[Long].collect().toSeq.sorted
      } finally spark.conf.set(key, saved)
    }

    // 5. ISO-8601 text (a CSV-ish writer's natural output)
    millis.toDF("ms")
      .select(date_format(timestamp_millis(col("ms")),
        "yyyy-MM-dd HH:mm:ss.SSS").as("ts"))
      .write.mode("overwrite").parquet(s"$dir/iso")

    assert(readNorm("tz") == millis)
    assert(readNorm("ntz", ntzInference = true) == millis)
    assert(readNorm("ntz") == millis) // and with inference off (our builders)
    assert(readNorm("nanos") == millis)
    assert(readNorm("micros") == millis)
    assert(readNorm("longms") == millis)
    assert(readNorm("iso") == millis)

    // DATE truncates to midnight by construction — assert the mapping, not
    // round-tripped millis
    millis.toDF("ms")
      .select(timestamp_millis(col("ms")).cast("date").as("ts"))
      .write.mode("overwrite").parquet(s"$dir/date")
    val dateNorm = Tables.normalizeTs(spark.read.parquet(s"$dir/date"))
    assert(dateNorm.schema("ts").dataType ==
      org.apache.spark.sql.types.TimestampType)
    assert(dateNorm.select(unix_millis(col("ts")) % (86400L * 1000))
      .as[Long].collect().forall(_ == 0L), "date->timestamp not midnight UTC")
  }
}
