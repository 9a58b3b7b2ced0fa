package graft.io

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Sink configuration + the incident-to-row mapper (reference:
  * streaming/.../io/OutputConf.scala:37-201,
  * mappers/PatternsToRowMapper.scala:18-132, SinkSchema.scala:18-62).
  *
  * The sink schema maps output columns to typed specs whose string values
  * may interpolate `$`-macros over the incident:
  * `$PatternID`, `$IncidentStart`, `$IncidentEnd`, `$Unit`, `$Subunit`,
  * `$UUID`, `$PatternMetadata@<key>`.
  */
final case class ColumnSpec(sqlType: String, template: String)

final case class RowSchema(columns: Map[String, ColumnSpec])

final case class JdbcSinkConf(
  tableName: String,
  rowSchema: RowSchema,
  jdbcUrl: String,
  driverName: String,
  userName: Option[String] = None,
  password: Option[String] = None
)

final case class KafkaSinkConf(
  brokers: String,
  topic: String,
  rowSchema: RowSchema
)

object Sinks {

  /** Expected incident-frame columns: pattern_id, unit, subunit, seg_from,
    * seg_to (+ metadata map column `meta` if `$PatternMetadata@` is used).
    * Macro expansion is pure column algebra — `concat` of literal fragments
    * and incident columns — so the mapper stays inside codegen
    * (reference interpolation: PatternsToRowMapper.scala:54-70).
    */
  private val macroRe = """\$(PatternID|IncidentStart|IncidentEnd|Unit|Subunit|UUID|PatternMetadata@[A-Za-z0-9_]+)""".r

  private def macroColumn(name: String): Column = name match {
    case "PatternID"     => col("pattern_id")
    case "IncidentStart" => col("seg_from").cast("string")
    case "IncidentEnd"   => col("seg_to").cast("string")
    case "Unit"          => col("unit")
    case "Subunit"       => col("subunit")
    case "UUID"          => expr("uuid()")
    case m if m.startsWith("PatternMetadata@") =>
      element_at(col("meta"), m.stripPrefix("PatternMetadata@"))
    case other => lit(other)
  }

  /** A template compiles to: the macro's column if the template is exactly
    * one macro (keeps the native type before the cast), else a concat of
    * text fragments and stringified macro values.
    */
  def templateColumn(template: String): Column = {
    val ms = macroRe.findAllMatchIn(template).toSeq
    if (ms.isEmpty) lit(template)
    else if (ms.length == 1 && ms.head.start == 0 && ms.head.end == template.length)
      macroColumn(ms.head.group(1))
    else {
      val parts = scala.collection.mutable.ArrayBuffer.empty[Column]
      var pos = 0
      ms.foreach { m =>
        if (m.start > pos) parts += lit(template.substring(pos, m.start))
        parts += macroColumn(m.group(1)).cast("string")
        pos = m.end
      }
      if (pos < template.length) parts += lit(template.substring(pos))
      concat(parts.toSeq: _*)
    }
  }

  private def sparkType(t: String): String = t.toLowerCase match {
    case "int8"      => "tinyint"
    case "int16"     => "smallint"
    case "int32"     => "int"
    case "int64"     => "bigint"
    case "float32"   => "float"
    case "float64"   => "double"
    case "boolean"   => "boolean"
    case "string"    => "string"
    case "timestamp" => "timestamp"
    case "object"    => "string" // JSON-encoded, reference SinkSchema.scala:28-35
    case other       => other
  }

  /** Incidents frame -> sink-shaped frame per the row schema. */
  def toSinkRows(incidents: DataFrame, schema: RowSchema): DataFrame = {
    val cols = schema.columns.toSeq.map { case (name, spec) =>
      templateColumn(spec.template).cast(sparkType(spec.sqlType)).as(name)
    }
    incidents.select(cols: _*)
  }

  /** Batch JDBC write (streaming callers wrap this in `foreachBatch`). */
  def writeJdbc(df: DataFrame, conf: JdbcSinkConf): Unit = {
    var w = df.write.format("jdbc")
      .option("url", conf.jdbcUrl)
      .option("dbtable", conf.tableName)
      .option("driver", conf.driverName)
    conf.userName.foreach(u => w = w.option("user", u))
    conf.password.foreach(p => w = w.option("password", p))
    w.mode("append").save()
  }

  /** Bookkeeping columns of the idempotent streaming sink. */
  val JobCol = "graft_job"
  val BatchCol = "graft_batch"

  /** Exactly-once JDBC write for a streaming micro-batch: rows land
    * tagged with `(graft_job, graft_batch)`, and any rows already present
    * under that tag are DELETED first — so the replayed micro-batch a
    * failure between the sink write and the checkpoint commit produces
    * (Spark re-runs the batch with the SAME batchId) overwrites its own
    * partial output instead of appending a duplicate copy. Plain
    * [[writeJdbc]] is at-least-once under that failure, the same contract
    * as the reference's row-insert sink (reference:
    * streaming/.../io/OutputConf.scala:62-71) — this is the upgrade path
    * streaming callers get via [[foreachBatchJdbc]].
    *
    * The delete is one indexed-key statement per micro-batch (not per
    * row), so the idempotence overhead does not grow with batch size; at
    * scale, index `(graft_job, graft_batch)` on the sink table. The
    * table is created by the first write (Spark's append-mode create) —
    * the existence probe keeps batch 0 from failing on the DELETE.
    */
  def writeJdbcBatch(df: DataFrame, conf: JdbcSinkConf, jobId: String,
                     batchId: Long): Unit = {
    require(jobId.length <= 64, s"jobId must fit VARCHAR(64): $jobId")
    deleteBatch(conf, jobId, batchId)
    val tagged =
      df.withColumn(JobCol, lit(jobId)).withColumn(BatchCol, lit(batchId))
    var w = tagged.write.format("jdbc")
      .option("url", conf.jdbcUrl)
      .option("dbtable", conf.tableName)
      .option("driver", conf.driverName)
      // string -> the dialect's default LOB type is not '='-comparable on
      // some engines (Derby CLOB); pin the tag column to VARCHAR at table
      // creation so the delete's equality predicate works everywhere
      .option("createTableColumnTypes", s"$JobCol VARCHAR(64)")
    conf.userName.foreach(u => w = w.option("user", u))
    conf.password.foreach(p => w = w.option("password", p))
    w.mode("append").save()
  }

  /** The `foreachBatch` hook for a streaming query writing through the
    * idempotent JDBC sink:
    * `ds.writeStream.foreachBatch(Sinks.foreachBatchJdbc(conf, jobId))`.
    */
  def foreachBatchJdbc(conf: JdbcSinkConf, jobId: String)
      : (DataFrame, Long) => Unit =
    (df, batchId) => writeJdbcBatch(df, conf, jobId, batchId)

  /** Remove a (job, batch) tag's rows if the sink table exists. Driver-side
    * single statement; the probe distinguishes "table not created yet"
    * (fine — nothing to delete) from a real connectivity failure (thrown).
    */
  private def deleteBatch(conf: JdbcSinkConf, jobId: String, batchId: Long): Unit = {
    Class.forName(conf.driverName)
    val props = new java.util.Properties()
    conf.userName.foreach(props.setProperty("user", _))
    conf.password.foreach(props.setProperty("password", _))
    val cn = java.sql.DriverManager.getConnection(conf.jdbcUrl, props)
    try {
      val exists =
        try {
          val st = cn.createStatement()
          try { st.executeQuery(s"SELECT 1 FROM ${conf.tableName} WHERE 1=0").close(); true }
          finally st.close()
        } catch { case _: java.sql.SQLException => false }
      if (exists) {
        // the Spark JDBC writer CREATES tables with dialect-quoted (hence
        // case-sensitive) identifiers, so the delete must quote the same
        // way or an upcasing database (Derby) won't find the columns
        val dialect = org.apache.spark.sql.jdbc.JdbcDialects.get(conf.jdbcUrl)
        val ps = cn.prepareStatement(
          s"DELETE FROM ${conf.tableName} WHERE " +
            s"${dialect.quoteIdentifier(JobCol)} = ? AND " +
            s"${dialect.quoteIdentifier(BatchCol)} = ?")
        try {
          ps.setString(1, jobId)
          ps.setLong(2, batchId)
          ps.executeUpdate()
        } finally ps.close()
      }
    } finally cn.close()
  }

  /** The Kafka sink's payload projection: one JSON `value` column per row,
    * every sink column embedded. Factored from [[writeKafka]] so the
    * conversion is testable without a broker (the connector itself is the
    * only part that cannot run offline).
    */
  def kafkaPayload(df: DataFrame): DataFrame =
    df.select(to_json(struct(df.columns.map(col): _*)).as("value"))

  /** Rows -> JSON -> Kafka (needs the kafka connector at runtime). */
  def writeKafka(df: DataFrame, conf: KafkaSinkConf): Unit =
    kafkaPayload(df)
      .write.format("kafka")
      .option("kafka.bootstrap.servers", conf.brokers)
      .option("topic", conf.topic)
      .save()
}
