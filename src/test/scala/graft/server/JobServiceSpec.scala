package graft.server

import graft.SparkSpec
import graft.dsl.{PatternConfig, TspEngine}
import graft.io.{ColumnSpec, JdbcSinkConf, JdbcSourceConf, RowSchema}
import org.apache.spark.sql.functions._

/** End-to-end job lifecycle: submit a pattern job over a JDBC (Derby)
  * source, let the scheduler run it, and read incidents back from the JDBC
  * sink — the reference's `/job/submit` happy path without the HTTP shim.
  */
class JobServiceSpec extends SparkSpec {

  import JobService._
  import spark.implicits._

  private val url = "jdbc:derby:memory:jobdb;create=true"
  private val driver = "org.apache.derby.iapi.jdbc.AutoloadedDriver"

  test("submit -> run -> incidents in the sink; status transitions; validation") {
    // seed source table: one key, a 3-event high-value run; unit_id is the
    // per-equipment unit column the incident must carry
    val events = Seq(
      ("u1", 1000L, 10.0, 7), ("u1", 1001L, 80.0, 7), ("u1", 1002L, 85.0, 7),
      ("u1", 1003L, 90.0, 7), ("u1", 1004L, 5.0, 7)
    ).toDF("user_id", "dt", "value", "unit_id")
    events.write.format("jdbc").option("url", url)
      .option("dbtable", "src_events").option("driver", driver).mode("append").save()

    val svc = new JobService(spark)
    try {
      val req = FindPatternsRequest(
        uuid = "job-1",
        inputConf = JdbcSourceConf(
          jdbcUrl = url, query = "SELECT * FROM src_events",
          driverName = driver, datetimeField = "dt",
          partitionFields = Seq("user_id"),
          unitIdField = Some("unit_id"),
          eventsMaxGapMs = 60000L, defaultEventsGapMs = 1000L),
        outConfs = Seq(JdbcSinkConf(
          tableName = "sink_incidents",
          rowSchema = RowSchema(Map(
            "id" -> ColumnSpec("string", "$PatternID"),
            "from_ts" -> ColumnSpec("timestamp", "$IncidentStart"),
            "to_ts" -> ColumnSpec("timestamp", "$IncidentEnd"),
            "unit" -> ColumnSpec("int32", "$Unit"),
            "subunit" -> ColumnSpec("int32", "$Subunit"),
            "sev" -> ColumnSpec("string", "sev=$PatternMetadata@severity"))),
          jdbcUrl = url, driverName = driver)),
        priority = 50,
        patterns = Seq(TspEngine.RawPattern("p42", "value > 50", subunit = 3,
          metadata = Map("severity" -> "critical"))))

      assert(svc.submit(req) == Right("job-1"))
      // invalid pattern rejected at submit
      assert(svc.submit(req.copy(uuid = "bad",
        patterns = Seq(TspEngine.RawPattern("x", "value >>> 1")))).isLeft)

      val deadline = System.currentTimeMillis() + 120000
      while (System.currentTimeMillis() < deadline &&
        !Set[JobStatus](JobStatus.Finished, JobStatus.Failed)
          .contains(svc.status("job-1").get.status)) Thread.sleep(200)

      val info = svc.status("job-1").get
      assert(info.status == JobStatus.Finished, s"job ended as $info")
      assert(info.rowsWritten == 1L)

      val sunk = spark.read.format("jdbc").option("url", url)
        .option("dbtable", "sink_incidents").option("driver", driver).load()
      val row = sunk.collect().head
      assert(row.getAs[String]("id") == "p42")
      assert(row.getAs[java.sql.Timestamp]("from_ts").getTime == 1001000L)
      assert(row.getAs[java.sql.Timestamp]("to_ts").getTime == 1003000L)
      // unit from the source's unit_id column; subunit + metadata from the
      // RawPattern, interpolated through the $-macros
      assert(row.getAs[Int]("unit") == 7)
      assert(row.getAs[Int]("subunit") == 3)
      assert(row.getAs[String]("sev") == "sev=critical")

      assert(svc.overview.exists(_.uuid == "job-1"))
    } finally svc.shutdown()
  }

  test("checkpointed job resumes from the recorded event time") {
    // first run processes 3 events (one incident); new rows arrive; the
    // resubmitted uuid reads only the new rows — the sink gains exactly one
    // new incident and rowsRead accumulates. A fresh JobService instance
    // proves the checkpoint survives on disk.
    val ckDir = java.nio.file.Files.createTempDirectory("graft-jobck").toString
    def seed(rows: Seq[(String, Long, Double)]): Unit =
      rows.toDF("user_id", "dt", "value").write.format("jdbc")
        .option("url", url).option("dbtable", "resume_events")
        .option("driver", driver).mode("append").save()
    seed(Seq(("u1", 2000L, 10.0), ("u1", 2001L, 80.0), ("u1", 2002L, 5.0)))

    def req(uuid: String) = FindPatternsRequest(
      uuid = uuid,
      inputConf = JdbcSourceConf(
        jdbcUrl = url, query = "SELECT * FROM resume_events",
        driverName = driver, datetimeField = "dt",
        partitionFields = Seq("user_id"),
        eventsMaxGapMs = 60000L, defaultEventsGapMs = 500L),
      outConfs = Seq(JdbcSinkConf(
        tableName = "resume_sink",
        rowSchema = RowSchema(Map(
          "from_ts" -> ColumnSpec("timestamp", "$IncidentStart"))),
        jdbcUrl = url, driverName = driver)),
      priority = 50,
      patterns = Seq(TspEngine.RawPattern("p", "value > 50")))

    def awaitDone(svc: JobService, uuid: String): JobService.JobInfo = {
      val deadline = System.currentTimeMillis() + 120000
      while (System.currentTimeMillis() < deadline &&
        !Set[JobStatus](JobStatus.Finished, JobStatus.Failed)
          .contains(svc.status(uuid).get.status)) Thread.sleep(200)
      svc.status(uuid).get
    }

    val svc1 = new JobService(spark, checkpointDir = Some(ckDir))
    try {
      val info1 = awaitDone(svc1, { svc1.submit(req("job-r")); "job-r" })
      assert(info1.status == JobStatus.Finished, s"first run: $info1")
      assert(info1.rowsWritten == 1L && info1.rowsRead == 3L)
      assert(svc1.checkpoint("job-r").contains(
        JobCheckpoint(3L, 2002000L, 1L)))
    } finally svc1.shutdown()

    // a later second burst: one more qualifying run
    seed(Seq(("u1", 2100L, 90.0), ("u1", 2101L, 1.0)))

    val svc2 = new JobService(spark, checkpointDir = Some(ckDir))
    try {
      val info2 = awaitDone(svc2, { svc2.submit(req("job-r")); "job-r" })
      assert(info2.status == JobStatus.Finished, s"resume run: $info2")
      // only the 2 new rows were read; total accumulates in the checkpoint
      assert(info2.rowsWritten == 1L && info2.rowsRead == 5L)
      assert(svc2.checkpoint("job-r").contains(
        JobCheckpoint(5L, 2101000L, 2L)))
      val sunk = spark.read.format("jdbc").option("url", url)
        .option("dbtable", "resume_sink").option("driver", driver).load()
      val starts = sunk.collect().map(_.getAs[java.sql.Timestamp]("from_ts").getTime).sorted
      assert(starts.toSeq == Seq(2001000L, 2100000L), s"got ${starts.toSeq}")
    } finally svc2.shutdown()
  }

  test("queue inspection: queued / request / removeFromQueue") {
    val svc = new JobService(spark)
    // freeze the scheduler first so submissions stay queued deterministically
    // (the drain loop races an immediate submit otherwise)
    svc.shutdown()

    def rq(uuid: String) = FindPatternsRequest(
      uuid = uuid,
      inputConf = JdbcSourceConf(
        jdbcUrl = url, query = "SELECT * FROM src_events",
        driverName = driver, datetimeField = "dt",
        partitionFields = Seq("user_id"),
        eventsMaxGapMs = 60000L, defaultEventsGapMs = 1000L),
      outConfs = Nil, priority = 50,
      patterns = Seq(TspEngine.RawPattern("p", "value > 50")))

    assert(svc.submit(rq("qa")).isRight && svc.submit(rq("qb")).isRight)
    assert(svc.queued.map(_.uuid) == Seq("qa", "qb"))
    assert(svc.request("qa").exists(_.patterns.head.sourceCode == "value > 50"))
    assert(svc.request("nope").isEmpty)

    assert(svc.removeFromQueue("qa"))
    assert(!svc.removeFromQueue("qa")) // no longer queued
    assert(svc.queued.map(_.uuid) == Seq("qb"))
    assert(svc.status("qa").exists(_.status == JobStatus.Stopped))
    assert(svc.status("qb").exists(_.status == JobStatus.Queued))
  }

  test("shared multi-pattern evaluation matches per-pattern evaluation") {
    val df = Seq(
      ("u1", 1000L, 10.0), ("u1", 1001L, 80.0), ("u1", 1002L, 85.0),
      ("u1", 1003L, 20.0), ("u1", 1004L, 90.0), ("u2", 1000L, 70.0)
    ).toDF("user_id", "sec", "value")
      .withColumn("ts", timestamp_seconds(col("sec")))
    val cfg = PatternConfig(Seq("user_id"), "ts",
      eventsMaxGapMs = 60000L, sessionGapMs = 0L)
    val pats = Seq(
      TspEngine.RawPattern("a", "value > 50"),
      TspEngine.RawPattern("b", "value > 50 for 1 sec"),
      TspEngine.RawPattern("c", "value < 50 andThen value > 85"))

    def canon(d: org.apache.spark.sql.DataFrame) =
      d.select("pattern_id", "user_id", "from_ms", "to_ms", "n_events")
        .collect().map(_.toSeq).toSet

    val shared = canon(TspEngine.incidentsAllShared(df, pats, cfg))
    val separate = canon(TspEngine.incidentsAll(df, pats, cfg))
    assert(shared == separate && shared.nonEmpty)
  }
}
