package graft.server

import graft.SparkSpec

import java.net.URI
import java.net.http.{HttpClient, HttpRequest, HttpResponse}
import java.time.Duration

/** The reference's HTTP surface over real sockets: submit a job via
  * POST /job/submit, watch it through /job/:uuid/status, read the
  * incidents back from the JDBC sink, and exercise the queue, request,
  * validation, overview and error routes — the full
  * JobsRoutes/MonitoringRoutes/ValidationRoutes lifecycle.
  */
class JobRoutesSpec extends SparkSpec {

  import spark.implicits._

  private val url = "jdbc:derby:memory:routesdb;create=true"
  private val driver = "org.apache.derby.iapi.jdbc.AutoloadedDriver"

  private val client = HttpClient.newBuilder()
    .connectTimeout(Duration.ofSeconds(5)).build()

  private def get(base: String, path: String): HttpResponse[String] =
    client.send(HttpRequest.newBuilder(URI.create(base + path)).GET().build(),
      HttpResponse.BodyHandlers.ofString())

  private def post(base: String, path: String, body: String): HttpResponse[String] =
    client.send(HttpRequest.newBuilder(URI.create(base + path))
      .POST(HttpRequest.BodyPublishers.ofString(body)).build(),
      HttpResponse.BodyHandlers.ofString())

  test("submit over HTTP -> status -> incidents in the sink; all routes") {
    Seq(
      ("u1", 5000L, 10.0, 9), ("u1", 5001L, 80.0, 9), ("u1", 5002L, 85.0, 9),
      ("u1", 5003L, 90.0, 9), ("u1", 5004L, 5.0, 9)
    ).toDF("user_id", "dt", "value", "unit_id")
      .write.format("jdbc").option("url", url)
      .option("dbtable", "http_events").option("driver", driver)
      .mode("append").save()

    val svc = new JobService(spark)
    val routes = new JobRoutes(svc, port = 0)
    val base = s"http://localhost:${routes.boundPort}"
    try {
      val submitBody =
        s"""{
           |  "uuid": "http-1",
           |  "priority": 50,
           |  "source": {
           |    "type": "jdbc", "jdbcUrl": "$url",
           |    "query": "SELECT * FROM http_events",
           |    "driverName": "$driver", "datetimeField": "dt",
           |    "partitionFields": ["user_id"], "unitIdField": "unit_id",
           |    "eventsMaxGapMs": 60000, "defaultEventsGapMs": 1000
           |  },
           |  "sinks": [{
           |    "tableName": "http_sink",
           |    "rowSchema": {
           |      "id": {"type": "string", "value": "$$PatternID"},
           |      "from_ts": {"type": "timestamp", "value": "$$IncidentStart"},
           |      "to_ts": {"type": "timestamp", "value": "$$IncidentEnd"},
           |      "unit": {"type": "int32", "value": "$$Unit"},
           |      "subunit": {"type": "int32", "value": "$$Subunit"},
           |      "sev": {"type": "string", "value": "sev=$$PatternMetadata@severity"}
           |    },
           |    "jdbcUrl": "$url", "driverName": "$driver"
           |  }],
           |  "patterns": [{"id": "p7", "sourceCode": "value > 50",
           |                "subunit": 4, "metadata": {"severity": "high"}}]
           |}""".stripMargin
      val sub = post(base, "/job/submit", submitBody)
      assert(sub.statusCode() == 200, sub.body())
      assert(sub.body().contains("http-1 enqueued"))

      // malformed pattern rejected with the reference's error shape
      val bad = post(base, "/job/submit",
        submitBody.replace("\"http-1\"", "\"http-bad\"")
          .replace("value > 50", "value >>> 1"))
      assert(bad.statusCode() == 400 && bad.body().contains("4001"), bad.body())

      // poll status over HTTP until terminal
      val deadline = System.currentTimeMillis() + 120000
      var status = ""
      while (System.currentTimeMillis() < deadline &&
        status != "Finished" && status != "Failed") {
        val r = get(base, "/job/http-1/status")
        assert(r.statusCode() == 200, r.body())
        status = Json.parse(r.body()).asObj("status").asStr
        if (status != "Finished" && status != "Failed") Thread.sleep(200)
      }
      val info = Json.parse(get(base, "/job/http-1/status").body()).asObj
      assert(info("status").asStr == "Finished", info)
      assert(info("rowsWritten").asNum == 1.0 && info("rowsRead").asNum == 5.0)
      // the streaming truncation metric flows through status (0 for a
      // batch job — only a stalled forward-looking streaming pattern
      // increments it)
      assert(info("forceFinalized").asNum == 0.0, info)

      // incidents landed through the sink, macros interpolated
      val row = spark.read.format("jdbc").option("url", url)
        .option("dbtable", "http_sink").option("driver", driver).load()
        .collect().head
      assert(row.getAs[String]("id") == "p7")
      assert(row.getAs[java.sql.Timestamp]("from_ts").getTime == 5001000L)
      assert(row.getAs[java.sql.Timestamp]("to_ts").getTime == 5003000L)
      assert(row.getAs[Int]("unit") == 9 && row.getAs[Int]("subunit") == 4)
      assert(row.getAs[String]("sev") == "sev=high")

      // request round-trip: what was submitted comes back
      val reqBack = Json.parse(get(base, "/job/http-1/request").body()).asObj
      assert(reqBack("uuid").asStr == "http-1")
      assert(reqBack("source").asObj("query").asStr == "SELECT * FROM http_events")
      assert(reqBack("patterns").asArr.head.asObj("sourceCode").asStr == "value > 50")
      // and re-parses to the identical request object
      assert(JobRoutes.readRequest(get(base, "/job/http-1/request").body())
        == svc.request("http-1").get)

      // overview lists the job
      val over = Json.parse(get(base, "/jobs/overview").body()).asArr
      assert(over.exists(_.asObj("uuid").asStr == "http-1"))

      // validation route: one good, one bad
      val vr = Json.parse(post(base, "/patterns/validate",
        """{"patterns": [{"id": "a", "sourceCode": "value > 50 for 10 sec"},
          |              {"id": "b", "sourceCode": "value >>>"}]}""".stripMargin).body()).asArr
      assert(vr.head.asObj("success").asBool)
      assert(vr.head.asObj("context").asStr.contains("value"))
      assert(!vr(1).asObj("success").asBool)

      // queue routes: unknown job is not queued -> redirect shape to stop
      val rem = get(base, "/queue/http-1/remove")
      assert(rem.statusCode() == 308 || rem.statusCode() == 200)
      assert(get(base, "/queue/show").statusCode() == 200)

      // error + misc routes
      assert(get(base, "/job/nope/status").statusCode() == 400)
      assert(get(base, "/job/nope/status").body().contains("4006"))
      assert(get(base, "/nope").statusCode() == 404)
      assert(get(base, "/metainfo/getVersion").body().contains("graft"))
    } finally { routes.close(); svc.shutdown() }
  }

  test("queued job can be removed over HTTP before it runs") {
    // maxConcurrent=1 and a long-running occupant would be flaky; instead
    // saturate the single worker with a job against a slow-enough source
    // and remove the second job while it waits in the queue
    Seq(("u1", 1L, 1.0)).toDF("user_id", "dt", "value")
      .write.format("jdbc").option("url", url)
      .option("dbtable", "rm_events").option("driver", driver)
      .mode("append").save()
    val svc = new JobService(spark)
    val routes = new JobRoutes(svc, port = 0)
    val base = s"http://localhost:${routes.boundPort}"
    try {
      def req(uuid: String, prio: Int) =
        s"""{"uuid": "$uuid", "priority": $prio,
           |  "source": {"type": "jdbc", "jdbcUrl": "$url",
           |    "query": "SELECT * FROM rm_events", "driverName": "$driver",
           |    "datetimeField": "dt", "partitionFields": ["user_id"]},
           |  "sinks": [{"tableName": "rm_sink",
           |    "rowSchema": {"from_ts": {"type": "timestamp", "value": "$$IncidentStart"}},
           |    "jdbcUrl": "$url", "driverName": "$driver"}],
           |  "patterns": [{"id": "p", "sourceCode": "value > 50"}]}""".stripMargin
      // submit a burst; the tail of the queue is removable before the single
      // worker reaches it
      (1 to 6).foreach(i => assert(post(base, "/job/submit",
        req(s"rm-$i", 10 + i)).statusCode() == 200))
      val shown = Json.parse(get(base, "/queue/show").body()).asArr
      val victim = shown.lastOption.map(_.asObj("uuid").asStr)
      victim.foreach { uuid =>
        val r = get(base, s"/queue/$uuid/remove")
        if (r.statusCode() == 200) {
          assert(r.body().contains("removed from queue"))
          val st = Json.parse(get(base, s"/job/$uuid/status").body()).asObj
          assert(st("status").asStr == "Stopped")
        } // else the worker won the race — fine, it's a race by design
      }
    } finally { routes.close(); svc.shutdown() }
  }

  test("streaming-curation pipeline over HTTP: submit bloom+cap, status, stop") {
    val inDir = java.nio.file.Files.createTempDirectory("curhttp-in").toString
    val ckpt = java.nio.file.Files.createTempDirectory("curhttp-ck").toString
    (0 until 30).map(i =>
        (i.toLong, s"https://${Seq("x.com", "y.org")(i % 2)}/d/$i",
          (i % 100 + 1).toLong))
      .toDF("doc_id", "url", "w").coalesce(1).write.mode("append").parquet(inDir)

    val svc = new JobService(spark)
    val cur = new CurationService(spark, ckpt)
    val routes = new JobRoutes(svc, port = 0, curation = Some(cur))
    val base = s"http://localhost:${routes.boundPort}"
    try {
      val body =
        s"""{
           |  "uuid": "curhttp-1",
           |  "source": {"format": "parquet", "path": "$inDir",
           |             "schema": "doc_id BIGINT, url STRING, w BIGINT"},
           |  "jdbcUrl": "$url", "driverName": "$driver",
           |  "steps": [
           |    {"type": "bloom_seen", "name": "bloom", "table": "curhttp_bloom",
           |     "urlCol": "url", "nBits": 1024},
           |    {"type": "domain_cap", "name": "cap", "table": "curhttp_cap",
           |     "idCol": "doc_id", "urlCol": "url", "cap": 4, "seed": "h1"},
           |    {"type": "kmv_distinct", "name": "kmv", "table": "curhttp_kmv",
           |     "groupCol": "url", "valueCol": "doc_id", "k": 8},
           |    {"type": "hll_distinct", "name": "hll", "table": "curhttp_hll",
           |     "groupCol": "url", "valueCol": "doc_id", "p": 8},
           |    {"type": "ewma", "name": "ewma", "table": "curhttp_ewma",
           |     "keyCol": "doc_id", "tUsCol": "doc_id", "idCol": "doc_id",
           |     "valueCol": "doc_id", "k": 3},
           |    {"type": "weighted_sample", "name": "ws", "table": "curhttp_ws",
           |     "idCol": "doc_id", "groupCol": "url", "weightCol": "w", "k": 3},
           |    {"type": "trend", "name": "trend", "table": "curhttp_trend",
           |     "keyCol": "doc_id", "tUsCol": "doc_id", "idCol": "doc_id",
           |     "valueCol": "w", "unitUs": 1}
           |  ]
           |}""".stripMargin
      val sub = post(base, "/streamjob/submit", body)
      assert(sub.statusCode() == 200, sub.body())
      cur.awaitIdle("curhttp-1")

      val st = Json.parse(get(base, "/streamjob/curhttp-1/status").body()).asObj
      assert(st("status").asStr == "Running", st)
      val steps = st("steps").asArr.map(_.asObj)
      assert(steps.map(_("name").asStr).toSet ==
        Set("bloom", "cap", "kmv", "hll", "ewma", "ws", "trend"))
      assert(steps.forall(_("inputRows").asNum == 30.0), st)
      // the sink tables exist and carry rows
      Seq("curhttp_bloom", "curhttp_cap", "curhttp_kmv", "curhttp_hll",
          "curhttp_ewma", "curhttp_ws", "curhttp_trend").foreach { t =>
        val n = spark.read.format("jdbc").option("url", url)
          .option("dbtable", t).option("driver", driver).load().count()
        assert(n > 0, s"$t is empty")
      }
      // overview lists it; unknown uuid is a 400; bad step type a 400
      assert(get(base, "/streamjob/overview").body().contains("curhttp-1"))
      assert(get(base, "/streamjob/nope/status").statusCode() == 400)
      assert(post(base, "/streamjob/submit",
        body.replace("domain_cap", "mystery_op")
          .replace("curhttp-1", "curhttp-bad")).statusCode() == 400)

      val stop = get(base, "/streamjob/curhttp-1/stop")
      assert(stop.statusCode() == 200, stop.body())
      assert(Json.parse(get(base, "/streamjob/curhttp-1/status").body())
        .asObj("status").asStr == "Stopped")
    } finally { routes.close(); cur.shutdown(); svc.shutdown() }
  }

  test("streaming-curation routes answer 404 when the server has no curation service") {
    val svc = new JobService(spark)
    val routes = new JobRoutes(svc, port = 0)
    val base = s"http://localhost:${routes.boundPort}"
    try {
      val r = get(base, "/streamjob/overview")
      assert(r.statusCode() == 404 && r.body().contains("not enabled"), r.body())
    } finally { routes.close(); svc.shutdown() }
  }
}
