package graft.server

import com.sun.net.httpserver.{HttpExchange, HttpServer}
import graft.dsl.TspEngine
import graft.io._

import java.net.InetSocketAddress
import java.nio.charset.StandardCharsets
import java.util.concurrent.Executors
import scala.util.{Failure, Success, Try}

/** Thin HTTP transport over [[JobService]] — the analogue of the
  * reference's Akka-HTTP layer (http/.../routes/JobsRoutes.scala:32-52,
  * MonitoringRoutes.scala:53-83, ValidationRoutes.scala:21-36), on the
  * JDK's built-in `com.sun.net.httpserver` so no external server library
  * is needed. Route ↔ reference mapping:
  *
  *   POST /job/submit            → submit (200 enqueued / 400 errors)
  *   GET  /queue/show            → queued requests
  *   GET  /queue/:uuid/remove    → removed, or 308 redirect to stop
  *                                 (JobsRoutes.scala:48-52)
  *   GET  /job/:uuid/status      → status + rowsRead/rowsWritten
  *   GET  /job/:uuid/request     → the request as submitted
  *   GET  /job/:uuid/stop        → cooperative stop
  *   GET  /jobs/overview         → all known jobs
  *   POST /patterns/validate     → per-pattern {pattern, success, context}
  *   GET  /metainfo/getVersion   → engine version map
  *
  * Beyond the reference (which has no streaming-curation surface), the
  * same server exposes [[CurationService]] when one is supplied:
  *
  *   POST /streamjob/submit          → start a curation pipeline
  *   GET  /streamjob/:uuid/status    → per-step progress
  *   GET|POST /streamjob/:uuid/stop  → stop (checkpoints kept; resubmit resumes)
  *   GET  /streamjob/overview        → all curation jobs
  *
  * Error shape mirrors the reference's FailureResponse: 400 with
  * `{"errorCode": 4006, "message": "No such job."}` for unknown uuids.
  *
  * Control-plane only: payloads are job descriptions and status maps —
  * incident rows travel through the configured sinks, never through HTTP,
  * exactly like the reference.
  */
final class JobRoutes(svc: JobService, port: Int = 0,
                      curation: Option[CurationService] = None) {

  import JobRoutes._
  import JobService._

  private val server = HttpServer.create(new InetSocketAddress(port), 0)
  server.setExecutor(Executors.newFixedThreadPool(4, r => {
    val t = new Thread(r, "graft-http"); t.setDaemon(true); t
  }))
  server.createContext("/", (ex: HttpExchange) => handle(ex))
  server.start()

  /** The actual listen port (useful with port=0 for tests). */
  def boundPort: Int = server.getAddress.getPort

  def close(): Unit = server.stop(0)

  private def handle(ex: HttpExchange): Unit = {
    val result = Try {
      val segs = ex.getRequestURI.getPath.split("/").filter(_.nonEmpty).toList
      (ex.getRequestMethod, segs) match {
        case ("POST", List("job", "submit")) =>
          val req = readRequest(new String(
            ex.getRequestBody.readAllBytes(), StandardCharsets.UTF_8))
          svc.submit(req) match {
            case Right(uuid) =>
              (200, Json.Obj.of("status" -> Json.Str(s"Job $uuid enqueued.")))
            case Left(errors) =>
              (400, Json.Obj.of("errorCode" -> Json.Num(4001),
                "message" -> Json.Str("Invalid patterns."),
                "errors" -> Json.Arr(errors.map(Json.Str))))
          }
        case ("GET", List("queue", "show")) =>
          (200, Json.Arr(svc.queued.map(writeRequest)))
        case ("GET", List("queue", uuid, "remove")) =>
          if (svc.removeFromQueue(uuid))
            (200, Json.Obj.of("status" -> Json.Str(s"Job $uuid removed from queue.")))
          else { // mirror the reference: running jobs go through stop
            ex.getResponseHeaders.add("Location", s"/job/$uuid/stop")
            (308, Json.Obj.of("status" -> Json.Str(s"Job $uuid is not queued.")))
          }
        case ("GET", List("job", uuid, "status")) =>
          svc.status(uuid) match {
            case Some(info) => (200, writeInfo(info))
            case None       => (400, noSuchJob)
          }
        case ("GET", List("job", uuid, "request")) =>
          svc.request(uuid) match {
            case Some(req) => (200, writeRequest(req))
            case None      => (400, noSuchJob)
          }
        case ("GET" | "POST", List("job", uuid, "stop")) =>
          if (svc.stop(uuid))
            (200, Json.Obj.of("message" -> Json.Str(s"Job $uuid stopped.")))
          else (400, noSuchJob)
        case ("GET", List("jobs", "overview")) =>
          (200, Json.Arr(svc.overview.map(writeInfo)))
        case ("POST", List("patterns", "validate")) =>
          val body = Json.parse(new String(
            ex.getRequestBody.readAllBytes(), StandardCharsets.UTF_8))
          val patterns = body match {
            case o: Json.Obj => o("patterns").asArr.map(readPattern)
            case a: Json.Arr => a.items.map(readPattern)
            case other       => throw Json.ParseError(s"expected patterns, got $other")
          }
          val res = svc.validate(patterns.map(_.sourceCode))
            .zip(patterns).map { case (r, p) =>
              Json.Obj.of(
                "pattern" -> Json.Str(p.sourceCode),
                "success" -> Json.Bool(r.isRight),
                "context" -> Json.Str(r.fold(identity, _.toSeq.sorted.mkString(", "))))
            }
          (200, Json.Arr(res))
        case ("GET", List("metainfo", "getVersion")) =>
          (200, Json.Obj.of("graft" -> Json.Str("0.5.0"),
            "scala" -> Json.Str(scala.util.Properties.versionNumberString)))
        case ("POST", List("streamjob", "submit")) =>
          withCuration { cur =>
            val req = readCurationRequest(new String(
              ex.getRequestBody.readAllBytes(), StandardCharsets.UTF_8))
            cur.submit(req) match {
              case Right(uuid) =>
                (200, Json.Obj.of("status" ->
                  Json.Str(s"Streaming job $uuid started.")))
              case Left(errors) =>
                (400, Json.Obj.of("errorCode" -> Json.Num(4001),
                  "message" -> Json.Str("Invalid streaming job."),
                  "errors" -> Json.Arr(errors.map(Json.Str))))
            }
          }
        case ("GET", List("streamjob", uuid, "status")) =>
          withCuration { cur =>
            cur.status(uuid) match {
              case Some(info) => (200, writeCurationInfo(info))
              case None       => (400, noSuchJob)
            }
          }
        case ("GET" | "POST", List("streamjob", uuid, "stop")) =>
          withCuration { cur =>
            if (cur.stop(uuid))
              (200, Json.Obj.of("message" -> Json.Str(s"Streaming job $uuid stopped.")))
            else (400, noSuchJob)
          }
        case ("GET", List("streamjob", "overview")) =>
          withCuration { cur => (200, Json.Arr(cur.overview.map(writeCurationInfo))) }
        case _ => (404, Json.Obj.of("errorCode" -> Json.Num(4004),
          "message" -> Json.Str("No such route.")))
      }
    }
    val (code, payload) = result match {
      case Success(r) => r
      case Failure(e: Json.ParseError) =>
        (400, Json.Obj.of("errorCode" -> Json.Num(4002),
          "message" -> Json.Str(s"Bad request: ${e.msg}")))
      case Failure(e) =>
        (500, Json.Obj.of("errorCode" -> Json.Num(5000),
          "message" -> Json.Str(String.valueOf(e.getMessage))))
    }
    val bytes = Json.write(payload).getBytes(StandardCharsets.UTF_8)
    ex.getResponseHeaders.add("Content-Type", "application/json")
    ex.sendResponseHeaders(code, bytes.length)
    ex.getResponseBody.write(bytes)
    ex.close()
  }

  private def noSuchJob: Json.Value =
    Json.Obj.of("errorCode" -> Json.Num(4006), "message" -> Json.Str("No such job."))

  private def withCuration(f: CurationService => (Int, Json.Value)): (Int, Json.Value) =
    curation match {
      case Some(cur) => f(cur)
      case None => (404, Json.Obj.of("errorCode" -> Json.Num(4004),
        "message" -> Json.Str("Streaming jobs are not enabled on this server.")))
    }
}

/** JSON codecs for the request/response domain. Field names follow the
  * reference's wire format (http/.../domain/input/Request.scala:36-47,
  * RoutesProtocols.scala) where a Spark-side equivalent exists.
  */
object JobRoutes {

  import JobService._

  // ------------------------------------------------------------- readers

  def readRequest(body: String): FindPatternsRequest = {
    val o = Json.parse(body) match {
      case obj: Json.Obj => obj
      case other         => throw Json.ParseError(s"expected object, got $other")
    }
    FindPatternsRequest(
      uuid = o("uuid").asStr,
      inputConf = readSource(o("source")),
      outConfs = o("sinks").asArr.map(readSink),
      priority = o.get("priority").map(_.asNum.toInt).getOrElse(0),
      patterns = o("patterns").asArr.map(readPattern))
  }

  def readPattern(v: Json.Value): TspEngine.RawPattern = {
    val o = v match { case obj: Json.Obj => obj; case Json.Str(s) =>
      return TspEngine.RawPattern(s, s)
      case other => throw Json.ParseError(s"expected pattern, got $other") }
    TspEngine.RawPattern(
      id = o("id").asStr,
      sourceCode = o("sourceCode").asStr,
      subunit = o.get("subunit").map(_.asNum.toInt).getOrElse(0),
      metadata = o.get("metadata").map(_.asObj.map { case (k, v) => k -> v.asStr })
        .getOrElse(Map.empty))
  }

  def readSource(v: Json.Value): SourceConf = {
    val o = v match { case obj: Json.Obj => obj
      case other => throw Json.ParseError(s"expected source, got $other") }
    o("type").asStr match {
      case "jdbc" => JdbcSourceConf(
        jdbcUrl = o("jdbcUrl").asStr,
        query = o("query").asStr,
        driverName = o("driverName").asStr,
        datetimeField = o("datetimeField").asStr,
        userName = o.get("userName").map(_.asStr),
        password = o.get("password").map(_.asStr),
        timestampMultiplier = o.get("timestampMultiplier").map(_.asNum).getOrElse(1000.0),
        partitionFields = o.get("partitionFields").map(_.asArr.map(_.asStr)).getOrElse(Nil),
        unitIdField = o.get("unitIdField").map(_.asStr),
        eventsMaxGapMs = o.get("eventsMaxGapMs").map(_.asNum.toLong).getOrElse(60000L),
        defaultEventsGapMs = o.get("defaultEventsGapMs").map(_.asNum.toLong).getOrElse(2000L),
        dataTransformation = o.get("dataTransformation").map(readTransformation))
      case "kafka" => KafkaSourceConf(
        brokers = o("brokers").asStr,
        topic = o("topic").asStr,
        datetimeField = o("datetimeField").asStr,
        fieldsTypes = o("fieldsTypes").asObj.map { case (k, v) => k -> v.asStr },
        group = o.get("group").map(_.asStr),
        timestampMultiplier = o.get("timestampMultiplier").map(_.asNum).getOrElse(1000.0),
        partitionFields = o.get("partitionFields").map(_.asArr.map(_.asStr)).getOrElse(Nil),
        unitIdField = o.get("unitIdField").map(_.asStr),
        eventsMaxGapMs = o.get("eventsMaxGapMs").map(_.asNum.toLong).getOrElse(60000L),
        defaultEventsGapMs = o.get("defaultEventsGapMs").map(_.asNum.toLong).getOrElse(2000L),
        dataTransformation = o.get("dataTransformation").map(readTransformation))
      case other => throw Json.ParseError(s"unknown source type '$other'")
    }
  }

  def readTransformation(v: Json.Value): SourceTransformation = {
    val o = v match { case obj: Json.Obj => obj
      case other => throw Json.ParseError(s"expected transformation, got $other") }
    o("type").asStr match {
      case "NarrowDataUnfolding" => NarrowDataUnfolding(
        keyColumn = o("keyColumn").asStr,
        defaultValueColumn = o("defaultValueColumn").asStr,
        sensors = o.get("sensors").map(_.asArr.map(_.asStr)).getOrElse(Nil),
        valueColumnMapping = o.get("valueColumnMapping")
          .map(_.asObj.map { case (k, v) => k -> v.asStr }).getOrElse(Map.empty),
        defaultTimeoutMs = o.get("defaultTimeoutMs").map(_.asNum.toLong))
      case "WideDataFilling" => WideDataFilling(
        fillColumns = o.get("fillColumns").map(_.asArr.map(_.asStr)).getOrElse(Nil),
        defaultTimeoutMs = o.get("defaultTimeoutMs").map(_.asNum.toLong))
      case other => throw Json.ParseError(s"unknown transformation '$other'")
    }
  }

  def readSink(v: Json.Value): JdbcSinkConf = {
    val o = v match { case obj: Json.Obj => obj
      case other => throw Json.ParseError(s"expected sink, got $other") }
    JdbcSinkConf(
      tableName = o("tableName").asStr,
      rowSchema = RowSchema(o("rowSchema").asObj.map { case (name, spec) =>
        val so = spec match { case obj: Json.Obj => obj
          case other => throw Json.ParseError(s"expected column spec, got $other") }
        name -> ColumnSpec(so("type").asStr, so("value").asStr)
      }),
      jdbcUrl = o("jdbcUrl").asStr,
      driverName = o("driverName").asStr,
      userName = o.get("userName").map(_.asStr),
      password = o.get("password").map(_.asStr))
  }

  def readCurationRequest(body: String): CurationService.CurationRequest = {
    import CurationService._
    val o = Json.parse(body) match {
      case obj: Json.Obj => obj
      case other         => throw Json.ParseError(s"expected object, got $other")
    }
    val src = o("source") match {
      case s: Json.Obj => FileSourceConf(
        format = s("format").asStr,
        path = s("path").asStr,
        schemaDdl = s("schema").asStr,
        maxFilesPerTrigger = s.get("maxFilesPerTrigger").map(_.asNum.toInt))
      case other => throw Json.ParseError(s"expected source, got $other")
    }
    val steps = o("steps").asArr.map {
      case s: Json.Obj => s("type").asStr match {
        case "bloom_seen" => BloomSeenStep(
          name = s("name").asStr, table = s("table").asStr,
          urlCol = s("urlCol").asStr,
          nBits = s.get("nBits").map(_.asNum.toInt).getOrElse(1 << 16),
          nHashes = s.get("nHashes").map(_.asNum.toInt).getOrElse(4))
        case "domain_cap" => DomainCapStep(
          name = s("name").asStr, table = s("table").asStr,
          idCol = s("idCol").asStr, urlCol = s("urlCol").asStr,
          cap = s("cap").asNum.toInt,
          seed = s.get("seed").map(_.asStr).getOrElse("cap0"))
        case "kmv_distinct" => KmvDistinctStep(
          name = s("name").asStr, table = s("table").asStr,
          groupCol = s("groupCol").asStr, valueCol = s("valueCol").asStr,
          k = s.get("k").map(_.asNum.toInt).getOrElse(256))
        case "hll_distinct" => HllDistinctStep(
          name = s("name").asStr, table = s("table").asStr,
          groupCol = s("groupCol").asStr, valueCol = s("valueCol").asStr,
          p = s.get("p").map(_.asNum.toInt).getOrElse(8))
        case "ewma" => EwmaStep(
          name = s("name").asStr, table = s("table").asStr,
          keyCol = s("keyCol").asStr, tUsCol = s("tUsCol").asStr,
          idCol = s("idCol").asStr, valueCol = s("valueCol").asStr,
          k = s.get("k").map(_.asNum.toInt).getOrElse(3))
        case "weighted_sample" => WeightedSampleStep(
          name = s("name").asStr, table = s("table").asStr,
          idCol = s("idCol").asStr, groupCol = s("groupCol").asStr,
          weightCol = s("weightCol").asStr, k = s("k").asNum.toInt,
          seed = s.get("seed").map(_.asStr).getOrElse("ws0"))
        case "trend" => TrendStep(
          name = s("name").asStr, table = s("table").asStr,
          keyCol = s("keyCol").asStr, tUsCol = s("tUsCol").asStr,
          idCol = s("idCol").asStr, valueCol = s("valueCol").asStr,
          unitUs = s.get("unitUs").map(_.asNum.toLong).getOrElse(60000000L))
        case other => throw Json.ParseError(s"unknown step type '$other'")
      }
      case other => throw Json.ParseError(s"expected step, got $other")
    }
    CurationRequest(
      uuid = o("uuid").asStr,
      source = src,
      jdbcUrl = o("jdbcUrl").asStr,
      driverName = o("driverName").asStr,
      steps = steps,
      userName = o.get("userName").map(_.asStr),
      password = o.get("password").map(_.asStr))
  }

  def writeCurationInfo(i: CurationService.CurationInfo): Json.Value =
    Json.Obj.of(
      "uuid" -> Json.Str(i.uuid),
      "status" -> Json.Str(i.status),
      "steps" -> Json.Arr(i.steps.map(s => Json.Obj(Seq[(String, Json.Value)](
        "name" -> Json.Str(s.name),
        "active" -> Json.Bool(s.active),
        "batchId" -> Json.Num(s.batchId.toDouble),
        "inputRows" -> Json.Num(s.inputRows.toDouble)) ++
        s.error.map(e => "error" -> (Json.Str(e): Json.Value))))))

  // ------------------------------------------------------------- writers

  def writeRequest(r: FindPatternsRequest): Json.Value =
    Json.Obj.of(
      "uuid" -> Json.Str(r.uuid),
      "priority" -> Json.Num(r.priority),
      "source" -> writeSource(r.inputConf),
      "sinks" -> Json.Arr(r.outConfs.map(writeSink)),
      "patterns" -> Json.Arr(r.patterns.map(p => Json.Obj.of(
        "id" -> Json.Str(p.id),
        "sourceCode" -> Json.Str(p.sourceCode),
        "subunit" -> Json.Num(p.subunit),
        "metadata" -> Json.Obj(p.metadata.toSeq.sorted.map {
          case (k, v) => k -> (Json.Str(v): Json.Value) })))))

  def writeSource(c: SourceConf): Json.Value = {
    val common = Seq[(String, Json.Value)](
      "datetimeField" -> Json.Str(c.datetimeField),
      "timestampMultiplier" -> Json.Num(c.timestampMultiplier),
      "partitionFields" -> Json.Arr(c.partitionFields.map(Json.Str)),
      "eventsMaxGapMs" -> Json.Num(c.eventsMaxGapMs.toDouble),
      "defaultEventsGapMs" -> Json.Num(c.defaultEventsGapMs.toDouble)) ++
      c.unitIdField.map(u => "unitIdField" -> (Json.Str(u): Json.Value)) ++
      c.dataTransformation.map(t => "dataTransformation" -> writeTransformation(t))
    c match {
      case j: JdbcSourceConf => Json.Obj(Seq[(String, Json.Value)](
        "type" -> Json.Str("jdbc"),
        "jdbcUrl" -> Json.Str(j.jdbcUrl),
        "query" -> Json.Str(j.query),
        "driverName" -> Json.Str(j.driverName)) ++
        j.userName.map(u => "userName" -> (Json.Str(u): Json.Value)) ++
        j.password.map(p => "password" -> (Json.Str(p): Json.Value)) ++ common)
      case k: KafkaSourceConf => Json.Obj(Seq[(String, Json.Value)](
        "type" -> Json.Str("kafka"),
        "brokers" -> Json.Str(k.brokers),
        "topic" -> Json.Str(k.topic),
        "fieldsTypes" -> Json.Obj(k.fieldsTypes.toSeq.sorted.map {
          case (n, t) => n -> (Json.Str(t): Json.Value) }))
        ++ k.group.map(g => "group" -> (Json.Str(g): Json.Value))
        ++ common)
    }
  }

  def writeTransformation(t: SourceTransformation): Json.Value = t match {
    case n: NarrowDataUnfolding => Json.Obj(Seq[(String, Json.Value)](
      "type" -> Json.Str("NarrowDataUnfolding"),
      "keyColumn" -> Json.Str(n.keyColumn),
      "defaultValueColumn" -> Json.Str(n.defaultValueColumn),
      "sensors" -> Json.Arr(n.sensors.map(Json.Str)),
      "valueColumnMapping" -> Json.Obj(n.valueColumnMapping.toSeq.sorted.map {
        case (k, v) => k -> (Json.Str(v): Json.Value) })) ++
      n.defaultTimeoutMs.map(ms => "defaultTimeoutMs" -> (Json.Num(ms.toDouble): Json.Value)))
    case w: WideDataFilling => Json.Obj(Seq[(String, Json.Value)](
      "type" -> Json.Str("WideDataFilling"),
      "fillColumns" -> Json.Arr(w.fillColumns.map(Json.Str))) ++
      w.defaultTimeoutMs.map(ms => "defaultTimeoutMs" -> (Json.Num(ms.toDouble): Json.Value)))
  }

  def writeSink(s: JdbcSinkConf): Json.Value =
    Json.Obj(Seq[(String, Json.Value)](
      "tableName" -> Json.Str(s.tableName),
      "rowSchema" -> Json.Obj(s.rowSchema.columns.toSeq.sortBy(_._1).map {
        case (n, spec) => n -> (Json.Obj.of(
          "type" -> Json.Str(spec.sqlType),
          "value" -> Json.Str(spec.template)): Json.Value) }),
      "jdbcUrl" -> Json.Str(s.jdbcUrl),
      "driverName" -> Json.Str(s.driverName)) ++
      s.userName.map(u => "userName" -> (Json.Str(u): Json.Value)) ++
      s.password.map(p => "password" -> (Json.Str(p): Json.Value)))

  def writeInfo(i: JobInfo): Json.Value =
    Json.Obj(Seq[(String, Json.Value)](
      "uuid" -> Json.Str(i.uuid),
      "status" -> Json.Str(i.status.toString),
      "rowsRead" -> Json.Num(i.rowsRead.toDouble),
      "rowsWritten" -> Json.Num(i.rowsWritten.toDouble),
      "forceFinalized" -> Json.Num(i.forceFinalized.toDouble)) ++
      i.error.map(e => "error" -> (Json.Str(e): Json.Value)))
}
