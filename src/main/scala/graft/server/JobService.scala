package graft.server

import graft.dsl.{PatternConfig, Parser, TspEngine}
import graft.io.{JdbcSinkConf, Sinks, SourceConf, Sources}
import org.apache.spark.sql.SparkSession

import java.util.concurrent.{ConcurrentHashMap, Executors, PriorityBlockingQueue}
import java.util.concurrent.atomic.AtomicBoolean
import scala.jdk.CollectionConverters._
import scala.util.{Failure, Success, Try}

/** Programmatic job manager — the engine-side analogue of the reference's
  * HTTP job API (reference: http/.../routes/JobsRoutes.scala:32-38,
  * services/queuing/JobRunService.scala:63-170): a priority queue of
  * submitted jobs drained by a scheduler, per-job status/stop/overview, and
  * parse-only validation. The transport layer (HTTP) is intentionally
  * absent — this environment ships no server library, and every endpoint's
  * semantics live here, one `route` definition away.
  */
final class JobService(spark: SparkSession, maxConcurrent: Int = 1) {

  import JobService._

  private val queue = new PriorityBlockingQueue[Submitted](16,
    Ordering.by[Submitted, Int](-_.priority))
  private val jobs = new ConcurrentHashMap[String, JobInfo]()
  private val stopped = new ConcurrentHashMap[String, AtomicBoolean]()
  private val pool = Executors.newFixedThreadPool(maxConcurrent)
  @volatile private var running = true

  private val scheduler = new Thread(() => {
    while (running) {
      val next = queue.poll(100, java.util.concurrent.TimeUnit.MILLISECONDS)
      if (next != null) pool.submit(new Runnable { def run(): Unit = execute(next) })
    }
  }, "graft-job-scheduler")
  scheduler.setDaemon(true)
  scheduler.start()

  /** POST /job/submit analogue. */
  def submit(req: FindPatternsRequest): Either[Seq[String], String] = {
    val errors = TspEngine.validate(req.patterns.map(_.sourceCode))
      .zip(req.patterns)
      .collect { case (Left(e), p) => s"pattern ${p.id}: $e" }
    if (errors.nonEmpty) Left(errors)
    else {
      jobs.put(req.uuid, JobInfo(req.uuid, JobStatus.Queued, None, 0L))
      stopped.put(req.uuid, new AtomicBoolean(false))
      queue.put(Submitted(req, req.priority))
      Right(req.uuid)
    }
  }

  /** POST /patterns/validate analogue: per-pattern fields or error. */
  def validate(patterns: Seq[String]): Seq[Either[String, Set[String]]] =
    TspEngine.validate(patterns)

  /** GET /job/:uuid/status analogue. */
  def status(uuid: String): Option[JobInfo] = Option(jobs.get(uuid))

  /** GET /jobs/overview analogue. */
  def overview: Seq[JobInfo] = jobs.values().asScala.toSeq.sortBy(_.uuid)

  /** POST /job/:uuid/stop analogue (takes effect before execution starts;
    * running Spark jobs finish their current action).
    */
  def stop(uuid: String): Boolean =
    Option(stopped.get(uuid)).exists { f => f.set(true); true }

  def shutdown(): Unit = { running = false; pool.shutdown() }

  private def execute(s: Submitted): Unit = {
    val uuid = s.req.uuid
    if (stopped.get(uuid).get()) {
      jobs.put(uuid, JobInfo(uuid, JobStatus.Stopped, None, 0L))
      return
    }
    jobs.put(uuid, JobInfo(uuid, JobStatus.Running, None, 0L))
    Try {
      val events = Sources.read(spark, s.req.inputConf)
      val cfg = PatternConfig(
        keys = s.req.inputConf.partitionFields,
        tsCol = "ts",
        eventsMaxGapMs = s.req.inputConf.eventsMaxGapMs,
        sessionGapMs = s.req.inputConf.defaultEventsGapMs,
        unitIdField = s.req.inputConf.unitIdField)
      // unit comes from the configured unitIdField per incident; subunit and
      // meta ride in from each RawPattern (reference ToIncidentsMapper).
      // Without a unitIdField the reference's new-sink path is unusable
      // (it `.get`s the option); we default unit=0 for old-sink schemas.
      val incidents0 = TspEngine.incidentsAllShared(events, s.req.patterns, cfg)
      val incidents =
        if (incidents0.columns.contains("unit")) incidents0
        else incidents0.withColumn("unit", org.apache.spark.sql.functions.lit(0))
      // materialize once: each sink writes AND counts, and without this the
      // whole incidents pipeline would re-execute per action
      incidents.persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
      try {
        var written = 0L
        s.req.outConfs.foreach { out =>
          val rows = Sinks.toSinkRows(incidents, out.rowSchema)
          Sinks.writeJdbc(rows, out)
          written += rows.count()
        }
        written
      } finally incidents.unpersist()
    } match {
      case Success(n) => jobs.put(uuid, JobInfo(uuid, JobStatus.Finished, None, n))
      case Failure(e) => jobs.put(uuid, JobInfo(uuid, JobStatus.Failed, Some(e.getMessage), 0L))
    }
  }
}

object JobService {

  /** Mirror of the reference's FindPatternsRequest
    * (http/.../domain/input/Request.scala:36-47).
    */
  final case class FindPatternsRequest(
    uuid: String,
    inputConf: SourceConf,
    outConfs: Seq[JdbcSinkConf],
    priority: Int,
    patterns: Seq[TspEngine.RawPattern])

  sealed trait JobStatus
  object JobStatus {
    case object Queued extends JobStatus
    case object Running extends JobStatus
    case object Finished extends JobStatus
    case object Failed extends JobStatus
    case object Stopped extends JobStatus
  }

  final case class JobInfo(uuid: String, status: JobStatus,
    error: Option[String], rowsWritten: Long)

  private final case class Submitted(req: FindPatternsRequest, priority: Int)
}
