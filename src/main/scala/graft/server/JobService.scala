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
  * parse-only validation. [[JobRoutes]] exposes these over HTTP on the
  * JDK's built-in server; every endpoint's semantics live here so the
  * transport stays a thin shim.
  *
  * With `checkpointDir` set, each job persists progress (rows read, max
  * event time, rows written) after completion — the batch analogue of the
  * reference's CheckpointingService (CheckpointingService.scala:12-168,
  * which checkpoints read-row counts for resume and monitoring).
  * Resubmitting a uuid resumes from the recorded event time: only events
  * strictly after it are read, so append-only sources re-process nothing.
  * An incident spanning the resume boundary splits (the reference avoids
  * this by also checkpointing pattern state mid-stream; a from-scratch
  * batch rerun gives exact results when that matters). The checkpoint is
  * written only after ALL sinks succeed: a failure between two sinks
  * leaves no checkpoint, so a resubmit re-reads the window and duplicates
  * rows already landed in the earlier sink — idempotent sink schemas (or
  * one sink per job) are the mitigation, same as the reference's
  * at-least-once sink contract.
  */
final class JobService(spark: SparkSession, maxConcurrent: Int = 1,
                       checkpointDir: Option[String] = None) {

  import JobService._

  private val queue = new PriorityBlockingQueue[Submitted](16,
    Ordering.by[Submitted, Int](-_.priority))
  private val jobs = new ConcurrentHashMap[String, JobInfo]()
  private val requests = new ConcurrentHashMap[String, FindPatternsRequest]()
  private val stopped = new ConcurrentHashMap[String, AtomicBoolean]()
  // per-job force-finalize counter (streaming truncation metric); a named
  // Spark accumulator so executor-side machines can bump it and a status
  // poll reads it live on the driver
  private val accs =
    new ConcurrentHashMap[String, org.apache.spark.util.LongAccumulator]()
  // terminal jobs in completion order, for bounded retention: a long-lived
  // service would otherwise hold every request (with its pattern sources)
  // forever
  private val terminalOrder = new java.util.concurrent.ConcurrentLinkedQueue[String]()
  private val maxRetained = 1000
  private val pool = Executors.newFixedThreadPool(maxConcurrent)
  @volatile private var running = true

  /** Record a terminal status and evict the oldest terminal jobs' state
    * (request, stop flag, info) beyond the retention cap.
    */
  private def markTerminal(info: JobInfo): Unit = {
    jobs.put(info.uuid, info)
    terminalOrder.add(info.uuid)
    while (terminalOrder.size > maxRetained) {
      val old = terminalOrder.poll()
      if (old != null) {
        jobs.remove(old); requests.remove(old); stopped.remove(old)
        accs.remove(old)
      }
    }
  }

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
      requests.put(req.uuid, req)
      accs.put(req.uuid,
        spark.sparkContext.longAccumulator(s"graft.forceFinalize.${req.uuid}"))
      stopped.put(req.uuid, new AtomicBoolean(false))
      queue.put(Submitted(req, req.priority))
      Right(req.uuid)
    }
  }

  /** GET /queue/show analogue: jobs submitted but not yet started. */
  def queued: Seq[FindPatternsRequest] =
    queue.iterator().asScala.map(_.req).toSeq.sortBy(_.uuid)

  /** GET /queue/:uuid/remove analogue — true iff the job was still queued
    * (a running job must go through [[stop]] instead, which is what the
    * reference's route redirects to: JobsRoutes.scala:48-52).
    *
    * `removeIf`'s boolean is authoritative (an iterator `remove()` no-ops
    * silently if the scheduler dequeued the entry between `next()` and
    * `remove()`); the stopped flag is set as well so that if the scheduler
    * won the race anyway, `execute`'s pre-run guard still cancels the job.
    */
  def removeFromQueue(uuid: String): Boolean = {
    val removed = queue.removeIf(_.req.uuid == uuid)
    if (removed) {
      Option(stopped.get(uuid)).foreach(_.set(true))
      markTerminal(JobInfo(uuid, JobStatus.Stopped, None, 0L))
    }
    removed
  }

  /** GET /job/:uuid/request analogue: the request as submitted. */
  def request(uuid: String): Option[FindPatternsRequest] =
    Option(requests.get(uuid))

  /** POST /patterns/validate analogue: per-pattern fields or error. */
  def validate(patterns: Seq[String]): Seq[Either[String, Set[String]]] =
    TspEngine.validate(patterns)

  /** GET /job/:uuid/status analogue — merges the live force-finalize
    * accumulator reading into the stored info.
    */
  def status(uuid: String): Option[JobInfo] = Option(jobs.get(uuid)).map { i =>
    Option(accs.get(uuid)).fold(i)(a => i.copy(forceFinalized = a.value))
  }

  /** The job's force-finalize accumulator, for wiring into a streaming
    * evaluation's [[graft.streaming.StreamingPatterns.StreamConfig]].
    */
  def forceFinalizeAcc(uuid: String): Option[org.apache.spark.util.LongAccumulator] =
    Option(accs.get(uuid))

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
    // the flag may have been removed by retention eviction if this entry
    // raced a removeFromQueue — treat missing as stopped
    if (Option(stopped.get(uuid)).forall(_.get())) {
      markTerminal(JobInfo(uuid, JobStatus.Stopped, None, 0L))
      return
    }
    jobs.put(uuid, JobInfo(uuid, JobStatus.Running, None, 0L))
    Try {
      val prior = checkpoint(uuid)
      val all = Sources.read(spark, s.req.inputConf)
      // resume: skip everything at or before the checkpointed event time
      val events = prior.filter(_.maxTsMs != Long.MinValue)
        .map(c => all.filter(
          org.apache.spark.sql.functions.unix_millis(
            org.apache.spark.sql.functions.col("ts")) > c.maxTsMs))
        .getOrElse(all)
      val cfg = PatternConfig(
        keys = s.req.inputConf.partitionFields,
        tsCol = "ts",
        eventsMaxGapMs = s.req.inputConf.eventsMaxGapMs,
        sessionGapMs = s.req.inputConf.defaultEventsGapMs,
        unitIdField = s.req.inputConf.unitIdField)
      // snapshot the input before anything runs: a live source (JDBC) can
      // grow between the incident computation and the checkpoint agg, and a
      // high-water mark taken from a re-scan would record those new rows as
      // processed — so rows-read and max event time come from the SAME
      // persisted frame the incidents are computed from
      events.persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
      import org.apache.spark.sql.functions.{count => cnt, max => mx, unix_millis, col, lit}
      val stats = events.agg(cnt(lit(1)), mx(unix_millis(col("ts")))).head()
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
        // progress metrics: rows read this run + high-water event time, the
        // CheckpointingService analogue (accumulated across resumes) —
        // computed above from the persisted snapshot, not a source re-scan
        val rowsRead = stats.getLong(0)
        val maxTs =
          if (stats.isNullAt(1)) prior.map(_.maxTsMs).getOrElse(Long.MinValue)
          else stats.getLong(1)
        val ck = JobCheckpoint(
          rowsRead = prior.map(_.rowsRead).getOrElse(0L) + rowsRead,
          maxTsMs = maxTs,
          rowsWritten = prior.map(_.rowsWritten).getOrElse(0L) + written)
        saveCheckpoint(uuid, ck)
        (written, ck.rowsRead)
      } finally { incidents.unpersist(); events.unpersist() }
    } match {
      case Success((n, read)) =>
        markTerminal(JobInfo(uuid, JobStatus.Finished, None, n, read))
      case Failure(e) =>
        markTerminal(JobInfo(uuid, JobStatus.Failed, Some(e.getMessage), 0L))
    }
  }

  /** GET /job/:uuid/checkpoint analogue (monitoring + resume source). */
  def checkpoint(uuid: String): Option[JobCheckpoint] = checkpointDir.flatMap { d =>
    val p = java.nio.file.Paths.get(d, s"$uuid.ck")
    if (!java.nio.file.Files.exists(p)) None
    else java.nio.file.Files.readString(p).split(',') match {
      case Array(r, m, w) => Some(JobCheckpoint(r.toLong, m.toLong, w.toLong))
      case _              => None
    }
  }

  private def saveCheckpoint(uuid: String, ck: JobCheckpoint): Unit =
    checkpointDir.foreach { d =>
      val dir = java.nio.file.Paths.get(d)
      java.nio.file.Files.createDirectories(dir)
      java.nio.file.Files.writeString(dir.resolve(s"$uuid.ck"),
        s"${ck.rowsRead},${ck.maxTsMs},${ck.rowsWritten}")
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

  /** `forceFinalized` counts streaming force-finalize cuts (a
    * forward-looking pattern whose decision frontier stalled past
    * `maxUndecidedEvents` — see
    * [[graft.streaming.StreamingPatterns.StreamConfig]]); always 0 for
    * batch jobs, which never buffer undecided events.
    */
  final case class JobInfo(uuid: String, status: JobStatus,
    error: Option[String], rowsWritten: Long, rowsRead: Long = 0L,
    forceFinalized: Long = 0L)

  /** Persistent job progress — the CheckpointingService analogue: rows read
    * and written accumulate across resumes; `maxTsMs` is the resume point.
    */
  final case class JobCheckpoint(rowsRead: Long, maxTsMs: Long, rowsWritten: Long)

  private final case class Submitted(req: FindPatternsRequest, priority: Int)
}
