package graft.server

import graft.io.{JdbcSinkConf, RowSchema, Sinks}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.StreamingQuery

import java.util.concurrent.ConcurrentHashMap
import scala.jdk.CollectionConverters._
import scala.util.Try

/** Streaming-curation jobs: the continuous LLM-data-pipeline operators
  * (seen-URL bloom filter, per-domain quota cap, per-group distinct
  * sketch) behind the same job-server surface as the pattern jobs —
  * source conf → chosen stream operators → JDBC sink, each step its own
  * Structured Streaming query with its own checkpoint, resumable by
  * resubmitting the uuid.
  *
  * The reference's job API runs pattern-search jobs only
  * (http/.../routes/JobsRoutes.scala:32-38); this extends the same
  * lifecycle (submit/status/stop, JSON over HTTP via [[JobRoutes]]) to
  * the curation family so a crawl pipeline needs no bespoke driver
  * program.
  *
  * Delivery contract: every step writes through the idempotent JDBC sink
  * ([[Sinks.foreachBatchJdbc]] — (job, batch)-tagged delete-insert), so a
  * micro-batch replay after a sink-side failure overwrites its own rows
  * instead of duplicating them. The update-mode operators emit REFRESHED
  * rows per key; the current view of a sink table is the latest
  * `graft_batch` per key (for the cap: per domain; for the bloom filter:
  * `bit_or(bits)` per word — bits are monotone, so compaction is also
  * valid, exactly the [[graft.operators.Sketches.bloomProbe]] convention).
  *
  * Scale shape: state and emission are bounded per key (filter words /
  * cap survivors / k hashes) — a job runs indefinitely with state
  * proportional to key cardinality, never stream length; the file source
  * tracks processed files in the checkpoint, so a restart re-reads
  * nothing.
  */
object CurationService {

  /** Streaming file source: `format` parquet/json/csv, `schemaDdl` a DDL
    * string (file streams require an explicit schema), `path` a directory
    * watched for new files — the offline-testable stand-in for the Kafka
    * feed (the connector jars are unavailable in this environment; the
    * conf shape is source-agnostic).
    */
  final case class FileSourceConf(format: String, path: String,
    schemaDdl: String, maxFilesPerTrigger: Option[Int] = None)

  sealed trait CurationStep {
    def name: String

    /** Sink table the step maintains. */
    def table: String
  }

  /** Seen-URL bloom filter per domain: the crawl frontier's "have I seen
    * this URL" gate as a persisted (group=domain, word_idx, bits)
    * relation — load it with `bit_or` compaction and probe with
    * [[graft.operators.Sketches.bloomProbe]].
    */
  final case class BloomSeenStep(name: String, table: String, urlCol: String,
    nBits: Int = 1 << 16, nHashes: Int = 4) extends CurationStep

  /** Per-domain quota cap: ≤ `cap` docs per canonicalized domain, chosen
    * by seeded id-hash order — the continuous
    * [[graft.operators.Sampling.domainCap]].
    */
  final case class DomainCapStep(name: String, table: String, idCol: String,
    urlCol: String, cap: Int, seed: String = "cap0") extends CurationStep

  /** Per-group distinct-count KMV sketch over a column. */
  final case class KmvDistinctStep(name: String, table: String,
    groupCol: String, valueCol: String, k: Int = 256) extends CurationStep

  /** Per-group HyperLogLog registers over a column — the fixed-memory
    * distinct counter (2^p registers per group, idempotent MAX merge):
    * load the sink table with max-compaction per (group, reg) and
    * estimate with [[graft.operators.Sketches.hllEstimate]].
    */
  final case class HllDistinctStep(name: String, table: String,
    groupCol: String, valueCol: String, p: Int = 8) extends CurationStep

  /** Per-key EWMA level + residual over a pre-quantized BIGINT metric —
    * continuous telemetry smoothing/anomaly scoring
    * ([[graft.streaming.StreamingEwma.ewmaStream]]; in-order-per-key feed
    * contract). Emits every event once (append semantics, unlike the
    * update-mode sketch steps).
    */
  final case class EwmaStep(name: String, table: String, keyCol: String,
    tUsCol: String, idCol: String, valueCol: String,
    k: Int = 3) extends CurationStep

  /** Per-group weighted sample without replacement (priority sampling,
    * Duffield–Lund–Thorup): the k highest seeded-hash priorities per group
    * with the `max(w, τ)` subset-sum estimate — the continuous
    * [[graft.streaming.StreamingSample.weightedSampleStream]]. Update
    * semantics: the latest ranked list per group IS the sample. Weights
    * must be integral in [1, 16384] (violations fail the step loudly).
    */
  final case class WeightedSampleStep(name: String, table: String,
    idCol: String, groupCol: String, weightCol: String, k: Int,
    seed: String = "ws0") extends CurationStep

  /** Per-key OLS trend slope over a pre-quantized BIGINT metric — the
    * drift-direction signal beside [[EwmaStep]]'s level tracking
    * ([[graft.streaming.StreamingTrend.trendStream]]; in-order-per-key
    * feed contract — the rebase origin is the first event seen). Update
    * semantics: the latest row per key IS the trend.
    */
  final case class TrendStep(name: String, table: String, keyCol: String,
    tUsCol: String, idCol: String, valueCol: String,
    unitUs: Long = 60000000L) extends CurationStep

  final case class CurationRequest(
    uuid: String,
    source: FileSourceConf,
    jdbcUrl: String,
    driverName: String,
    steps: Seq[CurationStep],
    userName: Option[String] = None,
    password: Option[String] = None)

  final case class StepProgress(name: String, active: Boolean,
    batchId: Long, inputRows: Long, error: Option[String])

  final case class CurationInfo(uuid: String, status: String,
    steps: Seq[StepProgress])

  private val supportedFormats = Set("parquet", "json", "csv", "orc")
}

final class CurationService(spark: SparkSession, checkpointRoot: String) {

  import CurationService._

  private final case class Running(req: CurationRequest,
                                   queries: Seq[(String, StreamingQuery)])

  private val jobs = new ConcurrentHashMap[String, Running]()

  // cumulative input rows per query RUN: `recentProgress` retains only the
  // last ~100 progress reports, so a sum over it silently stops being
  // cumulative on a long-running job — the listener keeps the true total.
  // (status() still reads recentProgress as a synchronous floor: listener
  // delivery is async, so right after a batch the listener may lag.)
  private val rowsByRun =
    new ConcurrentHashMap[java.util.UUID, java.util.concurrent.atomic.AtomicLong]()

  private val progressListener =
    new org.apache.spark.sql.streaming.StreamingQueryListener {
      import org.apache.spark.sql.streaming.StreamingQueryListener._
      override def onQueryStarted(e: QueryStartedEvent): Unit = ()
      override def onQueryProgress(e: QueryProgressEvent): Unit =
        rowsByRun.computeIfAbsent(e.progress.runId,
          _ => new java.util.concurrent.atomic.AtomicLong())
          .addAndGet(e.progress.numInputRows)
      override def onQueryTerminated(e: QueryTerminatedEvent): Unit =
        // keep totals only for runs a tracked job still references (a
        // stopped job's status keeps its count); drop everything else so
        // the map never grows with the session's unrelated queries
        if (!jobs.values().asScala.exists(
            _.queries.exists(_._2.runId == e.runId)))
          rowsByRun.remove(e.runId)
    }
  spark.streams.addListener(progressListener)

  private def validate(req: CurationRequest): Seq[String] = {
    val errs = Seq.newBuilder[String]
    if (req.uuid.isEmpty || req.uuid.length > 60 || req.uuid.contains('/'))
      errs += s"uuid must be 1-60 chars without '/': '${req.uuid}'"
    if (!supportedFormats.contains(req.source.format))
      errs += s"unsupported source format '${req.source.format}'"
    if (Try(org.apache.spark.sql.types.StructType.fromDDL(req.source.schemaDdl)).isFailure)
      errs += s"bad schema DDL '${req.source.schemaDdl}'"
    if (req.steps.isEmpty) errs += "at least one step is required"
    val dup = req.steps.groupBy(_.name).collect { case (n, ss) if ss.size > 1 => n }
    dup.foreach(n => errs += s"duplicate step name '$n'")
    req.steps.foreach { s =>
      // the name splices into the checkpoint PATH and the sink job tag:
      // path chars would escape the job's checkpoint subtree, and the tag
      // "<uuid>/<name>" must fit writeJdbcBatch's 64-char cap — reject at
      // submit instead of failing opaquely on every micro-batch
      if (!s.name.matches("[A-Za-z0-9_-]{1,24}"))
        errs += s"step name must be 1-24 chars of [A-Za-z0-9_-]: '${s.name}'"
      else if (req.uuid.length + 1 + s.name.length > 64)
        errs += s"uuid/step tag '${req.uuid}/${s.name}' exceeds 64 chars"
    }
    req.steps.foreach {
      case s: DomainCapStep if s.cap <= 0 =>
        errs += s"step ${s.name}: cap must be > 0"
      case s: KmvDistinctStep if s.k <= 1 =>
        errs += s"step ${s.name}: k must be > 1"
      case s: HllDistinctStep if s.p < 4 || s.p > 16 =>
        errs += s"step ${s.name}: p must be in [4, 16]"
      case s: EwmaStep if s.k < 1 || s.k > 16 =>
        errs += s"step ${s.name}: k must be in [1, 16]"
      case s: WeightedSampleStep if s.k < 1 || s.k > 4096 =>
        errs += s"step ${s.name}: k must be in [1, 4096]"
      case s: TrendStep if s.unitUs < 1L =>
        errs += s"step ${s.name}: unitUs must be >= 1"
      case _ => ()
    }
    errs.result()
  }

  /** Emission semantics per step: the sketch/cap steps refresh keyed rows
    * (update), the EWMA step emits each event exactly once (append).
    */
  private def stepOutputMode(step: CurationStep): String = step match {
    case _: EwmaStep => "append"
    case _           => "update"
  }

  private def stepFrame(docs: DataFrame, step: CurationStep): DataFrame = step match {
    case s: BloomSeenStep =>
      graft.streaming.StreamingSketch.bloomStream(
        docs.select(
          graft.operators.Sampling.urlDomain(col(s.urlCol)).as("group"),
          col(s.urlCol).as("value")),
        nBits = s.nBits, nHashes = s.nHashes).toDF()
    case s: DomainCapStep =>
      graft.streaming.StreamingSample.domainCapStream(
        docs, s.idCol, s.urlCol, s.cap, s.seed).toDF()
    case s: KmvDistinctStep =>
      graft.streaming.StreamingSketch.kmvDistinctStream(
        docs.select(col(s.groupCol).as("group"), col(s.valueCol).as("value")),
        k = s.k).toDF()
    case s: HllDistinctStep =>
      graft.streaming.StreamingSketch.hllStream(
        docs.select(col(s.groupCol).as("group"), col(s.valueCol).as("value")),
        p = s.p).toDF()
    case s: EwmaStep =>
      graft.streaming.StreamingEwma.ewmaStream(
        docs.select(col(s.keyCol).as("key"), col(s.tUsCol).as("t_us"),
          col(s.idCol).as("event_id"), col(s.valueCol).as("v")),
        k = s.k).toDF()
    case s: WeightedSampleStep =>
      graft.streaming.StreamingSample.weightedSampleStream(
        docs, s.idCol, s.groupCol, s.weightCol, s.k, s.seed).toDF()
    case s: TrendStep =>
      graft.streaming.StreamingTrend.trendStream(
        docs.select(col(s.keyCol).as("key"), col(s.tUsCol).as("t_us"),
          col(s.idCol).as("event_id"), col(s.valueCol).as("v")),
        unitUs = s.unitUs).toDF()
  }

  /** Start (or resume) a curation job: one streaming query per step, each
    * checkpointed under `checkpointRoot/uuid/step` — resubmitting a
    * stopped uuid resumes every step from its checkpoint (processed files
    * are not re-read; operator state restores). A uuid with queries still
    * active is rejected.
    */
  /** Synchronized: two concurrent submits of one uuid must not both pass
    * the already-running check and double-start query sets (checkpoint /
    * queryName collisions with one winner untracked).
    */
  def submit(req: CurationRequest): Either[Seq[String], String] = synchronized {
    val errs = validate(req)
    if (errs.nonEmpty) return Left(errs)
    val existing = Option(jobs.get(req.uuid))
    if (existing.exists(_.queries.exists(_._2.isActive)))
      return Left(Seq(s"job ${req.uuid} is already running"))
    // start step by step; if the Nth start fails, the N-1 already-running
    // queries are STOPPED before reporting the error — a partial start
    // must not leak untracked queries holding the uuid's checkpoints
    val begun = Seq.newBuilder[(String, StreamingQuery)]
    val started = Try {
      val docs = {
        var r = spark.readStream.format(req.source.format)
          .schema(req.source.schemaDdl)
        req.source.maxFilesPerTrigger.foreach(n =>
          r = r.option("maxFilesPerTrigger", n))
        r.load(req.source.path)
      }
      req.steps.map { step =>
        val sink = JdbcSinkConf(step.table, RowSchema(Map.empty),
          req.jdbcUrl, req.driverName, req.userName, req.password)
        val q = stepFrame(docs, step).writeStream
          .queryName(s"curation-${req.uuid}-${step.name}")
          .outputMode(stepOutputMode(step))
          .option("checkpointLocation",
            s"$checkpointRoot/${req.uuid}/${step.name}")
          .foreachBatch(Sinks.foreachBatchJdbc(sink, s"${req.uuid}/${step.name}"))
          .start()
        begun += step.name -> q
        step.name -> q
      }
    }
    started.toEither.left.map { e =>
      begun.result().foreach { case (_, q) => Try(if (q.isActive) q.stop()) }
      Seq(String.valueOf(e.getMessage))
    }.map { qs =>
      jobs.put(req.uuid, Running(req, qs))
      req.uuid
    }
  }

  def status(uuid: String): Option[CurationInfo] =
    Option(jobs.get(uuid)).map { r =>
      val steps = r.queries.map { case (name, q) =>
        val p = Option(q.lastProgress)
        val recent = q.recentProgress.map(_.numInputRows).sum
        val total = Option(rowsByRun.get(q.runId)).map(_.get()).getOrElse(0L)
        StepProgress(name,
          active = q.isActive,
          batchId = p.map(_.batchId).getOrElse(-1L),
          inputRows = math.max(total, recent),
          error = q.exception.map(_.getMessage))
      }
      val status =
        if (steps.exists(_.error.isDefined)) "Failed"
        else if (steps.forall(_.active)) "Running"
        else "Stopped"
      CurationInfo(uuid, status, steps)
    }

  def overview: Seq[CurationInfo] =
    jobs.keys().asScala.toSeq.sorted.flatMap(status)

  /** Stop every step's query; checkpoints stay, so a resubmit resumes. */
  def stop(uuid: String): Boolean = Option(jobs.get(uuid)).exists { r =>
    r.queries.foreach { case (_, q) => if (q.isActive) q.stop() }
    true
  }

  /** Drain every pending file/batch of the job's queries — deterministic
    * settling for tests and controlled shutdowns.
    */
  def awaitIdle(uuid: String): Boolean = Option(jobs.get(uuid)).exists { r =>
    r.queries.foreach { case (_, q) => if (q.isActive) q.processAllAvailable() }
    true
  }

  def shutdown(): Unit = {
    jobs.values().asScala.foreach(_.queries.foreach { case (_, q) =>
      if (q.isActive) q.stop()
    })
    spark.streams.removeListener(progressListener)
  }
}
