package graft.server

import graft.SparkSpec
import graft.operators.{Sampling, Sketches}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** The streaming-curation job type end to end: a bloom+cap pipeline over
  * a file-stream source (the offline stand-in for the Kafka feed), each
  * step its own checkpointed query writing through the idempotent JDBC
  * sink; stop + resubmit resumes from the checkpoints (processed files
  * are not re-read, operator state restores), and the sink relations
  * equal the batch operators over everything fed.
  */
class CurationServiceSpec extends SparkSpec {

  import CurationService._
  import spark.implicits._

  private val url = "jdbc:derby:memory:curationdb;create=true"
  private val driver = "org.apache.derby.iapi.jdbc.AutoloadedDriver"

  private def mkDocs(ids: Range): Seq[(Long, String)] = ids.map { i =>
    (i.toLong, s"https://${Seq("a.com", "b.org", "c.net")(i % 3)}/p/$i")
  }

  private def readSink(table: String) =
    spark.read.format("jdbc")
      .option("url", url).option("dbtable", table).option("driver", driver)
      .load()

  /** Current capped selection from the emission log: the latest
    * graft_batch per domain carries the whole refreshed ranked list.
    */
  private def capView(table: String): Set[(String, Int, Long)] = {
    val w = Window.partitionBy("domain")
    readSink(table)
      .withColumn("_mx", max(col("graft_batch")).over(w))
      .filter(col("graft_batch") === col("_mx"))
      .select(col("domain"), col("rank").cast("int"), col("doc_id").cast("long"))
      .as[(String, Int, Long)].collect().toSet
  }

  /** Batch expectation: domainCap survivors with their hash-order ranks. */
  private def capExpected(docs: Seq[(Long, String)], cap: Int, seed: String)
      : Set[(String, Int, Long)] = {
    val df = docs.toDF("doc_id", "url")
    Sampling.domainCap(df, "doc_id", "url", cap, seed)
      .withColumn("rank", row_number().over(
        Window.partitionBy("domain")
          .orderBy(Sampling.capHash(col("doc_id"), seed), col("doc_id"))))
      .select(col("domain"), col("rank").cast("int"), col("doc_id").cast("long"))
      .as[(String, Int, Long)].collect().toSet
  }

  /** Per-domain OR-compacted bloom words from the emission log. */
  private def bloomView(table: String): Set[(String, Long, Long)] =
    readSink(table)
      .groupBy(col("group"), col("word_idx"))
      .agg(expr("bit_or(bits)").as("bits"))
      .filter(col("bits") =!= 0L)
      .select(col("group"), col("word_idx").cast("long"), col("bits").cast("long"))
      .as[(String, Long, Long)].collect().toSet

  private def bloomExpected(docs: Seq[(Long, String)], nBits: Int, nHashes: Int)
      : Set[(String, Long, Long)] = {
    val df = docs.toDF("doc_id", "url")
      .withColumn("domain", Sampling.urlDomain(col("url")))
    df.select("domain").distinct().as[String].collect().toSeq.flatMap { d =>
      Sketches.bloomSketch(df.filter(col("domain") === d), col("url"),
          nBits, nHashes)
        .select(col("word_idx").cast("long"), col("bits").cast("long"))
        .as[(Long, Long)].collect().map { case (w, b) => (d, w, b) }
    }.toSet
  }

  test("bloom+cap pipeline over a file stream: runs, stops, resumes from checkpoint") {
    val inDir = java.nio.file.Files.createTempDirectory("cur-in").toString
    val ckpt = java.nio.file.Files.createTempDirectory("cur-ckpt").toString
    val svc = new CurationService(spark, ckpt)
    val req = CurationRequest(
      uuid = "cur-1",
      source = FileSourceConf("parquet", inDir, "doc_id BIGINT, url STRING"),
      jdbcUrl = url, driverName = driver,
      steps = Seq(
        BloomSeenStep("bloom", "cur_bloom", "url", nBits = 1024, nHashes = 4),
        DomainCapStep("cap", "cur_cap", "doc_id", "url", cap = 3, seed = "s1")))

    val part1 = mkDocs(0 until 40)
    part1.toDF("doc_id", "url").coalesce(1)
      .write.mode("append").parquet(inDir)
    try {
      assert(svc.submit(req).isRight)
      // a second submit while running is rejected, not double-started
      assert(svc.submit(req).swap.exists(_.exists(_.contains("already running"))))
      svc.awaitIdle("cur-1")
      val st1 = svc.status("cur-1").get
      assert(st1.status == "Running" && st1.steps.forall(_.active), st1)
      assert(st1.steps.forall(_.inputRows == part1.size.toLong), st1)
      assert(capView("cur_cap") == capExpected(part1, cap = 3, "s1"))
      assert(bloomView("cur_bloom") == bloomExpected(part1, 1024, 4))

      svc.stop("cur-1")
      assert(svc.status("cur-1").get.status == "Stopped")

      // part 2 lands while the job is down; resubmitting the uuid resumes
      // from the checkpoints — the new run reads ONLY the new files
      val part2 = mkDocs(40 until 80)
      part2.toDF("doc_id", "url").coalesce(1)
        .write.mode("append").parquet(inDir)
      assert(svc.submit(req).isRight)
      svc.awaitIdle("cur-1")
      val st2 = svc.status("cur-1").get
      assert(st2.steps.forall(_.inputRows == part2.size.toLong),
        s"resume must not re-read processed files: $st2")
      val all = part1 ++ part2
      assert(capView("cur_cap") == capExpected(all, cap = 3, "s1"),
        "state must survive the restart (survivors reflect both parts)")
      assert(bloomView("cur_bloom") == bloomExpected(all, 1024, 4))
    } finally {
      svc.stop("cur-1")
      svc.shutdown()
    }
  }

  test("hll+ewma pipeline equals the batch operators, across a restart") {
    val inDir = java.nio.file.Files.createTempDirectory("cur2-in").toString
    val ckpt = java.nio.file.Files.createTempDirectory("cur2-ckpt").toString
    val svc = new CurationService(spark, ckpt)
    val req = CurationRequest(
      uuid = "cur-2",
      source = FileSourceConf("parquet", inDir,
        "grp STRING, val STRING, key BIGINT, t_us BIGINT, event_id BIGINT, v BIGINT"),
      jdbcUrl = url, driverName = driver,
      steps = Seq(
        HllDistinctStep("hll", "cur_hll", "grp", "val", p = 8),
        EwmaStep("ewma", "cur_ewma", "key", "t_us", "event_id", "v", k = 3),
        // unitUs = 1: the fixture's t_us are small integers, so rebased x
        // carries real variance instead of collapsing into one bucket
        TrendStep("trend", "cur_trend", "key", "t_us", "event_id", "v",
          unitUs = 1L)))

    def mkRows(ids: Range): Seq[(String, String, Long, Long, Long, Long)] =
      ids.map { i =>
        (s"g${i % 2}", s"u${i % 50}", (i % 3).toLong, i.toLong, i.toLong,
          (i * 37 % 1000).toLong)
      }
    def hllView: Set[(String, Long, Long)] =
      readSink("cur_hll")
        .groupBy(col("group"), col("reg"))
        .agg(max(col("max_rank")).as("r"))
        .select(col("group"), col("reg").cast("long"), col("r").cast("long"))
        .as[(String, Long, Long)].collect().toSet
    def hllExpected(rows: Seq[(String, String, Long, Long, Long, Long)]) =
      Sketches.hllRegisters(rows.toDF("grp", "val", "key", "t_us", "event_id", "v"),
          Seq("grp"), col("val"), p = 8)
        .select(col("grp"), col("reg"), col("max_rank").cast("long"))
        .as[(String, Long, Long)].collect().toSet
    def ewmaView: Set[(Long, Long, Long)] =
      readSink("cur_ewma")
        .select(col("event_id").cast("long"), col("level_q").cast("long"),
          col("resid").cast("long"))
        .as[(Long, Long, Long)].collect().toSet
    def ewmaExpected(rows: Seq[(String, String, Long, Long, Long, Long)]) =
      graft.operators.Stats.ewma(
          rows.toDF("grp", "val", "key", "t_us", "event_id", "v"),
          Seq("key"), Seq("t_us", "event_id"), "v", k = 3)
        .select(col("event_id"), col("level_q"), col("resid"))
        .as[(Long, Long, Long)].collect().toSet
    // latest row per key (max n) IS the trend — the update contract
    def trendView: Map[Long, (Long, Long)] =
      readSink("cur_trend")
        .select(col("key").cast("long"), col("n").cast("long"),
          col("slope_ppm").cast("long"))
        .as[(Long, Long, Option[Long])].collect()
        .groupBy(_._1).map { case (k, rs) =>
          val best = rs.maxBy(_._2)
          k -> ((best._2, best._3.getOrElse(Long.MinValue)))
        }
    def trendExpected(rows: Seq[(String, String, Long, Long, Long, Long)]) =
      graft.operators.Stats.trend(
          rows.toDF("grp", "val", "key", "t_us", "event_id", "v"),
          Seq("key"), "t_us", "v", xUnitUs = 1L)
        .select(col("key"), col("n"), col("slope_ppm"))
        .as[(Long, Long, Option[Long])].collect()
        .map(r => r._1 -> ((r._2, r._3.getOrElse(Long.MinValue)))).toMap

    val part1 = mkRows(0 until 60)
    part1.toDF("grp", "val", "key", "t_us", "event_id", "v").coalesce(1)
      .write.mode("append").parquet(inDir)
    try {
      assert(svc.submit(req).isRight)
      svc.awaitIdle("cur-2")
      assert(hllView == hllExpected(part1))
      assert(ewmaView == ewmaExpected(part1))
      assert(trendView == trendExpected(part1))

      svc.stop("cur-2")
      val part2 = mkRows(60 until 120) // later t_us: in-order per key
      part2.toDF("grp", "val", "key", "t_us", "event_id", "v").coalesce(1)
        .write.mode("append").parquet(inDir)
      assert(svc.submit(req).isRight)
      svc.awaitIdle("cur-2")
      val all = part1 ++ part2
      assert(hllView == hllExpected(all),
        "hll registers must survive the restart")
      assert(ewmaView == ewmaExpected(all),
        "the ewma level must survive the restart (no fresh-series resid)")
      assert(trendView == trendExpected(all),
        "the trend sums and rebase origin must survive the restart")
    } finally {
      svc.stop("cur-2")
      svc.shutdown()
    }
  }

  test("weighted-sample step equals the batch sample, across a restart") {
    val inDir = java.nio.file.Files.createTempDirectory("cur3-in").toString
    val ckpt = java.nio.file.Files.createTempDirectory("cur3-ckpt").toString
    val svc = new CurationService(spark, ckpt)
    val req = CurationRequest(
      uuid = "cur-3",
      source = FileSourceConf("parquet", inDir,
        "doc_id BIGINT, site STRING, w BIGINT"),
      jdbcUrl = url, driverName = driver,
      steps = Seq(WeightedSampleStep("ws", "cur_ws", "doc_id", "site", "w",
        k = 5, seed = "s3")))

    def mkRows(ids: Range): Seq[(Long, String, Long)] =
      ids.map(i => (i.toLong, s"s${i % 2}", (i * 13 % 400 + 1).toLong))
    // current sample from the emission log: latest graft_batch per group
    // carries the whole refreshed ranked list
    def view: Set[(String, Long, Long, Long)] = {
      val w = Window.partitionBy("group")
      readSink("cur_ws")
        .withColumn("_mx", max(col("graft_batch")).over(w))
        .filter(col("graft_batch") === col("_mx"))
        .select(col("group"), col("id").cast("long"),
          col("weight").cast("long"), col("w_hat").cast("long"))
        .as[(String, Long, Long, Long)].collect().toSet
    }
    def expected(rows: Seq[(Long, String, Long)]) =
      Sampling.weightedSample(rows.toDF("doc_id", "site", "w"),
          "doc_id", Seq("site"), "w", k = 5, seed = "s3")
        .select(col("site"), col("doc_id"), col("weight"), col("w_hat"))
        .as[(String, Long, Long, Long)].collect().toSet

    val part1 = mkRows(0 until 50)
    part1.toDF("doc_id", "site", "w").coalesce(1)
      .write.mode("append").parquet(inDir)
    try {
      assert(svc.submit(req).isRight)
      svc.awaitIdle("cur-3")
      assert(view == expected(part1))
      svc.stop("cur-3")
      val part2 = mkRows(50 until 100)
      part2.toDF("doc_id", "site", "w").coalesce(1)
        .write.mode("append").parquet(inDir)
      assert(svc.submit(req).isRight)
      svc.awaitIdle("cur-3")
      assert(view == expected(part1 ++ part2),
        "survivor state must fold the restart's new docs into the old sample")
    } finally {
      svc.stop("cur-3")
      svc.shutdown()
    }
  }

  test("submit validation rejects bad requests with named errors") {
    val svc = new CurationService(spark,
      java.nio.file.Files.createTempDirectory("cur-v").toString)
    val base = CurationRequest("v1",
      FileSourceConf("parquet", "/tmp/none", "doc_id BIGINT, url STRING"),
      url, driver,
      Seq(DomainCapStep("cap", "t", "doc_id", "url", cap = 3)))
    def errsOf(r: CurationRequest): Seq[String] =
      svc.submit(r).swap.getOrElse(Nil)
    assert(errsOf(base.copy(steps = Nil)).exists(_.contains("at least one step")))
    assert(errsOf(base.copy(source = base.source.copy(format = "avro")))
      .exists(_.contains("unsupported source format")))
    assert(errsOf(base.copy(source = base.source.copy(schemaDdl = "not a ddl (")))
      .exists(_.contains("bad schema DDL")))
    assert(errsOf(base.copy(uuid = "a/b")).exists(_.contains("uuid")))
    assert(errsOf(base.copy(steps = Seq(
      DomainCapStep("x", "t", "doc_id", "url", cap = 0))))
      .exists(_.contains("cap must be > 0")))
    assert(errsOf(base.copy(steps = Seq(
        DomainCapStep("x", "t1", "doc_id", "url", cap = 1),
        DomainCapStep("x", "t2", "doc_id", "url", cap = 2))))
      .exists(_.contains("duplicate step name")))
    // the name splices into the checkpoint path and the 64-char sink tag
    assert(errsOf(base.copy(steps = Seq(
        DomainCapStep("../esc", "t", "doc_id", "url", cap = 1))))
      .exists(_.contains("step name")))
    assert(errsOf(base.copy(uuid = "u" * 55, steps = Seq(
        DomainCapStep("longish-name", "t", "doc_id", "url", cap = 1))))
      .exists(_.contains("exceeds 64 chars")))
  }
}
