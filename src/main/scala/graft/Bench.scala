package graft
import java.util.concurrent.ConcurrentHashMap
import java.util.concurrent.atomic.AtomicBoolean
import org.apache.spark.sql.SparkSession

/** Benchmark entry point (driver contract): runs every catalog query on
  * `SPARK_GRAFT_SF_DIR`, prints ONE JSON line with per-query seconds.
  *
  * Robustness (round 7): the round-6 driver host ran ~5-15x slower than the
  * session machines (see STATUS.md bench methodology) and the driver's
  * timeout killed the JVM mid-pass -> rc 124, no JSON, no perf reading for
  * the whole round. Three defenses:
  *
  *   1. A shutdown hook emits the JSON line with whatever has been measured
  *      when the JVM is TERM'd, marking `"partial":true` and counting the
  *      unmeasured queries in `"skipped"` — a timeout now degrades the
  *      reading instead of erasing it.
  *   2. Pass 1 runs cheapest-tier-first, so a mid-pass kill still leaves
  *      the cheap majority of the catalog measured.
  *   3. The rerun passes (pass 2 min-of-two; pass 3 third sample for
  *      queries whose two readings disagree >1.3x) are budget-gated: each
  *      rerun happens only while projected elapsed stays under
  *      `SPARK_GRAFT_BENCH_BUDGET_S` (default 420 s of measured wall from
  *      main entry). On a fast host all passes fit with headroom; on a
  *      slow host the reruns shrink to the expensive queries that fit, or
  *      to nothing — pass-1 values stand. Every raw reading is emitted
  *      under `"readings"` (round 12) so drift adjudicates from the JSON.
  *
  * Measurement action (round 8): a full-output checksum aggregate, not a
  * bare `count()` — count lets Catalyst prune the whole computation of
  * narrow per-row queries (regex features, fingerprints, media decode), so
  * their "timings" were parquet row counts. Adds ~1-2 ms/query of hashing
  * for the honest queries; makes the narrow-map third of the catalog real.
  */
object Bench {

  /** Hashable projection of every output column: names are backtick-quoted
    * (a dotted column name would otherwise parse as a field path) and any
    * column whose type contains a MapType is rendered to JSON first —
    * `xxhash64` rejects maps (non-deterministic iteration order), which
    * would report a future map-emitting query as FAILED instead of slow.
    */
  private[graft] def checksumCols(df: org.apache.spark.sql.DataFrame): Seq[org.apache.spark.sql.Column] = {
    import org.apache.spark.sql.functions.{col, to_json}
    import org.apache.spark.sql.types.{ArrayType, DataType, MapType, StructType}
    def hasMap(dt: DataType): Boolean = dt match {
      case _: MapType      => true
      case a: ArrayType    => hasMap(a.elementType)
      case s: StructType   => s.fields.exists(f => hasMap(f.dataType))
      case _               => false
    }
    df.schema.fields.toSeq.map { f =>
      val c = col("`" + f.name + "`")
      if (hasMap(f.dataType)) to_json(c) else c
    }
  }

  /** name -> (all readings oldest-first, ok); filled incrementally so the
    * hook can read it. The reported per-query value is the MIN over
    * readings (steady-state convention, same as VolumeBench round-2), and
    * every raw reading is emitted under `"readings"` so a drifted driver
    * value is adjudicated from the JSON itself instead of costing a round
    * of same-code reruns (r11 `dsl_reducer` 1.60x-on-unchanged-code class).
    */
  private val measured = new ConcurrentHashMap[String, (List[Double], Boolean)]()
  private val emitted  = new AtomicBoolean(false)

  /** Emit the bench result. The driver records only a ~2000-char stdout
    * TAIL, and `parsed` has been null in BENCH_r01..r14 because the one-line
    * JSON (~10 KB once round 12 added `"readings"`) never fit it — fourteen
    * rounds of perf adjudication from truncated tails (r14 verdict item 1).
    * Round-15 contract-compatible fix, three sinks:
    *
    *   1. stdout, second-to-last line: the FULL contract JSON (metric/value/
    *      unit/queries/failed/skipped/partial/sf, values rounded to 3
    *      decimals). This is the same one-line shape every previous round
    *      printed, minus `"readings"` (moved to the file; at ~2.5 KB the
    *      queries map alone still cannot fit a 2000-char tail, so a driver
    *      parsing the tail would still miss it — hence line 2).
    *   2. stdout, LAST line: a compact summary (~170 chars) that always fits
    *      the tail even after sbt's `[success]` footer, so the driver can
    *      finally parse value/failed/skipped/partial. No `"queries"` key —
    *      a truncated or empty map could misread as dropped queries.
    *   3. `tools/bench_last.json`: the full JSON including `"readings"`
    *      (every raw sample, for drift adjudication — the r12 convention).
    *
    * Nothing may write to stderr after this: sbt relays the forked JVM's
    * stderr onto stdout as `[error]` lines on a separate reader thread, and
    * a late racing line could push the compact summary out of the tail.
    */
  private def emit(allNames: Seq[String], sfDir: String, partial: Boolean): Unit =
    if (emitted.compareAndSet(false, true)) {
      def f3(v: Double): String = BigDecimal(v)
        .setScale(3, BigDecimal.RoundingMode.HALF_UP).bigDecimal.toPlainString
      val present = allNames.flatMap(n => Option(measured.get(n)).map(n -> _))
      val qs = present
        .map { case (k, (v, ok)) => "\"" + k + "\":" + (if (ok) f3(v.min) else "-1.0") }
        .mkString("{", ",", "}")
      val rs = present
        .map { case (k, (v, _)) => "\"" + k + "\":" + v.map(f3).mkString("[", ",", "]") }
        .mkString("{", ",", "}")
      val failed  = present.count(!_._2._2)
      val skipped = allNames.size - present.size
      val total   = f3(present.collect { case (_, (v, true)) => v.min }.sum)
      val common =
        s""""value":$total,"unit":"sec","failed":$failed,"skipped":$skipped,"partial":$partial,"sf":"$sfDir""""
      val full = s"""{"metric":"total",$common,"queries":$qs}"""
      try {
        val p = java.nio.file.Paths.get("tools/bench_last.json")
        java.nio.file.Files.createDirectories(p.getParent)
        java.nio.file.Files.write(p,
          s"""{"metric":"total",$common,"queries":$qs,"readings":$rs}""".getBytes("UTF-8"))
      } catch { case _: Throwable => () } // file sink is best-effort
      println(full)
      println(s"""{"metric":"total",$common,"n_queries":${present.size},"full":"tools/bench_last.json"}""")
      System.out.flush()
    }

  /** Coarse expected-cost tier (from BENCH_SCALING.md sf0.1): used only to
    * order pass 1 cheap-first; wrong tiers cost nothing but ordering.
    */
  private def tier(name: String): Int = name match {
    case "dedup_url"                                          => 0 // cheap agg despite the dedup_ prefix
    case n if n.startsWith("dedup_") || n.startsWith("ann_")  => 3
    case n if n.startsWith("dsl_") || n.startsWith("pat_and") => 2
    case n if n.startsWith("pat_") || n.startsWith("q")       => 1
    case _                                                    => 0 // text_*, media, sample, pack, decontaminate
  }

  def main(args: Array[String]): Unit = {
    val t0      = System.nanoTime()
    def elapsed = (System.nanoTime() - t0) / 1e9
    val sfDir   = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus    = sys.env.getOrElse("SPARK_GRAFT_CPUS", "4")
    val budget  = sys.env.getOrElse("SPARK_GRAFT_BENCH_BUDGET_S", "420").toDouble
    val catalog = SparkEntry.queries
    // optional subset (comma-separated names) for targeted runs — the sf10
    // heavy-row spot-proof benches ~15 rows without paying the full catalog
    val only = sys.env.get("SPARK_GRAFT_BENCH_ONLY")
      .map(_.split(',').map(_.trim).filter(_.nonEmpty).toSet)
    only.foreach { o =>
      val unknown = o -- catalog.keySet
      require(unknown.isEmpty, s"SPARK_GRAFT_BENCH_ONLY names unknown queries: $unknown")
    }
    val names   = catalog.keys.toSeq.filter(n => only.forall(_.contains(n)))
      .sortBy(n => (tier(n), n))

    val hook = new Thread(() => emit(names, sfDir, partial = true))
    Runtime.getRuntime.addShutdownHook(hook)

    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.extensions", "graft.functions.GraftExtensions")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.sql.parquet.inferTimestampNTZ.enabled", "false")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    // untimed warmup: JVM/codegen/parquet-reader startup otherwise lands on
    // whichever query runs first. Tiny slices additionally warm each operator
    // family's machinery (interpreted HOFs, mapPartitions encoders, wide
    // hash-agg codegen) so no family's first-hit class-load/JIT lands in a
    // timed run.
    try {
      import org.apache.spark.sql.functions.col
      SparkEntry.queries("q7_filter_agg")(spark, sfDir).count()
      val docs = spark.read.parquet(s"$sfDir/documents.parquet").limit(120)
      graft.operators.TextDedup.minhashDuplicates(docs, "doc_id", "text").count()
      graft.operators.TextDedup.simhashDuplicates(docs, "doc_id", "text").count()
      val emb = spark.read.parquet(s"$sfDir/embeddings.parquet").limit(200)
      graft.operators.VectorOps.embeddingDuplicates(emb, "vec_id", "embedding", 0.45).count()
      // r15 (r14 verdict item 6): slices for the families whose first-hit
      // class-load/JIT (~1-3 s each) previously landed in their cheapest
      // timed member's pass-1 reading — DSL window+machine path, the text
      // explode/aggregate pipelines, and the graph checkpoint loop
      val ev = spark.read.parquet(s"$sfDir/events.parquet").limit(300)
      graft.dsl.TspEngine.incidents(graft.Tables.normalizeTs(ev),
        "value > 100 andThen event_type = 'purchase'",
        graft.dsl.PatternConfig(keys = Seq("user_id"), tsCol = "ts")).count()
      graft.operators.TextAnalysis.bigramLmScores(docs, "doc_id", "text").count()
      graft.operators.TextAnalysis.gopherFrame(docs, "doc_id", "text").count()
      val edges = docs.select(col("doc_id").as("src"),
        ((col("doc_id") * 7 + 3) % 120).as("dst"))
      graft.operators.Graphs.pageRank(edges, iters = 2).count()
    } catch { case _: Throwable => () }
    spark.catalog.clearCache()
    System.err.println(f"[bench] warmup done at ${elapsed}%.1f s (budget $budget%.0f s)")

    def runOne(name: String): (Double, Boolean) = {
      val t = System.nanoTime()
      val ok =
        try {
          // checksum over every output column, not a bare count(): count
          // lets Catalyst prune the computation of narrow per-row queries
          // entirely (a text_pii "measurement" under count() is a parquet
          // row count — the regexes never run). Same action as
          // VolumeBench; r8 methodology change, noted in BENCH_SCALING.md.
          import org.apache.spark.sql.functions.{bit_xor, count, lit, xxhash64}
          val df = catalog(name)(spark, sfDir)
          df.agg(count(lit(1)), bit_xor(xxhash64(Bench.checksumCols(df): _*))).head()
          true
        }
        catch { case e: Throwable =>
          System.err.println(s"[bench] $name FAILED: ${e.getMessage}")
          false
        }
      // operators may persist() intermediates (signatures, vector bases);
      // drop them so one query's cache never evicts the next one's
      spark.catalog.clearCache()
      ((System.nanoTime() - t) / 1e9, ok)
    }

    // pass 1: cheap-first, every query measured once
    names.foreach { n => val (t, ok) = runOne(n); measured.put(n, (List(t), ok)) }
    System.err.println(f"[bench] pass 1 done at ${elapsed}%.1f s")

    def rerun(n: String): Unit = {
      val (prev, prevOk) = measured.get(n)
      val (t, ok)        = runOne(n)
      measured.put(n, (prev :+ t, prevOk && ok))
    }

    // pass 2: min-of-two noise suppression, most-expensive-first, only while
    // the projected finish stays inside the budget (estimate = pass-1 time)
    val byCost = names.sortBy(n => -measured.get(n)._1.min)
    var reran  = 0
    byCost.foreach { n =>
      if (elapsed + measured.get(n)._1.min * 1.5 < budget) { rerun(n); reran += 1 }
    }
    System.err.println(f"[bench] pass 2 reran $reran%d/${names.size}%d at ${elapsed}%.1f s")

    // pass 3: targeted tie-break — only queries whose two readings disagree
    // by >1.3x (one of them hit host noise; a third sample lets min() land
    // on steady state), most-discrepant-first, same budget gate
    val noisy = names
      .filter { n => val r = measured.get(n)._1; r.size >= 2 && r.max / r.min.max(1e-9) > 1.3 }
      .sortBy { n => val r = measured.get(n)._1; -(r.max / r.min.max(1e-9)) }
    var reran3 = 0
    noisy.foreach { n =>
      if (elapsed + measured.get(n)._1.min * 1.5 < budget) { rerun(n); reran3 += 1 }
    }
    System.err.println(f"[bench] pass 3 reran $reran3%d/${noisy.size}%d noisy at ${elapsed}%.1f s")

    emit(names, sfDir, partial = false)
    Runtime.getRuntime.removeShutdownHook(hook)
    spark.stop()
  }
}
