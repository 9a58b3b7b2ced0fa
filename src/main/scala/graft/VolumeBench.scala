package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Volume ladder for the pattern engine (dev tool, like [[FlapBench]]):
  * replicates the sf events table K× with DISTINCT key spaces (user_id
  * offset per replica) — the realistic 100 TB shape, where data growth
  * comes from more units, not longer per-unit histories (per-key depth is
  * [[FlapBench]]'s axis) — then times a representative set of pattern/DSL
  * queries at each rung and prints rows/s. Replicas land in
  * /tmp/graft-volume/x<K>/events.parquet so [[SparkEntry.queries]] run
  * against them unchanged.
  *
  *   SPARK_GRAFT_SF_DIR=/root/testdata/sf0.1 sbt "runMain graft.VolumeBench [factors...]"
  */
object VolumeBench {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
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

    val mode = args.headOption
      .filter(Set("dedup", "vectors", "skew", "groupstats", "sketches", "joins"))
      .getOrElse("patterns")
    val rest = (if (mode == "patterns") args else args.drop(1)).toSeq.map(_.toInt)

    mode match {
      case "dedup" => runDedup(spark, sfDir, cpus.toInt,
        if (rest.nonEmpty) rest else Seq(1, 10, 100))
      case "vectors" => runVectors(spark, sfDir, cpus.toInt,
        if (rest.nonEmpty) rest else Seq(1, 10, 100))
      case "skew" => runSkew(spark, sfDir, cpus.toInt,
        if (rest.nonEmpty) rest else Seq(10, 60))
      case "groupstats" => runGroupStats(spark, sfDir, cpus.toInt,
        if (rest.nonEmpty) rest else Seq(1, 10, 100))
      case "sketches" => runSketches(spark, sfDir, cpus.toInt,
        if (rest.nonEmpty) rest else Seq(1, 10, 100))
      case "joins" => runJoins(spark, cpus.toInt,
        if (rest.nonEmpty) rest else Seq(1, 6))
      case _ => runPatterns(spark, sfDir, cpus.toInt,
        if (rest.nonEmpty) rest else Seq(1, 10, 60))
    }
    spark.stop()
  }

  /** Join-hardening ladder (synthetic — factors are millions of fact
    * rows): the salted join against the plain shuffle join on a
    * 90%-hot-key fact, and the bloom-pruned join against the plain join
    * on a 1%-selective dim, with broadcast disabled on both (the 100 TB
    * premise: the dim is not broadcastable or the plan is committed).
    * Reports wall-clock plus the two metrics the operators exist to move:
    * the LONGEST TASK (salting: the hot reducer shrinks ~1/salt; records
    * stay ~constant) and SHUFFLE RECORDS (bloom: collapse toward the
    * matching rows). Contender outputs are checksum-required equal.
    */
  private def runJoins(spark: SparkSession, cpus: Int,
                       factors: Seq[Int]): Unit = {
    import org.apache.spark.scheduler.{SparkListener, SparkListenerTaskEnd}
    val shuffleRecords = new java.util.concurrent.atomic.AtomicLong
    val maxTaskMs = new java.util.concurrent.atomic.AtomicLong
    val listener = new SparkListener {
      override def onTaskEnd(t: SparkListenerTaskEnd): Unit = {
        val m = t.taskMetrics
        if (m != null) {
          shuffleRecords.addAndGet(m.shuffleWriteMetrics.recordsWritten)
          maxTaskMs.accumulateAndGet(m.executorRunTime, Math.max(_, _))
        }
      }
    }
    spark.sparkContext.addSparkListener(listener)
    val prevThresh = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try factors.foreach { f =>
      val n = f * 1000000L
      val hotFact = spark.range(n).select(
        when(pmod(col("id"), lit(10)) < 9, lit(0L))
          .otherwise(pmod(xxhash64(col("id")), lit(100000L))).as("k"),
        col("id").as("payload"))
      // realistic fact rows carry bytes, not just a key — the shuffle the
      // bloom prune removes must cost something
      val coldFact = spark.range(n).select(
        pmod(xxhash64(col("id")), lit(100000L)).as("k"),
        concat(lit("x" * 64), col("id").cast("string")).as("payload"))
      val dimAll = spark.range(100000L).select(col("id").as("dk"),
        (col("id") % 97).as("dpay"))
      // the selective dim must be OPAQUE: spelled as a filter, Catalyst
      // propagates `dk % 100 = 0` through the equi-join onto the fact scan
      // and prunes statically — the case where bloomPrunedJoin is NOT
      // needed. Landing it in parquet first models the real shape (a dedup
      // survivor set, a contaminated-id list) whose selectivity no
      // optimizer can see.
      val dimPath = s"/tmp/graft-volume/joins-dim-x$f"
      // written unconditionally: a reused fixture from a previous run would
      // silently survive a change to the dim's selectivity or schema (it's
      // ~1000 rows — rewriting costs nothing)
      dimAll.filter(col("dk") % 100 === 0) // 1% of the key space
        .write.mode("overwrite").parquet(dimPath)
      val dimSel = spark.read.parquet(dimPath)

      def drive(name: String, mk: () => org.apache.spark.sql.DataFrame): (Long, Long, Double, Long, Long) = {
        val best = (1 to 2).map { _ =>
          shuffleRecords.set(0L); maxTaskMs.set(0L)
          val t0 = System.nanoTime()
          val df = mk()
          val Array(cnt, ck) = df
            .agg(count(lit(1)), bit_xor(xxhash64(col("payload"), col("dpay"))))
            .head().toSeq.toArray
          val sec = (System.nanoTime() - t0) / 1e9
          Thread.sleep(800) // listener bus drains asynchronously
          (cnt.asInstanceOf[Long], ck.asInstanceOf[Long], sec,
            shuffleRecords.get(), maxTaskMs.get())
        }.minBy(_._3)
        println(f"[joins] x$f%-3d $name%-18s out=${best._1}%-9d sec=${best._3}%7.2f " +
          f"shuffleRecords=${best._4}%-10d maxTaskMs=${best._5}%-7d")
        best
      }

      val plainHot = drive("hot_plain", () =>
        hotFact.join(dimAll, hotFact("k") === dimAll("dk")))
      val salted = drive("hot_salted", () =>
        graft.operators.Skew.saltedJoin(hotFact, dimAll, "k", "dk", salt = 32))
      require(plainHot._1 == salted._1 && plainHot._2 == salted._2,
        s"salted output diverges: ${plainHot._1}/${plainHot._2} vs ${salted._1}/${salted._2}")
      println(f"[joins] x$f%-3d hot-key summary: speedup=${plainHot._3 / salted._3}%5.2fx " +
        f"maxTask=${plainHot._5}%d -> ${salted._5}%d ms " +
        f"(records ${plainHot._4} -> ${salted._4}: salt replicates the dim x32)")

      val plainSel = drive("selective_plain", () =>
        coldFact.join(dimSel, coldFact("k") === dimSel("dk")))
      val bloomed = drive("selective_bloom", () =>
        graft.operators.JoinPrune.bloomPrunedJoin(coldFact, dimSel, "k", "dk",
          nBits = 1 << 22))
      require(plainSel._1 == bloomed._1 && plainSel._2 == bloomed._2,
        s"bloom output diverges: ${plainSel._1}/${plainSel._2} vs ${bloomed._1}/${bloomed._2}")
      println(f"[joins] x$f%-3d selective summary: speedup=${plainSel._3 / bloomed._3}%5.2fx " +
        f"shuffleRecords=${plainSel._4} -> ${bloomed._4} " +
        f"(${100.0 * bloomed._4 / math.max(plainSel._4, 1)}%.1f%% of plain)")
    } finally {
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prevThresh)
      spark.sparkContext.removeSparkListener(listener)
    }
  }

  /** Sketch-family structural ladder: the CMS / Bloom / KMV relations
    * against the exact operators they stand in for (`groupBy(value)`
    * count table; `distinct()` membership set), on a replicated
    * high-cardinality value column. The sketches' OUTPUT (= exchange)
    * must stay CONSTANT as the corpus grows Kx — depth x width cells,
    * nBits/64 words, k survivors — while the exact tables grow with the
    * distinct-value count; outputs differ semantically (estimate vs
    * exact), so each rung asserts the structural bound plus estimator
    * sanity (CMS never underestimates a probed count; Bloom never
    * false-negatives a planted member) instead of a checksum.
    */
  private def runSketches(spark: SparkSession, sfDir: String, cpus: Int,
                          factors: Seq[Int]): Unit = {
    factors.foreach { f =>
      val dir = s"/tmp/graft-volume/sk-x$f"
      if (!new java.io.File(s"$dir/vals.parquet").exists()) {
        Tables.events(spark, sfDir)
          .select(col("event_id"), col("user_id"))
          .withColumn("_rep", explode(lit((0 until f).toArray)))
          // distinct-value cardinality grows with the corpus — the axis
          // that breaks an exact table and leaves the sketches flat
          .withColumn("v", col("user_id") + col("_rep") * 1000000L)
          .drop("_rep")
          .repartition(cpus)
          .write.mode("overwrite").parquet(s"$dir/vals.parquet")
      }
      val base = spark.read.parquet(s"$dir/vals.parquet")
      val rows = base.count()

      val impls: Seq[(String, () => org.apache.spark.sql.DataFrame)] = Seq(
        "cms" -> (() => graft.operators.Sketches.cmsSketch(
          base, col("v"), depth = 4, width = 1024)),
        "bloom" -> (() => graft.operators.Sketches.bloomSketch(
          base, col("v"), nBits = 1 << 16, nHashes = 4)),
        "kmv" -> (() => graft.operators.Sketches.kmvSurvivors(
          base.withColumn("one", lit(1)), Seq("one"), col("v"), k = 256)),
        "exact_counts" -> (() => base.groupBy(col("v"))
          .agg(count(lit(1)).as("n"))),
        "exact_distinct" -> (() => base.select(col("v")).distinct()))

      impls.foreach { case (impl, mk) =>
        (1 to 2).foreach { round =>
          val t0 = System.nanoTime()
          val df = if (impl == "kmv")
            mk().drop("one")
          else mk()
          val n = df.count()
          val sec = (System.nanoTime() - t0) / 1e9
          println(f"[sk] x$f%-3d rows=$rows%-9d $impl%-14s round=$round " +
            f"out=$n%-8d sec=$sec%6.2f rate=${rows / sec / 1e3}%9.1fk rows/s")
          spark.catalog.clearCache()
        }
      }

      // estimator sanity at this rung: CMS >= exact on a probed slice;
      // Bloom true for every planted member
      val probes = base.select(col("v")).distinct().limit(50)
      val est = graft.operators.Sketches.cmsEstimate(
          graft.operators.Sketches.cmsSketch(base, col("v"), 4, 1024),
          probes, "v", 4, 1024)
        .join(base.groupBy(col("v")).agg(count(lit(1)).as("n")), "v")
        .filter(col("cms_est") < col("n")).count()
      require(est == 0L, s"CMS underestimated $est probes at x$f")
      val fn = graft.operators.Sketches.bloomProbe(
          graft.operators.Sketches.bloomSketch(base, col("v"), 1 << 16, 4),
          probes, "v", 1 << 16, 4)
        .filter(!col("maybe_present")).count()
      require(fn == 0L, s"Bloom false-negatived $fn members at x$f")
      println(f"[sk] x$f%-3d sanity: cms_underestimates=0 bloom_false_negatives=0")
    }
  }

  private def runPatterns(spark: SparkSession, sfDir: String, cpus: Int,
                          factors: Seq[Int]): Unit = {
    // r10 additions ride the same replicated events dirs: the two join
    // operators (ordered-window carry / time-grid pairing), the CUSUM
    // window pair, and the KMV sketch — all keyed on user_id, so the
    // distinct-key replication is exactly their 100 TB growth axis
    // r11: quantile_sample (bottom-k heaps; exchange groups × k at any K)
    // and sketch_cms (depth × width counter cells) ride the same events
    // replication — their exchanges must stay corpus-size-invariant
    val queries = Seq("pat_timer", "pat_sessions", "pat_truth_millis",
      "dsl_andthen", "dsl_forstat", "dsl_nested",
      "asof_join", "interval_join", "cusum_drift", "sketch_distinct",
      "quantile_sample", "sketch_cms")
    factors.foreach { f =>
      val dir = s"/tmp/graft-volume/x$f"
      if (!new java.io.File(s"$dir/events.parquet").exists()) {
        // distinct key space per replica: offset far above any real user_id
        Tables.events(spark, sfDir)
          .withColumn("_rep", explode(lit((0 until f).toArray)))
          .withColumn("user_id", col("user_id") + col("_rep") * 10000000L)
          .drop("_rep")
          .repartition(cpus)
          .write.mode("overwrite").parquet(s"$dir/events.parquet")
      }
      val rows = spark.read.parquet(s"$dir/events.parquet").count()
      queries.foreach { name =>
        (1 to 2).foreach { round =>
          val t0 = System.nanoTime()
          // checksum over every output column: a bare count() would let
          // Catalyst prune the pattern computation for queries whose row
          // count doesn't depend on it (e.g. per-event window statistics)
          val df = SparkEntry.queries(name)(spark, dir)
          val Array(n, _) = df
            .agg(count(lit(1)), bit_xor(xxhash64(Bench.checksumCols(df): _*)))
            .head().toSeq.toArray
          val sec = (System.nanoTime() - t0) / 1e9
          println(f"[volume] x$f%-3d rows=$rows%-9d $name%-17s round=$round " +
            f"out=$n%-7s sec=$sec%6.2f rate=${rows / sec / 1e3}%9.1fk rows/s")
          spark.catalog.clearCache()
        }
      }
    }
  }

  /** Hot-key skew adversary for the pattern engine: ONE key owns ~90% of
    * the corpus — the classic pattern-engine scale killer, because every
    * window stage partitions by key and a hot key serializes into one task.
    * The hot key's history is the realistic long-lived-unit shape: a dense
    * 60 s feed with a connectivity gap (> eventsMaxGapMs) every 5000
    * events, so its state splits into thousands of independent gap runs.
    * The remaining 10% are ordinary distinct-key replicas of the sf events
    * table.
    *
    * Each pattern runs A/B: `gapSubPartition = true` (default — the
    * compiler forces the (key, gap_run) exchange) vs `false` (the coarse
    * hash(keys) exchange Spark plans on its own), asserting identical
    * incident counts + output checksums. The irreducible serial part under
    * skew is the gap/idx assignment window (lag + running sum over one
    * sorted task of the hot key); everything downstream parallelizes.
    */
  private def runSkew(spark: SparkSession, sfDir: String, cpus: Int,
                      factors: Seq[Int]): Unit = {
    import graft.dsl.{PatternConfig, TspEngine}
    val G = 604800000L          // eventsMaxGapMs: 7 days (DslQueries cfg)
    val S = 86400000L           // session gap: 1 day
    val gapStep = 8L * 86400000L // inter-run hole: 8 days > G
    val patterns = Seq(
      "skew_simple"  -> "value > 100",
      "skew_timer"   -> "value > 50 for 24 hr",
      "skew_forstat" -> "value > 100 for 168 hr > 5 times",
      "skew_andthen" -> "value > 150 andThen event_type = 'purchase'")
    factors.foreach { f =>
      val dir = s"/tmp/graft-volume/skew-x$f"
      if (!new java.io.File(s"$dir/events.parquet").exists()) {
        val base = Tables.events(spark, sfDir)
        val baseN = base.count()
        val hotN = baseN * f * 9L / 10L
        val coldReps = math.max(1, f / 10)
        // dense ids -> deterministic synthetic history for the hot key:
        // 60 s cadence, one > G hole every 5000 events => hotN/5000 gap runs
        val hot = spark.range(hotN).select(
          col("id").as("event_id"),
          timestamp_millis(lit(946684800000L) + col("id") * 60000L +
            expr("id div 5000") * gapStep).as("ts"),
          lit(-1L).as("user_id"),
          element_at(
            lit(Array("view", "click", "purchase", "error")),
            (pmod(xxhash64(col("id"), lit(1)), lit(4)) + 1).cast("int")).as("event_type"),
          (pmod(xxhash64(col("id"), lit(2)), lit(201))).cast("double").as("value"),
          lit("{}").as("props"))
        val cold = base
          .withColumn("_rep", explode(lit((0 until coldReps).toArray)))
          .withColumn("user_id", col("user_id") + col("_rep") * 10000000L)
          .drop("_rep")
          .select(hot.columns.map(col): _*)
        hot.unionByName(cold)
          .repartition(cpus)
          .write.mode("overwrite").parquet(s"$dir/events.parquet")
      }
      val events = Tables.events(spark, dir)
      val rows = events.count()
      patterns.foreach { case (name, pat) =>
        val results = Seq(true, false).map { sub =>
          val cfg = PatternConfig(Seq("user_id"), "ts", eventsMaxGapMs = G,
            sessionGapMs = S, gapSubPartition = sub)
          val mk = () => TspEngine.incidents(events, pat, cfg)
            .select(col("user_id"), col("from_ms"), col("to_ms"), col("n_events"))
          val timings = (1 to 2).map { round =>
            val t0 = System.nanoTime()
            val df = mk()
            val Array(n, h) = df
              .agg(count(lit(1)), bit_xor(xxhash64(Bench.checksumCols(df): _*)))
              .head().toSeq.toArray
            val sec = (System.nanoTime() - t0) / 1e9
            println(f"[skew] x$f%-3d rows=$rows%-9d $name%-14s sub=$sub%-5s " +
              f"round=$round out=$n%-6s sec=$sec%7.2f rate=${rows / sec / 1e3}%9.1fk rows/s")
            spark.catalog.clearCache()
            (n, h, sec)
          }
          (sub, timings.last._1, timings.last._2, timings.map(_._3).min)
        }
        val Seq((_, nOn, hOn, tOn), (_, nOff, hOff, tOff)) = results
        require(nOn == nOff && hOn == hOff,
          s"$name: sub-partitioned output diverges (n $nOn vs $nOff, hash $hOn vs $hOff)")
        println(f"[skew] x$f%-3d $name%-14s speedup=${tOff / tOn}%5.2fx " +
          f"(on=${tOn}%6.2f s off=${tOff}%6.2f s, identical output)")
      }
    }
  }

  /** Group-statistics A/B ladder: the r10 GroupTopK heap operator and the
    * histogram-quantile operator against the rank-window spellings they
    * replace, on a replicated (lang, source, n_chars, doc_id) profile table
    * whose GROUP CARDINALITY STAYS FIXED (~40 (lang, source) cells) while
    * the corpus grows Kx. Outputs are asserted checksum-identical per rung
    * before the speedup prints.
    *
    * Read the top-k rung with [[graft.plans.TopKProbe]]'s finding in mind:
    * Spark 4's WindowGroupLimit already caps the window plan's shuffle at
    * k rows per group per partition, so the rungs compare heap admission
    * (no sort) against the window's map-side full-partition sort — a
    * constant-factor race locally, sort-superlinearity at scale. The
    * QUANTILE rung is the structural one: the rank-window spelling has no
    * group-limit rewrite (the filter is a cumulative pick, not rank<=k),
    * so it really does exchange and sort every row, while the histogram
    * plan ships value counts.
    */
  private def runGroupStats(spark: SparkSession, sfDir: String, cpus: Int,
                            factors: Seq[Int]): Unit = {
    import org.apache.spark.sql.expressions.Window
    factors.foreach { f =>
      val dir = s"/tmp/graft-volume/gs-x$f"
      if (!new java.io.File(s"$dir/profile.parquet").exists()) {
        Tables.documents(spark, sfDir)
          .select(col("lang"), col("source"), col("doc_id"), col("n_chars"))
          .withColumn("_rep", explode(lit((0 until f).toArray)))
          .withColumn("doc_id", col("doc_id") + col("_rep") * 10000000L)
          // shift lengths per replica so the top-k winners and the
          // percentile positions actually move (no degenerate all-ties)
          .withColumn("n_chars", col("n_chars") + pmod(col("_rep"), lit(7)))
          .drop("_rep")
          .repartition(cpus)
          .write.mode("overwrite").parquet(s"$dir/profile.parquet")
      }
      val base = spark.read.parquet(s"$dir/profile.parquet")
      val rows = base.count()

      val contenders: Seq[(String, Seq[(String, () => org.apache.spark.sql.DataFrame)])] = Seq(
        "topk5" -> Seq(
          "heap" -> (() => graft.plans.GroupTopK.topK(base, Seq("lang", "source"),
            Seq("n_chars" -> false, "doc_id" -> true), 5)),
          "window" -> { () =>
            val w = Window.partitionBy(col("lang"), col("source"))
              .orderBy(col("n_chars").desc, col("doc_id"))
            base.withColumn("_rn", row_number().over(w))
              .filter(col("_rn") <= 5).drop("_rn")
          }),
        "quantiles" -> Seq(
          "histogram" -> (() => graft.operators.Stats.histogramQuantiles(
            base, Seq("lang", "source"), "n_chars", Seq(25, 50, 90, 99))),
          "window" -> { () =>
            val wOrd = Window.partitionBy(col("lang"), col("source"))
              .orderBy(col("n_chars"))
            val wAll = Window.partitionBy(col("lang"), col("source"))
            val ranked = base
              .withColumn("_rn", row_number().over(wOrd))
              .withColumn("_n", count(lit(1)).over(wAll))
            val picks = Seq(25, 50, 90, 99).map { p =>
              min(when(col("_rn") === expr(s"(_n * $p + 99) div 100"),
                col("n_chars"))).as(s"p$p")
            }
            ranked.groupBy(col("lang"), col("source"))
              .agg(max(col("_n")).as("n_rows"), picks: _*)
          }))

      contenders.foreach { case (task, impls) =>
        val timed = impls.map { case (impl, mk) =>
          val runs = (1 to 2).map { round =>
            val t0 = System.nanoTime()
            val df = mk()
            val Array(n, h) = df
              .agg(count(lit(1)), bit_xor(xxhash64(Bench.checksumCols(df): _*)))
              .head().toSeq.toArray
            val sec = (System.nanoTime() - t0) / 1e9
            println(f"[gs] x$f%-3d rows=$rows%-9d $task%-10s $impl%-10s " +
              f"round=$round out=$n%-6s sec=$sec%6.2f " +
              f"rate=${rows / sec / 1e3}%9.1fk rows/s")
            spark.catalog.clearCache()
            (n, h, sec)
          }
          (impl, runs.last._1, runs.last._2, runs.map(_._3).min)
        }
        val (bi, bn, bh, bt) = timed.head
        timed.tail.foreach { case (oi, on, oh, ot) =>
          require(bn == on && bh == oh,
            s"$task: $bi and $oi outputs diverge (n $bn vs $on, hash $bh vs $oh)")
          println(f"[gs] x$f%-3d $task%-10s speedup=${ot / bt}%5.2fx " +
            f"($bi=${bt}%6.2f s $oi=${ot}%6.2f s, identical output)")
        }
      }

      // Continuous-domain rung (r11): a raw-double metric makes every value
      // distinct, so the exact histogram's exchange grows WITH the corpus
      // while the bottom-k sample ships groups × k (hash, value) pairs at
      // any K. Outputs are estimate-vs-exact (not identical), so the
      // assertion is quantile BRACKETING per group instead of a checksum:
      // sample p50 within exact [p25, p75], sample p99 within [p90, p100].
      locally {
        val cont = base.withColumn("v",
          col("n_chars") +
            pmod(xxhash64(col("doc_id")), lit(1000000)).cast("double") / 1e6)
        val impls = Seq[(String, () => org.apache.spark.sql.DataFrame)](
          "sample256" -> (() => graft.operators.Stats.sampleQuantiles(
            cont, Seq("lang", "source"), col("doc_id"), "v", Seq(50, 99),
            k = 256)),
          "histogram" -> (() => graft.operators.Stats.histogramQuantiles(
            cont, Seq("lang", "source"), "v",
            Seq(25, 50, 75, 90, 99, 100))))
        val timed = impls.map { case (impl, mk) =>
          val runs = (1 to 2).map { round =>
            val t0 = System.nanoTime()
            val df = mk()
            val n = df.count()
            val sec = (System.nanoTime() - t0) / 1e9
            println(f"[gs] x$f%-3d rows=$rows%-9d ${"contq"}%-10s $impl%-10s " +
              f"round=$round out=$n%-6s sec=$sec%6.2f " +
              f"rate=${rows / sec / 1e3}%9.1fk rows/s")
            spark.catalog.clearCache()
            sec
          }
          impl -> runs.min
        }.toMap
        val joined = impls(0)._2().alias("s")
          .join(impls(1)._2().alias("e"), Seq("lang", "source"))
          .select(col("s.p50").as("s50"), col("s.p99").as("s99"),
            col("e.p25").as("e25"), col("e.p75").as("e75"),
            col("e.p90").as("e90"), col("e.p100").as("e100"))
          .collect()
        joined.foreach { r =>
          require(r.getDouble(0) >= r.getDouble(2) &&
            r.getDouble(0) <= r.getDouble(3), s"sample p50 outside [p25,p75]: $r")
          require(r.getDouble(1) >= r.getDouble(4) &&
            r.getDouble(1) <= r.getDouble(5), s"sample p99 outside [p90,p100]: $r")
        }
        println(f"[gs] x$f%-3d contq      sample=${timed("sample256")}%6.2f s " +
          f"exact=${timed("histogram")}%6.2f s " +
          f"(${joined.length} groups bracket-verified)")
      }
    }
  }

  /** Dedup-family ladder over a replicated documents table. Every replica
    * prefixes each WORD with a replica tag: intra-replica similarity
    * structure (shingle/signature/embedding-free dedups) is preserved
    * exactly, while cross-replica shingle overlap is ZERO — so the planted
    * duplicate-pair count scales linearly with K instead of quadratically
    * (naive text replication would make every original dup cluster a
    * K²-sized cross-replica clique and change the workload's shape).
    */
  private def runDedup(spark: SparkSession, sfDir: String, cpus: Int,
                       factors: Seq[Int]): Unit = {
    // r8 additions: dedup_substring's cross-replica 8-gram overlap is zero
    // under the word prefixes, so span counts scale linearly like the pair
    // dedups; affinity_weights' target slice (source=src0) replicates with
    // the corpus, so the feature-table shape is invariant; text_pii is the
    // narrow-map control rung.
    // dedup_incremental measures index build + probe together (the catalog
    // query rebuilds the index each run); in production the index
    // amortizes, so the rung is an upper bound on the probe cost.
    // r9 rungs: text_lm is the two-agg + gram-join shape (its model table
    // is vocab-bounded, so the join side shrinks relative to the corpus as
    // K grows — word prefixes make each replica's vocab distinct, the
    // worst case); text_gopher is a narrow-map control like text_pii.
    // r10 rungs: text_bpe_encode is the worst-case encode shape (word
    // prefixes make every replica's vocabulary OOV for the frozen merges,
    // so the per-partition memo amortizes nothing across replicas);
    // span_corrupt and dedup_url are narrow-map/cheap-agg controls.
    // r11 rungs: html_extract / html_links are narrow-map + cheap-agg
    // controls like text_pii; link_rank is 10 join+agg iterations whose
    // cost must track EDGES (2 per doc) linearly — the planted modular
    // graph stays well-defined under the sparse replicated doc ids
    val queries = Seq("dedup_exact", "dedup_minhash", "dedup_simhash",
      "dedup_ngram", "text_boilerplate", "dedup_substring",
      "affinity_weights", "text_pii", "dedup_incremental",
      "text_lm", "text_gopher",
      "text_bpe_encode", "span_corrupt", "dedup_url",
      "html_extract", "html_links", "link_rank")
    factors.foreach { f =>
      val dir = s"/tmp/graft-volume/docs-x$f"
      if (!new java.io.File(s"$dir/documents.parquet").exists()) {
        Tables.documents(spark, sfDir)
          .withColumn("_rep", explode(lit((0 until f).toArray)))
          .withColumn("doc_id", col("doc_id") + col("_rep") * 10000000L)
          .withColumn("text", concat_ws(" ",
            transform(split(col("text"), "\\s+"),
              w => concat(lit("r"), col("_rep"), lit("_"), w))))
          .drop("_rep")
          .repartition(cpus)
          .write.mode("overwrite").parquet(s"$dir/documents.parquet")
      }
      val rows = spark.read.parquet(s"$dir/documents.parquet").count()
      queries.foreach { name =>
        (1 to 2).foreach { round =>
          val t0 = System.nanoTime()
          val df = SparkEntry.queries(name)(spark, dir)
          val Array(n, _) = df
            .agg(count(lit(1)), bit_xor(xxhash64(Bench.checksumCols(df): _*)))
            .head().toSeq.toArray
          val sec = (System.nanoTime() - t0) / 1e9
          println(f"[volume] docs-x$f%-3d rows=$rows%-9d $name%-17s round=$round " +
            f"out=$n%-7s sec=$sec%6.2f rate=${rows / sec / 1e3}%9.1fk rows/s")
          spark.catalog.clearCache()
        }
      }
    }
  }

  /** Vector-family ladder over a replicated embeddings table. Each replica
    * applies a deterministic per-(replica, dimension) sign flip: applying
    * one flip pattern to every vector of a replica preserves intra-replica
    * cosines EXACTLY (cos(Sx, Sy) = cos(x, y) for a diagonal ±1 S), so the
    * planted near-dup structure replicates linearly, while cross-replica
    * directions decorrelate — LSH buckets and k-means cells spread replicas
    * apart instead of stacking them into K²-sized hot cells.
    */
  private def runVectors(spark: SparkSession, sfDir: String, cpus: Int,
                         factors: Seq[Int]): Unit = {
    // ann_lsh is deliberately absent: its catalog config fixes bits=4 (16
    // buckets/table — right for the 2k-vector oracle corpus), and bucket
    // population is N/2^bits, so at x100 every (query, table) probe scans
    // ~12.5k members: ~1.6e9 candidate pairs before distinct. The operator
    // itself scales by raising `bits` with log2(N/targetBucket) — a
    // per-deployment knob, not a fixed-config ladder subject. The capped
    // dedups and the stride-scaled IVF (centroids ~sqrt(N), probe fraction
    // nprobe/#cells shrinking with N) are the honest fixed-config rungs.
    // dedup_embed appears twice: the PRODUCTION config (default bucketCap
    // 200, whose census cap collapses recall to exact-signature groups
    // once every bucket is over-cap — the ladder SHOWS the cliff) and the
    // autoBits variant that widens bits with log2(N) to keep buckets near
    // the cap target. NOT the catalog queries: those lift the cap so the
    // DuckDB oracle can replay the light path exactly, which is the right
    // correctness contract and the WRONG volume config (uncapped dense
    // buckets go quadratic by design — 40 s at x10, hours at x100).
    val queries = Seq[(String, String => org.apache.spark.sql.DataFrame)](
      "dedup_embed" -> (dir => graft.operators.VectorOps.embeddingDuplicates(
        Tables.embeddings(spark, dir), "vec_id", "embedding",
        threshold = 0.45)),
      "dedup_embed_auto" -> (dir => graft.operators.VectorOps.embeddingDuplicates(
        Tables.embeddings(spark, dir), "vec_id", "embedding",
        threshold = 0.45, autoBits = true)),
      "dedup_semantic" -> (dir => SparkEntry.queries("dedup_semantic")(spark, dir)),
      "ann_ivf" -> (dir => SparkEntry.queries("ann_ivf")(spark, dir)),
      // PQ scan at a production config (256-codeword byte codes, fixed
      // 40-query set from the base replica so the axis is corpus growth):
      // index rebuilt per run — encode is the narrow O(N*m*ksub*dsub)
      // pass, the scan reads ONLY the code table
      "ann_pq" -> { dir =>
        val e = Tables.embeddings(spark, dir)
        val q = e.filter(col("vec_id") < 10000000L && col("vec_id") % 50 === 0)
        val idx = graft.operators.ProductQuantization.pqIndex(
          e, "vec_id", "embedding", m = 8, ksub = 256, dim = 64)
        graft.operators.ProductQuantization.pqTopK(
          q, "vec_id", "embedding", idx, k = 5, refine = 8)
      },
      // r10: the per-cell corpus map — stride grows with sqrt(N), so the
      // broadcast matrix and the assignment cost per row stay bounded
      "cluster_assign" -> (dir => SparkEntry.queries("cluster_assign")(spark, dir)),
      // production config, index rebuilt each run (upper bound on the
      // amortized probe, same caveat as the text ladder's incremental rung)
      "dedup_embed_incr" -> { dir =>
        val e = Tables.embeddings(spark, dir)
        val idx = graft.operators.VectorOps.embeddingIndex(
          e.filter(col("vec_id") % 10 =!= 0), "vec_id", "embedding")
        graft.operators.VectorOps.embeddingDuplicatesAgainst(
          e.filter(col("vec_id") % 10 === 0), "vec_id", "embedding", idx,
          threshold = 0.45)
      })
    factors.foreach { f =>
      val dir = s"/tmp/graft-volume/vecs-x$f"
      if (!new java.io.File(s"$dir/embeddings.parquet").exists()) {
        Tables.embeddings(spark, sfDir)
          .withColumn("_rep", explode(lit((0 until f).toArray)))
          .withColumn("vec_id", col("vec_id") + col("_rep") * 10000000L)
          .withColumn("embedding", transform(col("embedding"), (x, i) =>
            (x * when(pmod(xxhash64(col("_rep"), i), lit(2)) === 0, lit(1.0))
              .otherwise(lit(-1.0))).cast("float")))
          .drop("_rep")
          .repartition(cpus)
          .write.mode("overwrite").parquet(s"$dir/embeddings.parquet")
      }
      val rows = spark.read.parquet(s"$dir/embeddings.parquet").count()
      queries.foreach { case (name, mk) =>
        (1 to 2).foreach { round =>
          val t0 = System.nanoTime()
          val df = mk(dir)
          val Array(n, _) = df
            .agg(count(lit(1)), bit_xor(xxhash64(Bench.checksumCols(df): _*)))
            .head().toSeq.toArray
          val sec = (System.nanoTime() - t0) / 1e9
          println(f"[volume] vecs-x$f%-3d rows=$rows%-9d $name%-17s round=$round " +
            f"out=$n%-7s sec=$sec%6.2f rate=${rows / sec / 1e3}%9.1fk rows/s")
          spark.catalog.clearCache()
        }
      }
    }
  }
}
