package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

import scala.util.Random

class StatsSpec extends SparkSpec {
  import spark.implicits._

  /** Brute-force percentile_disc: 1-based element at ceil(p*n/100). */
  private def disc(sorted: Seq[Long], p: Int): Long =
    sorted((p * sorted.size + 99) / 100 - 1)

  test("histogram quantiles equal brute-force percentile_disc on random data") {
    val rng = new Random(21)
    val rows = Seq.tabulate(20000) { _ =>
      (s"g${rng.nextInt(4)}", rng.nextInt(500).toLong)
    }
    val df = rows.toDF("g", "v").repartition(6)
    val got = Stats.histogramQuantiles(df, Seq("g"), "v", Seq(25, 50, 90, 99, 100))
      .select("g", "n_rows", "p25", "p50", "p90", "p99", "p100")
      .as[(String, Long, Long, Long, Long, Long, Long)].collect()
      .map(r => r._1 -> r).toMap
    val byG = rows.groupBy(_._1).map { case (g, vs) => g -> vs.map(_._2).sorted.toIndexedSeq }
    for ((g, sorted) <- byG) {
      val (_, n, p25, p50, p90, p99, p100) = got(g)
      assert(n == sorted.size)
      assert(p25 == disc(sorted, 25), s"$g p25")
      assert(p50 == disc(sorted, 50), s"$g p50")
      assert(p90 == disc(sorted, 90), s"$g p90")
      assert(p99 == disc(sorted, 99), s"$g p99")
      assert(p100 == sorted.last, s"$g p100 must be the max")
    }
  }

  test("null values are ignored, like every SQL percentile aggregate") {
    val df = (Seq.tabulate(100)(i => ("a", Option(i.toLong))) ++
        Seq.fill(50)(("a", Option.empty[Long])))
      .toDF("g", "v")
    val got = Stats.histogramQuantiles(df, Seq("g"), "v", Seq(50, 100))
      .select("n_rows", "p50", "p100").as[(Long, Long, Long)].head()
    assert(got == ((100L, 49L, 99L))) // n and picks over the 100 non-nulls only
  }

  test("heavy ties and single-value groups") {
    val df = (Seq.fill(999)(("a", 7L)) ++ Seq(("a", 8L)) ++ Seq(("b", 1L)))
      .toDF("g", "v")
    val got = Stats.histogramQuantiles(df, Seq("g"), "v", Seq(50, 99, 100))
      .select("g", "p50", "p99", "p100").as[(String, Long, Long, Long)]
      .collect().map(r => r._1 -> r).toMap
    assert(got("a") == (("a", 7L, 7L, 8L)))  // 999 sevens, one eight
    assert(got("b") == (("b", 1L, 1L, 1L)))
  }

  // ------------------------------------------- bottom-k quantile sample

  test("sampleQuantiles is exact when every group fits the sample budget") {
    val rng = new Random(31)
    val rows = Seq.tabulate(900) { i =>
      (s"g${i % 3}", i.toLong, rng.nextDouble() * 100)
    }
    val df = rows.toDF("g", "id", "v").repartition(5)
    // 300 rows per group < k=512: the sample IS the group
    val got = Stats.sampleQuantiles(df, Seq("g"), col("id"), "v",
        Seq(25, 50, 99), k = 512)
      .select("g", "n_sample", "p25", "p50", "p99")
      .as[(String, Long, Double, Double, Double)].collect()
      .map(r => r._1 -> r).toMap
    for ((g, vs) <- rows.groupBy(_._1)) {
      val sorted = vs.map(_._3).sorted.toIndexedSeq
      def disc(p: Int) = sorted((p * sorted.size + 99) / 100 - 1)
      val (_, n, p25, p50, p99) = got(g)
      assert(n == sorted.size)
      assert(p25 == disc(25) && p50 == disc(50) && p99 == disc(99), g)
    }
  }

  test("sampleQuantiles approximates true percentiles within sample error") {
    val rng = new Random(37)
    // uniform [0, 1000): true p-quantile = 10*p; k=256 ⇒ se(p50) ≈ 3.1%
    val df = Seq.tabulate(50000) { i =>
      ("g", i.toLong, rng.nextDouble() * 1000)
    }.toDF("g", "id", "v").repartition(8)
    val (n, p25, p50, p90) = Stats.sampleQuantiles(df, Seq("g"), col("id"),
        "v", Seq(25, 50, 90), k = 256)
      .select("n_sample", "p25", "p50", "p90")
      .as[(Long, Double, Double, Double)].head()
    assert(n == 256)
    assert(math.abs(p25 - 250) < 100, s"p25=$p25")
    assert(math.abs(p50 - 500) < 100, s"p50=$p50")
    assert(math.abs(p90 - 900) < 100, s"p90=$p90")
  }

  test("plan: the sample's one exchange is heap-bounded, no corpus distinct") {
    val df = Seq(("a", 1L, 2.0), ("b", 2L, 3.0)).toDF("g", "id", "v")
      .repartition(2)
    val p = Stats.quantileSurvivors(df, Seq("g"), col("id"), "v", 8)
      .queryExecution.executedPlan.toString()
    // exactly one exchange (the GroupTopK final), fed by partial heaps —
    // a defensive distinct would add a corpus-sized hash exchange
    assert("Exchange hashpartitioning\\(g#".r.findAllIn(p).size == 1, p)
    assert(!p.toLowerCase.contains("hashaggregate"), p)
  }

  test("bottom-k sample merge law: update(surv(b1), b2) == surv(b1 ∪ b2)") {
    val rng = new Random(41)
    def batch(ids: Range) = ids.map { i =>
      (s"g${i % 2}", i.toLong, rng.nextDouble() * 10)
    }
    val b1 = batch(0 until 4000)
    val b2 = batch(4000 until 7000)
    val d1 = b1.toDF("g", "id", "v").repartition(4)
    val d2 = b2.toDF("g", "id", "v").repartition(3)
    val dAll = (b1 ++ b2).toDF("g", "id", "v").repartition(5)
    val k = 64
    val merged = Stats.quantileUpdate(
        Stats.quantileSurvivors(d1, Seq("g"), col("id"), "v", k),
        d2, Seq("g"), col("id"), "v", k)
      .select("g", "hv", "value").as[(String, Long, Double)].collect().toSet
    val direct = Stats.quantileSurvivors(dAll, Seq("g"), col("id"), "v", k)
      .select("g", "hv", "value").as[(String, Long, Double)].collect().toSet
    assert(merged == direct && direct.size == 2 * k)
    // re-ingesting an already-seen batch changes nothing (idempotence)
    val again = Stats.quantileUpdate(
        Stats.quantileSurvivors(dAll, Seq("g"), col("id"), "v", k),
        d1, Seq("g"), col("id"), "v", k)
      .select("g", "hv", "value").as[(String, Long, Double)].collect().toSet
    assert(again == direct)
  }

  test("cusum closed form equals the max(0, s+d) recursion on random walks") {
    val rng = new Random(13)
    val rows = for (k <- 0 until 6; i <- 0 until 500) yield
      (k.toLong, i.toLong, rng.nextInt(200).toLong - 90L) // drifting walks
    val df = rows.toDF("k", "i", "x").repartition(4)
    val got = Stats.cusum(df, Seq("k"), Seq("i"), col("x"), slack = 10L)
      .select("k", "i", "cusum").as[(Long, Long, Long)].collect()
      .map(r => (r._1, r._2) -> r._3).toMap
    for ((k, seq) <- rows.groupBy(_._1)) {
      var s = 0L
      seq.sortBy(_._2).foreach { case (_, i, x) =>
        s = math.max(0L, s + x - 10L)
        assert(got((k, i)) == s, s"key=$k i=$i")
      }
    }
  }

  test("cusum plan: both windows share one exchange and sort") {
    val df = Seq((1L, 1L, 5L)).toDF("k", "i", "x").repartition(2)
    val p = Stats.cusum(df, Seq("k"), Seq("i"), col("x"), slack = 1L)
      .queryExecution.executedPlan.toString()
    assert("Exchange hashpartitioning\\(k#".r.findAllIn(p).size == 1, p)
    assert("Sort ".r.findAllIn(p).size == 1, p)
  }

  test("plan: the exchange carries the histogram, not the rows") {
    val df = Seq(("a", 1L), ("b", 2L)).toDF("g", "v").repartition(2)
    val p = Stats.histogramQuantiles(df, Seq("g"), "v", Seq(50))
      .queryExecution.executedPlan.toString()
    // partial_count before any exchange = the map-side histogram combine
    assert(p.contains("partial_count"), s"histogram must combine map-side:\n$p")
  }

  test("ewma equals the JVM recurrence, keys isolated, negative deltas floored") {
    val rng = new scala.util.Random(79)
    // values swing negative so (v<<k − level) exercises the arithmetic
    // shift's floor semantics (where div/// would truncate differently)
    val rows = (1L to 2000L).map { i =>
      (i % 4, i / 4, i, rng.nextInt(4000).toLong - 2000L)
    }
    val k = 3
    val got = Stats.ewma(rows.toDF("key", "t_us", "event_id", "vq"),
        Seq("key"), Seq("t_us", "event_id"), "vq", k)
      .select("key", "event_id", "level_q", "resid")
      .as[(Long, Long, Long, Long)].collect()
      .map(r => r._2 -> ((r._1, r._3, r._4))).toMap
    val want = rows.groupBy(_._1).flatMap { case (key, evs) =>
      var level = 0L
      var first = true
      evs.sortBy(e => (e._2, e._3)).map { case (_, _, id, v) =>
        val resid = if (first) 0L else v - (level >> k)
        level = if (first) { first = false; v << k }
          else level + (((v << k) - level) >> k)
        id -> ((key, level >> k, resid))
      }
    }
    assert(got == want.toMap)
  }

  test("ewma converges to a constant level and tracks it exactly afterward") {
    val rows = (1L to 100L).map(i => (1L, i, i, 800L))
    val out = Stats.ewma(rows.toDF("key", "t_us", "event_id", "vq"),
        Seq("key"), Seq("t_us", "event_id"), "vq", 3)
      .orderBy("event_id").select("level_q", "resid")
      .as[(Long, Long)].collect()
    assert(out.forall(_._1 == 800L)) // level_0 = v_0; constant input holds it
    assert(out.tail.forall(_._2 == 0L))
  }

  test("ewma excludes null metrics: no observation, no row, level untouched") {
    val rows = Seq(
      (1L, 1L, 1L, Option(1000L)),
      (1L, 2L, 2L, Option.empty[Long]), // carries no observation
      (1L, 3L, 3L, Option(1800L)))
      .toDF("key", "t_us", "event_id", "vq")
    val out = Stats.ewma(rows, Seq("key"), Seq("t_us", "event_id"), "vq", 3)
      .orderBy("event_id").select("event_id", "level_q", "resid")
      .as[(Long, Long, Long)].collect().toSeq
    // the null row vanishes; row 3's resid reads against row 1's level
    assert(out == Seq((1L, 1000L, 0L), (3L, 1100L, 800L)))
  }

  test("ewma plan: one key exchange + in-partition sort, no per-row join") {
    val df = Seq((1L, 1L, 1L, 5L)).toDF("key", "t_us", "event_id", "vq")
      .repartition(2)
    val p = Stats.ewma(df, Seq("key"), Seq("t_us", "event_id"), "vq", 3)
      .queryExecution.executedPlan.toString()
    assert("Exchange hashpartitioning\\(key#".r.findAllIn(p).size == 1, p)
    assert(!p.contains("Join"), s"ewma must not join:\n$p")
  }

  test("mad equals the exact percentile_disc replica, flags planted outliers") {
    import spark.implicits._
    val rnd = new scala.util.Random(83)
    // 8 keys x 200 tight values + 3 planted wild outliers per key
    val rows = for {
      key <- 0 until 8
      i <- 0 until 203
    } yield {
      val v = if (i >= 200) 100000L + i else (key * 100 + rnd.nextInt(40)).toLong
      (key.toLong, v)
    }
    val df = rows.toDF("key", "vq")
    def disc(sorted: Seq[Long]): Long = // percentile_disc p50: ceil(n/2)th
      sorted(((sorted.size * 50 + 99) / 100 - 1).toInt)
    val got = Stats.mad(df, Seq("key"), "vq", k = 5)
      .as[(Long, Long, Long, Long, Long)].collect()
      .map(r => r._1 -> ((r._2, r._3, r._4, r._5))).toMap
    for ((key, g) <- rows.groupBy(_._1)) {
      val vs = g.map(_._2)
      val med = disc(vs.sorted)
      val devs = vs.map(v => math.abs(v - med))
      val madQ = disc(devs.sorted)
      val flagged = devs.count(_ > 5L * madQ).toLong
      assert(got(key) == ((vs.size.toLong, med, madQ, flagged)), s"key $key")
      assert(flagged == 3L, s"key $key: the 3 planted outliers must flag")
    }
  }

  test("mad zero-spread edge: a majority value gives mad 0, deviants all flag") {
    import spark.implicits._
    val df = (Seq.fill(10)(7L) ++ Seq(8L, 100L, -50L)).map((1L, _)).toDF("key", "vq")
    val Seq((n, med, madQ, flagged)) = Stats.mad(df, Seq("key"), "vq")
      .select("n", "med_q", "mad_q", "n_flagged")
      .as[(Long, Long, Long, Long)].collect().toSeq
    assert(n == 13L && med == 7L && madQ == 0L && flagged == 3L)
  }

  test("trend slope equals the exact BigInt least-squares replica") {
    import spark.implicits._
    val rnd = new scala.util.Random(11)
    // 20 keys x 40 points: slope s in [-50, 50] centiunits/min + noise,
    // timestamps at irregular minute offsets
    val rows = for {
      key <- 0 until 20
      i <- 0 until 40
    } yield {
      val s = key * 5 - 50
      val tUs = (i.toLong * 60 + rnd.nextInt(50)) * 60000000L / 60
      (key.toLong, tUs, s.toLong * (tUs / 60000000L) + rnd.nextInt(400) - 200)
    }
    val df = rows.toDF("key", "t_us", "vq")
    val got = Stats.trend(df, Seq("key"), "t_us", "vq")
      .select("key", "n", "sx", "sy", "sxy", "sxx", "slope_ppm")
      .collect().map(r => r.getLong(0) -> r).toMap
    for ((key, group) <- rows.groupBy(_._1)) {
      val t0 = group.map(_._2).min
      val xy = group.map { case (_, t, v) =>
        (BigInt((t - t0) / 60000000L), BigInt(v)) }
      val n = BigInt(xy.size)
      val (sx, sy) = (xy.map(_._1).sum, xy.map(_._2).sum)
      val (sxy, sxx) = (xy.map(p => p._1 * p._2).sum, xy.map(p => p._1 * p._1).sum)
      val den = n * sxx - sx * sx
      val num = (n * sxy - sx * sy) * 1000000
      val want = if (den == 0) null else Long.box((num / den).toLong) // BigInt / truncates
      val r = got(key)
      assert(r.getLong(1) == n.toLong && r.getLong(2) == sx.toLong &&
        r.getLong(3) == sy.toLong && r.getLong(4) == sxy.toLong &&
        r.getLong(5) == sxx.toLong, s"sums differ for key $key")
      val gotSlope = if (r.isNullAt(6)) null else Long.box(r.getLong(6))
      assert(gotSlope == want, s"key $key: got $gotSlope want $want")
      // the planted slope survives the noise (±200 over 40 pts -> the
      // slope's own standard error is ~2.4; this is a plausibility check,
      // the exact contract is the replica equality above)
      if (want != null)
        assert(math.abs(want.toLong / 1000000.0 - (key * 5 - 50)) < 8.0)
    }
  }

  test("trend degenerate keys: zero x-variance gives a NULL slope") {
    import spark.implicits._
    val df = Seq(
      (1L, 1000L, 5L), // single observation
      (2L, 1000L, 5L), (2L, 2000L, 9L), // both inside one x bucket
      (3L, 0L, 0L), (3L, 120000000L, -100L) // real spread, negative slope
    ).toDF("key", "t_us", "vq")
    val got = Stats.trend(df, Seq("key"), "t_us", "vq")
      .select("key", "slope_ppm").collect()
      .map(r => r.getLong(0) -> (if (r.isNullAt(1)) null else Long.box(r.getLong(1))))
      .toMap
    assert(got(1L) == null && got(2L) == null)
    assert(got(3L) == Long.box(-50L * 1000000L)) // -100 centiunits / 2 min
  }

  test("trend plan: the window min and the aggregation share one exchange") {
    import spark.implicits._
    val df = (0 until 400).map(i => (i % 7L, i.toLong * 60000000L, i.toLong))
      .toDF("key", "t_us", "vq")
    val p = Stats.trend(df, Seq("key"), "t_us", "vq")
      .queryExecution.executedPlan.toString()
    assert("Exchange hashpartitioning\\(key#".r.findAllIn(p).size == 1, p)
    assert(!p.contains("Join"), s"trend must not join:\n$p")
  }
}
