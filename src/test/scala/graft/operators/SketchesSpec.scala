package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

import scala.util.Random

class SketchesSpec extends SparkSpec {
  import spark.implicits._

  test("KMV estimate lands within 4/sqrt(k) of the exact distinct count") {
    val rng = new Random(3)
    // three groups with very different true cardinalities, values repeated
    val rows = Seq.tabulate(30000) { _ =>
      val g = rng.nextInt(3)
      val card = Seq(500, 3000, 12000)(g)
      (s"g$g", rng.nextInt(card).toLong)
    }
    val df = rows.toDF("g", "v").repartition(6)
    val k = 256
    val got = Sketches.kmvDistinct(df, Seq("g"), col("v"), k)
      .select("g", "est_distinct").as[(String, Long)].collect().toMap
    val exact = df.groupBy("g").agg(countDistinct(col("v")).as("n"))
      .as[(String, Long)].collect().toMap
    for ((g, ex) <- exact) {
      val est = got(g)
      val relErr = math.abs(est - ex).toDouble / ex
      assert(relErr < 4.0 / math.sqrt(k), s"$g: est=$est exact=$ex err=$relErr")
    }
  }

  test("groups under k distinct values report the exact count") {
    val df = (1 to 100).flatMap(i => Seq(("a", i.toLong), ("a", i.toLong)))
      .toDF("g", "v")
    val row = Sketches.kmvDistinct(df, Seq("g"), col("v"), k = 256)
      .select("n_kept", "est_distinct").as[(Long, Long)].head()
    assert(row == ((100L, 100L)))
  }

  test("sketches merge: k smallest of unioned survivor sets = sketch of the union") {
    val rng = new Random(9)
    val a = Seq.fill(5000)(("g", rng.nextInt(4000).toLong)).toDF("g", "v")
    val b = Seq.fill(5000)(("g", rng.nextInt(4000).toLong + 2000L)).toDF("g", "v")
    val k = 128
    def survivors(df: org.apache.spark.sql.DataFrame) =
      graft.plans.GroupTopK.topK(
        df.select(col("g"), Sketches.hash48(col("v")).as("hv")).distinct(),
        Seq("g"), Seq("hv" -> true), k)
    val merged = graft.plans.GroupTopK.topK(
        survivors(a).union(survivors(b)).distinct(), Seq("g"), Seq("hv" -> true), k)
      .agg(max("hv")).as[Long].head()
    val direct = survivors(a.union(b)).agg(max("hv")).as[Long].head()
    assert(merged == direct)
  }

  test("incremental kmvUpdate over batches equals the one-shot sketch") {
    val rng = new Random(29)
    val all = Seq.tabulate(9000) { _ =>
      (s"g${rng.nextInt(3)}", rng.nextInt(2500).toLong)
    }
    val k = 128
    val batches = all.grouped(3000).toSeq
    var surv = Sketches.kmvSurvivors(batches.head.toDF("g", "v"),
      Seq("g"), col("v"), k)
    batches.tail.foreach { b =>
      surv = Sketches.kmvUpdate(surv, b.toDF("g", "v"), Seq("g"), col("v"), k)
    }
    val incr = Sketches.kmvEstimate(surv, Seq("g"), k)
      .select("g", "n_kept", "kth_hv", "est_distinct")
      .as[(String, Long, Long, Long)].collect().toSet
    val oneShot = Sketches.kmvDistinct(all.toDF("g", "v"), Seq("g"), col("v"), k)
      .select("g", "n_kept", "kth_hv", "est_distinct")
      .as[(String, Long, Long, Long)].collect().toSet
    assert(incr == oneShot && incr.nonEmpty)
  }

  test("null values are excluded, matching count(DISTINCT) semantics") {
    val df = (Seq.tabulate(80)(i => ("a", Option((i % 40).toLong))) ++
        Seq.fill(25)(("a", Option.empty[Long])) :+ ("b", Option.empty[Long]))
      .toDF("g", "v")
    val got = Sketches.kmvDistinct(df, Seq("g"), col("v"), k = 256)
      .select("g", "n_kept", "est_distinct").as[(String, Long, Long)]
      .collect().map(r => r._1 -> ((r._2, r._3))).toMap
    assert(got("a") == ((40L, 40L))) // nulls never occupy survivor slots
    assert(!got.contains("b"))       // all-null group vanishes, like COUNT(DISTINCT)
  }

  test("hash48 stays in [1, 2^48] and is deterministic") {
    val vals = Seq("a", "b", "", "0", "a").toDF("v")
      .select(Sketches.hash48(col("v")).as("h")).as[Long].collect()
    assert(vals.forall(h => h >= 1L && h <= (1L << 48)))
    assert(vals(0) == vals(4))
  }

  // ------------------------------------------------- Count-Min sketch

  test("CMS never underestimates, and is exact when width clears the load") {
    val rng = new Random(67)
    val rows = Seq.fill(6000)(("u" + rng.nextInt(300)).hashCode.toLong % 300)
    val df = rows.toDF("v").repartition(5)
    val exact = rows.groupBy(identity).view.mapValues(_.size.toLong).toMap
    val probes = exact.keys.toSeq.toDF("v")
    // narrow sketch: collisions certain; estimate must only ever be high
    val narrow = Sketches.cmsEstimate(
        Sketches.cmsSketch(df, col("v"), depth = 4, width = 16),
        probes, "v", depth = 4, width = 16)
      .as[(Long, Long)].collect().toMap
    exact.foreach { case (v, n) => assert(narrow(v) >= n, s"v=$v") }
    assert(exact.exists { case (v, n) => narrow(v) > n }) // collisions real
    // wide sketch: 4 rows of 4096 over 300 keys — min resolves every probe
    val wide = Sketches.cmsEstimate(
        Sketches.cmsSketch(df, col("v"), depth = 4, width = 4096),
        probes, "v", depth = 4, width = 4096)
      .as[(Long, Long)].collect().toMap
    exact.foreach { case (v, n) => assert(wide(v) == n, s"v=$v") }
  }

  test("CMS merge law: merge(sketch(b1), sketch(b2)) == sketch(b1 ++ b2)") {
    val rng = new Random(71)
    val b1 = Seq.fill(2000)(rng.nextInt(150).toLong)
    val b2 = Seq.fill(1500)(rng.nextInt(150).toLong)
    def cells(df: org.apache.spark.sql.DataFrame) =
      df.select("row", "bucket", "cnt").as[(Int, Long, Long)].collect().toSet
    val merged = cells(Sketches.cmsMerge(
      Sketches.cmsSketch(b1.toDF("v"), col("v"), 4, 64),
      Sketches.cmsSketch(b2.toDF("v"), col("v"), 4, 64)))
    val oneShot = cells(Sketches.cmsSketch((b1 ++ b2).toDF("v"), col("v"), 4, 64))
    assert(merged == oneShot && merged.nonEmpty)
  }

  test("CMS plan: one map-side-combinable exchange, cells never the corpus") {
    val df = Seq.tabulate(100)(i => i.toLong % 7).toDF("v").repartition(3)
    val p = Sketches.cmsSketch(df, col("v"), 4, 32)
      .queryExecution.executedPlan.toString()
    assert(p.contains("partial_count"), s"must combine map-side:\n$p")
  }

  test("Bloom: never a false negative; absent probes mostly reject at sane fill") {
    val rng = new Random(73)
    val present = (0 until 400).map(i => s"url-$i")
    val absent = (0 until 200).map(i => s"miss-$i")
    val filter = Sketches.bloomSketch(
      present.toDF("v").repartition(5), col("v"), nBits = 65536, nHashes = 4)
    val got = Sketches.bloomProbe(filter,
        rng.shuffle(present ++ absent).toDF("v"), "v", nBits = 65536, nHashes = 4)
      .as[(String, Boolean)].collect().toMap
    present.foreach(v => assert(got(v), s"FALSE NEGATIVE on $v"))
    // 1600 set bits of 65536: FP rate ~ (0.024)^4 ~ 3e-7 — demand < 5/200
    assert(absent.count(got) < 5, s"implausible FP count ${absent.count(got)}")
  }

  test("Bloom merge law: OR of two filters == filter of the union; idempotent") {
    val b1 = (0 until 300).map(i => s"a-$i")
    val b2 = (150 until 450).map(i => s"a-$i") // overlaps b1
    def words(df: org.apache.spark.sql.DataFrame) =
      df.as[(Long, Long)].collect().toSet
    val f1 = Sketches.bloomSketch(b1.toDF("v"), col("v"), 4096, 4)
    val f2 = Sketches.bloomSketch(b2.toDF("v"), col("v"), 4096, 4)
    val merged = words(Sketches.bloomMerge(f1, f2))
    assert(merged == words(
      Sketches.bloomSketch((b1 ++ b2).toDF("v"), col("v"), 4096, 4)))
    // idempotence: merging a filter with itself changes nothing
    assert(words(Sketches.bloomMerge(f1, f1)) == words(f1))
  }

  test("Bloom words are partitioning-invariant and use bit 63") {
    val vs = (0 until 2000).map(i => s"k-$i")
    def words(parts: Int) = Sketches
      .bloomSketch(vs.toDF("v").repartition(parts), col("v"), 1024, 4)
      .as[(Long, Long)].collect().toSet
    val w1 = words(1)
    assert(w1 == words(7)) // bit_or commutes
    // at 8000 positions over 1024 bits every word saturates, so bit 63
    // (the Long.MinValue mask — the DuckDB-oracle CASE edge) is exercised
    assert(w1.exists { case (_, bits) => bits < 0L }, "bit 63 never set")
    // plan: the word aggregate combines map-side — the exchange carries
    // word cells, never one row per (value, hash)
    val p = Sketches.bloomSketch(vs.toDF("v").repartition(3), col("v"), 1024, 4)
      .queryExecution.executedPlan.toString()
    assert(p.contains("partial_bit_or"), s"must combine map-side:\n$p")
  }

  // ------------------------------------------------- HyperLogLog

  test("HLL raw estimate lands within 4·1.04/sqrt(m) of the exact count") {
    val rng = new Random(41)
    val rows = Seq.tabulate(40000) { _ =>
      val g = rng.nextInt(3)
      val card = Seq(2000, 8000, 20000)(g)
      (s"g$g", rng.nextInt(card).toLong)
    }
    val df = rows.toDF("g", "v").repartition(6)
    val p = 8
    val est = Sketches.hllEstimate(
        Sketches.hllRegisters(df, Seq("g"), col("v"), p), Seq("g"), p)
      .select("g", "hll_est").as[(String, Long)].collect().toMap
    val exact = df.groupBy("g").agg(countDistinct(col("v")).as("n"))
      .as[(String, Long)].collect().toMap
    for ((g, ex) <- exact) {
      val relErr = math.abs(est(g) - ex).toDouble / ex
      assert(relErr < 4.0 * 1.04 / math.sqrt(1 << p),
        s"$g: est=${est(g)} exact=$ex err=$relErr")
    }
  }

  test("HLL rank/register math replays on the JVM bit-for-bit") {
    // re-derive reg and rank for a handful of values straight from
    // MessageDigest md5, proving the column expressions implement the
    // documented sketch (and therefore that any engine can)
    val vals = Seq("a", "xyz", "42", "grafted")
    val p = 8
    val got = Sketches.hllRegisters(vals.toDF("v"), Seq.empty, col("v"), p)
      .select("reg", "max_rank").as[(Long, Int)].collect().toSet
    val md = java.security.MessageDigest.getInstance("MD5")
    val want = vals.map { v =>
      val hex = md.digest(v.getBytes("UTF-8"))
        .map("%02x".format(_)).mkString.take(12)
      val h = java.lang.Long.parseLong(hex, 16)
      val rem = 48 - p
      val r = h % (1L << rem)
      val rank = if (r == 0) rem + 1
        else rem + 1 - (64 - java.lang.Long.numberOfLeadingZeros(r))
      (h >> rem, rank)
    }.groupBy(_._1).map { case (reg, rs) => (reg, rs.map(_._2).max) }.toSet
    assert(got == want)
  }

  test("HLL merge law: per-register MAX of two sketches == sketch of the union; idempotent") {
    val a = (0 until 3000).map(i => ("g", s"a-$i"))
    val b = (1500 until 4500).map(i => ("g", s"a-$i")) // overlaps a
    def regs(rows: Seq[(String, String)]) =
      Sketches.hllRegisters(rows.toDF("g", "v"), Seq("g"), col("v"), p = 8)
    def set(df: org.apache.spark.sql.DataFrame) =
      df.select("g", "reg", "max_rank").as[(String, Long, Int)].collect().toSet
    val merged = set(Sketches.hllMerge(regs(a), regs(b), Seq("g")))
    assert(merged == set(regs(a ++ b)))
    assert(set(Sketches.hllMerge(regs(a), regs(a), Seq("g"))) == set(regs(a)))
  }

  test("HLL estimate max-compacts a raw emission log; nulls are excluded") {
    val rows = (0 until 2000).map(i => ("g", Option(s"v-$i"))) ++
      Seq.fill(50)(("g", Option.empty[String]))
    val regs = Sketches.hllRegisters(rows.toDF("g", "v"), Seq("g"), col("v"), 8)
    // a stale emission log: every register also carries a rank-1 row
    val log = regs.unionByName(regs.withColumn("max_rank", lit(1)))
    def est(df: org.apache.spark.sql.DataFrame) =
      Sketches.hllEstimate(df, Seq("g"), 8)
        .select("n_regs", "sum_scaled", "hll_est")
        .as[(Long, Long, Long)].head()
    assert(est(log) == est(regs), "stale lower-rank rows moved the estimate")
    // nulls excluded: the same sketch as without them
    val clean = (0 until 2000).map(i => ("g", s"v-$i"))
    assert(est(regs) ==
      est(Sketches.hllRegisters(clean.toDF("g", "v"), Seq("g"), col("v"), 8)))
  }

  test("HLL small-range correction beats the raw estimator at tiny cardinality") {
    val df = (0 until 30).map(i => ("g", s"tiny-$i")).toDF("g", "v")
    val raw = Sketches.hllEstimate(
      Sketches.hllRegisters(df, Seq("g"), col("v"), 8), Seq("g"), 8)
    val (rawEst, corrected) = Sketches.hllCorrected(raw, 8)
      .select("hll_est", "est_corrected").as[(Long, Long)].head()
    // 30 values in 256 registers: the raw harmonic estimator overshoots,
    // linear counting lands close
    assert(math.abs(corrected - 30) <= 3,
      s"linear counting off: $corrected (raw $rawEst)")
    assert(math.abs(corrected - 30) < math.abs(rawEst - 30))
  }

  test("HLL exchange is register cells, combined map-side") {
    val df = (0 until 5000).map(i => ("g", s"x-$i")).toDF("g", "v")
      .repartition(4)
    val plan = Sketches.hllRegisters(df, Seq("g"), col("v"), 8)
      .queryExecution.executedPlan.toString()
    assert(plan.contains("partial_max"), s"must combine map-side:\n$plan")
  }
}
