package graft.dsl

import graft.SparkSpec
import org.apache.spark.sql.functions._

import scala.util.Random

/** Randomized differential tests: the columnar window formulations vs
  * direct Scala simulations of the reference state machines
  * (TimerPattern.scala:63-109, WindowStatistic.scala:45-104), over random
  * event streams with irregular spacing, gaps and noise. Catches
  * off-by-one-interval and edge-correction mistakes the fixed corpus can't.
  */
class RandomizedSemanticsSpec extends SparkSpec {

  import spark.implicits._

  private val rnd = new Random(20260812L)
  private val GapMs = 60000L

  // ~60 keys x ~50 events, 0.5-90s spacing (some spacings exceed the gap)
  private case class Ev(k: Int, ms: Long, cond: Boolean)
  private val streams: Map[Int, Vector[Ev]] = (1 to 60).map { k =>
    var t = 1000000000000L + rnd.nextInt(100000)
    val evs = Vector.fill(30 + rnd.nextInt(40)) {
      t += 500L + (if (rnd.nextInt(10) == 0) 60000L + rnd.nextInt(60000)
                   else rnd.nextInt(20000))
      Ev(k, t, rnd.nextBoolean())
    }
    k -> evs
  }.toMap

  private lazy val df = streams.values.flatten.toSeq
    .map(e => (e.k, e.ms, e.cond))
    .toDF("k", "ms", "cond")
    .withColumn("ts", timestamp_millis(col("ms")))
    .withColumn("v", when(col("cond"), 100.0).otherwise(0.0))
    .cache()

  private val cfg = PatternConfig(Seq("k"), "ts", eventsMaxGapMs = GapMs,
    sessionGapMs = 0L)

  /** Split a key's events into gap-runs (state reset at dt > GapMs). */
  private def gapRuns(evs: Vector[Ev]): Vector[Vector[Ev]] = {
    val out = Vector.newBuilder[Vector[Ev]]
    var cur = Vector.newBuilder[Ev]
    var prev = Long.MinValue
    evs.foreach { e =>
      if (prev != Long.MinValue && e.ms - prev > GapMs) {
        out += cur.result(); cur = Vector.newBuilder[Ev]
      }
      cur += e; prev = e.ms
    }
    out += cur.result()
    out.result().filter(_.nonEmpty)
  }

  test("timer matches the reference run semantics on random streams") {
    val T = 5000L
    // reference: per cond-run [start..end] within a gap-run, success on
    // events with t >= start + T (TimerPattern: fail before head+window,
    // succ through run end once reached)
    val expected = streams.flatMap { case (k, evs) =>
      gapRuns(evs).flatMap { run =>
        val condRuns = run.foldLeft(Vector.empty[Vector[Ev]]) { (acc, e) =>
          if (!e.cond) acc :+ Vector.empty
          else if (acc.isEmpty || acc.last.isEmpty ||
            (acc.nonEmpty && acc.last.nonEmpty)) {
            if (acc.isEmpty) Vector(Vector(e))
            else acc.init :+ (acc.last :+ e)
          } else acc
        }.filter(_.nonEmpty)
        condRuns.flatMap { cr =>
          val succ = cr.filter(e => e.ms >= cr.head.ms + T)
          if (succ.nonEmpty) Some((k.toLong, succ.head.ms, succ.last.ms)) else None
        }
      }
    }.toSet

    val got = TspEngine.incidents(df, "v > 50 for 5 sec", cfg)
      .select(col("k").cast("long"), col("from_ms"), col("to_ms"))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    assert(got == expected,
      s"timer mismatch; missing=${expected -- got}, extra=${got -- expected}")
  }

  test("window-statistic count matches a direct simulation on random streams") {
    val W = 20000L
    // reference: successCount at e = number of cond-true events in
    // [e.ms - W, e.ms] within the gap-run (queue eviction t + W < now)
    val expected = streams.flatMap { case (k, evs) =>
      gapRuns(evs).flatMap { run =>
        run.map { e =>
          val cnt = run.count(o => o.ms >= e.ms - W && o.ms <= e.ms && o.cond)
          (k, e.ms, cnt >= 4)
        }
      }
    }.filter(_._3).map(t => (t._1.toLong, t._2)).toSet

    // per-event truth of the stat: recover it via single-event incidents
    // (sessionGap 0 merges only adjacent), then explode back to events
    val (frame, res) = {
      val compiler = new PatternCompiler(df, cfg)
      val ast = Parser.parse("v > 50 for 20 sec >= 4 times", 0.0)
        .fold(e => fail(e.toString), identity)
      compiler.compile(ast)
    }
    val got = frame.filter(col(res))
      .select(col("k").cast("long"), unix_millis(col("ts")))
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(got == expected,
      s"stat mismatch; missing=${(expected -- got).take(5)}, extra=${(got -- expected).take(5)}")
  }

  // ---------------------------------------------------------------- andThen

  /** Independent transliteration of the reference's queue merge
    * (AndThenPattern.scala:42-94), written functionally over Lists — a second
    * implementation against PatternCompiler.andThenMerge's mutable-queue
    * port, so a transcription slip in either shows up as a diff.
    */
  private def refAndThen(a: List[(Long, Long, Boolean)],
                         b: List[(Long, Long, Boolean)]): List[(Long, Long)] = {
    def rewindTo(q: List[(Long, Long, Boolean)], n: Long) =
      q.dropWhile(_._2 < n) match {
        case (s, e, v) :: t if s <= n => (n, e, v) :: t
        case other                    => other
      }
    (a, b) match {
      case (Nil, _) | (_, Nil) => Nil
      case ((s1, e1, v1) :: at, (s2, e2, v2) :: bt) =>
        if (!v1) refAndThen(at, b.dropWhile(_._2 <= s1))
        else if (!v2) {
          if (a.size == 1) refAndThen(rewindTo(a, e2 + 1), bt)
          else refAndThen(a, bt)
        } else if (s1 > e2) refAndThen(a, bt)
        else if (e1 + 1 < s2) refAndThen(at, b)
        else {
          val start = math.min(s1, s2)
          val end = math.max(e1 + 1, e2)
          (start, end) :: refAndThen(rewindTo(a, end + 1), rewindTo(b, end + 1))
        }
    }
  }

  /** RLE of a boolean series (1-based global idx per key) within one part. */
  private def rle(evs: Vector[(Long, Boolean)]): List[(Long, Long, Boolean)] =
    evs.foldLeft(List.empty[(Long, Long, Boolean)]) {
      case ((s, e, v) :: t, (i, c)) if v == c => (s, i, v) :: t
      case (acc, (i, c))                      => (i, i, c) :: acc
    }.reverse

  test("andThen matches a direct port of the reference queue merge") {
    // two independent random conditions on fresh streams
    val rnd2 = new Random(99173L)
    case class E2(k: Int, ms: Long, a: Boolean, b: Boolean)
    val streams2: Map[Int, Vector[E2]] = (1 to 50).map { k =>
      var t = 1000000000000L + rnd2.nextInt(100000)
      val evs = Vector.fill(30 + rnd2.nextInt(40)) {
        t += 500L + (if (rnd2.nextInt(12) == 0) 60000L + rnd2.nextInt(60000)
                     else rnd2.nextInt(20000))
        E2(k, t, rnd2.nextBoolean(), rnd2.nextBoolean())
      }
      k -> evs
    }.toMap
    val df2 = streams2.values.flatten.toSeq
      .map(e => (e.k, e.ms, if (e.a) 100.0 else 0.0, if (e.b) 100.0 else 0.0))
      .toDF("k", "ms", "va", "vb")
      .withColumn("ts", timestamp_millis(col("ms")))

    // .toSeq first: flatMap over a Map with pair results would collapse
    // into Map semantics (one entry per key) and silently drop events
    val expected = streams2.toSeq.flatMap { case (k, evs) =>
      val idxed = evs.zipWithIndex.map { case (e, i) => (e, i + 1L) }
      // gap-runs preserve the global per-key idx
      val parts = {
        val out = Vector.newBuilder[Vector[(E2, Long)]]
        var cur = Vector.newBuilder[(E2, Long)]
        var prev = Long.MinValue
        idxed.foreach { case (e, i) =>
          if (prev != Long.MinValue && e.ms - prev > GapMs) {
            out += cur.result(); cur = Vector.newBuilder[(E2, Long)]
          }
          cur += ((e, i)); prev = e.ms
        }
        out += cur.result()
        out.result().filter(_.nonEmpty)
      }
      parts.flatMap { part =>
        val aR = rle(part.map { case (e, i) => (i, e.a) })
        val bR = rle(part.map { case (e, i) => (i, e.b) })
        val maxIdx = part.last._2
        refAndThen(aR, bR).flatMap { case (s, e) =>
          part.collect { case (_, i) if i >= s && i <= math.min(e, maxIdx) => (k.toLong, i) }
        }
      }
    }.toSet

    val compiler = new PatternCompiler(df2, cfg)
    val ast = Parser.parse("va > 50 andThen vb > 50", 0.0)
      .fold(e => fail(e.toString), identity)
    val (frame, res) = compiler.compile(ast)
    val got = frame.filter(col(res))
      .select(col("k").cast("long"), col("ms"))
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    // map expected idx back to ms for comparison
    val idxToMs = streams2.flatMap { case (k, evs) =>
      evs.zipWithIndex.map { case (e, i) => (k.toLong, i + 1L) -> e.ms }
    }
    val expectedMs = expected.map { case (k, i) => (k, idxToMs((k, i))) }
    assert(got == expectedMs,
      s"andThen mismatch; missing=${(expectedMs -- got).take(5)}, extra=${(got -- expectedMs).take(5)}")
  }

  test("incremental AndThenMachine is identical to the whole-part queue merge") {
    // pure-function fuzz, no Spark: varying flap rates (flip=1 is maximal
    // flapping, flip=8 gives long constant stretches — the stall shapes
    // where the incremental merge must hold state), random non-1-based
    // start indices (gap runs resume mid-key)
    val r = new Random(421337L)
    for (trial <- 1 to 20000) {
      val n = 1 + r.nextInt(60)
      val start = 1L + r.nextInt(100)
      val flipA = 1 + r.nextInt(8)
      val flipB = 1 + r.nextInt(8)
      var a = r.nextBoolean()
      var b = r.nextBoolean()
      val evs = (start until start + n).map { i =>
        if (r.nextInt(flipA) == 0) a = !a
        if (r.nextInt(flipB) == 0) b = !b
        (i, a, b)
      }
      def rle(xs: Seq[(Long, Boolean)]): List[(Long, Long, Boolean)] =
        xs.foldLeft(List.empty[(Long, Long, Boolean)]) {
          case ((s, e, v) :: t, (i, c)) if v == c => (s, i, v) :: t
          case (acc, (i, c))                      => (i, i, c) :: acc
        }.reverse
      val last = evs.last._1
      val whole = PatternCompiler
        .andThenMerge(rle(evs.map(e => (e._1, e._2))), rle(evs.map(e => (e._1, e._3))))
        .map { case (s, e) => (s, math.min(e, last)) }
      val m = new PatternCompiler.AndThenMachine
      evs.foreach { case (i, ca, cb) => m.feed(i, ca, cb) }
      val inc = m.finish()
      assert(inc == whole,
        s"trial=$trial n=$n flipA=$flipA flipB=$flipB: machine=$inc merge=$whole evs=${evs.take(30)}")
    }
  }

  test("pattern machines stream a million events without whole-part buffering") {
    // the scale claim behind the mapPartitions rewrite: state is runs (and
    // the wait windowQueue), never the events. 1M events with adversarial
    // shapes — flapping conditions, a never-true side holding the frontier
    // open — must stream through in-heap without materializing per-event
    // structures (the old collect_list formulation held 1M struct rows
    // per part here).
    val t0 = System.nanoTime()
    val m1 = new PatternCompiler.AndThenMachine
    var i = 1L
    while (i <= 1000000L) { m1.feed(i, i % 2 == 0, i % 3 == 0); i += 1 }
    val out1 = m1.finish()
    assert(out1.nonEmpty)
    // A constant-true, B never true: the frontier never advances — pending
    // state is ONE open run per side, zero closed runs
    val m2 = new PatternCompiler.AndThenMachine
    i = 1L
    while (i <= 1000000L) { m2.feed(i, ca = true, cb = false); i += 1 }
    assert(m2.finish().isEmpty)
    val m3 = new PatternCompiler.WaitMachine(1000L)
    i = 1L
    while (i <= 1000000L) { m3.feed(i, i * 100L, (i / 7) % 2 == 0); i += 1 }
    assert(m3.finish().nonEmpty)
    val secs = (System.nanoTime() - t0) / 1e9
    assert(secs < 30.0, s"machines took ${secs}s for 3M events")
  }

  // ------------------------------------------------------------------- wait

  /** Port of WaitAccumState.updated driven per part, as AccumPattern feeds
    * it (reference: aggregators/WaitPattern.scala:29-89 + AccumPattern
    * .scala:60-85): one call per RLE cond run with that run's (idx, ms)
    * times; state (windowQueue, lastFail, lastTime) carries across runs and
    * resets at gap-runs like every pattern state. Returns emitted
    * (startIdx, endIdx, isSucc) intervals.
    */
  private def refWait(windowMs: Long,
                      runs: Seq[(Boolean, Vector[(Long, Long)])]): Seq[(Long, Long, Boolean)] = {
    var windowQueue = Vector.empty[(Long, Long)]
    var lastFail = false
    var lastTime = (0L, 0L)
    val out = Vector.newBuilder[(Long, Long, Boolean)]
    runs.foreach { case (succ, times) =>
      if (times.nonEmpty) {
        val start = if (lastFail) times.head._2 - windowMs else times.head._2
        val end = if (!succ) times.last._2 - windowMs else times.last._2
        var wq = windowQueue ++ times
        while (wq.length > 1 && wq(1)._2 < start) wq = wq.tail
        val (outputs, remaining) = wq.span(_._2 <= end)
        // reference: cleanedWindowQueue is mutated by takeWhileFromQueue, so
        // its lastOption at this point is the REMAINING queue's last
        val waitStart =
          if (lastTime._2 != 0L && outputs.nonEmpty &&
            outputs.head._2 + windowMs <= outputs.last._2) outputs.headOption
          else Some(remaining.lastOption.getOrElse(lastTime))
        val waitEnd = outputs.lastOption
        for (s <- waitStart; e <- waitEnd; if s._1 <= e._1)
          out += ((s._1, e._1, succ))
        windowQueue = remaining
        lastFail = !succ
        lastTime = times.last
      }
    }
    out.result()
  }

  test("wait matches a direct port of the reference WaitAccumState") {
    val W = 10000L
    // .toSeq first: see the andThen test — Map.flatMap would drop events
    val expected = streams.toSeq.flatMap { case (k, evs) =>
      val idxed = evs.zipWithIndex.map { case (e, i) => (e, i + 1L) }
      val parts = {
        val out = Vector.newBuilder[Vector[(Ev, Long)]]
        var cur = Vector.newBuilder[(Ev, Long)]
        var prev = Long.MinValue
        idxed.foreach { case (e, i) =>
          if (prev != Long.MinValue && e.ms - prev > GapMs) {
            out += cur.result(); cur = Vector.newBuilder[(Ev, Long)]
          }
          cur += ((e, i)); prev = e.ms
        }
        out += cur.result()
        out.result().filter(_.nonEmpty)
      }
      parts.flatMap { part =>
        // RLE cond runs with times, in order
        val runs = {
          val rs = Vector.newBuilder[(Boolean, Vector[(Long, Long)])]
          var cur = Vector.newBuilder[(Long, Long)]
          var curV: Option[Boolean] = None
          part.foreach { case (e, i) =>
            if (curV.exists(_ != e.cond)) {
              rs += ((curV.get, cur.result())); cur = Vector.newBuilder[(Long, Long)]
            }
            curV = Some(e.cond); cur += ((i, e.ms))
          }
          curV.foreach(v => rs += ((v, cur.result())))
          rs.result()
        }
        refWait(W, runs).collect { case (s, e, true) =>
          part.collect { case (_, i) if i >= s && i <= e => (k.toLong, i) }
        }.flatten
      }
    }.toSet

    val compiler = new PatternCompiler(df, cfg)
    val ast = Parser.parse("wait(10 sec, v > 50)", 0.0)
      .fold(e => fail(e.toString), identity)
    val (frame, res) = compiler.compile(ast)
    val got = frame.filter(col(res))
      .select(col("k").cast("long"), col("ms"))
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val idxToMs = streams.flatMap { case (k, evs) =>
      evs.zipWithIndex.map { case (e, i) => (k.toLong, i + 1L) -> e.ms }
    }
    val expectedMs = expected.map { case (k, i) => (k, idxToMs((k, i))) }
    assert(got == expectedMs,
      s"wait mismatch (${(expectedMs -- got).size} missing, ${(got -- expectedMs).size} extra); " +
        s"missing=${(expectedMs -- got).take(5)}, extra=${(got -- expectedMs).take(5)}")
  }

  test("streaming WaitMachine is bit-identical to the whole-part waitMerge") {
    // pure-function fuzz, no Spark: random (idx, ms, cond) streams with
    // duplicate timestamps, tiny and large windows, short and long runs
    val r = new Random(42)
    for (trial <- 1 to 500) {
      val w = Seq(1L, 10L, 500L, 5000L, 60000L)(r.nextInt(5))
      var ms = 1000000L + r.nextInt(1000)
      val n = 1 + r.nextInt(120)
      val evs = (1 to n).map { i =>
        ms += (if (r.nextInt(8) == 0) 0L else r.nextInt(3000).toLong)
        (i.toLong, ms, r.nextBoolean())
      }
      val whole = PatternCompiler.waitMerge(w, evs)
      val m = new PatternCompiler.WaitMachine(w)
      evs.foreach { case (i, t, c) => m.feed(i, t, c) }
      val inc = m.finish()
      assert(inc == whole,
        s"trial=$trial w=$w n=$n: machine=$inc merge=$whole evs=${evs.take(20)}")
    }
  }

  test("truthMillis matches an interval-clipping simulation on random streams") {
    val W = 30000L
    val expected = streams.flatMap { case (k, evs) =>
      evs.zipWithIndex.map { case (e, i) =>
        // intervals (prev, cur] with prev cond-true, clipped to [e.ms - W, e.ms]
        val tm = evs.zip(evs.drop(1)).collect {
          case (p, c) if p.cond && c.ms <= e.ms && c.ms >= e.ms - W =>
            c.ms - math.max(p.ms, e.ms - W)
        }.sum
        ((k.toLong, e.ms), tm)
      }
    }.toMap

    val got = graft.operators.PatternOps
      .withTruthMillis(df, Seq("k"), "ts", col("cond"), W)
      .select(col("k").cast("long"), unix_millis(col("ts")), col("truth_ms"))
      .collect().map(r => (r.getLong(0), r.getLong(1)) -> r.getLong(2)).toMap
    val diffs = expected.collect {
      case (key, v) if got.get(key).exists(_ != v) => (key, v, got(key))
    }
    assert(diffs.isEmpty, s"truthMillis mismatches: ${diffs.take(5)}")
  }
}
