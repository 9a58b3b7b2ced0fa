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
