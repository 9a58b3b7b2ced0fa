package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

import scala.util.Random

/** [[IntervalJoin]] differentially against the BETWEEN-join spelling it
  * replaces, across bucket widths (the grid must never change the result,
  * only the pairing strategy).
  */
class IntervalJoinSpec extends SparkSpec {
  import spark.implicits._

  test("matches the BETWEEN join on randomized data across bucket widths") {
    val rng = new Random(11)
    val pts = Seq.tabulate(3000) { i =>
      (i.toLong, rng.nextInt(20).toLong, rng.nextInt(100000).toLong)
    }.toDF("event_id", "key", "t_us").repartition(5)
    val ivs = Seq.tabulate(400) { i =>
      val s = rng.nextInt(100000).toLong
      (rng.nextInt(20).toLong, s, s + 1 + rng.nextInt(8000).toLong, i.toLong)
    }.toDF("key", "start_us", "end_us", "iv_id").repartition(3)

    val want = pts.join(ivs, Seq("key"))
      .filter(col("t_us") >= col("start_us") && col("t_us") < col("end_us"))
      .select("event_id", "iv_id").as[(Long, Long)].collect().toSeq.sorted
    assert(want.nonEmpty)

    for (bucket <- Seq(100L, 4096L, 65536L, 10000000L)) {
      val got = IntervalJoin.intervalJoin(pts, ivs, Seq("key"),
          "t_us", "start_us", "end_us", bucket)
        .select("event_id", "iv_id").as[(Long, Long)].collect().toSeq.sorted
      assert(got == want, s"bucket=$bucket")
    }
  }

  test("end is exclusive, start inclusive, empty intervals drop") {
    val pts = Seq((1L, 1L, 10L), (2L, 1L, 20L), (3L, 1L, 15L))
      .toDF("event_id", "key", "t_us")
    val ivs = Seq(
      (1L, 10L, 20L, 100L), // covers t=10,15 not 20
      (1L, 30L, 30L, 101L), // empty -> nothing
      (1L, 25L, 24L, 102L)  // negative -> nothing
    ).toDF("key", "start_us", "end_us", "iv_id")
    val got = IntervalJoin.intervalJoin(pts, ivs, Seq("key"),
        "t_us", "start_us", "end_us", 7L)
      .select("event_id", "iv_id").as[(Long, Long)].collect().toSeq.sorted
    assert(got == Seq((1L, 100L), (3L, 100L)))
  }

  test("overlapping windows multiply points; disjoint keys never pair") {
    val pts = Seq((1L, 1L, 50L), (2L, 2L, 50L)).toDF("event_id", "key", "t_us")
    val ivs = Seq((1L, 0L, 100L, 10L), (1L, 40L, 60L, 11L), (3L, 0L, 100L, 12L))
      .toDF("key", "start_us", "end_us", "iv_id")
    val got = IntervalJoin.intervalJoin(pts, ivs, Seq("key"),
        "t_us", "start_us", "end_us", 32L)
      .select("event_id", "iv_id").as[(Long, Long)].collect().toSeq.sorted
    assert(got == Seq((1L, 10L), (1L, 11L)))
  }

  test("auto-tuned width returns identical results to any fixed width") {
    val rng = new Random(19)
    val pts = Seq.tabulate(1500) { i =>
      (i.toLong, rng.nextInt(10).toLong, rng.nextInt(50000).toLong)
    }.toDF("event_id", "key", "t_us").repartition(3)
    val ivs = Seq.tabulate(200) { i =>
      val s = rng.nextInt(50000).toLong
      (rng.nextInt(10).toLong, s, s + 1 + rng.nextInt(4000).toLong, i.toLong)
    }.toDF("key", "start_us", "end_us", "iv_id").repartition(2)
    val auto = IntervalJoin.intervalJoinAuto(pts, ivs, Seq("key"),
        "t_us", "start_us", "end_us")
      .select("event_id", "iv_id").as[(Long, Long)].collect().toSeq.sorted
    val fixed = IntervalJoin.intervalJoin(pts, ivs, Seq("key"),
        "t_us", "start_us", "end_us", bucketUs = 777L)
      .select("event_id", "iv_id").as[(Long, Long)].collect().toSeq.sorted
    assert(auto == fixed && auto.nonEmpty)
  }

  test("auto-tuned width survives empty and all-degenerate interval sides") {
    val pts = Seq((1L, 1L, 10L)).toDF("event_id", "key", "t_us")
    // empty intervals frame: percentile_approx is NULL — must not NPE
    val none = Seq.empty[(Long, Long, Long, Long)]
      .toDF("key", "start_us", "end_us", "iv_id")
    assert(IntervalJoin.intervalJoinAuto(pts, none, Seq("key"),
      "t_us", "start_us", "end_us").count() === 0L)
    // every interval degenerate (end <= start): same NULL p95 path
    val degen = Seq((1L, 10L, 10L, 1L), (1L, 9L, 5L, 2L))
      .toDF("key", "start_us", "end_us", "iv_id")
    assert(IntervalJoin.intervalJoinAuto(pts, degen, Seq("key"),
      "t_us", "start_us", "end_us").count() === 0L)
  }

  test("pathological interval-to-bucket fan-out fails fast with a named span") {
    val pts = Seq((1L, 1L, 50L)).toDF("event_id", "key", "t_us")
    val ivs = Seq((1L, 0L, 10000000L, 10L)).toDF("key", "start_us", "end_us", "iv_id")
    val ex = intercept[Exception] {
      IntervalJoin.intervalJoin(pts, ivs, Seq("key"),
        "t_us", "start_us", "end_us", bucketUs = 2L,
        maxBucketsPerInterval = 100).count()
    }
    def messages(t: Throwable): Seq[String] =
      Option(t).toSeq.flatMap(e => Option(e.getMessage).toSeq ++ messages(e.getCause))
    assert(messages(ex).exists(_.contains("mis-sized")), ex.getMessage)
    // same data with an adequate width still works
    val ok = IntervalJoin.intervalJoin(pts, ivs, Seq("key"),
      "t_us", "start_us", "end_us", bucketUs = 1000000L).count()
    assert(ok == 1)
  }

  test("plan: exchange carries (key, time-bucket), not key alone") {
    val pts = Seq((1L, 1L, 50L)).toDF("event_id", "key", "t_us").repartition(2)
    val ivs = Seq((1L, 0L, 100L, 10L)).toDF("key", "start_us", "end_us", "iv_id")
      .repartition(2)
    val p = IntervalJoin.intervalJoin(pts, ivs, Seq("key"),
        "t_us", "start_us", "end_us", 32L)
      .queryExecution.executedPlan.toString()
    assert("hashpartitioning\\(key#\\d+L, _ib".r.findFirstIn(p).isDefined
      || p.contains("BroadcastHashJoin"), s"join key must include the bucket:\n$p")
  }

  test("overlap join matches the plain overlap join, exactly once, across widths") {
    val rng = new Random(41)
    def ivs(pre: String, n: Int) = Seq.tabulate(n) { i =>
      val s = rng.nextInt(100000).toLong
      (rng.nextInt(10).toLong, s, s + 1 + rng.nextInt(9000).toLong, i.toLong)
    }.toDF("key", s"${pre}_start", s"${pre}_end", s"${pre}_id")
    val a = ivs("a", 500).repartition(4)
    val b = ivs("b", 400).repartition(3)
    val want = a.join(b, Seq("key"))
      .filter(col("a_start") < col("b_end") && col("b_start") < col("a_end"))
      .select("a_id", "b_id").as[(Long, Long)].collect().toSeq.sorted
    assert(want.nonEmpty && want.distinct.size == want.size)
    // the grid is a physical knob only — and even when a pair shares MANY
    // buckets (width 100 on spans up to 9000: dozens shared), the
    // left-edge emit-once guard keeps the multiset exactly once per pair
    for (bucket <- Seq(100L, 4096L, 65536L, 10000000L)) {
      val got = IntervalJoin.overlapJoin(a, b, Seq("key"),
          "a_start", "a_end", "b_start", "b_end", bucket)
        .select("a_id", "b_id").as[(Long, Long)].collect().toSeq.sorted
      assert(got == want, s"bucket=$bucket")
    }
  }

  test("overlap semantics: half-open — touching endpoints do not pair") {
    val a = Seq((1L, 0L, 10L, 1L)).toDF("key", "a_start", "a_end", "a_id")
    val b = Seq(
      (1L, 10L, 20L, 1L), // touches a's end: NOT an overlap
      (1L, 9L, 20L, 2L),  // one-us overlap
      (1L, 0L, 10L, 3L),  // identical span
      (1L, 3L, 4L, 4L),   // contained
      (2L, 0L, 10L, 5L)   // other key
    ).toDF("key", "b_start", "b_end", "b_id")
    val got = IntervalJoin.overlapJoin(a, b, Seq("key"),
        "a_start", "a_end", "b_start", "b_end", bucketUs = 4L)
      .select("b_id").as[Long].collect().sorted.toSeq
    assert(got == Seq(2L, 3L, 4L))
    // colliding non-key payload names are rejected loudly, not silently
    // disambiguated by position
    intercept[IllegalArgumentException] {
      IntervalJoin.overlapJoin(
        a, a.withColumnRenamed("a_id", "x"), Seq("key"),
        "a_start", "a_end", "a_start", "a_end", bucketUs = 4L)
    }
  }
}
