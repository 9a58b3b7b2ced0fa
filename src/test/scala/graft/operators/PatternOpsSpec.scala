package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Unit coverage for the standalone segment-level combinators — in particular
  * [[PatternOps.andThen]], whose window frame must stay *incremental*
  * (running min over a preceding frame). Spark recomputes
  * unbounded-FOLLOWING row frames from scratch per row, so a flapping
  * condition producing ~100k segments on one key would be O(S²) ≈ 10^10
  * comparisons with the wrong frame shape; the adversarial case below only
  * completes when the frame is linear in segments.
  */
class PatternOpsSpec extends SparkSpec {

  /** Build a segment frame (the [[Segments.segmentize]] schema) from
    * (key, fromMs, toMs) triples.
    */
  private def segs(rows: Seq[(Long, Long, Long)]): DataFrame = {
    import spark.implicits._
    rows.toDF("user_id", "from_ms", "to_ms")
      .select(col("user_id"),
        timestamp_millis(col("from_ms")).as("seg_from"),
        timestamp_millis(col("to_ms")).as("seg_to"),
        col("from_ms"), col("to_ms"), lit(1L).as("n_events"))
  }

  /** Reference semantics: each A pairs with the first B whose start is
    * at-or-after `a.to - tolerance`; the result interval is [A.from, B.to].
    */
  private def brute(a: Seq[(Long, Long, Long)], b: Seq[(Long, Long, Long)],
                    tol: Long): Set[(Long, Long, Long)] =
    a.flatMap { case (k, af, at) =>
      b.filter(x => x._1 == k && x._2 >= at - tol)
        .sortBy(x => (x._2, x._3))
        .headOption.map(x => (k, af, x._3))
    }.toSet

  test("andThen matches brute-force first-B pairing on random segments") {
    val r = new scala.util.Random(42)
    val a = (1 to 300).map { _ =>
      val f = r.nextInt(100000).toLong; (r.nextInt(5).toLong, f, f + r.nextInt(5000))
    }
    val b = (1 to 300).map { _ =>
      val f = r.nextInt(100000).toLong; (r.nextInt(5).toLong, f, f + r.nextInt(5000))
    }
    val got = PatternOps.andThen(segs(a), segs(b), Seq("user_id"), toleranceMs = 1000L)
      .select("user_id", "from_ms", "to_ms")
      .collect().map(x => (x.getLong(0), x.getLong(1), x.getLong(2))).toSet
    assert(got == brute(a, b, 1000L),
      s"only-spark=${(got -- brute(a, b, 1000L)).take(5)} only-brute=${(brute(a, b, 1000L) -- got).take(5)}")
  }

  test("andThen survives a flapping key with 100k segments (linear frame)") {
    // one key, 100k A segments interleaved with 100k B segments — the
    // adversary for a per-row-recomputed following frame
    val n = 100000
    import spark.implicits._
    val a = spark.range(n).select(lit(1L).as("user_id"),
      (col("id") * 2000).as("from_ms"), (col("id") * 2000 + 500).as("to_ms"))
    val b = spark.range(n).select(lit(1L).as("user_id"),
      (col("id") * 2000 + 1000).as("from_ms"), (col("id") * 2000 + 1500).as("to_ms"))
    def seg(d: DataFrame): DataFrame = d.select(col("user_id"),
      timestamp_millis(col("from_ms")).as("seg_from"),
      timestamp_millis(col("to_ms")).as("seg_to"),
      col("from_ms"), col("to_ms"), lit(1L).as("n_events"))
    val t0 = System.nanoTime()
    val out = PatternOps.andThen(seg(a), seg(b), Seq("user_id"), toleranceMs = 0L)
    // every A_i pairs with B_i (b_from = a_to + 500)
    assert(out.count() === n.toLong)
    val sample = out.filter(col("from_ms") === 0L)
      .select("to_ms").as[Long].collect()
    assert(sample.toSeq == Seq(1500L))
    val secs = (System.nanoTime() - t0) / 1e9
    info(f"100k-segment flapping key completed in $secs%.1f s")
    assert(secs < 120, f"quadratic frame suspected: $secs%.1f s for 100k segments")
  }
}
