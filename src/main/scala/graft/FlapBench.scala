package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Adversarial flapping-condition bench (dev tool): ONE key whose condition
  * alternates every event, producing `n` segments on each side of an
  * `andThen` — the worst case for (a) the standalone segment combinator's
  * window frame (quadratic if the frame is recomputed per row) and (b) the
  * DSL compiler's interval→event mapping (quadratic if events scan a
  * per-key interval array). Prints seconds at a ladder of segment counts;
  * linear shape = each 2x of segments costs ~2x, not ~4x.
  *
  *   sbt "runMain graft.FlapBench"
  */
object FlapBench {
  def main(args: Array[String]): Unit = {
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

    def segs(n: Long, offMs: Long): DataFrame =
      spark.range(n).select(lit(1L).as("user_id"),
        timestamp_millis(col("id") * 2000 + offMs).as("seg_from"),
        timestamp_millis(col("id") * 2000 + offMs + 500).as("seg_to"),
        (col("id") * 2000 + offMs).as("from_ms"),
        (col("id") * 2000 + offMs + 500).as("to_ms"),
        lit(1L).as("n_events"))

    // one key, value flapping above/below both thresholds every event:
    // every event is its own segment for each operand
    def flapEvents(n: Long): DataFrame =
      spark.range(n).select(lit("k1").as("k"),
        timestamp_millis(col("id") * 1000).as("ts"),
        when(col("id") % 2 === 0, 100.0).otherwise(1.0).as("v"))

    val sizes = args.toSeq match {
      case Nil => Seq(25000L, 50000L, 100000L)
      case xs  => xs.map(_.toLong)
    }
    sizes.foreach { n =>
      val t0 = System.nanoTime()
      val c1 = operators.PatternOps
        .andThen(segs(n, 0L), segs(n, 1000L), Seq("user_id"), toleranceMs = 0L)
        .count()
      val t1 = System.nanoTime()
      val cfg = dsl.PatternConfig(Seq("k"), "ts",
        eventsMaxGapMs = 604800000L, sessionGapMs = 1000L)
      val c2 = dsl.TspEngine
        .incidents(flapEvents(2 * n), "v > 50 andThen v < 10", cfg)
        .count()
      val t2 = System.nanoTime()
      println(f"[flap] segments=$n combinator=${(t1 - t0) / 1e9}%.2fs " +
        f"(rows=$c1) dsl=${(t2 - t1) / 1e9}%.2fs (incidents=$c2)")
    }
    spark.stop()
  }
}
