package graft

import org.apache.spark.sql.SparkSession

/** Per-query profiling harness (dev tool, not part of the library surface):
  * separates DataFrame build, Catalyst analysis/planning, and execution
  * time, twice per query — the second round shows steady-state cost once
  * JIT/codegen warmup has been paid. Usage:
  *
  *   SPARK_GRAFT_SF_DIR=... sbt "runMain graft.Scratch [query ...]"
  */
object Scratch {
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
    try SparkEntry.queries("q7_filter_agg")(spark, sfDir).count()
    catch { case _: Throwable => () }
    spark.catalog.clearCache()
    val names =
      if (args.nonEmpty) args.toSeq
      else Seq("dedup_minhash", "dedup_simhash", "dedup_ngram", "dedup_embed",
        "ann_lsh", "ann_ivf")
    names.foreach { name =>
      (1 to 2).foreach { round =>
        val t0 = System.nanoTime()
        val df = SparkEntry.queries(name)(spark, sfDir)
        val t1 = System.nanoTime()
        df.queryExecution.executedPlan // force analysis + optimization
        val t2 = System.nanoTime()
        // full-output checksum, not count(): count lets Catalyst prune
        // narrow per-row computations entirely (same action as Bench r8+)
        import org.apache.spark.sql.functions.{bit_xor, col, count, lit, xxhash64}
        val n = df.agg(count(lit(1)), bit_xor(xxhash64(Bench.checksumCols(df): _*)))
          .head().getLong(0)
        val t3 = System.nanoTime()
        println(f"[scratch] $name round=$round rows=$n " +
          f"build=${(t1 - t0) / 1e9}%.2f plan=${(t2 - t1) / 1e9}%.2f " +
          f"exec=${(t3 - t2) / 1e9}%.2f")
        spark.catalog.clearCache()
      }
    }
    spark.stop()
  }
}
