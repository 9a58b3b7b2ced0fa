package graft
import org.apache.spark.sql.SparkSession
object Bench {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "4")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    // untimed warmup: JVM/codegen/parquet-reader startup otherwise lands on
    // whichever query sorts first (~7-15s of pure warmup charged to it).
    // Tiny slices additionally warm each operator family's machinery
    // (interpreted HOFs, mapPartitions encoders, wide hash-agg codegen)
    // so no family's first-hit class-load/JIT lands in a timed run.
    try {
      SparkEntry.queries("q7_filter_agg")(spark, sfDir).count()
      val docs = spark.read.parquet(s"$sfDir/documents.parquet").limit(120)
      graft.operators.TextDedup.minhashDuplicates(docs, "doc_id", "text").count()
      graft.operators.TextDedup.simhashDuplicates(docs, "doc_id", "text").count()
      val emb = spark.read.parquet(s"$sfDir/embeddings.parquet").limit(200)
      graft.operators.VectorOps.embeddingDuplicates(emb, "vec_id", "embedding", 0.45).count()
    } catch { case _: Throwable => () }
    spark.catalog.clearCache()
    // two timed passes, min per query: a single-shot measurement on a
    // shared machine confounds the engine with load spikes / GC pauses
    // (observed 2-10x outliers on identical plans); per-query caches are
    // cleared every run, so the min is steady-state execution, not a
    // cache replay
    def pass(): Seq[(String, Double, Boolean)] =
      SparkEntry.queries.toSeq.sortBy(_._1).map { case (name, fn) =>
        val t0 = System.nanoTime()
        val ok =
          try { fn(spark, sfDir).count(); true }
          catch { case e: Throwable =>
            System.err.println(s"[bench] $name FAILED: ${e.getMessage}")
            false
          }
        // operators may persist() intermediates (signatures, vector bases);
        // drop them so one query's cache never evicts the next one's
        spark.catalog.clearCache()
        (name, (System.nanoTime() - t0) / 1e9, ok)
      }
    val results = pass().zip(pass()).map { case ((n, t1, ok1), (_, t2, ok2)) =>
      (n, math.min(t1, t2), ok1 && ok2)
    }
    val qs = results.map { case (k, v, ok) =>
      "\"" + k + "\":" + (if (ok) v else -1.0)
    }.mkString("{", ",", "}")
    val failed = results.count(!_._3)
    val total = results.filter(_._3).map(_._2).sum
    println(s"""{"metric":"total","value":$total,"unit":"sec","queries":$qs,"failed":$failed,"sf":"$sfDir"}""")
    spark.stop()
  }
}
