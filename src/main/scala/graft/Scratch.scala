package graft
import org.apache.spark.scheduler._
import org.apache.spark.sql.SparkSession

/** Ad-hoc profiling scratchpad for the optimization rounds (not part of the
  * driver contract). Runs one catalog query with a stage-timing listener.
  * Usage: runMain graft.Scratch <sfDir> <query> [reps]
  */
object Scratch {
  def main(args: Array[String]): Unit = {
    val sfDir = args(0)
    val name  = args(1)
    val reps  = if (args.length > 2) args(2).toInt else 1
    val cpus  = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
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
    val t00 = System.nanoTime()
    def ts  = f"${(System.nanoTime() - t00) / 1e9}%8.2f"
    spark.sparkContext.addSparkListener(new SparkListener {
      override def onStageCompleted(sc: SparkListenerStageCompleted): Unit = {
        val si = sc.stageInfo
        val ms = for {s <- si.submissionTime; c <- si.completionTime} yield c - s
        println(f"$ts stage ${si.stageId}%4d ${si.numTasks}%4dt ${ms.getOrElse(-1L)}%7dms ${si.name.take(60)}")
      }
      override def onJobStart(j: SparkListenerJobStart): Unit =
        println(f"$ts job ${j.jobId}%4d start (${j.stageInfos.size} stages)")
    })
    for (r <- 1 to reps) {
      val t = System.nanoTime()
      import org.apache.spark.sql.functions.{bit_xor, count, lit, xxhash64}
      val df = SparkEntry.queries(name)(spark, sfDir)
      df.agg(count(lit(1)), bit_xor(xxhash64(Bench.checksumCols(df): _*))).head()
      println(f"$ts === rep $r took ${(System.nanoTime() - t) / 1e9}%.2f s")
      spark.catalog.clearCache()
    }
    spark.stop()
  }
}
