package graft
import java.util.concurrent.atomic.AtomicInteger
import org.apache.spark.scheduler._
import org.apache.spark.sql.SparkSession

/** Optimization-round tooling: one warm pass over the catalog counting
  * jobs/stages per query (after one untimed warm rep), to rank fixed
  * scheduling overhead. Usage: runMain graft.JobCensus <sfDir>
  */
object JobCensus {
  def main(args: Array[String]): Unit = {
    val sfDir = args(0)
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
    spark.sparkContext.setLogLevel("ERROR")
    val jobs = new AtomicInteger; val stages = new AtomicInteger
    spark.sparkContext.addSparkListener(new SparkListener {
      override def onJobStart(j: SparkListenerJobStart): Unit = { jobs.incrementAndGet; () }
      override def onStageCompleted(s: SparkListenerStageCompleted): Unit = { stages.incrementAndGet; () }
    })
    import org.apache.spark.sql.functions.{bit_xor, count, lit, xxhash64}
    SparkEntry.queries.toSeq.sortBy(_._1).foreach { case (name, fn) =>
      try {
        val df0 = fn(spark, sfDir) // warm rep
        df0.agg(count(lit(1)), bit_xor(xxhash64(Bench.checksumCols(df0): _*))).head()
        spark.catalog.clearCache()
        Thread.sleep(50)
        jobs.set(0); stages.set(0)
        val t = System.nanoTime()
        val df = fn(spark, sfDir)
        df.agg(count(lit(1)), bit_xor(xxhash64(Bench.checksumCols(df): _*))).head()
        val w = (System.nanoTime() - t) / 1e9
        Thread.sleep(100) // let listener drain
        println(f"CENSUS $name%-28s wall=$w%6.2f jobs=${jobs.get}%4d stages=${stages.get}%4d")
      } catch { case e: Throwable => println(s"CENSUS $name FAILED ${e.getMessage}") }
      spark.catalog.clearCache()
    }
    spark.stop()
  }
}
