package graft.plans

import org.apache.spark.scheduler.{SparkListener, SparkListenerTaskEnd}
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Dev probe: where does GroupTopK's time go vs the window plan, and what
  * do the two exchanges actually carry? (Shuffle bytes are the metric that
  * matters on a real cluster; local[32] shuffles are memcpy.)
  */
object TopKProbe {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.extensions", "graft.functions.GraftExtensions")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    @volatile var shuffleWrite = 0L
    @volatile var records = 0L
    spark.sparkContext.addSparkListener(new SparkListener {
      override def onTaskEnd(t: SparkListenerTaskEnd): Unit = {
        val m = t.taskMetrics
        if (m != null) {
          shuffleWrite += m.shuffleWriteMetrics.bytesWritten
          records += m.shuffleWriteMetrics.recordsWritten
        }
      }
    })

    val dir = "/tmp/graft-volume/gs-x1000"
    val base = spark.read.parquet(s"$dir/profile.parquet")
    println(s"rows=${base.count()}")

    def time(name: String)(mk: => org.apache.spark.sql.DataFrame): Unit = {
      (1 to 3).foreach { r =>
        shuffleWrite = 0L; records = 0L
        val t0 = System.nanoTime()
        val df = mk
        val n = df.agg(count(lit(1))).head().getLong(0)
        val sec = (System.nanoTime() - t0) / 1e9
        println(f"[probe] $name%-16s round=$r out=$n%-7d sec=$sec%6.2f " +
          f"shufWrite=${shuffleWrite / 1024}%8d KiB shufRecords=$records%9d")
      }
    }

    // scan-only baseline: the iterator cost floor
    time("scan_count")(base)
    time("scan_project")(base.select(col("lang"), col("source"),
      col("doc_id"), col("n_chars")).filter(col("n_chars") >= 0))
    time("heap_topk")(GroupTopK.topK(base, Seq("lang", "source"),
      Seq("n_chars" -> false, "doc_id" -> true), 5))
    time("window_topk") {
      val w = Window.partitionBy(col("lang"), col("source"))
        .orderBy(col("n_chars").desc, col("doc_id"))
      base.withColumn("_rn", row_number().over(w)).filter(col("_rn") <= 5)
        .drop("_rn")
    }
    spark.stop()
  }
}
