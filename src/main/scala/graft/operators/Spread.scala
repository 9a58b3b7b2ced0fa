package graft.operators

import org.apache.spark.sql.DataFrame

/** Input-parallelism guard for per-row-heavy operators.
  *
  * A small parquet file arrives as ONE input split, so every downstream
  * narrow transformation — shingling, signature hashing, hyperplane dot
  * products — runs on a single core until the first shuffle, no matter how
  * many executors the cluster has. At production scale (100 TB) scans carry
  * thousands of splits and this is a no-op; the check only pays a round-robin
  * repartition of data that is by definition tiny when it fires.
  */
object Spread {

  /** Repartition `df` up to the session's default parallelism iff the
    * source is too small to yield that many input splits.
    *
    * The check reads the optimizer's size estimate (for the parquet reads
    * Spread wraps, the summed file size) against `filesMaxPartitionBytes` —
    * it deliberately does NOT touch `df.rdd`, which would force physical
    * planning plus RDD DAG construction per call just to count partitions
    * (measurable per-operator overhead at bench scale).
    */
  def apply(df: DataFrame): DataFrame = {
    val spark = df.sparkSession
    val target = spark.sparkContext.defaultParallelism.toLong
    val bytes = df.queryExecution.optimizedPlan.stats.sizeInBytes
    val estSplits = bytes / spark.sessionState.conf.filesMaxPartitionBytes
    if (estSplits >= target) df else df.repartition(target.toInt)
  }
}
