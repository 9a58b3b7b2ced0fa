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
    * physical plan would yield fewer partitions than that.
    */
  def apply(df: DataFrame): DataFrame = {
    val target = df.sparkSession.sparkContext.defaultParallelism
    if (df.rdd.getNumPartitions >= target) df else df.repartition(target)
  }
}
