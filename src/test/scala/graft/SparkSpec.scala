package graft

import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite

/** Shared local SparkContext for test suites, one isolated SQL session per
  * suite.
  *
  * Suites run CONCURRENTLY inside the forked test JVM
  * (`Test / testForkedParallel := true`, round 15: the serial suite wall
  * exceeded the driver's verify budget — `tests_ok: false` in VERIFY_r14
  * with the tail cut mid-suite). Concurrent jobs share the one SparkContext
  * (Spark's scheduler interleaves them; guide §2.6), but each suite gets its
  * own `newSession()` so that:
  *   - session-conf mutations stay suite-local (IoSpec flips the parquet NTZ
  *     inference flag, BucketingSpec/SkewSpec disable auto-broadcast —
  *     a racing global `conf.set` would flip PlanSpec's asserted join
  *     strategies mid-flight);
  *   - temp views and streaming memory-sink tables are suite-scoped, so
  *     equal names in two suites cannot collide.
  */
trait SparkSpec extends AnyFunSuite {
  lazy val spark: SparkSession = SparkSpec.session.newSession()
}

object SparkSpec {
  lazy val session: SparkSession = {
    val s = SparkSession.builder()
      .master("local[16]")
      .appName("graft-test")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.extensions", "graft.functions.GraftExtensions")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.sql.parquet.inferTimestampNTZ.enabled", "false")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    s.sparkContext.setLogLevel("WARN")
    s
  }
}
