package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Loaders for the driver-generated parquet tables (see TESTDATA.md).
  *
  * All query entry points take an `sfDir` (e.g. /root/testdata/sf0.01) and read
  * the tables lazily; Catalyst pushes filters/column pruning into the parquet
  * scan, so loading "the whole table" here costs nothing at plan time.
  */
object Tables {
  val names: Seq[String] = Seq(
    "region", "nation", "customer", "supplier", "part", "orders", "lineitem",
    "events", "documents", "embeddings")

  /** Resolved-relation memo, per (session, path): `spark.read.parquet`
    * re-lists the directory and re-reads a footer for the schema on every
    * call, which costs a driver round-trip + a one-task job PER QUERY per
    * table (~0.1-0.2 s each across a 113-query catalog run). Reusing the
    * analyzed DataFrame keeps the FileIndex + inferred schema — exactly
    * what a catalog table (metastore schema) provides in production; no
    * DATA is cached, the plan still scans parquet on every execution.
    * Retention note: the map is weak-keyed by session, but the cached
    * DataFrame itself references its session, so an entry lives until the
    * map is next written after ALL external references drop — in practice
    * entries persist for the JVM. That is bounded by construction at
    * (#sessions x #tables) logical plans, kilobytes each; acceptable for
    * the CLI mains and the test suites alike.
    *
    * READ-ONLY CONTRACT (r15, from the r14 advice): the memo assumes the
    * files under a memoized path never change within a session — true for
    * the driver-generated testdata every current caller reads. A caller
    * that overwrites `<dir>/<name>.parquet` mid-session would otherwise
    * see the stale FileIndex (and `spark.catalog.refreshByPath` cannot
    * evict this memo); such a caller must invoke [[invalidate]] after the
    * write.
    */
  private val relCache =
    new java.util.WeakHashMap[SparkSession,
      java.util.concurrent.ConcurrentHashMap[String, DataFrame]]()

  def apply(spark: SparkSession, sfDir: String, name: String): DataFrame = {
    val perSession = relCache.synchronized {
      var m = relCache.get(spark)
      if (m == null) {
        m = new java.util.concurrent.ConcurrentHashMap[String, DataFrame]()
        relCache.put(spark, m)
      }
      m
    }
    perSession.computeIfAbsent(s"$sfDir/$name.parquet",
      p => spark.read.parquet(p))
  }

  /** Drop memoized relations so the next [[apply]] re-lists and re-reads
    * the schema — REQUIRED after overwriting a previously-read table path
    * in the same session (see the read-only contract above). With `path`
    * None, every entry of the session is dropped.
    */
  def invalidate(spark: SparkSession, path: Option[String] = None): Unit =
    relCache.synchronized {
      val m = relCache.get(spark)
      if (m != null) path match {
        case Some(p) => m.remove(p); ()
        case None    => m.clear()
      }
    }

  def region(s: SparkSession, d: String): DataFrame = apply(s, d, "region")
  def nation(s: SparkSession, d: String): DataFrame = apply(s, d, "nation")
  def customer(s: SparkSession, d: String): DataFrame = apply(s, d, "customer")
  def supplier(s: SparkSession, d: String): DataFrame = apply(s, d, "supplier")
  def part(s: SparkSession, d: String): DataFrame = apply(s, d, "part")
  def orders(s: SparkSession, d: String): DataFrame = apply(s, d, "orders")
  def lineitem(s: SparkSession, d: String): DataFrame = apply(s, d, "lineitem")
  /** Normalize an event-time column to session-TZ `TimestampType`, whatever
    * encoding the parquet writer chose. The driver has regenerated testdata
    * with different writers across rounds, producing every one of:
    *
    *  - `TimestampType` (µs, with TZ) — pass through;
    *  - `TimestampNTZType` (µs, no TZ; Spark 4.1 infers this for
    *    `timestamp[us]` parquet unless `inferTimestampNTZ.enabled=false`) —
    *    cast is value-preserving because the session TZ is pinned to UTC;
    *  - `LongType` epoch-nanos (TIMESTAMP(NANOS) parquet read under
    *    `spark.sql.legacy.parquet.nanosAsLong=true`) or epoch-micros —
    *    or epoch-millis — disambiguated per-row by magnitude: epoch-nanos for
    *    any date after 1973 exceeds 1e17, epoch-micros stays in [1e14, 1e17)
    *    from 1973 to year ~5138, and epoch-millis stays below 1e14 until year
    *    ~5138. Convert with integer `div`/multiply — `/` on longs is
    *    floating-point in Spark and a double's ULP at ~1.7e18 is 256ns,
    *    corrupting ms precision.
    */
  def normalizeTs(df: DataFrame, name: String = "ts"): DataFrame = {
    import org.apache.spark.sql.types._
    df.schema(name).dataType match {
      case TimestampType => df
      case _: TimestampNTZType => // singleton in 4.x, but match structurally
        df.withColumn(name, col(name).cast(TimestampType))
      case LongType =>
        val c = col(name)
        val micros = when(abs(c) >= 100000000000000000L,
          expr(s"`$name` div 1000"))
          .when(abs(c) < 100000000000000L, c * 1000L)
          .otherwise(c)
        df.withColumn(name, timestamp_micros(micros))
      // two more shapes a future regeneration could plausibly ship:
      // DATE (midnight UTC under the pinned session TZ) and ISO-8601 text
      case DateType | StringType =>
        df.withColumn(name, col(name).cast(TimestampType))
      case other =>
        throw new IllegalArgumentException(
          s"cannot normalize time column `$name` of type $other")
    }
  }

  def events(s: SparkSession, d: String): DataFrame =
    normalizeTs(apply(s, d, "events"))
  def documents(s: SparkSession, d: String): DataFrame = apply(s, d, "documents")
  def embeddings(s: SparkSession, d: String): DataFrame = apply(s, d, "embeddings")
}
