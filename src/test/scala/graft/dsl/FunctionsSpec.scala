package graft.dsl

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Locks the scalar-function semantics of the compiler against the
  * reference's registry (reference: FunctionRegistry.scala:114-518):
  * Fail-absorbing `or`, Fail-propagating `and`, Scala NaN ordering for
  * comparisons with missing data, degree trig, reducers with filters.
  */
class FunctionsSpec extends SparkSpec {

  import spark.implicits._

  private val cfg = PatternConfig(Seq("k"), "ts", eventsMaxGapMs = 3600000L,
    sessionGapMs = 0L)

  /** Run a pattern over rows (sec, a, b) and return incident second-spans. */
  private def inc(pattern: String, rows: Seq[(Long, java.lang.Double, java.lang.Double)]): Seq[(Long, Long)] = {
    val df = rows.toDF("sec", "a", "b")
      .withColumn("ts", timestamp_seconds(col("sec")))
      .withColumn("k", lit(1))
    TspEngine.incidents(df, pattern, cfg)
      .select((col("from_ms") / 1000).cast("long"), (col("to_ms") / 1000).cast("long"))
      .collect().map(r => (r.getLong(0), r.getLong(1))).sorted.toSeq
  }

  private val D = (d: Double) => java.lang.Double.valueOf(d)
  private val N: java.lang.Double = null

  test("or absorbs Fail: null or true = true") {
    // a is null at t=1 but b > 0 holds -> the or succeeds
    assert(inc("a > 0 or b > 0", Seq((0L, D(-1), D(-1)), (1L, N, D(5)), (2L, D(-1), D(-1))))
      == Seq((1L, 1L)))
  }

  test("and propagates Fail: null and true = no incident") {
    assert(inc("a > 0 and b > 0", Seq((0L, N, D(5)), (1L, D(1), D(5))))
      == Seq((1L, 1L)))
  }

  test("missing data compares like Scala NaN: != is true, everything else false") {
    assert(inc("a != 5", Seq((0L, N, N), (1L, D(5), N))) == Seq((0L, 0L)))
    assert(inc("a = 5", Seq((0L, N, N), (1L, D(5), N))) == Seq((1L, 1L)))
    assert(inc("a > 5", Seq((0L, N, N), (1L, D(6), N))) == Seq((1L, 1L)))
    assert(inc("a < 5", Seq((0L, N, N), (1L, D(4), N))) == Seq((1L, 1L)))
  }

  test("not over a NaN comparison: not(a = 5) is true when a missing") {
    assert(inc("not a = 5", Seq((0L, N, N), (1L, D(5), N))) == Seq((0L, 0L)))
  }

  test("xor at boolean layer") {
    assert(inc("a > 0 xor b > 0",
      Seq((0L, D(1), D(1)), (1L, D(1), D(-1)), (2L, D(-1), D(-1))))
      == Seq((1L, 1L)))
  }

  test("degree trig: sind(30) = 0.5") {
    assert(inc("abs(sind(a) - 0.5) < 0.000001", Seq((0L, D(30), N))) == Seq((0L, 0L)))
    assert(inc("abs(cosd(a) - 0.5) < 0.000001", Seq((0L, D(60), N))) == Seq((0L, 0L)))
    assert(inc("abs(tand(a) - 1.0) < 0.000001", Seq((0L, D(45), N))) == Seq((0L, 0L)))
    assert(inc("abs(ctgd(a) - 1.0) < 0.000001", Seq((0L, D(45), N))) == Seq((0L, 0L)))
  }

  test("arithmetic and casts") {
    assert(inc("(a + b) * 2 = 6", Seq((0L, D(1), D(2)), (1L, D(2), D(2)))) == Seq((0L, 0L)))
    assert(inc("a as int32 = 1", Seq((0L, D(1.7), N))) == Seq((0L, 0L)))
    assert(inc("a / b > 1.9", Seq((0L, D(4), D(2)), (1L, D(2), D(2)))) == Seq((0L, 0L)))
  }

  test("reducers: minOf/maxOf/countOf with and without filters") {
    assert(inc("minOf(a, b) = 2", Seq((0L, D(4), D(2)), (1L, D(1), D(2)))) == Seq((0L, 0L)))
    assert(inc("maxOf(a, b) = 4", Seq((0L, D(4), D(2)), (1L, D(1), D(2)))) == Seq((0L, 0L)))
    // filter excludes negatives; countOf counts survivors
    assert(inc("countOf(a, b; _ > 0) = 1", Seq((0L, D(4), D(-2)), (1L, D(1), D(2)))) == Seq((0L, 0L)))
    // a Fail argument is excluded when the filter rejects NaN...
    assert(inc("sumOf(a, b; _ > 0) = 2", Seq((0L, N, D(2)), (1L, D(1), D(2)))) == Seq((0L, 0L)))
    // ...but poisons the result when the filter accepts everything
    assert(inc("sumOf(a, b) = 2", Seq((0L, N, D(2)), (1L, D(2), N))) == Seq.empty)
  }

  test("avgOf matches reference fold: empty filter survivors -> NaN -> no match") {
    assert(inc("avgOf(a, b; _ > 100) > 0", Seq((0L, D(4), D(2)))) == Seq.empty)
  }

  test("string equality and inequality") {
    val df = Seq((0L, "OFF"), (1L, "ON"), (2L, "OFF")).toDF("sec", "s")
      .withColumn("ts", timestamp_seconds(col("sec")))
      .withColumn("k", lit(1))
    val got = TspEngine.incidents(df, "s = 'ON'", cfg)
      .select((col("from_ms") / 1000).cast("long")).collect().map(_.getLong(0)).toSeq
    assert(got == Seq(1L))
  }

  test("sigmoid/exp/ln extensions") {
    assert(inc("abs(sigmoid(a) - 0.5) < 0.000001", Seq((0L, D(0), N))) == Seq((0L, 0L)))
    assert(inc("abs(ln(exp(a)) - 2.0) < 0.000001", Seq((0L, D(2), N))) == Seq((0L, 0L)))
  }
}
