package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Run-length / segment utilities over keyed, time-ordered event frames.
  *
  * The reference engine represents pattern results as segment-compressed
  * `IdxValue(start, end, value)` runs (reference: core/.../Pattern.scala:45-50,
  * PQueue.scala:96-105 merge-adjacent-equal). In a Spark-first design the
  * equivalent is a *column formulation*: a boolean/value column over the event
  * frame plus window-function run-ids; segments materialize only at the output
  * as `(key..., from, to)` rows. All transforms below are pure DataFrame ->
  * DataFrame combinators, shuffle exactly once on the partition key, and stay
  * inside whole-stage codegen (no UDFs).
  *
  * Column-name contract: callers pass the partition key columns and the event
  * time column; intermediate columns are prefixed `_g_` and dropped before
  * returning.
  */
object Segments {

  /** Epoch milliseconds of a timestamp column (truncating, matches DuckDB
    * `epoch_ms`). Used as the ordering / range-frame axis everywhere, because
    * range frames need a numeric orderBy.
    */
  def millis(ts: Column): Column = unix_millis(ts)

  /** Gap run id: a per-key counter that increments whenever the time delta
    * from the previous event exceeds `gapMs` — i.e. the reference's
    * `eventsMaxGapMs` state reset (reference: mappers/PatternProcessor.scala:77-92
    * splitByCondition). All stateful pattern operators must group by
    * (key, gap_run) so state never crosses a data gap.
    */
  /** Ordered window over the keys: event-time millis plus deterministic
    * tie-break columns (row-frame windows are order-sensitive among equal
    * timestamps; a tiebreak like the event id keeps Spark and any external
    * oracle in lockstep).
    */
  def orderedWindow(keys: Seq[String], tsCol: String,
                    tieCols: Seq[String]): org.apache.spark.sql.expressions.WindowSpec =
    Window.partitionBy(keys.map(col): _*)
      .orderBy(millis(col(tsCol)) +: tieCols.map(col): _*)

  def withGapRunId(df: DataFrame, keys: Seq[String], tsCol: String,
                   gapMs: Long, out: String = "gap_run",
                   tieCols: Seq[String] = Nil): DataFrame = {
    val w = orderedWindow(keys, tsCol, tieCols)
    val delta = millis(col(tsCol)) - lag(millis(col(tsCol)), 1).over(w)
    df.withColumn(out,
      sum(when(delta > gapMs, 1).otherwise(0)).over(w).cast("long"))
  }

  /** Condition run id: gaps-and-islands over a boolean (or any comparable)
    * column — consecutive equal values share a run id. This is the columnar
    * analogue of `SegmentizerPattern` / `PQueue.enqueueWithUniting`
    * (reference: core/.../SegmentizerPattern.scala:12-49).
    */
  def withCondRunId(df: DataFrame, keys: Seq[String], tsCol: String,
                    cond: Column, out: String = "run_id",
                    tieCols: Seq[String] = Nil): DataFrame = {
    val w = orderedWindow(keys, tsCol, tieCols)
    // null-safe change detection: <=> treats NULL = NULL as true
    val changed = when(cond <=> lag(cond, 1).over(w), 0).otherwise(1)
    df.withColumn("_g_cond", cond)
      .withColumn(out, sum(changed).over(w).cast("long"))
  }

  /** Collapse the true-runs of `cond` into segments
    * `(keys..., from, to, from_ms, to_ms, n_events)`.
    *
    * One shuffle (by keys) for the window pass; the groupBy reuses the same
    * hash partitioning so AQE coalesces it without a second exchange of the
    * full data. Equivalent of the reference's final
    * `TimestampsAdderPattern(SegmentizerPattern(p))` wrapping
    * (reference: PatternsSearchJob.scala:244-245).
    */
  def segmentize(df: DataFrame, keys: Seq[String], tsCol: String,
                 cond: Column, tieCols: Seq[String] = Nil): DataFrame = {
    val withRun = withCondRunId(df, keys, tsCol, cond, tieCols = tieCols)
    withRun
      .filter(col("_g_cond"))
      .groupBy((keys :+ "run_id").map(col): _*)
      .agg(
        min(col(tsCol)).as("seg_from"),
        max(col(tsCol)).as("seg_to"),
        min(millis(col(tsCol))).as("from_ms"),
        max(millis(col(tsCol))).as("to_ms"),
        count(lit(1)).as("n_events"))
      .drop("run_id")
  }

  /** Merge segments of one key that are closer than `maxGapMs` — the incident
    * sessionizer (reference: PatternsSearchJob.scala:259-305 reduceIncidents,
    * Semigroup union at core/.../Incident.scala:27-49).
    *
    * Input must have `from_ms`/`to_ms` columns (as produced by [[segmentize]]).
    * Implemented as gaps-and-islands over segment start/ends rather than
    * `session_window` so it also merges *overlapping* segments and works on
    * plain batch frames.
    */
  def sessionize(segments: DataFrame, keys: Seq[String],
                 maxGapMs: Long, carry: Seq[String] = Nil): DataFrame = {
    val w = Window.partitionBy(keys.map(col): _*)
      .orderBy(col("from_ms"), col("to_ms"))
    // running max of to_ms over preceding rows: a new session starts when this
    // segment begins more than maxGapMs after everything seen so far ended
    val prevMaxTo = max(col("to_ms"))
      .over(w.rowsBetween(Window.unboundedPreceding, -1))
    val newSession = when(
      prevMaxTo.isNull || (col("from_ms") > prevMaxTo + maxGapMs), 1
    ).otherwise(0)
    // carried columns take the earliest segment's value (deterministic by
    // segment span) — the incident-merge semigroup keeps the first
    // incident's attributes, reference core/.../Incident.scala:27-49
    val carryAggs = carry.map(c =>
      min_by(col(c), struct(col("from_ms"), col("to_ms"))).as(c))
    segments
      .withColumn("_g_sess", sum(newSession).over(w).cast("long"))
      .groupBy((keys :+ "_g_sess").map(col): _*)
      .agg(min(col("seg_from")).as("seg_from"),
        Seq(
          max(col("seg_to")).as("seg_to"),
          min(col("from_ms")).as("from_ms"),
          max(col("to_ms")).as("to_ms"),
          sum(col("n_events")).as("n_events")) ++ carryAggs: _*)
      .drop("_g_sess")
  }
}
