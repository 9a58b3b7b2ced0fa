package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.{Window, WindowSpec}
import org.apache.spark.sql.functions._

/** Column-level pattern operators: the Spark formulation of the reference's
  * aggregator patterns (reference: the core aggregators package).
  *
  * Everything here is expressed with built-in window functions over a
  * `rangeBetween` frame on epoch-millis, so Catalyst/Tungsten codegen applies
  * and the only shuffle is the hash partitioning on the pattern key. At
  * cluster scale each key's events land in one task; within the task the
  * range-frame evaluation is a single sorted pass.
  */
object PatternOps {
  import Segments.millis

  /** Window spec over the pattern key ordered by event-time millis. */
  def keyWindow(keys: Seq[String], tsCol: String): WindowSpec =
    Window.partitionBy(keys.map(col): _*).orderBy(millis(col(tsCol)))

  /** Trailing time frame `[ts - windowMs, ts]` — the reference's
    * `GroupPattern` sliding group-fold (reference:
    * core/.../aggregators/GroupPattern.scala:20-99).
    */
  def trailing(keys: Seq[String], tsCol: String, windowMs: Long): WindowSpec =
    keyWindow(keys, tsCol).rangeBetween(-windowMs, 0)

  /** `avg(x, T)` / `sum(x, T)` / `count(x, T)` — windowed aggregates of the
    * DSL (reference: core/.../Patterns.scala:125-141).
    */
  def avgOver(x: Column, keys: Seq[String], tsCol: String, windowMs: Long): Column =
    avg(x).over(trailing(keys, tsCol, windowMs))
  def sumOver(x: Column, keys: Seq[String], tsCol: String, windowMs: Long): Column =
    sum(x).over(trailing(keys, tsCol, windowMs))
  def countOver(x: Column, keys: Seq[String], tsCol: String, windowMs: Long): Column =
    count(x).over(trailing(keys, tsCol, windowMs))

  /** `lag(x)` — previous event's value (reference:
    * core/.../aggregators/PreviousValue.scala:12-74 with window=1ms,
    * Patterns.scala:123).
    */
  def lagOne(x: Column, keys: Seq[String], tsCol: String,
             tieCols: Seq[String] = Nil): Column =
    lag(x, 1).over(Segments.orderedWindow(keys, tsCol, tieCols))

  /** `lag(x, T)` — the value in effect at `ts - T`: last value at-or-before
    * that moment (reference: PreviousValue.scala:34-58 — first value *after*
    * window start of the trailing buffer).
    */
  def lagTime(x: Column, keys: Seq[String], tsCol: String, windowMs: Long): Column =
    last(x, ignoreNulls = true)
      .over(keyWindow(keys, tsCol).rangeBetween(Window.unboundedPreceding, -windowMs))

  /** truthCount: number of events in the trailing window where `cond` held
    * (reference: core/.../aggregators/WindowStatistic.scala:13-156,
    * projection Patterns.scala:91-113).
    */
  def truthCount(cond: Column, keys: Seq[String], tsCol: String,
                 windowMs: Long): Column =
    sum(when(cond, 1L).otherwise(0L)).over(trailing(keys, tsCol, windowMs))

  /** failCount — events in the trailing window where `cond` did NOT hold
    * (reference: WindowStatistic failCount projection, Patterns.scala:91-113).
    */
  def failCount(cond: Column, keys: Seq[String], tsCol: String,
                windowMs: Long): Column =
    sum(when(cond, 0L).otherwise(1L)).over(trailing(keys, tsCol, windowMs))

  /** truthMillis: milliseconds within the trailing window during which `cond`
    * held. Duration between consecutive events is attributed to the *earlier*
    * event's truth value, clipped to the window — the reference's
    * edge-correction rule (WindowStatistic.scala:66-99).
    *
    * Columnar formulation: per event, `heldMs` = (ts - prev_ts) if the
    * previous event satisfied cond (the interval [prev, this] counts), then
    * truthMillis = sum(heldMs) over the trailing range frame, plus the
    * partial interval that straddles the window's left edge.
    */
  def withTruthMillis(df: DataFrame, keys: Seq[String], tsCol: String,
                      cond: Column, windowMs: Long,
                      out: String = "truth_ms",
                      tieCols: Seq[String] = Nil): DataFrame = {
    val w = Segments.orderedWindow(keys, tsCol, tieCols)
    val ms = millis(col(tsCol))
    val d1 = df
      .withColumn("_g_ms", ms)
      .withColumn("_g_prev_ms", lag(ms, 1).over(w))
      .withColumn("_g_prev_cond", lag(cond, 1).over(w))
    // full contribution of the interval ending at this event
    val held = when(col("_g_prev_cond") && col("_g_prev_ms").isNotNull,
      col("_g_ms") - col("_g_prev_ms")).otherwise(0L)
    val d2 = d1.withColumn("_g_held", held)
    val frame = Window.partitionBy(keys.map(col): _*)
      .orderBy(col("_g_ms")).rangeBetween(-windowMs, 0)
    // sum of contributions whose *end* lies in the window, minus the part of
    // the oldest contributing interval that sticks out past ts - windowMs
    val inWin = sum(col("_g_held")).over(frame)
    val overhang = greatest(lit(0L),
      (col("_g_ms") - windowMs) - min(when(col("_g_held") > 0, col("_g_prev_ms")))
        .over(frame))
    d2.withColumn(out, (inWin - when(overhang.isNull, 0L).otherwise(overhang))
        .cast("long"))
      .drop("_g_ms", "_g_prev_ms", "_g_prev_cond", "_g_held")
  }

  /** failMillis — the complement duration statistic: ms within the trailing
    * window during which `cond` did NOT hold (reference:
    * WindowStatistic.scala:66-99, fail branch). Same attribution/clipping
    * rules as [[withTruthMillis]] with the condition inverted.
    */
  def withFailMillis(df: DataFrame, keys: Seq[String], tsCol: String,
                     cond: Column, windowMs: Long,
                     out: String = "fail_ms",
                     tieCols: Seq[String] = Nil): DataFrame =
    withTruthMillis(df, keys, tsCol, !coalesce(cond, lit(false)), windowMs,
      out, tieCols)

  /** Timer — `X for T`: the condition holds continuously for at least
    * `windowMs` (reference: core/.../aggregators/TimerPattern.scala:15-119).
    * Returns the segment frame of qualifying runs: the run must span >= T of
    * wall time; the emitted incident is the full run interval.
    *
    * With `gapMs` set, a run is additionally split wherever the inter-event
    * delta exceeds it — the reference's `eventsMaxGapMs` state reset
    * (mappers/PatternProcessor.scala:33-41): a condition spanning a data
    * outage must not count the outage as held time. (The DSL engine always
    * evaluates gap-aware; this standalone combinator makes it opt-in.)
    */
  def timer(df: DataFrame, keys: Seq[String], tsCol: String, cond: Column,
            windowMs: Long, tieCols: Seq[String] = Nil,
            gapMs: Option[Long] = None): DataFrame = {
    val (frame, segKeys) = gapMs match {
      case Some(g) =>
        (Segments.withGapRunId(df, keys, tsCol, g, tieCols = tieCols),
          keys :+ "gap_run")
      case None => (df, keys)
    }
    Segments.segmentize(frame, segKeys, tsCol, cond, tieCols)
      .filter(col("to_ms") - col("from_ms") >= windowMs)
      .drop("gap_run")
  }

  /** `A andThen B` — sequencing: each A-success pairs with the first
    * B-success that starts at-or-after `A.to - toleranceMs`; the result
    * interval is `[A.from, B.to]` (reference:
    * core/.../AndThenPattern.scala:11-102; the exact queue-merge semantics
    * including consumption live in [[graft.dsl.PatternCompiler]] — this is
    * the standalone segment-level combinator).
    *
    * Implemented as one window pass over the *union* of the two segment
    * frames — no join, so no per-key A-cross-B blowup when a flapping
    * condition yields thousands of segments on one key. Each A row is
    * anchored at `a_to - tolerance`; the first B at-or-after that anchor is
    * the running minimum of `(b_from, b_to)` over the following rows.
    */
  def andThen(segA: DataFrame, segB: DataFrame, keys: Seq[String],
              toleranceMs: Long = 1000L): DataFrame = {
    val kc = keys.map(col)
    val a = segA.select(kc ++ Seq(
      (col("to_ms") - toleranceMs).as("_g_pos"), lit(0).as("_g_isb"),
      col("seg_from").as("_g_afrom"), col("from_ms").as("_g_afromms"),
      lit(null).cast("struct<fms:bigint,tms:bigint,to:timestamp>").as("_g_b")): _*)
    val b = segB.select(kc ++ Seq(
      col("from_ms").as("_g_pos"), lit(1).as("_g_isb"),
      lit(null).cast("timestamp").as("_g_afrom"), lit(null).cast("bigint").as("_g_afromms"),
      struct(col("from_ms").as("fms"), col("to_ms").as("tms"),
        col("seg_to").as("to")).as("_g_b")): _*)
    // The frame must cover every row at-or-after the A row's position. Spark
    // recomputes unbounded-*following* ROW frames from scratch per row
    // (UnboundedFollowingWindowFunctionFrame) — O(S²) per key in segment
    // count — so sort *descending* and take a running min over the preceding
    // frame instead, which Spark maintains incrementally (O(S)). Descending
    // (_g_isb) keeps an adjacent B (b_from == a_to - tol) inside the A row's
    // frame: B rows sort before A rows at equal position.
    val w = Window.partitionBy(kc: _*)
      .orderBy(col("_g_pos").desc, col("_g_isb").desc)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    a.unionByName(b)
      .withColumn("_g_next", min(col("_g_b")).over(w))
      .filter(col("_g_isb") === 0 && col("_g_next").isNotNull)
      .select(kc ++ Seq(
        col("_g_afrom").as("seg_from"), col("_g_next.to").as("seg_to"),
        col("_g_afromms").as("from_ms"), col("_g_next.tms").as("to_ms"),
        // event counts would need a join back to the event frame; segment
        // consumers only use the interval, so this stays a placeholder
        lit(1L).as("n_events")): _*)
  }

  /** Forward fill: carry the last non-null value of each column forward within
    * the key — `WideDataFilling` (reference:
    * streaming/.../transformers/SparseRowsDataAccumulator.scala:56-64,140-167).
    * With `timeoutMs` set, a carried value expires once it is older than the
    * timeout (reference: SparseRowsDataAccumulator.scala:91-95 key expiry).
    */
  def forwardFill(df: DataFrame, keys: Seq[String], tsCol: String,
                  fillCols: Seq[String],
                  timeoutMs: Option[Long] = None): DataFrame = {
    val base = keyWindow(keys, tsCol)
    // reference expiry is `now - recorded >= timeout` (strict retain `<`,
    // SparseRowsDataAccumulator.scala:91-95), hence the open left edge
    val w = timeoutMs match {
      case Some(t) => base.rangeBetween(-(t - 1), 0)
      case None    => base.rowsBetween(Window.unboundedPreceding, 0)
    }
    fillCols.foldLeft(df) { (d, c) =>
      d.withColumn(c, last(col(c), ignoreNulls = true).over(w))
    }
  }

  /** Narrow (key-value) to wide pivot with timed forward fill —
    * `NarrowDataUnfolding` (reference:
    * streaming/.../transformers/SparseRowsDataAccumulator.scala:15-175,
    * conf io/SourceDataTransformation.scala:9-18).
    *
    * @param valueColumnMapping sensor -> value column (e.g. string-typed
    *        sensors read from `value_str`); sensors not in the map read from
    *        `defaultValueCol` (reference: StreamSource.scala:34-55).
    */
  def unfoldNarrow(df: DataFrame, keys: Seq[String], tsCol: String,
                   sensorCol: String, defaultValueCol: String,
                   sensors: Seq[String],
                   valueColumnMapping: Map[String, String] = Map.empty,
                   timeoutMs: Option[Long] = None): DataFrame = {
    // pivot: one row per (keys, ts), one column per sensor. Explicit sensor
    // list keeps the plan static (no extra distinct-collect job) — matches the
    // reference, which derives the sensor set from the patterns' field set.
    val valueCols = (defaultValueCol +: valueColumnMapping.values.toSeq).distinct
    val aggs = valueCols.map(vc => last(col(vc), ignoreNulls = true).as(vc))
    val pivoted = df
      .groupBy((keys :+ tsCol).map(col): _*)
      .pivot(sensorCol, sensors)
      .agg(aggs.head, aggs.tail: _*)
    // with several value columns Spark names pivot output "{sensor}_{alias}";
    // project each sensor to its configured value column
    val unwrapped =
      if (valueCols.size == 1) pivoted
      else sensors.foldLeft(pivoted) { (d, s) =>
        val vc = valueColumnMapping.getOrElse(s, defaultValueCol)
        d.withColumn(s, col(s"${s}_$vc"))
      }.drop(sensors.flatMap(s => valueCols.map(vc => s"${s}_$vc")): _*)
    forwardFill(unwrapped, keys, tsCol, sensors, timeoutMs)
  }
}
