package graft.queries

import graft.Tables
import graft.operators.{PatternOps, Segments}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Pattern-engine verification queries over the `events` table
  * (event_id, ts, user_id, event_type, value, props).
  *
  * These exercise the operator inventory of SURVEY.md §2.B — segmentation,
  * sessionization, lag, trailing-window aggregates, truth statistics, timers
  * and `andThen` sequencing — keyed by `user_id`, ordered by event time with
  * `event_id` as the deterministic tiebreak.
  *
  * Each query has an equivalent DuckDB SQL oracle built from the same
  * gaps-and-islands algebra, so the driver hash-compares full results.
  */
object PatternQueries {
  private val K = Seq("user_id")
  private val TS = "ts"
  private val TIE = Seq("event_id")

  /** DuckDB CTE for the events frame with epoch-ms time axis. */
  private val eCte =
    "WITH e AS (SELECT user_id, event_id, event_type, value, epoch_ms(ts) AS ms FROM events)"

  /** DuckDB gaps-and-islands segments of `cond` (boolean SQL over e). */
  private def segSql(cond: String): String =
    s"""runs AS (
       |  SELECT user_id, ms, cond,
       |    sum(CASE WHEN cond IS NOT DISTINCT FROM prev THEN 0 ELSE 1 END)
       |      OVER (PARTITION BY user_id ORDER BY ms, event_id) AS run_id
       |  FROM (SELECT *, ($cond) AS cond,
       |          lag(($cond)) OVER (PARTITION BY user_id ORDER BY ms, event_id) AS prev
       |        FROM e)),
       |seg AS (
       |  SELECT user_id, min(ms) AS from_ms, max(ms) AS to_ms,
       |         count(*) AS n_events
       |  FROM runs WHERE cond GROUP BY user_id, run_id)""".stripMargin

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    // SimplePattern + SegmentizerPattern: true-runs of a predicate.
    "pat_segments" -> { (s, d) =>
      Segments.segmentize(Tables.events(s, d), K, TS, col("value") > 100, TIE)
        .select(col("user_id"), col("from_ms"), col("to_ms"), col("n_events"))
    },

    // Incident sessionization (reduceIncidents): merge segments < 2h apart.
    "pat_sessions" -> { (s, d) =>
      val seg = Segments.segmentize(Tables.events(s, d), K, TS,
        col("value") > 100, TIE)
      Segments.sessionize(seg, K, 7200000L)
        .select(col("user_id"), col("from_ms"), col("to_ms"), col("n_events"))
    },

    // PreviousValue / lag(x): value drops of more than 100 vs previous event.
    "pat_lag_drop" -> { (s, d) =>
      val e = Tables.events(s, d)
      e.withColumn("prev", PatternOps.lagOne(col("value"), K, TS, TIE))
        .filter(col("prev") - col("value") > 100)
        .select(col("user_id"), col("event_id"),
          round(col("value"), 2).as("value"),
          round(col("prev"), 2).as("prev"))
    },

    // GroupPattern projections: trailing 1h avg/sum/count per event.
    "pat_window_agg" -> { (s, d) =>
      val e = Tables.events(s, d)
      e.select(col("user_id"), col("event_id"),
          round(PatternOps.avgOver(col("value"), K, TS, 3600000L), 3).as("avg_1h"),
          round(PatternOps.sumOver(col("value"), K, TS, 3600000L), 2).as("sum_1h"),
          PatternOps.countOver(col("value"), K, TS, 3600000L).as("cnt_1h"))
    },

    // WindowStatistic truthCount: events with value>100 in trailing 1h.
    "pat_truth_count" -> { (s, d) =>
      val e = Tables.events(s, d)
      e.select(col("user_id"), col("event_id"),
        PatternOps.truthCount(col("value") > 100, K, TS, 3600000L).as("truth_cnt"))
    },

    // TimerPattern `X for T`: value > 50 continuously for >= 30 minutes,
    // runs split at 7d data gaps (eventsMaxGapMs reset).
    "pat_timer" -> { (s, d) =>
      PatternOps.timer(Tables.events(s, d), K, TS, col("value") > 50,
        1800000L, TIE, gapMs = Some(604800000L))
        .select(col("user_id"), col("from_ms"), col("to_ms"), col("n_events"))
    },

    // AndThenPattern: a (value > 150)-run followed by a purchase-run.
    "pat_andthen" -> { (s, d) =>
      val e = Tables.events(s, d)
      val a = Segments.segmentize(e, K, TS, col("value") > 150, TIE)
      val b = Segments.segmentize(e, K, TS, col("event_type") === "purchase", TIE)
      PatternOps.andThen(a, b, K, toleranceMs = 0L)
        .select(col("user_id"), col("from_ms"), col("to_ms"))
    },

    // WindowStatistic truthMillis/failMillis/failCount: duration + count
    // statistics over the trailing 7d window; durations attributed to the
    // earlier event, clipped at the window edge (reference:
    // WindowStatistic.scala:66-99).
    "pat_truth_millis" -> { (s, d) =>
      val withTm = PatternOps.withTruthMillis(Tables.events(s, d), K, TS,
        col("value") > 100, 604800000L, tieCols = TIE)
      PatternOps.withFailMillis(withTm, K, TS, col("value") > 100,
          604800000L, tieCols = TIE)
        .select(col("user_id"), col("event_id"), col("truth_ms"), col("fail_ms"),
          PatternOps.failCount(col("value") > 100, K, TS, 604800000L).as("fail_cnt"))
    },

    // WideDataFilling: carry last non-null value forward with a 2d timeout
    // (nulls injected at error events to exercise the fill).
    "pat_fill" -> { (s, d) =>
      val e = Tables.events(s, d)
        .withColumn("v", when(col("event_type") =!= "error", col("value")))
      PatternOps.forwardFill(e, K, TS, Seq("v"), timeoutMs = Some(172800000L))
        .select(col("user_id"), col("event_id"), col("v"))
    },

    // NarrowDataUnfolding: events-as-kv (event_type is the sensor id) pivoted
    // to one wide row per (user, ts) with 2d timeout fill.
    "pat_unfold" -> { (s, d) =>
      val types = Seq("click", "view", "purchase", "error", "signup")
      PatternOps.unfoldNarrow(Tables.events(s, d), K, TS,
          sensorCol = "event_type", defaultValueCol = "value",
          sensors = types, timeoutMs = Some(172800000L))
        .select(col("user_id") +: Segments.millis(col(TS)).as("ms") +:
          types.map(col): _*)
    },

    // Gap splitter: eventsMaxGapMs state-reset runs (7d) per key.
    "pat_gap_run" -> { (s, d) =>
      Segments.withGapRunId(Tables.events(s, d), K, TS, 604800000L,
          tieCols = TIE)
        .groupBy(col("user_id"), col("gap_run"))
        .agg(count(lit(1)).as("n_events"),
          min(Segments.millis(col(TS))).as("from_ms"),
          max(Segments.millis(col(TS))).as("to_ms"))
    })

  val oracle: Map[String, String] = Map(
    "pat_segments" ->
      s"""$eCte, ${segSql("value > 100")}
         |SELECT user_id, from_ms, to_ms, n_events FROM seg""".stripMargin,
    "pat_sessions" ->
      s"""$eCte, ${segSql("value > 100")},
         |sess AS (
         |  SELECT user_id, from_ms, to_ms, n_events,
         |    sum(CASE WHEN prev_max_to IS NULL
         |             OR from_ms > prev_max_to + 7200000 THEN 1 ELSE 0 END)
         |      OVER (PARTITION BY user_id ORDER BY from_ms, to_ms) AS sid
         |  FROM (SELECT *, max(to_ms) OVER (PARTITION BY user_id
         |          ORDER BY from_ms, to_ms
         |          ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING) AS prev_max_to
         |        FROM seg))
         |SELECT user_id, min(from_ms) AS from_ms, max(to_ms) AS to_ms,
         |       CAST(sum(n_events) AS BIGINT) AS n_events
         |FROM sess GROUP BY user_id, sid""".stripMargin,
    "pat_lag_drop" ->
      s"""$eCte
         |SELECT user_id, event_id, round(value, 2) AS value,
         |       round(prev, 2) AS prev
         |FROM (SELECT user_id, event_id, value,
         |        lag(value) OVER (PARTITION BY user_id ORDER BY ms, event_id) AS prev
         |      FROM e)
         |WHERE prev - value > 100""".stripMargin,
    "pat_window_agg" ->
      s"""$eCte
         |SELECT user_id, event_id,
         |  round(avg(value) OVER w, 3) AS avg_1h,
         |  round(sum(value) OVER w, 2) AS sum_1h,
         |  count(value) OVER w AS cnt_1h
         |FROM e
         |WINDOW w AS (PARTITION BY user_id ORDER BY ms
         |  RANGE BETWEEN 3600000 PRECEDING AND CURRENT ROW)""".stripMargin,
    "pat_truth_count" ->
      s"""$eCte
         |SELECT user_id, event_id,
         |  CAST(sum(CASE WHEN value > 100 THEN 1 ELSE 0 END) OVER
         |    (PARTITION BY user_id ORDER BY ms
         |     RANGE BETWEEN 3600000 PRECEDING AND CURRENT ROW) AS BIGINT) AS truth_cnt
         |FROM e""".stripMargin,
    "pat_timer" ->
      s"""$eCte,
         |g AS (SELECT user_id, event_id, ms, value,
         |        sum(CASE WHEN prev_ms IS NOT NULL AND ms - prev_ms > 604800000
         |                 THEN 1 ELSE 0 END)
         |          OVER (PARTITION BY user_id ORDER BY ms, event_id) AS grun
         |      FROM (SELECT user_id, event_id, ms, value,
         |              lag(ms) OVER (PARTITION BY user_id ORDER BY ms, event_id) AS prev_ms
         |            FROM e)),
         |runs AS (
         |  SELECT user_id, grun, ms, cond,
         |    sum(CASE WHEN cond IS NOT DISTINCT FROM prev THEN 0 ELSE 1 END)
         |      OVER (PARTITION BY user_id, grun ORDER BY ms, event_id) AS run_id
         |  FROM (SELECT *, (value > 50) AS cond,
         |          lag((value > 50)) OVER (PARTITION BY user_id, grun ORDER BY ms, event_id) AS prev
         |        FROM g)),
         |seg AS (
         |  SELECT user_id, min(ms) AS from_ms, max(ms) AS to_ms,
         |         count(*) AS n_events
         |  FROM runs WHERE cond GROUP BY user_id, grun, run_id)
         |SELECT user_id, from_ms, to_ms, n_events FROM seg
         |WHERE to_ms - from_ms >= 1800000""".stripMargin,
    "pat_andthen" ->
      s"""$eCte, ${segSql("value > 150")},
         |bruns AS (
         |  SELECT user_id, ms, cond,
         |    sum(CASE WHEN cond IS NOT DISTINCT FROM prev THEN 0 ELSE 1 END)
         |      OVER (PARTITION BY user_id ORDER BY ms, event_id) AS run_id
         |  FROM (SELECT *, (event_type = 'purchase') AS cond,
         |          lag((event_type = 'purchase')) OVER
         |            (PARTITION BY user_id ORDER BY ms, event_id) AS prev
         |        FROM e)),
         |bseg AS (
         |  SELECT user_id, min(ms) AS from_ms, max(ms) AS to_ms
         |  FROM bruns WHERE cond GROUP BY user_id, run_id),
         |j AS (
         |  SELECT a.user_id, a.from_ms AS a_from, b.to_ms AS b_to,
         |    row_number() OVER (PARTITION BY a.user_id, a.from_ms
         |      ORDER BY b.from_ms, b.to_ms) AS rk
         |  FROM seg a JOIN bseg b ON a.user_id = b.user_id
         |  WHERE b.from_ms >= a.to_ms)
         |SELECT user_id, a_from AS from_ms, b_to AS to_ms FROM j
         |WHERE rk = 1""".stripMargin,
    // independent formulation: per (event, contributing interval) self-join
    // with explicit clipping of each interval to the window
    "pat_truth_millis" ->
      s"""$eCte,
         |fc AS (
         |  SELECT user_id, event_id,
         |    CAST(sum(CASE WHEN value > 100 THEN 0 ELSE 1 END) OVER
         |      (PARTITION BY user_id ORDER BY ms
         |       RANGE BETWEEN 604800000 PRECEDING AND CURRENT ROW) AS BIGINT) AS fail_cnt
         |  FROM e),
         |tm AS (
         |  SELECT a.user_id, a.event_id,
         |    CAST(COALESCE(SUM(CASE WHEN wprev.prev_cond
         |      THEN wprev.ms - GREATEST(wprev.prev_ms, a.ms - 604800000)
         |      ELSE 0 END), 0) AS BIGINT) AS truth_ms,
         |    CAST(COALESCE(SUM(CASE WHEN NOT wprev.prev_cond
         |      THEN wprev.ms - GREATEST(wprev.prev_ms, a.ms - 604800000)
         |      ELSE 0 END), 0) AS BIGINT) AS fail_ms
         |  FROM e a
         |  LEFT JOIN (SELECT user_id, ms,
         |               lag(ms) OVER (PARTITION BY user_id ORDER BY ms, event_id) AS prev_ms,
         |               lag(value > 100) OVER (PARTITION BY user_id ORDER BY ms, event_id) AS prev_cond
         |             FROM e) wprev
         |    ON a.user_id = wprev.user_id
         |    AND wprev.ms BETWEEN a.ms - 604800000 AND a.ms
         |    AND wprev.prev_ms IS NOT NULL
         |  GROUP BY a.user_id, a.event_id)
         |SELECT tm.user_id, tm.event_id, tm.truth_ms, tm.fail_ms, fc.fail_cnt
         |FROM tm JOIN fc ON tm.event_id = fc.event_id""".stripMargin,
    "pat_fill" ->
      s"""$eCte
         |SELECT user_id, event_id,
         |  last_value(CASE WHEN event_type <> 'error' THEN value END IGNORE NULLS)
         |    OVER (PARTITION BY user_id ORDER BY ms
         |          RANGE BETWEEN 172799999 PRECEDING AND CURRENT ROW) AS v
         |FROM e""".stripMargin,
    "pat_unfold" ->
      s"""$eCte, p AS (
         |  SELECT user_id, ms,
         |    max(CASE WHEN event_type = 'click' THEN value END) AS click,
         |    max(CASE WHEN event_type = 'view' THEN value END) AS view,
         |    max(CASE WHEN event_type = 'purchase' THEN value END) AS purchase,
         |    max(CASE WHEN event_type = 'error' THEN value END) AS error,
         |    max(CASE WHEN event_type = 'signup' THEN value END) AS signup
         |  FROM e GROUP BY user_id, ms)
         |SELECT user_id, ms,
         |  last_value(click IGNORE NULLS) OVER w AS click,
         |  last_value(view IGNORE NULLS) OVER w AS view,
         |  last_value(purchase IGNORE NULLS) OVER w AS purchase,
         |  last_value(error IGNORE NULLS) OVER w AS error,
         |  last_value(signup IGNORE NULLS) OVER w AS signup
         |FROM p
         |WINDOW w AS (PARTITION BY user_id ORDER BY ms
         |  RANGE BETWEEN 172799999 PRECEDING AND CURRENT ROW)""".stripMargin,
    "pat_gap_run" ->
      s"""$eCte
         |SELECT user_id, CAST(gap_run AS BIGINT) AS gap_run, count(*) AS n_events,
         |       min(ms) AS from_ms, max(ms) AS to_ms
         |FROM (SELECT user_id, ms,
         |        sum(CASE WHEN prev_ms IS NOT NULL AND ms - prev_ms > 604800000
         |                 THEN 1 ELSE 0 END)
         |          OVER (PARTITION BY user_id ORDER BY ms, event_id) AS gap_run
         |      FROM (SELECT user_id, ms, event_id,
         |              lag(ms) OVER (PARTITION BY user_id ORDER BY ms, event_id) AS prev_ms
         |            FROM e))
         |GROUP BY user_id, gap_run""".stripMargin)
}
