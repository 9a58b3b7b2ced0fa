package graft.queries

import graft.Tables
import graft.dsl.{PatternConfig, TspEngine}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** End-to-end DSL queries: pattern source text -> parser -> compiler ->
  * incidents, over the `events` table. These are the driver-gate counterpart
  * of the golden-corpus ScalaTest suite (CorpusWideSpec) — the oracle SQL
  * re-derives the same semantics independently in DuckDB.
  *
  * The events table is sparse (median inter-event gap per user ~7.3 h), so
  * windows are day-scale: state resets at gaps > 7 days, incidents merge when
  * closer than 1 day.
  */
object DslQueries {

  private val G = 604800000L // eventsMaxGapMs: 7 days
  private val S = 86400000L  // incident session gap: 1 day

  private val cfg = PatternConfig(
    keys = Seq("user_id"),
    tsCol = "ts",
    eventsMaxGapMs = G,
    sessionGapMs = S
  )

  private def run(s: SparkSession, d: String, pattern: String): DataFrame =
    TspEngine.incidents(Tables.events(s, d), pattern, cfg)
      .select(col("user_id"), col("from_ms"), col("to_ms"), col("n_events"))

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    // parser + comparison + segmentization + sessionization
    "dsl_simple" -> ((s, d) => run(s, d, "value > 100")),

    // TimerPattern: continuously > 50 for at least 24 hours
    "dsl_timer" -> ((s, d) => run(s, d, "value > 50 for 24 hr")),

    // WindowStatistic + repetition range: > 5 matches within a 7-day window
    "dsl_forstat" -> ((s, d) => run(s, d, "value > 100 for 168 hr > 5 times")),

    // `until`: X and not B
    "dsl_until" -> ((s, d) => run(s, d, "value > 50 until event_type = 'error'")),

    // PreviousValue lag(x, T): value rose vs the value in effect 24h earlier
    "dsl_lag" -> ((s, d) => run(s, d, "lag(value, 24 hr) < value")),

    // ReducePattern avgOf with a per-argument filter
    "dsl_reducer" -> ((s, d) => run(s, d, "avgOf(value, lag(value); _ >= 0) > 150")),

    // AndThenPattern over the DSL: exact queue-merge semantics. The oracle
    // simulates the sequential merge with a DuckDB recursive CTE (one merge
    // step per iteration, rewinds in closed form over the RLE run arrays).
    "dsl_andthen" -> ((s, d) => run(s, d, "value > 150 andThen event_type = 'purchase'")),

    // nested (right-associated) andThen tree: the inner merge's output is
    // the outer merge's second operand — exercises the compiler's
    // recursive evaluation, not just the left-spine chain
    "dsl_nested" -> ((s, d) =>
      run(s, d, "value > 150 andThen (event_type = 'purchase' andThen value < 50)")),

    // shared multi-pattern evaluation: three patterns, one scan, one window
    // exchange; results must equal running each pattern alone
    "dsl_multi" -> { (s, d) =>
      TspEngine.incidentsAllShared(Tables.events(s, d), Seq(
        TspEngine.RawPattern("simple", "value > 100"),
        TspEngine.RawPattern("timer", "value > 50 for 24 hr"),
        TspEngine.RawPattern("until", "value > 50 until event_type = 'error'")), cfg)
        .select(col("pattern_id"), col("user_id"), col("from_ms"), col("to_ms"),
          col("n_events"))
    }
  )

  /** Shared oracle scaffolding: events with epoch-ms and a gap-run id that
    * increments at data gaps > G (the engine's state-reset rule).
    */
  private val eCte =
    s"""WITH e0 AS (SELECT user_id, event_id, event_type, value, epoch_ms(ts) AS ms
       |            FROM events),
       |e AS (SELECT *, sum(CASE WHEN prev_ms IS NULL OR ms - prev_ms > $G
       |                         THEN 1 ELSE 0 END)
       |        OVER (PARTITION BY user_id ORDER BY ms) AS grun
       |      FROM (SELECT *, lag(ms) OVER (PARTITION BY user_id ORDER BY ms) AS prev_ms
       |            FROM e0))""".stripMargin

  /** Gaps-and-islands of `cond` within (user, gap-run). */
  private def segSql(cond: String): String =
    s"""runs AS (
       |  SELECT user_id, grun, ms, cond,
       |    sum(CASE WHEN cond IS NOT DISTINCT FROM prev THEN 0 ELSE 1 END)
       |      OVER (PARTITION BY user_id, grun ORDER BY ms) AS run_id
       |  FROM (SELECT *, ($cond) AS cond,
       |          lag(($cond)) OVER (PARTITION BY user_id, grun ORDER BY ms) AS prev
       |        FROM e) ),
       |seg AS (
       |  SELECT user_id, min(ms) AS from_ms, max(ms) AS to_ms,
       |         count(*) AS n_events
       |  FROM runs WHERE cond GROUP BY user_id, grun, run_id)""".stripMargin

  /** Merge segments closer than S (incident sessionization). */
  private val sessSql =
    s"""sess AS (
       |  SELECT user_id, from_ms, to_ms, n_events,
       |    sum(CASE WHEN prev_max_to IS NULL OR from_ms > prev_max_to + $S
       |             THEN 1 ELSE 0 END)
       |      OVER (PARTITION BY user_id ORDER BY from_ms, to_ms) AS sid
       |  FROM (SELECT *, max(to_ms) OVER (PARTITION BY user_id
       |          ORDER BY from_ms, to_ms
       |          ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING) AS prev_max_to
       |        FROM seg))""".stripMargin

  private val sessSelect =
    """SELECT user_id, min(from_ms) AS from_ms, max(to_ms) AS to_ms,
      |       CAST(sum(n_events) AS BIGINT) AS n_events
      |FROM sess GROUP BY user_id, sid""".stripMargin

  private def condIncidents(cond: String): String =
    s"$eCte, ${segSql(cond)}, $sessSql\n$sessSelect"

  /** One pattern's oracle wrapped with its pattern_id, for the multi-pattern
    * union.
    */
  private def tagged(id: String, sql: String): String =
    s"SELECT '$id' AS pattern_id, * FROM (\n$sql\n)"

  /** timer: within each true-run (split at gaps), success spans from the
    * first event at-or-after run_start + T through the run end.
    */
  private val timerOracle: String =
    s"""$eCte, ${segSql("value > 50")},
       |traw AS (
       |  SELECT r.user_id, min(r.ms) AS from_ms, max(r.ms) AS to_ms,
       |         count(*) AS n_events
       |  FROM runs r
       |  JOIN (SELECT user_id, grun, run_id, min(ms) AS start_ms
       |        FROM runs WHERE cond GROUP BY user_id, grun, run_id) st
       |    ON r.user_id = st.user_id AND r.grun = st.grun AND r.run_id = st.run_id
       |  WHERE r.cond AND r.ms >= st.start_ms + ${86400000L}
       |  GROUP BY r.user_id, r.grun, r.run_id),
       |sess AS (
       |  SELECT user_id, from_ms, to_ms, n_events,
       |    sum(CASE WHEN prev_max_to IS NULL OR from_ms > prev_max_to + $S
       |             THEN 1 ELSE 0 END)
       |      OVER (PARTITION BY user_id ORDER BY from_ms, to_ms) AS sid
       |  FROM (SELECT *, max(to_ms) OVER (PARTITION BY user_id
       |          ORDER BY from_ms, to_ms
       |          ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING) AS prev_max_to
       |        FROM traw))
       |$sessSelect""".stripMargin

  val oracle: Map[String, String] = Map(
    "dsl_simple" -> condIncidents("value > 100"),

    "dsl_timer" -> timerOracle,

    // window statistic: success-count >= 6 in the closed trailing 7-day
    // window, truncated at gap-run boundaries; the result column is a new
    // boolean whose true-runs then segment + sessionize as usual
    "dsl_forstat" ->
      s"""$eCte,
         |st AS (
         |  SELECT user_id, grun, ms,
         |    (sum(CASE WHEN value > 100 THEN 1 ELSE 0 END) OVER
         |      (PARTITION BY user_id, grun ORDER BY ms
         |       RANGE BETWEEN ${604800000L} PRECEDING AND CURRENT ROW)) >= 6 AS cond
         |  FROM e),
         |runs AS (
         |  SELECT user_id, grun, ms, cond,
         |    sum(CASE WHEN cond IS NOT DISTINCT FROM prev THEN 0 ELSE 1 END)
         |      OVER (PARTITION BY user_id, grun ORDER BY ms) AS run_id
         |  FROM (SELECT *, lag(cond) OVER (PARTITION BY user_id, grun ORDER BY ms) AS prev
         |        FROM st)),
         |seg AS (
         |  SELECT user_id, min(ms) AS from_ms, max(ms) AS to_ms,
         |         count(*) AS n_events
         |  FROM runs WHERE cond GROUP BY user_id, grun, run_id),
         |$sessSql
         |$sessSelect""".stripMargin,

    "dsl_until" -> condIncidents("value > 50 AND NOT (event_type = 'error')"),

    // lag(x, T): last value at or before ms - T within the gap-run
    "dsl_lag" ->
      s"""$eCte,
         |lg AS (
         |  SELECT user_id, grun, ms, value,
         |    last_value(value) OVER (PARTITION BY user_id, grun ORDER BY ms
         |      RANGE BETWEEN UNBOUNDED PRECEDING AND ${86400000L} PRECEDING) AS lagv
         |  FROM e),
         |runs AS (
         |  SELECT user_id, grun, ms, cond,
         |    sum(CASE WHEN cond IS NOT DISTINCT FROM prev THEN 0 ELSE 1 END)
         |      OVER (PARTITION BY user_id, grun ORDER BY ms) AS run_id
         |  FROM (SELECT *, COALESCE(lagv < value, FALSE) AS cond,
         |          lag(COALESCE(lagv < value, FALSE)) OVER
         |            (PARTITION BY user_id, grun ORDER BY ms) AS prev
         |        FROM lg)),
         |seg AS (
         |  SELECT user_id, min(ms) AS from_ms, max(ms) AS to_ms,
         |         count(*) AS n_events
         |  FROM runs WHERE cond GROUP BY user_id, grun, run_id),
         |$sessSql
         |$sessSelect""".stripMargin,

    // avgOf(value, lag(value); _ >= 0) > 150: the filter drops negative
    // arguments; a NULL lag fails the filter (NaN >= 0 is false in Scala),
    // so it is excluded rather than poisoning the result; avg of an empty
    // set is NaN and the comparison fails
    "dsl_reducer" ->
      s"""$eCte,
         |lg AS (
         |  SELECT user_id, grun, ms, value,
         |    lag(value) OVER (PARTITION BY user_id, grun ORDER BY ms) AS lagv
         |  FROM e),
         |red AS (
         |  SELECT user_id, grun, ms,
         |    (CASE WHEN value >= 0 THEN value ELSE 0 END
         |     + CASE WHEN lagv IS NOT NULL AND lagv >= 0 THEN lagv ELSE 0 END)
         |    / NULLIF((CASE WHEN value >= 0 THEN 1 ELSE 0 END
         |            + CASE WHEN lagv IS NOT NULL AND lagv >= 0 THEN 1 ELSE 0 END), 0)
         |      AS avgv
         |  FROM lg),
         |runs AS (
         |  SELECT user_id, grun, ms, cond,
         |    sum(CASE WHEN cond IS NOT DISTINCT FROM prev THEN 0 ELSE 1 END)
         |      OVER (PARTITION BY user_id, grun ORDER BY ms) AS run_id
         |  FROM (SELECT *, COALESCE(avgv > 150, FALSE) AS cond,
         |          lag(COALESCE(avgv > 150, FALSE)) OVER
         |            (PARTITION BY user_id, grun ORDER BY ms) AS prev
         |        FROM red)),
         |seg AS (
         |  SELECT user_id, min(ms) AS from_ms, max(ms) AS to_ms,
         |         count(*) AS n_events
         |  FROM runs WHERE cond GROUP BY user_id, grun, run_id),
         |$sessSql
         |$sessSelect""".stripMargin,

    "dsl_multi" -> Seq(
      tagged("simple", condIncidents("value > 100")),
      tagged("timer", timerOracle),
      tagged("until", condIncidents("value > 50 AND NOT (event_type = 'error')"))
    ).mkString("\nUNION ALL\n"),

    "dsl_andthen" -> andThenOracle,

    "dsl_nested" -> nestedOracle
  )

  /** Recursive-CTE simulation of the reference's andThen queue merge
    * (AndThenPattern.scala:42-94, mirrored by PatternCompiler.andThenMerge):
    * per (user, gap-run) the two conditions RLE into run arrays; each CTE
    * iteration applies one merge step, with queue rewinds computed in
    * closed form via list_filter; every step advances a pointer so the
    * recursion terminates in <= |runsA| + |runsB| iterations. Emitted idx
    * intervals mark events, which then segment + sessionize as usual.
    */
  private def rewindSql(arr: String, i: String, s: String, t: String): (String, String) = {
    val drop = s"len(list_filter($arr[$i:], x -> x.e < $t))"
    (s"$i + $drop",
      s"""(CASE WHEN $i + $drop > len($arr) THEN NULL
         |      WHEN $drop = 0 THEN (CASE WHEN $s <= $t THEN $t ELSE $s END)
         |      ELSE (CASE WHEN $arr[$i + $drop].s <= $t THEN $t
         |                 ELSE $arr[$i + $drop].s END) END)""".stripMargin)
  }

  private def rleSql(c: String, src: String = "cnd"): String =
    s"""(SELECT user_id, grun, $c AS v, min(idx) AS s, max(idx) AS e FROM
       |  (SELECT *, sum(CASE WHEN $c IS NOT DISTINCT FROM prev THEN 0 ELSE 1 END)
       |     OVER (PARTITION BY user_id, grun ORDER BY idx) AS rid
       |   FROM (SELECT *, lag($c) OVER (PARTITION BY user_id, grun ORDER BY idx) AS prev
       |         FROM $src))
       | GROUP BY user_id, grun, rid, $c)""".stripMargin

  /** One queue-merge as composable CTEs: `<pfx>arr` packs the two RLE run
    * tables into per-(user, gap-run) arrays, `<pfx>step` iterates the merge
    * (one step per recursion), `<pfx>emitted` collects the emitted idx
    * intervals, `<pfx>marked` projects them back onto events as a boolean.
    * Nesting = feeding `rleSql("cond", "<pfx>marked")` of one merge into
    * another — the same recursion the engine compiler applies to nested
    * `andThen` trees.
    */
  private def mergeCtes(pfx: String, raT: String, rbT: String): String = {
    val endU = "greatest(ar[ai].e + 1, br[bi].e)"
    val (a2u, as2u) = rewindSql("ar", "ai", "a_s", s"($endU + 1)")
    val (b2u, bs2u) = rewindSql("br", "bi", "b_s", s"($endU + 1)")
    val (a2f, as2f) = rewindSql("ar", "ai", "a_s", "(br[bi].e + 1)")
    val skipb = "len(list_filter(br[bi:], x -> x.e <= a_s))"
    s"""${pfx}arr AS (
       |  SELECT a.user_id, a.grun, a.ar, b.br
       |  FROM (SELECT user_id, grun, list(struct_pack(s := s, e := e, v := v) ORDER BY s) AS ar
       |        FROM $raT GROUP BY user_id, grun) a
       |  JOIN (SELECT user_id, grun, list(struct_pack(s := s, e := e, v := v) ORDER BY s) AS br
       |        FROM $rbT GROUP BY user_id, grun) b
       |    USING (user_id, grun)),
       |${pfx}step AS (
       |  SELECT user_id, grun, ar, br,
       |         1::BIGINT AS ai, ar[1].s AS a_s, 1::BIGINT AS bi, br[1].s AS b_s,
       |         NULL::BIGINT AS em_s, NULL::BIGINT AS em_e
       |  FROM ${pfx}arr
       |  UNION ALL
       |  SELECT user_id, grun, ar, br,
       |    CASE WHEN NOT ar[ai].v THEN ai + 1
       |         WHEN NOT br[bi].v THEN CASE WHEN ai = len(ar) THEN $a2f ELSE ai END
       |         WHEN a_s > br[bi].e THEN ai
       |         WHEN ar[ai].e + 1 < b_s THEN ai + 1
       |         ELSE $a2u END AS ai,
       |    CASE WHEN NOT ar[ai].v THEN (CASE WHEN ai + 1 <= len(ar) THEN ar[ai + 1].s END)
       |         WHEN NOT br[bi].v THEN CASE WHEN ai = len(ar) THEN $as2f ELSE a_s END
       |         WHEN a_s > br[bi].e THEN a_s
       |         WHEN ar[ai].e + 1 < b_s THEN (CASE WHEN ai + 1 <= len(ar) THEN ar[ai + 1].s END)
       |         ELSE $as2u END AS a_s,
       |    CASE WHEN NOT ar[ai].v THEN bi + $skipb
       |         WHEN NOT br[bi].v THEN bi + 1
       |         WHEN a_s > br[bi].e THEN bi + 1
       |         WHEN ar[ai].e + 1 < b_s THEN bi
       |         ELSE $b2u END AS bi,
       |    CASE WHEN NOT ar[ai].v THEN
       |           (CASE WHEN $skipb = 0 THEN b_s
       |                 WHEN bi + $skipb <= len(br) THEN br[bi + $skipb].s
       |                 ELSE NULL END)
       |         WHEN NOT br[bi].v THEN (CASE WHEN bi + 1 <= len(br) THEN br[bi + 1].s END)
       |         WHEN a_s > br[bi].e THEN (CASE WHEN bi + 1 <= len(br) THEN br[bi + 1].s END)
       |         WHEN ar[ai].e + 1 < b_s THEN b_s
       |         ELSE $bs2u END AS b_s,
       |    CASE WHEN ar[ai].v AND br[bi].v AND a_s <= br[bi].e AND ar[ai].e + 1 >= b_s
       |         THEN least(a_s, b_s) END AS em_s,
       |    CASE WHEN ar[ai].v AND br[bi].v AND a_s <= br[bi].e AND ar[ai].e + 1 >= b_s
       |         THEN $endU END AS em_e
       |  FROM ${pfx}step
       |  WHERE ai <= len(ar) AND bi <= len(br)),
       |${pfx}emitted AS (SELECT user_id, grun, em_s, em_e FROM ${pfx}step WHERE em_s IS NOT NULL),
       |${pfx}marked AS (
       |  SELECT c.user_id, c.grun, c.idx, c.ms,
       |    EXISTS (SELECT 1 FROM ${pfx}emitted m JOIN mx USING (user_id, grun)
       |            WHERE m.user_id = c.user_id AND m.grun = c.grun
       |              AND c.idx BETWEEN m.em_s AND least(m.em_e, mx.maxidx)) AS cond
       |  FROM cnd c)""".stripMargin
  }

  /** Events with gap-run + idx, the condition columns, their RLEs, and the
    * per-part max idx — the shared preamble of every merge oracle.
    */
  private def mergePreamble(conds: Map[String, String]): String = {
    val condCols = conds.map { case (n, c) => s"COALESCE($c, FALSE) AS $n" }
      .mkString(",\n          ")
    val rles = conds.keys.map(n => s"r$n AS ${rleSql(n)}").mkString(",\n")
    s"""e0 AS (SELECT user_id, event_id, event_type, value, epoch_ms(ts) AS ms FROM events),
       |e AS (SELECT *,
       |        sum(CASE WHEN prev_ms IS NULL OR ms - prev_ms > $G THEN 1 ELSE 0 END)
       |          OVER (PARTITION BY user_id ORDER BY ms) AS grun,
       |        row_number() OVER (PARTITION BY user_id ORDER BY ms) AS idx
       |      FROM (SELECT *, lag(ms) OVER (PARTITION BY user_id ORDER BY ms) AS prev_ms
       |            FROM e0)),
       |cnd AS (SELECT user_id, grun, idx, ms,
       |          $condCols
       |        FROM e),
       |$rles,
       |mx AS (SELECT user_id, grun, max(idx) AS maxidx FROM cnd GROUP BY user_id, grun)""".stripMargin
  }

  /** Segment + sessionize the boolean `cond` of a marked table. */
  private def markedTail(markedT: String): String =
    s"""runs AS (
       |  SELECT user_id, grun, ms, cond,
       |    sum(CASE WHEN cond IS NOT DISTINCT FROM prev THEN 0 ELSE 1 END)
       |      OVER (PARTITION BY user_id, grun ORDER BY ms) AS run_id
       |  FROM (SELECT *, lag(cond) OVER (PARTITION BY user_id, grun ORDER BY ms) AS prev
       |        FROM $markedT)),
       |seg AS (
       |  SELECT user_id, min(ms) AS from_ms, max(ms) AS to_ms, count(*) AS n_events
       |  FROM runs WHERE cond GROUP BY user_id, grun, run_id),
       |$sessSql
       |$sessSelect""".stripMargin

  // lazy: referenced from the `oracle` map defined above this declaration
  private lazy val andThenOracle: String =
    s"""WITH RECURSIVE
       |${mergePreamble(scala.collection.immutable.ListMap(
            "ca" -> "value > 150", "cb" -> "event_type = 'purchase'"))},
       |${mergeCtes("m_", "rca", "rcb")},
       |${markedTail("m_marked")}""".stripMargin

  /** Nested tree `A andThen (B andThen C)`: the inner merge's marked
    * boolean re-RLEs and feeds the outer merge — two chained recursions,
    * exactly the engine compiler's evaluation order for the nested AST.
    */
  private lazy val nestedOracle: String =
    s"""WITH RECURSIVE
       |${mergePreamble(scala.collection.immutable.ListMap(
            "ca" -> "value > 150", "cb" -> "event_type = 'purchase'",
            "cc" -> "value < 50"))},
       |${mergeCtes("i_", "rcb", "rcc")},
       |ri AS ${rleSql("cond", "i_marked")},
       |${mergeCtes("o_", "rca", "ri")},
       |${markedTail("o_marked")}""".stripMargin
}
