package graft.queries

import graft.Tables
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window

/** Relational verification queries over the TPC-H-ish tables.
  *
  * Conventions (driver compare contract):
  *  - every computed column is aliased identically in Spark and oracle SQL;
  *  - floating aggregates are `round(_, 2)` on both sides (double summation
  *    order differs between engines);
  *  - timestamps leave the plan as epoch-millis longs (`unix_millis` here,
  *    `epoch_ms` in DuckDB — both truncate identically).
  */
object RelationalQueries {

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    // TPC-H Q1-style pricing summary: single scan, partial agg map-side,
    // one shuffle on the tiny group key space.
    "q1_agg" -> { (s, d) =>
      Tables.lineitem(s, d)
        .groupBy(col("l_returnflag"), col("l_linestatus"))
        .agg(
          round(sum(col("l_quantity")), 2).as("sum_qty"),
          round(sum(col("l_extendedprice") * (lit(1) - col("l_discount"))), 2)
            .as("revenue"),
          round(avg(col("l_discount")), 4).as("avg_disc"),
          count(lit(1)).as("cnt"))
    },

    // Per-group top-k, two-phase. o_orderpriority has only 5 distinct
    // values, so a direct rank window would funnel the whole table through 5
    // tasks at scale. Phase 1 ranks within (priority, input-partition) — a
    // high-cardinality key that spreads the exchange — and keeps at most k
    // rows per (priority, partition); phase 2 ranks the surviving
    // k * numPartitions * 5 rows, which is trivially small.
    "q2_topk" -> { (s, d) =>
      val k = 3
      val pre = Tables.orders(s, d)
        .select(col("o_orderpriority"), col("o_orderkey"), col("o_totalprice"))
        .withColumn("_pid", spark_partition_id())
      val w1 = Window.partitionBy(col("o_orderpriority"), col("_pid"))
        .orderBy(col("o_totalprice").desc, col("o_orderkey"))
      val cand = pre.withColumn("_rn1", row_number().over(w1))
        .filter(col("_rn1") <= k)
        .drop("_pid", "_rn1")
      val w = Window.partitionBy(col("o_orderpriority"))
        .orderBy(col("o_totalprice").desc, col("o_orderkey"))
      cand.withColumn("rn", row_number().over(w))
        .filter(col("rn") <= k)
        .select(col("o_orderpriority"), col("o_orderkey"),
          round(col("o_totalprice"), 2).as("total"), col("rn"))
    },

    // Multi-way join: fact-fact shuffle join on l_orderkey, dimensions
    // broadcast (nation/customer are tiny at every SF).
    "q3_join" -> { (s, d) =>
      val li = Tables.lineitem(s, d)
      val o = Tables.orders(s, d)
      val c = Tables.customer(s, d)
      val n = Tables.nation(s, d)
      li.join(o, col("l_orderkey") === col("o_orderkey"))
        .join(broadcast(c), col("o_custkey") === col("c_custkey"))
        .join(broadcast(n), col("c_nationkey") === col("n_nationkey"))
        .groupBy(col("n_name"))
        .agg(
          round(sum(col("l_extendedprice") * (lit(1) - col("l_discount"))), 2)
            .as("revenue"),
          count(lit(1)).as("cnt"))
    },

    // Existential semi-join: no row multiplication, no payload from the
    // filtering side.
    "q4_semijoin" -> { (s, d) =>
      val big = Tables.lineitem(s, d).filter(col("l_quantity") > 45)
        .select(col("l_orderkey"))
      Tables.orders(s, d)
        .join(big, col("o_orderkey") === col("l_orderkey"), "left_semi")
        .groupBy(col("o_orderpriority"))
        .agg(count(lit(1)).as("cnt"))
    },

    // Distinct aggregation (expands to two-phase agg under the hood).
    "q5_distinct" -> { (s, d) =>
      Tables.customer(s, d)
        .groupBy(col("c_mktsegment"))
        .agg(
          count(lit(1)).as("n_cust"),
          countDistinct(col("c_nationkey")).as("n_nations"),
          round(sum(col("c_acctbal")), 2).as("sum_bal"))
    },

    // Anti-join: orders with no high-quantity lineitem.
    "q6_antijoin" -> { (s, d) =>
      val big = Tables.lineitem(s, d).filter(col("l_quantity") > 49)
        .select(col("l_orderkey"))
      Tables.orders(s, d)
        .join(big, col("o_orderkey") === col("l_orderkey"), "left_anti")
        .groupBy(col("o_orderstatus"))
        .agg(count(lit(1)).as("cnt"), round(sum(col("o_totalprice")), 2).as("total"))
    },

    // Scan-heavy filtered agg with date predicate — exercises parquet
    // predicate pushdown (shipdate is a stats-prunable column).
    "q7_filter_agg" -> { (s, d) =>
      Tables.lineitem(s, d)
        .filter(col("l_shipdate") >= lit("1995-01-01").cast("timestamp") &&
          col("l_shipdate") < lit("1996-01-01").cast("timestamp") &&
          col("l_discount").between(0.03, 0.07))
        .agg(round(sum(col("l_extendedprice") * col("l_discount")), 2)
          .as("revenue"), count(lit(1)).as("cnt"))
    },

    // As-of (point-in-time) join: every non-click event picks up the
    // latest click "setpoint" at-or-before its timestamp per user — the
    // trade-meets-quote join Spark lacks. Union + ordered window (one
    // exchange per side), never a range join; the right side is
    // pre-aggregated to one row per (user, ts) as the operator contract
    // requires. Timestamps leave as epoch micros so the hash compare never
    // touches timezone rendering.
    "asof_join" -> { (s, d) =>
      val ev = Tables.events(s, d)
      val setp = ev.filter(col("event_type") === "click")
        .groupBy("user_id", "ts").agg(max(col("value")).as("setpoint"))
      val probes = ev.filter(col("event_type") =!= "click")
        .select("event_id", "user_id", "ts")
      graft.operators.AsofJoin.asofJoin(probes, setp,
          keys = Seq("user_id"), tsCol = "ts", payload = Seq("setpoint"))
        .select(col("event_id"), col("user_id"),
          unix_micros(col("ts")).as("t_us"),
          col("asof_setpoint"),
          (unix_micros(col("ts")) - unix_micros(col("asof_ts")))
            .as("staleness_us"))
    })

  val oracle: Map[String, String] = Map(
    "q1_agg" ->
      """SELECT l_returnflag, l_linestatus,
        | round(sum(l_quantity), 2) AS sum_qty,
        | round(sum(l_extendedprice * (1 - l_discount)), 2) AS revenue,
        | round(avg(l_discount), 4) AS avg_disc,
        | count(*) AS cnt
        |FROM lineitem GROUP BY l_returnflag, l_linestatus""".stripMargin,
    "q2_topk" ->
      """SELECT o_orderpriority, o_orderkey, round(o_totalprice, 2) AS total, rn
        |FROM (SELECT o_orderpriority, o_orderkey, o_totalprice,
        |       row_number() OVER (PARTITION BY o_orderpriority
        |         ORDER BY o_totalprice DESC, o_orderkey) AS rn
        |      FROM orders) WHERE rn <= 3""".stripMargin,
    "q3_join" ->
      """SELECT n_name,
        | round(sum(l_extendedprice * (1 - l_discount)), 2) AS revenue,
        | count(*) AS cnt
        |FROM lineitem
        |JOIN orders ON l_orderkey = o_orderkey
        |JOIN customer ON o_custkey = c_custkey
        |JOIN nation ON c_nationkey = n_nationkey
        |GROUP BY n_name""".stripMargin,
    "q4_semijoin" ->
      """SELECT o_orderpriority, count(*) AS cnt FROM orders
        |WHERE EXISTS (SELECT 1 FROM lineitem
        |  WHERE l_orderkey = o_orderkey AND l_quantity > 45)
        |GROUP BY o_orderpriority""".stripMargin,
    "q5_distinct" ->
      """SELECT c_mktsegment, count(*) AS n_cust,
        | count(DISTINCT c_nationkey) AS n_nations,
        | round(sum(c_acctbal), 2) AS sum_bal
        |FROM customer GROUP BY c_mktsegment""".stripMargin,
    "q6_antijoin" ->
      """SELECT o_orderstatus, count(*) AS cnt,
        | round(sum(o_totalprice), 2) AS total
        |FROM orders
        |WHERE NOT EXISTS (SELECT 1 FROM lineitem
        |  WHERE l_orderkey = o_orderkey AND l_quantity > 49)
        |GROUP BY o_orderstatus""".stripMargin,
    "q7_filter_agg" ->
      """SELECT round(sum(l_extendedprice * l_discount), 2) AS revenue,
        | count(*) AS cnt
        |FROM lineitem
        |WHERE l_shipdate >= TIMESTAMP '1995-01-01'
        |  AND l_shipdate < TIMESTAMP '1996-01-01'
        |  AND l_discount BETWEEN 0.03 AND 0.07""".stripMargin,

    // DuckDB has native ASOF JOIN — the oracle is the textbook spelling of
    // what the union+window operator computes (validated row-for-row
    // against an independent replica before shipping).
    "asof_join" ->
      """WITH sp AS (SELECT user_id, ts, max(value) AS setpoint FROM events
        |            WHERE event_type = 'click' GROUP BY user_id, ts),
        |pr AS (SELECT event_id, user_id, ts FROM events
        |       WHERE event_type <> 'click')
        |SELECT pr.event_id, pr.user_id,
        |  epoch_us(pr.ts) AS t_us,
        |  sp.setpoint AS asof_setpoint,
        |  CAST(epoch_us(pr.ts) - epoch_us(sp.ts) AS BIGINT) AS staleness_us
        |FROM pr ASOF LEFT JOIN sp
        |  ON pr.user_id = sp.user_id AND pr.ts >= sp.ts""".stripMargin)
}
