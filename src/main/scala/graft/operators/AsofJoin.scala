package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** As-of (point-in-time) join: each left row picks up the latest right row
  * with `right.ts <= left.ts` within its key group — the
  * sensor-reading-meets-setpoint / trade-meets-quote join that relational
  * Spark lacks (DuckDB spells it `ASOF JOIN`; kdb calls it `aj`).
  *
  * Mechanism — union + ordered window, NOT a range join: tag both sides,
  * union them by name (each side null-pads the other's columns), sort each
  * key group by (ts, side) with the right side first on timestamp ties (so
  * a value AT t applies to probes at t — the `>=` convention), and carry
  * the last non-null payload forward with an UNBOUNDED-PRECEDING `last`.
  * Probes before any right row keep NULL payloads (left-join semantics).
  *
  * Scale shape: ONE hash exchange per side on the keys and one
  * sort-within-partitions — O((n+m) log) per partition, versus the naive
  * `l JOIN r ON key AND r.ts <= l.ts` + argmax, whose range condition
  * explodes to O(n·m) pairs per key before the dedup. The forward carry is
  * a running frame (O(1) per row), never an unbounded re-aggregation. A
  * single hot key serializes its group into one task — the same inherent
  * ordered-window property the pattern engine documents; unlike gap-reset
  * pattern state, the carry crosses arbitrary time gaps, so there is no
  * safe finer physical key.
  *
  * Contract: the right side must be unique per (keys, ts) — pre-aggregate
  * it (the catalog query takes `max(value)`); with duplicates the carried
  * row would be partition-order-dependent (DuckDB's ASOF JOIN has the same
  * ambiguity).
  *
  * Output: every left row + `<prefix><payload col>` columns and
  * `<prefix><tsCol>` (the matched right timestamp, for staleness math).
  */
object AsofJoin {

  def asofJoin(left: DataFrame, right: DataFrame, keys: Seq[String],
               tsCol: String, payload: Seq[String],
               prefix: String = "asof_"): DataFrame = {
    require(keys.nonEmpty, "asofJoin needs at least one key column")
    val asofCols = s"$prefix$tsCol" +: payload.map(p => s"$prefix$p")
    val l = left.withColumn("_side", lit(1))
    // The whole right row travels as ONE struct under a single
    // last(ignoreNulls): per-column carries would mix two setpoints when
    // the latest one has a NULL in some payload column (that column would
    // fall back to an older row while asof_<ts> comes from the newer one).
    // The struct itself is never null on a right row, so NULL payload
    // values ride along atomically.
    val r = right.select(
      keys.map(col) ++ Seq(col(tsCol),
        struct(col(tsCol).as(s"$prefix$tsCol") +:
          payload.map(p => col(p).as(s"$prefix$p")): _*).as("_asof")): _*)
      .withColumn("_side", lit(0))
    val u = l.unionByName(r, allowMissingColumns = true)
    val w = Window.partitionBy(keys.map(col): _*)
      .orderBy(col(tsCol), col("_side"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val carried =
      u.withColumn("_asof", last(col("_asof"), ignoreNulls = true).over(w))
    carried.filter(col("_side") === 1)
      .select(left.columns.map(col) ++
        asofCols.map(n => col("_asof").getField(n).as(n)): _*)
  }
}
