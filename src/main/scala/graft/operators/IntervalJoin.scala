package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Interval (range-containment) join: pair each point row with every
  * interval row of the same key whose `[start, end)` contains the point's
  * timestamp — the "which incident window / session / promotion covers this
  * event" join (Flink's interval join; DuckDB/Postgres spell it a `BETWEEN`
  * join). Complements [[AsofJoin]]: as-of picks ONE latest row, interval
  * join keeps EVERY covering window.
  *
  * The relational spelling `p JOIN i ON p.key = i.key AND p.ts >= i.start
  * AND p.ts < i.end` hash-partitions on `key` alone and materializes every
  * same-key (point, interval) pair before the range filter — O(n·m) per key,
  * and a hot key funnels its entire history through one task. This operator
  * instead grids time into `bucketUs`-wide buckets and joins on
  * `(key, bucket)`:
  *
  *  - each POINT belongs to exactly one bucket, so every qualifying pair
  *    is produced exactly once — no post-join dedup;
  *  - each INTERVAL is replicated to the `ceil(len/bucketUs) (+1)` buckets
  *    it overlaps — bounded fan-out when `bucketUs` is chosen near the
  *    typical interval length (p95 duration is the usual pick; fan-out is
  *    then ~2 rows per interval);
  *  - the exchange key `(key, bucket)` carries the time dimension, so one
  *    hot entity spreads across time-slices instead of serializing.
  *
  * Contract: `endCol > startCol` (empty/negative intervals emit nothing),
  * timestamps in microseconds. Point rows matching no interval are dropped
  * (inner semantics); wrap with a left anti/outer union at the call site if
  * unmatched points must survive.
  */
object IntervalJoin {

  /** @param points    point side; `tsUsCol` in epoch micros
    * @param intervals interval side; `[startUsCol, endUsCol)` in epoch micros
    * @param keys      equality key columns present on both sides
    * @param bucketUs  time-grid width; choose near the p95 interval length
    * @param maxBucketsPerInterval fail-fast ceiling on per-interval fan-out:
    *   one interval `maxBucketsPerInterval × bucketUs` longer than the grid
    *   width means the width was chosen against the wrong duration profile,
    *   and the silent alternative is an OOM-sized explode. The error names
    *   the offending span so the caller can re-derive the width (or split
    *   pathological intervals upstream).
    */
  def intervalJoin(points: DataFrame, intervals: DataFrame, keys: Seq[String],
                   tsUsCol: String, startUsCol: String, endUsCol: String,
                   bucketUs: Long, maxBucketsPerInterval: Int = 10000): DataFrame = {
    require(keys.nonEmpty, "intervalJoin needs at least one key column")
    require(bucketUs > 0, s"bucketUs must be positive, got $bucketUs")
    val b = lit(bucketUs)
    val p = points.withColumn("_ib", floor(col(tsUsCol) / b))
    val iv = explodeBuckets(intervals, startUsCol, endUsCol, bucketUs,
      maxBucketsPerInterval, "intervalJoin")
    val joinKeys = keys :+ "_ib"
    p.join(iv, joinKeys)
      .filter(col(tsUsCol) >= col(startUsCol) && col(tsUsCol) < col(endUsCol))
      .drop("_ib")
  }

  /** Replicate each `[start, end)` interval row onto its time-grid buckets
    * as `_ib` (empty/negative intervals emit nothing; fan-out fail-fast
    * bounded). Shared by [[intervalJoin]] and [[overlapJoin]].
    */
  private def explodeBuckets(df: DataFrame, startUsCol: String,
                             endUsCol: String, bucketUs: Long,
                             maxBucketsPerInterval: Int,
                             opName: String): DataFrame = {
    val b = lit(bucketUs)
    val first = floor(col(startUsCol) / b)
    val last = floor((col(endUsCol) - lit(1L)) / b)
    df.filter(col(endUsCol) > col(startUsCol))
      .withColumn("_ib", explode(sequence(first,
        when(last - first < lit(maxBucketsPerInterval.toLong), last)
          .otherwise(raise_error(concat(
            lit(s"$opName: interval spans more than $maxBucketsPerInterval " +
              s"buckets of $bucketUs us (["),
            col(startUsCol), lit(", "), col(endUsCol),
            lit(")) — bucketUs is mis-sized for this duration profile")))))))
  }

  /** Interval-OVERLAP join — the two-sided sibling of [[intervalJoin]]:
    * pair every left interval with every same-key right interval it
    * overlaps (`[aS, aE) ∩ [bS, bE) ≠ ∅  ⇔  aS < bE ∧ bS < aE`; touching
    * endpoints do NOT overlap under half-open semantics) — the
    * session-vs-session / incident-vs-maintenance-window join.
    *
    * Both sides replicate onto the same time grid and join on
    * `(keys, bucket)`. A candidate pair co-occurs in EVERY bucket the two
    * spans share, so the raw join would duplicate it — the standard
    * emit-once guard keeps a pair only in the single bucket containing
    * `max(aS, bS)` (the overlap's left edge, inside both spans by
    * definition): no `distinct`, no post-join dedup shuffle. Column names
    * must be disjoint across the two inputs (beyond `keys`).
    */
  def overlapJoin(left: DataFrame, right: DataFrame, keys: Seq[String],
                  lStartUs: String, lEndUs: String,
                  rStartUs: String, rEndUs: String,
                  bucketUs: Long, maxBucketsPerInterval: Int = 10000): DataFrame = {
    require(keys.nonEmpty, "overlapJoin needs at least one key column")
    require(bucketUs > 0, s"bucketUs must be positive, got $bucketUs")
    val dup = left.columns.toSet.intersect(right.columns.toSet) -- keys
    require(dup.isEmpty,
      s"overlapJoin: rename overlapping non-key columns first: ${dup.mkString(", ")}")
    val a = explodeBuckets(left, lStartUs, lEndUs, bucketUs,
      maxBucketsPerInterval, "overlapJoin")
    val b = explodeBuckets(right, rStartUs, rEndUs, bucketUs,
      maxBucketsPerInterval, "overlapJoin")
    a.join(b, keys :+ "_ib")
      .filter(col(lStartUs) < col(rEndUs) && col(rStartUs) < col(lEndUs))
      .filter(col("_ib") ===
        floor(greatest(col(lStartUs), col(rStartUs)) / lit(bucketUs)))
      .drop("_ib")
  }

  /** [[intervalJoin]] with the grid width derived from the data: one cheap
    * aggregate reads the p95 interval duration and uses it as `bucketUs`
    * (clamped to ≥ 1), so typical intervals replicate to ~2 buckets without
    * the caller profiling durations by hand. Sound because the width is a
    * PHYSICAL knob only — the differential spec proves the result identical
    * across widths — so a planning-time approximation cannot change
    * results, and the p95 read is `percentile_approx` (one narrow pass, no
    * sort). Pathologically long outliers above p95 still hit the
    * fail-fast fan-out ceiling with the named-span error.
    */
  def intervalJoinAuto(points: DataFrame, intervals: DataFrame,
                       keys: Seq[String], tsUsCol: String, startUsCol: String,
                       endUsCol: String,
                       maxBucketsPerInterval: Int = 10000): DataFrame = {
    val r = intervals
      .filter(col(endUsCol) > col(startUsCol))
      .agg(percentile_approx(col(endUsCol) - col(startUsCol), lit(0.95),
        lit(1000)).as("p95"))
      .head()
    // No non-degenerate interval ⇒ percentile_approx is NULL; any width
    // yields the same (empty) join result, so take 1 rather than NPE.
    val p95 = if (r.isNullAt(0)) 1L else r.getLong(0)
    intervalJoin(points, intervals, keys, tsUsCol, startUsCol, endUsCol,
      bucketUs = math.max(1L, p95), maxBucketsPerInterval)
  }
}
