package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Mergeable cardinality sketches.
  *
  * KMV (k-minimum-values) distinct-count estimation: hash every value to a
  * uniform 48-bit integer, keep only the k smallest distinct hashes per
  * group, and estimate `|distinct| ≈ (k-1) · 2^48 / h_(k)` from the k-th
  * smallest (Bar-Yossef et al., "Counting distinct elements in a data
  * stream", RANDOM 2002). Standard error ~ 1/√k.
  *
  * Why this over Spark's built-in `approx_count_distinct` (HLL++): the
  * sketch state here is an EXPLICIT, portable relation — "the k smallest
  * 48-bit md5 prefixes" — so (a) any engine reproduces it bit-for-bit (the
  * DuckDB oracle replays it exactly; HLL registers are
  * implementation-defined), (b) sketches merge by unioning survivor sets
  * and re-taking the k smallest (used incrementally: yesterday's survivors
  * + today's batch), and (c) the k-th hash doubles as a uniform sample of
  * the distinct population (distinct-value sampling for free).
  *
  * Scale shape: the dedup `groupBy (group, hv)` is map-side combinable on
  * 16-byte keys (never the raw values — `valueExpr` text does not ride the
  * exchange), then the k-smallest selection runs on [[graft.plans.GroupTopK]]
  * — partial bounded heaps, so the second exchange carries ≤ groups × k
  * hashes. Estimation arithmetic is integer-only (`div`), bit-stable across
  * engines: 48-bit hashes keep `(k-1) · 2^48` inside a BIGINT for any
  * k < 32768.
  */
object Sketches {

  /** Uniform 48-bit hash (in `[1, 2^48]`) of a value: first 12 hex chars of
    * md5, +1 so the divisor is never zero. Portable to any SQL engine.
    */
  def hash48(v: Column): Column =
    conv(substring(md5(v.cast("string")), 1, 12), 16, 10).cast("long") + 1

  /** Per-`groupCols` KMV sketch of `count(distinct valueExpr)`.
    *
    * Output: group cols + `n_kept` (survivors, = exact distinct count when
    * below k), `kth_hv` (the k-th smallest hash — the mergeable sketch
    * boundary), `est_distinct` (exact `n_kept` when the group has fewer
    * than k distinct values, else the KMV estimator).
    */
  def kmvDistinct(df: DataFrame, groupCols: Seq[String], valueExpr: Column,
                  k: Int = 256): DataFrame = {
    require(k > 1 && k < 32768, s"kmvDistinct needs 1 < k < 32768, got $k")
    val g = groupCols.map(col)
    // null values are EXCLUDED, matching count(DISTINCT x) semantics —
    // and a null hash would also sort NULLS FIRST here vs NULLS LAST in
    // engines replaying the sketch, silently eating a survivor slot
    val dist = df.select(g :+ hash48(valueExpr).as("hv"): _*)
      .filter(col("hv").isNotNull).distinct()
    val kept = graft.plans.GroupTopK.topK(dist, groupCols, Seq("hv" -> true), k)
    kept.groupBy(g: _*)
      .agg(count(lit(1)).as("n_kept"), max(col("hv")).as("kth_hv"))
      .withColumn("est_distinct",
        when(col("n_kept") < k, col("n_kept"))
          .otherwise(expr(s"${(k - 1).toLong * (1L << 48)}L div kth_hv")))
  }
}
