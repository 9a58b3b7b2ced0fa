package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Distribution statistics over discrete-valued metrics (lengths, token
  * counts, scores in fixed-point) — the profiling pass a curation funnel
  * runs before choosing filter thresholds ("what IS p99 doc length per
  * language?").
  */
object Stats {

  /** Exact per-group percentiles via a value histogram.
    *
    * The textbook spelling — `percentile_disc` / rank-window over the raw
    * rows — hash-partitions on the group key alone, so every row of a group
    * funnels through ONE task and gets sorted there; with a handful of
    * groups (languages, sources) that is a handful of tasks for the whole
    * corpus. This operator instead:
    *
    *  1. `groupBy (group, value) → count` — map-side combinable, so the
    *     exchange carries at most `groups × distinct values` rows (a value
    *     histogram, corpus-size-invariant for discrete metrics), never the
    *     corpus;
    *  2. one running-sum window over the tiny histogram, then the
    *     `percentile_disc` pick: the smallest value whose cumulative count
    *     reaches `ceil(p·n/100)` — all integer arithmetic
    *     (`(n·p + 99) div 100`), so any engine replays it bit-for-bit.
    *
    * Exactness (not an approximation) holds because counting is lossless;
    * the histogram-size contract is the caller's: value domains that grow
    * with the corpus (raw doubles) should be quantized to fixed-point
    * first, exactly as [[TextAnalysis]]'s integer-ppm scores do.
    *
    * Output: group cols + `n_rows` + one `p<pct>` column per requested
    * percentile (1-based `ceil` convention, matching `percentile_disc`).
    */
  def histogramQuantiles(df: DataFrame, groupCols: Seq[String],
                         valueCol: String, pcts: Seq[Int]): DataFrame = {
    require(pcts.nonEmpty && pcts.forall(p => p >= 1 && p <= 100),
      s"percentiles must be in [1,100], got $pcts")
    val g = groupCols.map(col)
    // null values are excluded, as every SQL percentile aggregate does —
    // a null histogram row would otherwise pollute the cumulative counts
    val hist = df.filter(col(valueCol).isNotNull)
      .groupBy(g :+ col(valueCol): _*).agg(count(lit(1)).as("_cnt"))
    val cum = hist
      .withColumn("_cum", sum(col("_cnt")).over(
        org.apache.spark.sql.expressions.Window
          .partitionBy(g: _*).orderBy(col(valueCol))))
      .withColumn("_n", sum(col("_cnt")).over(
        org.apache.spark.sql.expressions.Window.partitionBy(g: _*)))
    val picks = pcts.map { p =>
      min(when(col("_cum") >= expr(s"(_n * $p + 99) div 100"), col(valueCol)))
        .as(s"p$p")
    }
    cum.groupBy(g: _*).agg(max(col("_n")).as("n_rows"), picks: _*)
  }

  /** The CONTINUOUS-domain quantile rung: [[histogramQuantiles]] is exact
    * but its exchange is bounded by the value domain, so raw-double metrics
    * must be quantized first. This sketch instead bounds the exchange by a
    * SAMPLE budget: per group, keep the k rows whose 48-bit id-hash is
    * smallest ([[Sketches.hash48]] — bottom-k sampling, a uniform
    * without-replacement row sample that is a pure function of the row SET,
    * so it merges like KMV: union survivor relations, re-take the k
    * smallest; see [[quantileUpdate]]). Standard error of a p-quantile is
    * ~ sqrt(p(1-p)/k); groups smaller than k are EXACT (the sample is the
    * whole group).
    *
    * The survivor relation (group cols..., hv, value) is the persistable
    * sketch state — parquet-writable, engine-portable (md5-prefix hash, so
    * an external engine replays the selection bit-for-bit), and the values
    * ride raw: no quantization, no float arithmetic anywhere — selection is
    * by integer hash and the estimator only sorts and counts.
    *
    * Scale shape: one narrow hash projection, then the k-smallest selection
    * on the [[graft.plans.GroupTopK]] bounded heaps — the exchange carries
    * ≤ groups × k (hash, value) pairs regardless of corpus size.
    */
  def quantileSurvivors(df: DataFrame, groupCols: Seq[String], idExpr: Column,
                        valueCol: String, k: Int = 256): DataFrame = {
    require(k > 1 && k < 32768, s"quantileSurvivors needs 1 < k < 32768, got $k")
    val base = df
      .select(groupCols.map(col) ++
        Seq(Sketches.hash48(idExpr).as("hv"), col(valueCol).as("value")): _*)
      // null values excluded like every SQL percentile aggregate
      .filter(col("value").isNotNull)
    // NO defensive distinct here: ids are row-unique by contract, and a
    // pre-selection distinct would hash-exchange the whole corpus —
    // exactly the shape this sketch exists to avoid. GroupTopK's partial
    // heaps bound the one exchange to partitions × groups × k.
    // (quantileUpdate keeps its distinct: re-delivered batches DO repeat
    // rows there, and its input is already survivor-bounded.)
    graft.plans.GroupTopK.topK(base, groupCols,
      Seq("hv" -> true, "value" -> true), k)
  }

  /** Fold a new batch into stored survivors — same merge law as
    * [[Sketches.kmvUpdate]]: bottom-k by hash of the union equals the
    * bottom-k of the full history, so quantile estimates never drift under
    * incremental re-ingestion.
    */
  def quantileUpdate(survivors: DataFrame, batch: DataFrame,
                     groupCols: Seq[String], idExpr: Column, valueCol: String,
                     k: Int = 256): DataFrame = {
    val fresh = batch
      .select(groupCols.map(col) ++
        Seq(Sketches.hash48(idExpr).as("hv"), col(valueCol).as("value")): _*)
      .filter(col("value").isNotNull)
    graft.plans.GroupTopK.topK(
      survivors.select(groupCols.map(col) ++ Seq(col("hv"), col("value")): _*)
        .unionByName(fresh).distinct(),
      groupCols, Seq("hv" -> true, "value" -> true), k)
  }

  /** Per-group percentile ESTIMATES from the bottom-k sample: the empirical
    * quantile of the survivor values, computed by [[histogramQuantiles]]
    * over the (tiny) survivor relation — same 1-based ceil-rank convention,
    * so the whole sketch replays in external SQL. Output: group cols +
    * `n_sample` + one `p<pct>` column per requested percentile.
    */
  def sampleQuantiles(df: DataFrame, groupCols: Seq[String], idExpr: Column,
                      valueCol: String, pcts: Seq[Int],
                      k: Int = 256): DataFrame =
    histogramQuantiles(quantileSurvivors(df, groupCols, idExpr, valueCol, k),
      groupCols, "value", pcts)
      .withColumnRenamed("n_rows", "n_sample")

  /** One-sided CUSUM drift statistic per key — the classic "has this unit's
    * level shifted upward" changepoint detector (Page 1954):
    * `s_i = max(0, s_{i-1} + x_i - slack)`, alarm when `s_i` exceeds a
    * threshold.
    *
    * The recursion has a closed form that two ORDERED-WINDOW passes compute
    * without any per-row state machine: with `p_i = Σ_{j<=i} (x_j - slack)`,
    * `s_i = p_i - min(0, min_{j<=i} p_j)` — a running sum and a running min,
    * both O(1)-per-row frames over ONE (key) exchange + sort (the two
    * windows share partitioning and ordering, so Catalyst plans a single
    * Window pipeline; the same shape the pattern engine's stages pin in
    * PlanSpec). Integer inputs make it bit-stable across engines — quantize
    * doubles with `floor(x * scale)` first.
    *
    * Appends `cusum` (the statistic, ≥ 0) to every input row; threshold
    * filtering is the caller's (keeps the operator composable — alarm
    * runs, first-crossing extraction, and hysteresis are all downstream
    * one-liners).
    */
  def cusum(df: DataFrame, keyCols: Seq[String], orderCols: Seq[String],
            x: Column, slack: Long): DataFrame = {
    require(keyCols.nonEmpty && orderCols.nonEmpty,
      "cusum needs key and order columns")
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(keyCols.map(col): _*)
      .orderBy(orderCols.map(col): _*)
      .rowsBetween(org.apache.spark.sql.expressions.Window.unboundedPreceding,
        org.apache.spark.sql.expressions.Window.currentRow)
    df.withColumn("_p", sum(x - lit(slack)).over(w))
      .withColumn("cusum", col("_p") - least(lit(0L), min(col("_p")).over(w)))
      .drop("_p")
  }

  /** Per-key integer fixed-point EWMA level + prior-residual — the
    * LEVEL-tracking sibling of [[cusum]]: cusum detects a sustained small
    * drift, the EWMA residual scores each observation's instantaneous
    * deviation from the smoothed local level (the classic telemetry
    * anomaly signal; thresholding stays downstream, like cusum's).
    *
    * α = 2^−k. The caller quantizes the metric to a BIGINT (`floor(x ·
    * scale)` — the house fixed-point stance); the level carries k extra
    * fractional bits and the recurrence runs in integers:
    *
    *   level_0 = v_0 · 2^k
    *   level_i = level_{i−1} + ((v_i · 2^k − level_{i−1}) >> k)
    *
    * `>>` is the ARITHMETIC shift — floor division by 2^k, identical on
    * the JVM and every SQL engine with an arithmetic `>>` (this is spelled
    * with shifts deliberately: DuckDB's `//` floors where Spark's `div`
    * truncates, so a negative delta would diverge under division, while
    * `-17 >> 3 == -3` on both). The k fractional bits keep the level
    * moving when |v − level| < 2^k (a v-granularity level would starve).
    * Every quantity is an exact integer, so any engine replays the
    * sequence bit-for-bit; headroom: |x| · scale · 2^k must stay below
    * 2^62.
    *
    * `resid_i = v_i − (level_{i−1} >> k)` — the deviation from the level
    * BEFORE the observation folds in, so a jump scores at full size on
    * its first row (resid_0 = 0: no prior level exists).
    *
    * Unlike [[cusum]]'s closed form, the EWMA recurrence has no exact
    * integer window spelling (geometric decay needs pow), so this is a
    * per-key sequential machine: ONE hash exchange on the keys + the
    * in-partition sort, O(1) state per key, rows stream through — the
    * same cost shape as any keyed aggregation at 100 TB. Output: the
    * input columns + `level_q` (the smoothed level in v units, post-
    * update) + `resid`.
    *
    * `vCol` must already be a BIGINT column of `df`; `orderCols` must be a
    * deterministic total order per key (event-time + a tiebreak id). Rows
    * with a NULL metric are EXCLUDED — a null carries no observation, so
    * it neither moves the level nor earns a smoothed row (the
    * count-semantics stance of the sketch family).
    */
  def ewma(df: DataFrame, keyCols: Seq[String], orderCols: Seq[String],
           vCol: String, k: Int = 3): DataFrame = {
    require(k >= 1 && k <= 16, s"need 1 <= k <= 16, got $k")
    require(keyCols.nonEmpty && orderCols.nonEmpty,
      "ewma needs key and order columns")
    val cols = df.columns.toSeq
    val nk = keyCols.length
    val vIx = cols.length // v re-selected last so the machine reads one slot
    val src = df
      .filter(col(vCol).isNotNull)
      .select((keyCols ++ cols.filterNot(keyCols.contains)).map(col) :+
        col(vCol).as("_v"): _*)
      .repartition(keyCols.map(col): _*)
      .sortWithinPartitions((keyCols ++ orderCols).map(col): _*)
    val outSchema = org.apache.spark.sql.types.StructType(
      src.schema.fields.dropRight(1) ++ Seq(
        org.apache.spark.sql.types.StructField("level_q",
          org.apache.spark.sql.types.LongType, nullable = false),
        org.apache.spark.sql.types.StructField("resid",
          org.apache.spark.sql.types.LongType, nullable = false)))
    src.mapPartitions { it =>
      var curKey: IndexedSeq[Any] = null
      var level = 0L
      var first = true
      it.map { r =>
        val key: IndexedSeq[Any] = (0 until nk).map(r.get)
        if (key != curKey) { curKey = key; first = true }
        val v = r.getLong(vIx)
        val resid = if (first) 0L else v - (level >> k)
        level = if (first) { first = false; v << k }
          else level + (((v << k) - level) >> k)
        org.apache.spark.sql.Row.fromSeq(
          r.toSeq.dropRight(1) ++ Seq(level >> k, resid))
      }
    }(org.apache.spark.sql.Encoders.row(outSchema))
  }

  /** Per-key median + MAD (median absolute deviation) with an outlier
    * count — the ROBUST member of the drift/anomaly family: where
    * [[ewma]]'s residual and [[trend]]'s slope are moment-based (one wild
    * value drags them), the median/MAD pair has a 50% breakdown point, so
    * thresholds derived from it survive the heavy-tailed metrics a real
    * telemetry corpus ships.
    *
    * All arithmetic is integer-exact on the quantized metric: med and mad
    * are [[histogramQuantiles]] p50 picks (percentile_disc convention —
    * the smallest value whose cumulative count reaches ceil(n/2)), and a
    * row flags as an outlier when `|v − med| > k·mad` (integer compare;
    * the classic k ≈ 5 stands in for 3σ at Gaussian efficiency). A
    * zero-MAD key (over half its values identical) flags every deviating
    * row — the conventional MAD edge, left undamped deliberately: damping
    * belongs to the caller's threshold policy.
    *
    * Scale shape: two histogram exchanges (each carries (key, value)
    * COUNTS — bounded by the value domain, never the corpus), one key
    * join of the per-key medians back onto the rows, one final count
    * aggregation. No window over raw rows, no sort of the corpus.
    */
  def mad(df: DataFrame, keyCols: Seq[String], vCol: String,
          k: Int = 5): DataFrame = {
    require(keyCols.nonEmpty, "mad needs key columns")
    require(k >= 1, s"k must be >= 1, got $k")
    val rows = df.select(keyCols.map(col) :+ col(vCol): _*)
      .filter(col(vCol).isNotNull)
    val med = histogramQuantiles(rows, keyCols, vCol, Seq(50))
      .select(keyCols.map(col) :+ col("p50").as("_med"): _*)
    val dev = rows.join(med, keyCols)
      .withColumn("_dev", abs(col(vCol) - col("_med")))
    val madQ = histogramQuantiles(dev, keyCols, "_dev", Seq(50))
      .select(keyCols.map(col) ++ Seq(col("n_rows").as("n"),
        col("p50").as("mad_q")): _*)
    dev.join(madQ, keyCols)
      .groupBy(keyCols.map(col) :+ col("n"): _*)
      .agg(max(col("_med")).as("med_q"), max(col("mad_q")).as("mad_q"),
        count(when(col("_dev") > col("mad_q") * k, lit(1))).as("n_flagged"))
      .select(keyCols.map(col) ++
        Seq(col("n"), col("med_q"), col("mad_q"), col("n_flagged")): _*)
  }

  /** Per-key OLS trend: the integer-exact least-squares slope of the
    * quantized metric against event time — the third drift signal beside
    * [[cusum]] (sustained small shift) and [[ewma]] (instantaneous
    * deviation): cusum says "the mean moved", trend says how fast and
    * which way, per key, in one aggregation pass.
    *
    * x = (t − min(t) over the key) div `xUnitUs` — rebasing per key keeps
    * x and all four moment sums exact BIGINTs for any realistic series
    * (x ≤ span/unit; Σx² ≤ n·x² must stay below 2^63 — a 30-day span in
    * minutes gives x ≤ 43 200, headroom to ~10^9 rows per key). The
    * closed form slope = (n·Σxy − Σx·Σy) / (n·Σxx − Σx²) is combined in
    * DECIMAL(38,0) — n·Σxy alone can pass 2^63 — and scaled by 10^6 with
    * truncation toward zero (Spark's decimal `div`; a floor-division
    * engine like DuckDB replays it exactly by sign-splitting), so
    * `slope_ppm` (y-units per x-unit, ×10^6) is a portable integer.
    * Degenerate keys (one observation, or all observations in one x
    * bucket) have zero x-variance → NULL slope.
    *
    * Scale shape: one hash exchange on the keys — the per-key min is a
    * partitionBy-only window and the groupBy's partial aggregation reuses
    * its distribution (single-Exchange plan pinned in StatsSpec) — with
    * O(1) aggregation state per key. Null metric or time rows are
    * excluded (the [[ewma]] count-semantics stance).
    */
  def trend(df: DataFrame, keyCols: Seq[String], tsUsCol: String,
            vCol: String, xUnitUs: Long = 60000000L): DataFrame = {
    require(keyCols.nonEmpty, "trend needs key columns")
    require(xUnitUs >= 1L, s"xUnitUs must be >= 1, got $xUnitUs")
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(keyCols.map(col): _*)
    val staged = df
      .filter(col(vCol).isNotNull && col(tsUsCol).isNotNull)
      .withColumn("_t0", min(col(tsUsCol)).over(w))
      .withColumn("_x", expr(s"(`$tsUsCol` - _t0) div $xUnitUs"))
    staged.groupBy(keyCols.map(col): _*)
      .agg(count(lit(1)).as("n"),
        sum(col("_x")).as("sx"),
        sum(col(vCol)).as("sy"),
        sum(col("_x") * col(vCol)).as("sxy"),
        sum(col("_x") * col("_x")).as("sxx"))
      .withColumn("slope_ppm", expr(
        """CASE WHEN CAST(n AS DECIMAL(38,0)) * sxx
          |       - CAST(sx AS DECIMAL(38,0)) * sx = 0
          |  THEN CAST(NULL AS BIGINT)
          |  ELSE (CAST(n AS DECIMAL(38,0)) * sxy
          |        - CAST(sx AS DECIMAL(38,0)) * sy) * 1000000
          |    div (CAST(n AS DECIMAL(38,0)) * sxx
          |        - CAST(sx AS DECIMAL(38,0)) * sx)
          |END""".stripMargin))
  }
}
