package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Mergeable sketches: KMV (distinct cardinality), Count-Min (frequency),
  * Bloom (membership) — each as an explicit, portable, engine-replayable
  * relation.
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
                  k: Int = 256): DataFrame =
    kmvEstimate(kmvSurvivors(df, groupCols, valueExpr, k), groupCols, k)

  /** The sketch STATE as a relation: per group, the k smallest distinct
    * hashes as (group cols..., hv) rows. This is the artifact to persist
    * for incremental use — parquet-writable, engine-portable, mergeable.
    * Null values are EXCLUDED, matching `count(DISTINCT x)` semantics —
    * and a null hash would also sort NULLS FIRST here vs NULLS LAST in
    * engines replaying the sketch, silently eating a survivor slot.
    */
  def kmvSurvivors(df: DataFrame, groupCols: Seq[String], valueExpr: Column,
                   k: Int = 256): DataFrame = {
    require(k > 1 && k < 32768, s"kmvSurvivors needs 1 < k < 32768, got $k")
    val dist = df.select(groupCols.map(col) :+ hash48(valueExpr).as("hv"): _*)
      .filter(col("hv").isNotNull).distinct()
    graft.plans.GroupTopK.topK(dist, groupCols, Seq("hv" -> true), k)
  }

  /** Fold a new batch into stored survivors — the daily-crawl shape (the
    * [[TextDedup]] index-and-probe stance): hash only the BATCH, union with
    * yesterday's k-row-per-group survivor relation, re-take the k smallest
    * distinct. By the KMV merge property the result equals the sketch of
    * the full history, so estimates never drift under re-ingestion.
    */
  def kmvUpdate(survivors: DataFrame, batch: DataFrame, groupCols: Seq[String],
                valueExpr: Column, k: Int = 256): DataFrame = {
    val fresh = batch.select(groupCols.map(col) :+ hash48(valueExpr).as("hv"): _*)
      .filter(col("hv").isNotNull)
    graft.plans.GroupTopK.topK(
      survivors.select(groupCols.map(col) :+ col("hv"): _*)
        .unionByName(fresh).distinct(),
      groupCols, Seq("hv" -> true), k)
  }

  /** Estimates from a survivor relation (see [[kmvSurvivors]]). */
  def kmvEstimate(survivors: DataFrame, groupCols: Seq[String],
                  k: Int): DataFrame = {
    val g = groupCols.map(col)
    survivors.groupBy(g: _*)
      .agg(count(lit(1)).as("n_kept"), max(col("hv")).as("kth_hv"))
      .withColumn("est_distinct",
        when(col("n_kept") < k, col("n_kept"))
          .otherwise(expr(s"${(k - 1).toLong * (1L << 48)}L div kth_hv")))
  }

  // ------------------------------------------------- Count-Min sketch

  /** Count-Min frequency sketch (Cormode & Muthukrishnan 2005) — the
    * FREQUENCY sibling of the KMV distinct sketch: `depth` independent
    * salted hash rows of `width` counters each; a value's estimate is the
    * MIN of its counters (always ≥ the true count; over by ≤ 2N/width
    * with prob 1 − 2^-depth).
    *
    * Same portable-relation stance as [[kmvSurvivors]]: the sketch IS a
    * (row, bucket, cnt) relation — parquet-persistable, engine-replayable
    * (salted md5-prefix bucket hash), and mergeable by pure addition
    * (counts sum; unlike KMV it is NOT idempotent under re-delivery —
    * counting never is). Exchange is ≤ depth × width counter cells per
    * group of the one map-side-combinable aggregate, regardless of corpus
    * size — the bounded-memory answer when key cardinality makes an exact
    * `groupBy(value)` table unholdable.
    */
  def cmsHash(v: Column, salt: Int, width: Int): Column =
    pmod(conv(substring(md5(concat(lit(s"$salt:"), v.cast("string"))), 1, 12),
      16, 10).cast("long"), lit(width.toLong))

  /** Build the sketch relation: (row, bucket, cnt), depth × width cells
    * max. Null values are excluded (count(value) semantics).
    */
  def cmsSketch(df: DataFrame, valueExpr: Column, depth: Int = 4,
                width: Int = 1024): DataFrame = {
    require(depth >= 1 && depth <= 16, s"need 1 <= depth <= 16, got $depth")
    require(width >= 2 && width <= (1 << 20), s"bad width $width")
    df.select(valueExpr.cast("string").as("_v"))
      .filter(col("_v").isNotNull)
      .select(explode(array((0 until depth).map { d =>
        struct(lit(d).as("row"), cmsHash(col("_v"), d, width).as("bucket"))
      }: _*)).as("_c"))
      .groupBy(col("_c.row").as("row"), col("_c.bucket").as("bucket"))
      .agg(count(lit(1)).as("cnt"))
  }

  /** Merge sketch relations built with the SAME (depth, width, salt
    * family): counts add cell-wise.
    */
  def cmsMerge(a: DataFrame, b: DataFrame): DataFrame =
    a.unionByName(b).groupBy(col("row"), col("bucket"))
      .agg(sum(col("cnt")).as("cnt"))

  // ------------------------------------------------- Bloom filter

  /** Bloom membership filter (Bloom, CACM 1970) — the MEMBERSHIP sibling
    * of KMV (distinct) and CMS (frequency): `nHashes` salted positions in
    * an `nBits` bit array per value; a probe is "maybe present" iff every
    * position is set. Never a false negative; false positives at the
    * classic (1 - e^(-kn/m))^k rate — and DETERMINISTIC here, because the
    * positions come from the same salted md5 family as [[cmsHash]], so an
    * external engine replays even the false positives bit-for-bit.
    *
    * Same portable-relation stance as the other sketches: the filter IS a
    * (word_idx, bits) relation of the NONZERO 64-bit words — parquet-
    * persistable, engine-replayable, mergeable by pure `bit_or` (which is
    * also idempotent: re-adding a value is a no-op, unlike CMS counting).
    * Exchange is ≤ nBits/64 word cells of one map-side-combinable
    * aggregate regardless of corpus size. This is the crawl-pipeline
    * "seen URL" structure: yesterday's filter unions today's batch, and
    * the frontier probe never ships the URL text anywhere — only word
    * indexes and masks.
    */
  def bloomSketch(df: DataFrame, valueExpr: Column, nBits: Int = 1 << 16,
                  nHashes: Int = 4): DataFrame = {
    require(nHashes >= 1 && nHashes <= 16, s"need 1 <= nHashes <= 16, got $nHashes")
    // the filter relation is DISTRIBUTED (<= nBits/64 word rows), so the
    // cap is generous: 2^30 bits = 16M word rows ~ 1% FP at ~10^8 values;
    // the streaming variant keeps a tighter cap (whole filter per group)
    require(nBits >= 64 && nBits <= (1 << 30) && nBits % 64 == 0,
      s"need 64 <= nBits <= 2^30, multiple of 64; got $nBits")
    df.select(valueExpr.cast("string").as("_v"))
      .filter(col("_v").isNotNull)
      .select(explode(array((0 until nHashes).map(d =>
        cmsHash(col("_v"), d, nBits)): _*)).as("_pos"))
      .select(expr("_pos div 64").as("word_idx"),
        expr("shiftleft(1L, cast(_pos % 64 as int))").as("_m"))
      .groupBy(col("word_idx"))
      .agg(bit_or(col("_m")).as("bits"))
  }

  /** Merge filters built with the SAME (nBits, nHashes, salt family):
    * words OR cell-wise. Idempotent — merging a filter with itself (or
    * re-adding any already-present value) changes nothing.
    */
  def bloomMerge(a: DataFrame, b: DataFrame): DataFrame =
    a.unionByName(b).groupBy(col("word_idx"))
      .agg(bit_or(col("bits")).as("bits"))

  /** Membership-probe a (small, broadcastable) relation exposing
    * `valueCol` against a filter relation: `maybe_present` is true iff
    * every one of the value's `nHashes` bits is set (never a false
    * negative; false positives deterministic).
    *
    * The filter relation is compacted (`bit_or` per word) before the
    * probe, so DUPLICATE word rows are harmless — in particular, the raw
    * emission log of [[graft.streaming.StreamingSketch.bloomStream]]
    * (several monotone rows per word) probes correctly as-is; without the
    * compaction a stale row's unset bit would enter the min and
    * false-negative a present value. Multi-GROUP relations must still be
    * filtered to one group first — compaction would OR groups together.
    */
  def bloomProbe(sketch: DataFrame, probes: DataFrame, valueCol: String,
                 nBits: Int = 1 << 16, nHashes: Int = 4): DataFrame = {
    val compact = sketch.groupBy(col("word_idx")).agg(bit_or(col("bits")).as("bits"))
    val cells = probes
      .select(col(valueCol), col(valueCol).cast("string").as("_v"))
      .select(col(valueCol) +: (0 until nHashes).map(d =>
        cmsHash(col("_v"), d, nBits).as(s"_p$d")): _*)
      .select(col(valueCol), explode(array((0 until nHashes).map(d =>
        col(s"_p$d")): _*)).as("_pos"))
      .select(col(valueCol), expr("_pos div 64").as("word_idx"),
        expr("shiftleft(1L, cast(_pos % 64 as int))").as("_m"))
    cells.join(compact, Seq("word_idx"), "left")
      .groupBy(col(valueCol))
      .agg((min(when((coalesce(col("bits"), lit(0L))
          .bitwiseAND(col("_m"))) === col("_m"), 1).otherwise(0)) === 1)
        .as("maybe_present"))
  }

  // ------------------------------------------------- HyperLogLog

  /** HyperLogLog distinct-cardinality sketch (Flajolet, Fusy, Gandouet &
    * Meunier, AofA 2007) — the FIXED-MEMORY sibling of [[kmvSurvivors]]:
    * where KMV keeps k value hashes per group (and doubles as a distinct
    * sample), HLL keeps exactly m = 2^p one-byte registers per group, ever.
    * Register index = top p bits of the 48-bit md5 value hash; register
    * value = max over values of (leading zeros of the remaining (48−p)-bit
    * field + 1).
    *
    * Same portable-relation stance as the other sketches: the sketch IS a
    * (group..., reg, max_rank) relation — parquet-persistable,
    * engine-replayable (the rank is `width+1 − length(bin(remainder))`,
    * identical in Spark and DuckDB), and mergeable by per-register MAX,
    * which is commutative, associative AND idempotent — the Bloom-grade
    * delivery contract (re-adding any value is a no-op; CMS counting is
    * not). Exchange is ≤ groups × m register rows of one map-side-
    * combinable aggregate regardless of corpus size.
    *
    * Standard error ≈ 1.04/√m (p = 8 → ~6.5%); use KMV when a distinct
    * SAMPLE or exact small counts matter, HLL when the fixed m-byte state
    * bound does (billions of groups, or the streaming sibling's per-key
    * state).
    */
  def hllHash(v: Column): Column =
    conv(substring(md5(v.cast("string")), 1, 12), 16, 10).cast("long")

  /** Build the register relation: (group cols..., reg, max_rank), ≤ m rows
    * per group. Null values are excluded (count(DISTINCT x) semantics).
    */
  def hllRegisters(df: DataFrame, groupCols: Seq[String], valueExpr: Column,
                   p: Int = 8): DataFrame = {
    require(p >= 4 && p <= 16, s"need 4 <= p <= 16, got $p")
    val rem = 48 - p // width of the rank field below the register index
    val g = groupCols.map(col)
    df.select(g :+ hllHash(valueExpr).as("_h"): _*)
      .filter(col("_h").isNotNull)
      .select(g :+ expr(s"_h div ${1L << rem}").as("reg")
        :+ (col("_h") % (1L << rem)).as("_r"): _*)
      // rank = leading zeros + 1 in the rem-bit field: bin() renders
      // without leading zeros in both Spark and DuckDB, so the bit length
      // of a nonzero remainder is length(bin(r)); the all-zeros remainder
      // ranks rem+1 (bin(0) = "0" would be off by one — hence the CASE)
      .withColumn("rank",
        when(col("_r") === 0, lit(rem + 1))
          .otherwise(lit(rem + 1) - length(bin(col("_r")))).cast("int"))
      .groupBy(g :+ col("reg"): _*)
      .agg(max(col("rank")).as("max_rank"))
  }

  /** Merge register relations built with the SAME p: per-register MAX.
    * Idempotent — merging a sketch with itself changes nothing.
    */
  def hllMerge(a: DataFrame, b: DataFrame, groupCols: Seq[String]): DataFrame =
    a.unionByName(b)
      .groupBy((groupCols.map(col) :+ col("reg")): _*)
      .agg(max(col("max_rank")).as("max_rank"))

  /** The standard HLL bias constant α_m, in parts-per-million (integer, so
    * the estimate arithmetic stays engine-exact).
    */
  def hllAlphaPpm(m: Int): Long =
    if (m <= 16) 673000L
    else if (m <= 32) 697000L
    else if (m <= 64) 709000L
    else math.floor(721300.0 / (1.0 + 1.079 / m)).toLong

  /** Raw-estimate a register relation (see [[hllRegisters]]): per group,
    * `hll_est = α_m · m² / Σ_j 2^(−M_j)` with empty registers contributing
    * 2^0 — computed ENTIRELY in integers: every 2^(−M_j) term is scaled by
    * 2^(rem+1) (exact — ranks are ≤ rem+1), the sum is an exact BIGINT,
    * and the final division is one truncating integral divide of a
    * DECIMAL(38,0) constant numerator. Bit-stable across engines,
    * partitionings and retries.
    *
    * The input is max-compacted per register first, so the raw emission
    * log of [[graft.streaming.StreamingSketch.hllStream]] (several
    * monotone rows per register) estimates correctly as-is — same stance
    * as [[cmsEstimate]]/[[bloomProbe]]. Output: group cols, `n_regs`
    * (registers hit; m − n_regs is the linear-counting zero count),
    * `sum_scaled`, `hll_est`.
    *
    * This is the RAW estimator (no small-range linear-counting or bias
    * correction) so the arithmetic stays integer-exact; see
    * [[hllCorrected]] for the production estimate.
    */
  def hllEstimate(registers: DataFrame, groupCols: Seq[String],
                  p: Int = 8): DataFrame = {
    require(p >= 4 && p <= 16, s"need 4 <= p <= 16, got $p")
    val m = 1 << p
    val rem = 48 - p
    val g = groupCols.map(col)
    val numerator = (BigInt(hllAlphaPpm(m)) * m * m) << (rem + 1)
    registers
      .groupBy(g :+ col("reg"): _*)
      .agg(max(col("max_rank")).as("max_rank"))
      .groupBy(g: _*)
      .agg(count(lit(1)).as("n_regs"),
        sum(expr(s"shiftleft(1L, ${rem + 1} - max_rank)")).as("_filled"))
      .withColumn("sum_scaled",
        col("_filled") + (lit(m.toLong) - col("n_regs")) * lit(1L << (rem + 1)))
      // the divisor is widened to DECIMAL before the ppm scale-up:
      // sum_scaled can reach m · 2^(rem+1) (≈ 2^50 at p = 8), so
      // 1000000 · sum_scaled overflows BIGINT on both engines
      .withColumn("hll_est",
        expr(s"cast('$numerator' as decimal(38,0)) div " +
          "(1000000 * cast(sum_scaled as decimal(38,0)))"))
      .drop("_filled")
  }

  /** Production estimate on top of [[hllEstimate]]: applies the standard
    * small-range correction — when empty registers exist and the raw
    * estimate is below 2.5·m, linear counting `m · ln(m / zeros)` is the
    * better estimator (Flajolet et al. §4). The correction is a DOUBLE
    * (ln is not engine-exact), which is why it lives outside the
    * hash-verifiable raw relation.
    */
  def hllCorrected(estimates: DataFrame, p: Int = 8): DataFrame = {
    val m = 1 << p
    estimates.withColumn("est_corrected",
      when(col("n_regs") < m && col("hll_est") <= lit(2.5 * m),
        round(lit(m.toDouble) * log(lit(m.toDouble) / (lit(m.toLong) - col("n_regs")))))
        .otherwise(col("hll_est")).cast("long"))
  }

  /** Point-estimate frequencies for a (small, broadcastable) probe
    * relation exposing `valueCol`: min over the depth counters, 0 for a
    * value whose buckets were never touched.
    *
    * The sketch relation is compacted (`max(cnt)` per cell) before the
    * probe: a no-op on a proper sketch (cells unique), and exactly right
    * for the raw emission log of
    * [[graft.streaming.StreamingSketch.cmsStream]] where several MONOTONE
    * rows per cell exist and a stale lower count would otherwise undercut
    * the never-underestimates guarantee. Distinct sketches to be SUMMED
    * must still go through [[cmsMerge]] first — max is not addition.
    */
  def cmsEstimate(sketch: DataFrame, probes: DataFrame, valueCol: String,
                  depth: Int = 4, width: Int = 1024): DataFrame = {
    val compact = sketch.groupBy(col("row"), col("bucket"))
      .agg(max(col("cnt")).as("cnt"))
    val cells = probes
      .select(col(valueCol), col(valueCol).cast("string").as("_v"))
      .select(col(valueCol) +: (0 until depth).map(d =>
        cmsHash(col("_v"), d, width).as(s"_b$d")): _*)
      .select(col(valueCol), explode(array((0 until depth).map { d =>
        struct(lit(d).as("row"), col(s"_b$d").as("bucket"))
      }: _*)).as("_c"))
      .select(col(valueCol), col("_c.row").as("row"),
        col("_c.bucket").as("bucket"))
    cells.join(compact, Seq("row", "bucket"), "left")
      .groupBy(col(valueCol))
      .agg(min(coalesce(col("cnt"), lit(0L))).as("cms_est"))
  }
}
