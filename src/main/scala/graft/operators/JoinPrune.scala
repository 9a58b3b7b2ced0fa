package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Bloom-pruned join: broadcast a Bloom filter of the dimension's join
  * keys and prefilter the fact side BEFORE its shuffle — the classic
  * 100 TB shuffle-reduction when a selective dimension would otherwise
  * make the join exchange carry mostly-unmatched fact rows.
  *
  * Spark's own runtime filter (`spark.sql.optimizer.runtimeFilter.*`,
  * SPARK-32268) injects this automatically in limited shapes — a
  * creation-side filter the optimizer can see, thresholds met, keys
  * directly on the shuffle. This operator is the EXPLICIT form for
  * everything the optimizer can't prove: a dimension produced by an
  * arbitrary pipeline (a dedup survivor set, an eval-contamination id
  * list, a sampled shard), a key wrapped in expressions, or a plan where
  * AQE already committed the join strategy.
  *
  * Correctness: a Bloom filter has NO false negatives, so every matching
  * fact row survives the prefilter; false positives are removed by the
  * real join that follows. Output is therefore provably identical to the
  * plain join for inner and left_semi (the only supported types — outer
  * joins must keep unmatched fact rows, which is exactly what the
  * prefilter removes). Null fact keys are dropped by the prefilter; an
  * inner join drops them anyway.
  *
  * The filter words come to the driver ONCE — bounded by construction at
  * nBits/8 bytes (the [[graft.operators.Clusters]] centroid-budget
  * stance: a capped, counted driver structure, not a data-dependent
  * collect) — and ship to executors as an array literal inside a
  * codegen'd narrow filter: no per-row join, no exchange, `nHashes`
  * native xxhash64 probes per fact row. Unlike the PORTABLE
  * [[Sketches.bloomSketch]] relation (md5-positioned so external engines
  * replay it), this filter is build-and-probe internal to one job, so it
  * uses the fast hash — at 10^8+ fact rows per task the probe IS the
  * operator's cost (measured 2x wall on 6M rows when this was md5:
  * VolumeBench "joins").
  */
object JoinPrune {

  /** Probe/build position d for value `v`: seeded native xxhash64.
    * Type-sensitive — [[bloomPrunedJoin]] casts the dim key to the fact
    * key's type so both sides hash identical bytes.
    */
  private def bloomPos(v: Column, d: Int, nBits: Int): Column =
    pmod(xxhash64(lit(d), v), lit(nBits.toLong))

  /** Densify the dim keys' bloom filter into an index-addressed word
    * array (missing words = 0). Driver memory = nBits/8, capped at 16 MB.
    */
  def bloomWords(dim: DataFrame, dimKey: String, nBits: Int = 1 << 20,
                 nHashes: Int = 4): Array[Long] = {
    require(nBits >= 64 && nBits <= (1 << 27) && nBits % 64 == 0,
      s"need 64 <= nBits <= 2^27 (16 MB driver budget), multiple of 64; got $nBits")
    require(nHashes >= 1 && nHashes <= 16, s"bad nHashes $nHashes")
    val rel = dim.select(col(dimKey).as("_v"))
      .filter(col("_v").isNotNull)
      .select(explode(array((0 until nHashes).map(d =>
        bloomPos(col("_v"), d, nBits)): _*)).as("_pos"))
      .select(expr("_pos div 64").as("word_idx"),
        expr("shiftleft(1L, cast(_pos % 64 as int))").as("_m"))
      .groupBy(col("word_idx"))
      .agg(bit_or(col("_m")).as("bits"))
    val words = new Array[Long](nBits / 64)
    rel.collect().foreach { r =>
      words(r.getAs[Long]("word_idx").toInt) = r.getAs[Long]("bits")
    }
    words
  }

  /** The narrow prefilter: keep fact rows whose key is non-null and hits
    * all `nHashes` bloom positions. Zero exchanges. The explicit
    * `isNotNull` conjunct is load-bearing: `xxhash64` SKIPS null inputs
    * (hashing only the seed literal), so without it a null key would probe
    * the fixed positions of `hash(lit(d))` and could pass whenever those
    * bits happen to be set — the join after [[bloomPrunedJoin]] would drop
    * it anyway, but direct callers of this prefilter get the documented
    * null-free contract.
    */
  def bloomPrefilter(fact: DataFrame, factKey: String, words: Array[Long],
                     nHashes: Int = 4): DataFrame = {
    val nBits = words.length * 64
    val arr = typedLit(words.toSeq)
    // shiftleft needs a literal amount — index a 64-entry power table with
    // the column-valued bit position instead
    val pow2 = typedLit((0 until 64).map(i => 1L << i))
    val pred: Column = (0 until nHashes).map { d =>
      val pos = bloomPos(col(factKey), d, nBits)
      val mask = element_at(pow2, pmod(pos, lit(64L)).cast("int") + 1)
      val word = element_at(arr, floor(pos / lit(64L)).cast("int") + 1)
      word.bitwiseAND(mask) === mask
    }.reduce(_ && _)
    fact.filter(col(factKey).isNotNull && pred)
  }

  /** Prefilter `fact` with a bloom of `dim`'s keys, then join. Output is
    * identical to the plain join (no false negatives; false positives die
    * in the join) — only the shuffle volume changes.
    */
  def bloomPrunedJoin(fact: DataFrame, dim: DataFrame, factKey: String,
                      dimKey: String, nBits: Int = 1 << 20, nHashes: Int = 4,
                      joinType: String = "inner"): DataFrame = {
    val ok = Set("inner", "left_semi", "leftsemi")
    require(ok(joinType.toLowerCase),
      s"bloomPrunedJoin supports ${ok.mkString("/")} (outer joins must keep " +
        s"unmatched fact rows — the prefilter removes them), got $joinType")
    // xxhash64 is type-sensitive: hash the dim keys as the fact key's type
    val keyType = fact.schema(factKey).dataType
    val dimKeys = dim.select(col(dimKey).cast(keyType).as(dimKey))
    val pruned = bloomPrefilter(fact, factKey,
      bloomWords(dimKeys, dimKey, nBits, nHashes), nHashes)
    pruned.join(dim, pruned(factKey) === dim(dimKey), joinType)
  }
}
