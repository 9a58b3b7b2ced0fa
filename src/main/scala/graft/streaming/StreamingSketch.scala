package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset, Encoder, Encoders}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** Streaming KMV distinct-count — the continuous counterpart of
  * [[graft.operators.Sketches.kmvDistinct]]: per group, keyed state holds
  * only the k smallest distinct 48-bit value hashes ever seen, and each
  * micro-batch emits the refreshed estimate for groups it touched (update
  * semantics).
  *
  * This is exactly the KMV merge property run incrementally: state ∪ batch
  * hashes → k smallest distinct. Because the survivor set is a pure
  * function of the SET of values seen, the stream result after any prefix
  * equals the batch sketch over that prefix — regardless of batching,
  * arrival order, or re-delivery of duplicates (idempotent by
  * construction). State is k longs per group — bounded by group
  * cardinality, never by stream length or value cardinality.
  *
  * The hash is computed with the same md5-prefix column expression as the
  * batch operator BEFORE `groupByKey`, so the raw value string never
  * enters state or the shuffle.
  */
object StreamingSketch {

  case class HashedValue(group: String, hv: Long)

  case class KmvState(hashes: Array[Long]) // sorted ascending, length <= k

  case class KmvEstimate(group: String, n_kept: Long, kth_hv: Long,
                         est_distinct: Long)

  private def emit(k: Int, group: String, sorted: Array[Long]): KmvEstimate = {
    val n = sorted.length.toLong
    val kth = sorted.last
    val est = if (n < k) n else ((k - 1).toLong * (1L << 48)) / kth
    KmvEstimate(group, n, kth, est)
  }

  private def processGroup(k: Int)(
      group: String, rows: Iterator[HashedValue],
      state: GroupState[KmvState]): Iterator[KmvEstimate] = {
    val prev = state.getOption.map(_.hashes).getOrElse(Array.empty[Long])
    // bounded k-element admission over the iterator — O(n log k) time,
    // O(k) memory: a hot group delivering millions of rows in one
    // micro-batch must not be buffered, distinct'ed, and fully sorted in
    // the single task that owns it (the same reason the batch operator
    // selects on GroupTopK's bounded heaps)
    val set = new java.util.TreeSet[java.lang.Long]()
    prev.foreach(h => set.add(h))
    rows.foreach { r =>
      if (set.size < k) set.add(r.hv)
      else if (r.hv < set.last && set.add(r.hv)) set.pollLast()
    }
    if (set.isEmpty) return Iterator.empty
    val merged = new Array[Long](set.size)
    val it = set.iterator()
    var i = 0
    while (it.hasNext) { merged(i) = it.next(); i += 1 }
    if (!java.util.Arrays.equals(prev, merged)) state.update(KmvState(merged))
    Iterator.single(emit(k, group, merged))
  }

  // ------------------------------------------------- Count-Min stream

  /** Wire row for the CMS stream: one (row, bucket) cell hit per depth
    * row per value — the same salted md5 bucket expression as the batch
    * sketch, computed BEFORE groupByKey so the raw value never enters
    * state or the shuffle.
    */
  case class CellHit(group: String, cell: Long)

  /** Touched cells as parallel arrays sorted by cell id (= row * width +
    * bucket); counts only ever grow. Bounded by depth x width per group.
    */
  case class CmsState(cells: Array[Long], cnts: Array[Long])

  case class CmsCell(group: String, row: Int, bucket: Long, cnt: Long)

  /** Linear merge of a SORTED (key, value) delta into sorted parallel
    * state arrays — O(state + delta) with flat allocation, instead of
    * rebuilding a TreeMap of the whole sketch per micro-batch (at the
    * permitted maxima the state holds millions of cells; the delta is
    * usually tiny). `combine` folds a delta into an existing value
    * (addition for CMS, OR for Bloom); absent keys take the delta as-is.
    */
  private def mergeSorted(keys: Array[Long], vals: Array[Long],
                          delta: Array[(Long, Long)],
                          combine: (Long, Long) => Long): (Array[Long], Array[Long]) = {
    val outK = new Array[Long](keys.length + delta.length)
    val outV = new Array[Long](keys.length + delta.length)
    var i = 0; var j = 0; var n = 0
    while (i < keys.length || j < delta.length) {
      if (j >= delta.length || (i < keys.length && keys(i) < delta(j)._1)) {
        outK(n) = keys(i); outV(n) = vals(i); i += 1
      } else if (i >= keys.length || delta(j)._1 < keys(i)) {
        outK(n) = delta(j)._1; outV(n) = delta(j)._2; j += 1
      } else {
        outK(n) = keys(i); outV(n) = combine(vals(i), delta(j)._2); i += 1; j += 1
      }
      n += 1
    }
    (outK.take(n), outV.take(n))
  }

  private def processCms(width: Int)(
      group: String, rows: Iterator[CellHit],
      state: GroupState[CmsState]): Iterator[CmsCell] = {
    val prev = state.getOption.getOrElse(CmsState(Array.empty, Array.empty))
    val incr = new scala.collection.mutable.HashMap[Long, Long]()
    rows.foreach(h => incr.update(h.cell, incr.getOrElse(h.cell, 0L) + 1L))
    if (incr.isEmpty) return Iterator.empty
    val delta = incr.toArray.sortBy(_._1)
    val (cells, cnts) = mergeSorted(prev.cells, prev.cnts, delta, _ + _)
    state.update(CmsState(cells, cnts))
    // emit only the cells this batch touched, with their REFRESHED totals:
    // counts are monotone, so the latest (max) emission per cell IS the
    // current sketch — no downstream merge pass needed
    delta.iterator.map { case (c, _) =>
      val ix = java.util.Arrays.binarySearch(cells, c)
      CmsCell(group, (c / width).toInt, c % width, cnts(ix))
    }
  }

  /** Streaming Count-Min sketch — the continuous counterpart of
    * [[graft.operators.Sketches.cmsSketch]]: per group, keyed state holds
    * the touched counter cells (≤ depth × width longs — the easiest state
    * shape of the streaming family), and each micro-batch emits the
    * refreshed (row, bucket, cnt) cells it touched (update semantics).
    *
    * Counting is additive, NOT idempotent (re-delivery counts again —
    * same caveat as the batch sketch's merge), but it IS order- and
    * batching-independent: the stream state after any prefix equals the
    * batch `cmsSketch` over that prefix under any chunking or disorder.
    * Because counts only grow, the last emission per (group, row, bucket)
    * is the current sketch relation — parquet the emission log, filter to
    * a group, and `cmsEstimate` replays point queries against it directly
    * (the probe max-compacts stale lower rows away itself).
    *
    * `df` must expose a string `group` column and a `value` column.
    */
  def cmsStream(df: DataFrame, depth: Int = 4, width: Int = 1024): Dataset[CmsCell] = {
    require(depth >= 1 && depth <= 16, s"need 1 <= depth <= 16, got $depth")
    require(width >= 2 && width <= (1 << 20), s"bad width $width")
    import df.sparkSession.implicits._
    implicit val stateEnc: Encoder[CmsState] = Encoders.product[CmsState]
    df.select(col("group").cast("string").as("group"),
        col("value").cast("string").as("_v"))
      .filter(col("_v").isNotNull)
      .select(col("group"), explode(array((0 until depth).map { d =>
        (lit(d.toLong) * width +
          graft.operators.Sketches.cmsHash(col("_v"), d, width)).as(s"_c$d")
      }: _*)).as("cell"))
      .as[CellHit]
      .groupByKey(_.group)
      .flatMapGroupsWithState(OutputMode.Update,
        GroupStateTimeout.NoTimeout)(processCms(width))
  }

  // ------------------------------------------------- Bloom stream

  /** One (word_idx, mask) bit hit per hash per value. */
  case class BitHit(group: String, word: Long, mask: Long)

  /** Touched words as parallel arrays sorted by word index; bits only
    * ever gain (OR). Bounded by nBits/64 longs per group.
    */
  case class BloomState(words: Array[Long], bits: Array[Long])

  case class BloomWord(group: String, word_idx: Long, bits: Long)

  private def processBloom(
      group: String, rows: Iterator[BitHit],
      state: GroupState[BloomState]): Iterator[BloomWord] = {
    val incr = new scala.collection.mutable.HashMap[Long, Long]()
    rows.foreach(h => incr.update(h.word, incr.getOrElse(h.word, 0L) | h.mask))
    if (incr.isEmpty) return Iterator.empty
    val prev = state.getOption.getOrElse(BloomState(Array.empty, Array.empty))
    // only words whose bits actually CHANGE are re-emitted: OR is
    // idempotent, so a pure re-delivery emits nothing and state is
    // untouched (no state-store write either)
    val changed = incr.toArray.sortBy(_._1).filter { case (w, m) =>
      val ix = java.util.Arrays.binarySearch(prev.words, w)
      ix < 0 || (prev.bits(ix) | m) != prev.bits(ix)
    }
    if (changed.isEmpty) return Iterator.empty
    val (words, bits) = mergeSorted(prev.words, prev.bits, changed, _ | _)
    state.update(BloomState(words, bits))
    changed.iterator.map { case (w, _) =>
      val ix = java.util.Arrays.binarySearch(words, w)
      BloomWord(group, w, bits(ix))
    }
  }

  /** Streaming Bloom filter — the continuous counterpart of
    * [[graft.operators.Sketches.bloomSketch]]: per group, keyed state
    * holds the touched 64-bit words (≤ nBits/64 longs), and each
    * micro-batch emits the words it CHANGED (update semantics; bits only
    * gain, so the latest emission per (group, word_idx) IS the filter —
    * parquet the emission log, filter to a group, and `bloomProbe`
    * replays against it directly, OR-compacting stale rows away itself).
    * OR is commutative AND
    * idempotent, so stream == batch under any chunking, disorder, or
    * duplicate re-delivery — the strongest delivery contract of the
    * sketch family. The continuous crawl "seen URL" gate: each arriving
    * batch both extends the filter and can be probed against the state
    * built so far.
    */
  def bloomStream(df: DataFrame, nBits: Int = 1 << 16,
                  nHashes: Int = 4): Dataset[BloomWord] = {
    require(nHashes >= 1 && nHashes <= 16, s"need 1 <= nHashes <= 16, got $nHashes")
    require(nBits >= 64 && nBits <= (1 << 26) && nBits % 64 == 0,
      s"need 64 <= nBits <= 2^26, multiple of 64; got $nBits")
    import df.sparkSession.implicits._
    implicit val stateEnc: Encoder[BloomState] = Encoders.product[BloomState]
    df.select(col("group").cast("string").as("group"),
        col("value").cast("string").as("_v"))
      .filter(col("_v").isNotNull)
      .select(col("group"), explode(array((0 until nHashes).map { d =>
        graft.operators.Sketches.cmsHash(col("_v"), d, nBits).as(s"_p$d")
      }: _*)).as("_pos"))
      .select(col("group"), expr("_pos div 64").as("word"),
        expr("shiftleft(1L, cast(_pos % 64 as int))").as("mask"))
      .as[BitHit]
      .groupByKey(_.group)
      .flatMapGroupsWithState(OutputMode.Update,
        GroupStateTimeout.NoTimeout)(processBloom)
  }

  // ------------------------------------------------- HyperLogLog stream

  /** One (register, rank) observation per value. */
  case class RegHit(group: String, reg: Long, rank: Long)

  /** Touched registers as parallel arrays sorted by register index; ranks
    * only ever grow (MAX). Bounded by m = 2^p longs per group — the
    * tightest state bound of the streaming sketch family (256 registers
    * at the default p = 8).
    */
  case class HllState(regs: Array[Long], ranks: Array[Long])

  case class HllRegister(group: String, reg: Long, max_rank: Long)

  private def processHll(
      group: String, rows: Iterator[RegHit],
      state: GroupState[HllState]): Iterator[HllRegister] = {
    val incr = new scala.collection.mutable.HashMap[Long, Long]()
    rows.foreach(h => incr.update(h.reg, math.max(incr.getOrElse(h.reg, 0L), h.rank)))
    if (incr.isEmpty) return Iterator.empty
    val prev = state.getOption.getOrElse(HllState(Array.empty, Array.empty))
    // only registers whose rank actually GROWS re-emit: max is idempotent,
    // so a pure re-delivery emits nothing and writes no state (the
    // bloomStream contract)
    val changed = incr.toArray.sortBy(_._1).filter { case (r, k) =>
      val ix = java.util.Arrays.binarySearch(prev.regs, r)
      ix < 0 || k > prev.ranks(ix)
    }
    if (changed.isEmpty) return Iterator.empty
    val (regs, ranks) = mergeSorted(prev.regs, prev.ranks, changed, math.max)
    state.update(HllState(regs, ranks))
    changed.iterator.map { case (r, _) =>
      val ix = java.util.Arrays.binarySearch(regs, r)
      HllRegister(group, r, ranks(ix))
    }
  }

  /** Streaming HyperLogLog — the continuous counterpart of
    * [[graft.operators.Sketches.hllRegisters]]: per group, keyed state
    * holds the touched registers (≤ 2^p longs — FIXED, unlike the KMV
    * stream's k-hash state this never depends on a tuning knob vs value
    * distribution trade), and each micro-batch emits the registers whose
    * rank GREW (update semantics; ranks are monotone, so the latest
    * emission per (group, reg) IS the sketch — parquet the emission log
    * and `hllEstimate` replays against it directly, max-compacting stale
    * rows away itself). MAX is commutative and idempotent, so stream ==
    * batch under any chunking, disorder, or duplicate re-delivery — the
    * same delivery contract as [[bloomStream]].
    *
    * `df` must expose a string `group` column and a `value` column.
    */
  def hllStream(df: DataFrame, p: Int = 8): Dataset[HllRegister] = {
    require(p >= 4 && p <= 16, s"need 4 <= p <= 16, got $p")
    val rem = 48 - p
    import df.sparkSession.implicits._
    implicit val stateEnc: Encoder[HllState] = Encoders.product[HllState]
    df.select(col("group").cast("string").as("group"),
        graft.operators.Sketches.hllHash(col("value")).as("_h"))
      .filter(col("_h").isNotNull)
      .select(col("group"), expr(s"_h div ${1L << rem}").as("reg"),
        (col("_h") % (1L << rem)).as("_r"))
      .select(col("group"), col("reg"),
        when(col("_r") === 0, lit((rem + 1).toLong))
          .otherwise(lit((rem + 1).toLong) - length(bin(col("_r")))).as("rank"))
      .as[RegHit]
      .groupByKey(_.group)
      .flatMapGroupsWithState(OutputMode.Update,
        GroupStateTimeout.NoTimeout)(processHll)
  }

  /** `df` must expose a string `group` column and a `value` column; emits
    * one refreshed [[KmvEstimate]] per touched group per micro-batch.
    */
  def kmvDistinctStream(df: DataFrame, k: Int = 256): Dataset[KmvEstimate] = {
    require(k > 1 && k < 32768, s"kmvDistinctStream needs 1 < k < 32768, got $k")
    import df.sparkSession.implicits._
    implicit val stateEnc: Encoder[KmvState] = Encoders.product[KmvState]
    df.select(col("group").cast("string").as("group"),
        graft.operators.Sketches.hash48(col("value")).as("hv"))
      // null values are excluded (count(DISTINCT) semantics — and a null
      // hv would fail the non-nullable Long decode below)
      .filter(col("hv").isNotNull)
      .as[HashedValue]
      .groupByKey(_.group)
      .flatMapGroupsWithState(OutputMode.Update,
        GroupStateTimeout.NoTimeout)(processGroup(k))
  }
}
