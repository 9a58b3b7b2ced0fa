package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset, Encoder, Encoders}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** Streaming per-domain quota cap — the continuous counterpart of
  * [[graft.operators.Sampling.domainCap]]: as documents arrive, keyed
  * state holds each domain's current survivor set (the `maxPerDomain`
  * docs with the smallest seeded md5 id-hashes ever seen), and each
  * micro-batch emits the refreshed survivor list of domains whose set
  * CHANGED (update semantics — the latest emission per domain IS the
  * capped selection).
  *
  * The survivor set is "k smallest (hash, id)" — a pure function of the
  * document SET seen, like the KMV survivors — so the stream result
  * after any prefix equals the batch [[graft.operators.Sampling.domainCap]]
  * over that prefix under ANY delivery order, batching, or duplicate
  * re-delivery (idempotent: a replayed doc re-derives the same hash and
  * changes nothing). The same `urlDomain`/`capHash` expressions run
  * BEFORE `groupByKey`, so document text/urls never enter state — state
  * is ≤ cap (32-char md5 hex, id) pairs per domain.
  *
  * A continuous crawl pairs this with [[StreamingSketch.bloomStream]]:
  * the bloom filter gates already-seen URLs, the cap keeps any one host
  * from flooding the corpus, both as incremental state.
  */
object StreamingSample {

  case class DomainDoc(domain: String, hv: String, docId: Long)

  /** Parallel arrays sorted by (hv, docId) ascending, length <= cap. */
  case class CapState(hvs: Array[String], ids: Array[Long])

  case class Survivor(domain: String, rank: Int, doc_id: Long)

  private def processDomain(cap: Int)(
      domain: String, rows: Iterator[DomainDoc],
      state: GroupState[CapState]): Iterator[Survivor] = {
    val prev = state.getOption.getOrElse(CapState(Array.empty, Array.empty))
    // bounded admission, the StreamingSketch KMV stance: O(n log cap)
    // over the micro-batch, never a buffer+sort of a hot domain's batch
    val set = new java.util.TreeSet[(String, Long)](
      Ordering.Tuple2[String, Long])
    // bound the seed at cap: a checkpoint written with a LARGER cap
    // truncates to the best cap entries (arrays are sorted) instead of
    // keeping an oversized survivor set alive forever
    var i = 0
    val lim = math.min(prev.hvs.length, cap)
    while (i < lim) { set.add((prev.hvs(i), prev.ids(i))); i += 1 }
    rows.foreach { r =>
      val e = (r.hv, r.docId)
      if (set.size < cap) set.add(e)
      else if (Ordering.Tuple2[String, Long].lt(e, set.last) && set.add(e))
        set.pollLast()
    }
    if (set.isEmpty) return Iterator.empty
    val hvs = new Array[String](set.size)
    val ids = new Array[Long](set.size)
    val it = set.iterator()
    var n = 0
    while (it.hasNext) { val (h, d) = it.next(); hvs(n) = h; ids(n) = d; n += 1 }
    if (java.util.Arrays.equals(prev.ids, ids) &&
        hvs.sameElements(prev.hvs)) return Iterator.empty // unchanged: no emit
    state.update(CapState(hvs, ids))
    ids.iterator.zipWithIndex.map { case (d, r) => Survivor(domain, r + 1, d) }
  }

  /** `docs` must expose `idCol` (row-unique long) and `urlCol`; emits the
    * refreshed ranked survivor list of every CHANGED domain per
    * micro-batch. Same seed and cap => bit-identical survivors to the
    * batch operator over any prefix.
    */
  def domainCapStream(docs: DataFrame, idCol: String, urlCol: String,
                      maxPerDomain: Int, seed: String = "cap0"): Dataset[Survivor] = {
    require(maxPerDomain > 0, s"need maxPerDomain > 0, got $maxPerDomain")
    import docs.sparkSession.implicits._
    implicit val stateEnc: Encoder[CapState] = Encoders.product[CapState]
    docs.select(
        graft.operators.Sampling.urlDomain(col(urlCol)).as("domain"),
        graft.operators.Sampling.capHash(col(idCol), seed).as("hv"),
        col(idCol).cast("long").as("docId"))
      .as[DomainDoc]
      .groupByKey(_.domain)
      .flatMapGroupsWithState(OutputMode.Update,
        GroupStateTimeout.NoTimeout)(processDomain(maxPerDomain))
  }

  // ---- streaming priority sample -----------------------------------------

  case class WsDoc(group: String, prio: Long, mh: Long, id: Long, weight: Long)

  /** Parallel arrays sorted by (prio desc, mh, id), length <= k+1. */
  case class WsState(prios: Array[Long], mhs: Array[Long], ids: Array[Long],
                     ws: Array[Long])

  case class WsPick(group: String, rank: Int, id: Long, weight: Long,
                    w_hat: Long)

  private val wsOrd: Ordering[(Long, Long, Long, Long)] =
    Ordering.by { case (prio, mh, id, _) => (-prio, mh, id) }

  private def processWs(k: Int)(
      group: String, rows: Iterator[WsDoc],
      state: GroupState[WsState]): Iterator[WsPick] = {
    val prev = state.getOption.getOrElse(
      WsState(Array.empty, Array.empty, Array.empty, Array.empty))
    // bounded admission at k+1 — the k+1-th row carries the threshold τ.
    // byId enforces the one-row-per-id contract when a re-crawled id
    // arrives with a CHANGED weight: the larger priority (= larger
    // weight at the id's fixed mh) wins, the batch wsUpdate rule.
    val set = new java.util.TreeSet[(Long, Long, Long, Long)](wsOrd)
    val byId = new java.util.HashMap[Long, (Long, Long, Long, Long)]()
    // a checkpoint written with a LARGER k truncates to the best k+1
    // (state arrays are sorted best-first); without the bound the set
    // would stay oversized forever and n == k+1 (the τ condition) would
    // never hold again — silently zeroing every w_hat estimate
    var i = 0
    val lim = math.min(prev.ids.length, k + 1)
    while (i < lim) {
      val e = (prev.prios(i), prev.mhs(i), prev.ids(i), prev.ws(i))
      set.add(e); byId.put(e._3, e); i += 1
    }
    rows.foreach { r =>
      val e = (r.prio, r.mh, r.id, r.weight)
      val old = byId.get(r.id)
      if (old != null) {
        if (wsOrd.lt(e, old)) { // strictly better: replace in place
          set.remove(old); set.add(e); byId.put(r.id, e)
        }
      } else if (set.size < k + 1) {
        set.add(e); byId.put(r.id, e)
      } else if (wsOrd.lt(e, set.last) && set.add(e)) {
        val evicted = set.pollLast()
        byId.remove(evicted._3); byId.put(r.id, e)
      }
    }
    if (set.isEmpty) return Iterator.empty
    val n = set.size
    val prios = new Array[Long](n); val mhs = new Array[Long](n)
    val ids = new Array[Long](n); val ws = new Array[Long](n)
    val it = set.iterator()
    var j = 0
    while (it.hasNext) {
      val (p, m, d, w) = it.next()
      prios(j) = p; mhs(j) = m; ids(j) = d; ws(j) = w; j += 1
    }
    if (java.util.Arrays.equals(prev.ids, ids) &&
        java.util.Arrays.equals(prev.prios, prios) &&
        java.util.Arrays.equals(prev.mhs, mhs)) return Iterator.empty
    state.update(WsState(prios, mhs, ids, ws))
    val tau = if (n == k + 1) prios(k) else 0L
    (0 until math.min(k, n)).iterator.map(r =>
      WsPick(group, r + 1, ids(r), ws(r), math.max(ws(r), tau)))
  }

  /** Streaming priority sample — the continuous sibling of
    * [[graft.operators.Sampling.weightedSample]]: keyed state holds each
    * group's k+1 largest-priority rows (the survivor relation of
    * [[graft.operators.Sampling.wsSurvivors]]), and each micro-batch emits
    * the refreshed ranked sample (with the Duffield–Lund–Thorup `w_hat =
    * max(w, τ)` estimate) of groups whose survivor set CHANGED — update
    * semantics, latest emission per group IS the sample.
    *
    * Priorities derive from the same seeded-hash expressions as the batch
    * operator BEFORE `groupByKey`, so the stream after any prefix equals
    * batch `weightedSample` over that prefix under any delivery order,
    * chunking, or duplicate re-delivery (a replayed id re-derives the
    * identical (mh, prio) — a pure set function; emits nothing, writes no
    * state). An id re-delivered with a CHANGED weight keeps the larger
    * weight's row (the [[graft.operators.Sampling.wsUpdate]] rule — one
    * row per id, deterministic). State is ≤ 4·(k+1) longs per group.
    *
    * `df` must expose `groupCol` (string), `idCol` (row-unique long) and
    * `weightCol` (integral in [1, 16384] — violations raise, as in batch).
    */
  def weightedSampleStream(df: DataFrame, idCol: String, groupCol: String,
                           weightCol: String, k: Int,
                           seed: String = "ws0"): Dataset[WsPick] = {
    require(k >= 1, s"need k >= 1, got $k")
    import df.sparkSession.implicits._
    implicit val stateEnc: Encoder[WsState] = Encoders.product[WsState]
    val wRaw = col(weightCol).cast("long")
    val wChecked = when(wRaw.between(1L, graft.operators.Sampling.maxSampleWeight), wRaw)
      .otherwise(raise_error(concat(
        lit(s"weightedSampleStream: weight must be in [1, ${graft.operators.Sampling.maxSampleWeight}], got "),
        coalesce(wRaw.cast("string"), lit("null")))))
    df.filter(col(idCol).isNotNull)
      .select(col(groupCol).cast("string").as("group"), wChecked.as("weight"),
        col(idCol).cast("long").as("id"))
      .withColumn("mh",
        conv(substring(md5(concat(lit(s"$seed:"), col("id").cast("string"))),
          1, 12), 16, 10).cast("long") + 1)
      .withColumn("prio", expr("(weight * 281474976710656) div mh"))
      .select("group", "prio", "mh", "id", "weight")
      .as[WsDoc]
      .groupByKey(_.group)
      .flatMapGroupsWithState(OutputMode.Update,
        GroupStateTimeout.NoTimeout)(processWs(k))
  }
}
