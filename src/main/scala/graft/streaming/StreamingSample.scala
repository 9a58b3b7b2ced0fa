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
    var i = 0
    while (i < prev.hvs.length) { set.add((prev.hvs(i), prev.ids(i))); i += 1 }
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
}
