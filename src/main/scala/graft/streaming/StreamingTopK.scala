package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset, Encoder, Encoders}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** Streaming per-group top-k leaderboard — the continuous counterpart of
  * [[graft.plans.GroupTopK]]: keyed state holds the k best (value, id)
  * rows ever seen per group; each micro-batch emits the refreshed
  * leaderboard for groups it touched (update semantics, one row per rank).
  *
  * Like the KMV sketch (and unlike the order-contracted joins), the
  * retained set is a pure function of the SET of rows seen, so the stream
  * result after any prefix equals the batch top-k over that prefix under
  * ANY delivery order, batching, or duplicate re-delivery. Each id holds at
  * most ONE rank: re-delivery of an id with a different score keeps the
  * BEST score ever seen for that id (per-id max is itself a set function,
  * so idempotence and order-independence survive score updates; an
  * append-only stream cannot distinguish "update" from "replay", so
  * best-ever is the only deterministic choice). State is ≤ k (long, long)
  * pairs per group.
  *
  * Ordering: descending by `v`, ascending by `id` on ties (the leaderboard
  * convention); rows are re-emitted with their 1-based `rank`.
  */
object StreamingTopK {

  case class ScoredRow(group: String, v: Long, id: Long)

  case class TopKState(vs: Array[Long], ids: Array[Long])

  case class RankedRow(group: String, rank: Int, v: Long, id: Long)

  private def better(v1: Long, id1: Long, v2: Long, id2: Long): Boolean =
    v1 > v2 || (v1 == v2 && id1 < id2)

  private def processGroup(k: Int)(
      group: String, rows: Iterator[ScoredRow],
      state: GroupState[TopKState]): Iterator[RankedRow] = {
    val prev = state.getOption.getOrElse(TopKState(Array.empty, Array.empty))
    val merged = (prev.vs.indices.map(i => (prev.vs(i), prev.ids(i))) ++
        rows.map(r => (r.v, r.id)))
      .groupBy(_._2).valuesIterator.map(_.maxBy(_._1)).toSeq
      .sortWith { case ((v1, i1), (v2, i2)) => better(v1, i1, v2, i2) }
      .take(k)
    if (merged.isEmpty) return Iterator.empty
    val st = TopKState(merged.map(_._1).toArray, merged.map(_._2).toArray)
    if (!java.util.Arrays.equals(prev.vs, st.vs) ||
        !java.util.Arrays.equals(prev.ids, st.ids)) state.update(st)
    merged.iterator.zipWithIndex.map { case ((v, id), i) =>
      RankedRow(group, i + 1, v, id)
    }
  }

  /** `df` must expose (group, v, id); emits the refreshed ranked top-k of
    * every touched group per micro-batch.
    */
  def topKStream(df: DataFrame, k: Int): Dataset[RankedRow] = {
    require(k > 0, s"topKStream needs k > 0, got $k")
    import df.sparkSession.implicits._
    implicit val stateEnc: Encoder[TopKState] = Encoders.product[TopKState]
    df.select(col("group").cast("string").as("group"),
        col("v").cast("long").as("v"), col("id").cast("long").as("id"))
      .as[ScoredRow]
      .groupByKey(_.group)
      .flatMapGroupsWithState(OutputMode.Update,
        GroupStateTimeout.NoTimeout)(processGroup(k))
  }
}
