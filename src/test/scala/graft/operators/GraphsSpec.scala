package graft.operators

import graft.SparkSpec

import scala.util.Random

/** Integer fixed-point PageRank against an independent Scala replica of
  * the same update (Maps and loops — no Spark), plus structural checks:
  * dangling redistribution, sink accumulation, and partitioning
  * invariance (BIGINT sums commute; the output must be bit-identical
  * under any physical layout).
  */
class GraphsSpec extends SparkSpec {
  import spark.implicits._

  private val scale = 1000000000L

  /** The operator's documented update, replicated independently. */
  private def replica(edges: Seq[(Long, Long)], iters: Int,
                      d: Int = 85): Map[Long, Long] = {
    val nodes = (edges.map(_._1) ++ edges.map(_._2)).distinct.sorted
    val n = nodes.size.toLong
    val deg = edges.groupBy(_._1).view.mapValues(_.size.toLong).toMap
    val init = scale / n
    var rank = nodes.map(_ -> init).toMap
    (1 to iters).foreach { _ =>
      val inflow = edges
        .groupBy(_._2).view
        .mapValues(_.map { case (s, _) => rank(s) / deg(s) }.sum).toMap
      val dang = nodes.filterNot(deg.contains).map(rank).sum
      rank = nodes.map { v =>
        v -> (((100L - d) * init +
          d * (inflow.getOrElse(v, 0L) + dang / n)) / 100L)
      }.toMap
    }
    rank
  }

  private def run(edges: Seq[(Long, Long)], iters: Int,
                  parts: Int = 1): Map[Long, Long] =
    Graphs.pageRank(edges.toDF("src", "dst").repartition(parts), iters)
      .as[(Long, Long)].collect().toMap

  test("matches the independent replica on a random graph, any layout") {
    val rnd = new Random(59)
    val edges = (0 until 400).map { _ =>
      (rnd.nextInt(60).toLong, rnd.nextInt(60).toLong)
    }.distinct
    val want = replica(edges, iters = 8)
    assert(run(edges, 8, parts = 1) == want)
    assert(run(edges, 8, parts = 7) == want) // BIGINT sums commute
  }

  test("sink and dangling semantics: mass flows downhill, nothing lost to order") {
    // 1 -> 2 -> 3, 3 dangling; 4 isolated-ish (only a self-loop)
    val edges = Seq((1L, 2L), (2L, 3L), (4L, 4L))
    val got = run(edges, 12)
    assert(got == replica(edges, 12))
    // the chain sink outranks its feeder, which outranks the source
    assert(got(3L) > got(2L) && got(2L) > got(1L))
    // the self-loop node hoards its own mass plus the dangling share
    assert(got(4L) > got(1L))
  }

  test("total mass stays within truncation loss of scale") {
    val rnd = new Random(61)
    val edges = (0 until 300).map(_ =>
      (rnd.nextInt(40).toLong, rnd.nextInt(40).toLong)).distinct
    val total = run(edges, 10).values.sum
    // each division truncates < 1 unit per term; with <= 40 nodes and
    // 300 edges over 10 ppb-scale iterations the loss is tiny
    assert(total <= scale && total > scale - 100000L, s"total=$total")
  }

  test("tol early-exit: stops before the budget, ranks frozen at the fixpoint") {
    val rnd = new Random(67)
    val edges = (0 until 400).map(_ =>
      (rnd.nextInt(50).toLong, rnd.nextInt(50).toLong)).distinct
    val df = edges.toDF("src", "dst")
    // integer fixed-point iterates REACH an exact fixpoint (Δ = 0); a
    // 100-iteration budget with tol=1 must stop well short of it
    val (ranks, ran) = Graphs.pageRankRun(df, iters = 100, tol = 1L)
    assert(ran < 100, s"never converged in 100 iterations")
    val got = ranks.as[(Long, Long)].collect().toMap
    // the early-exit result is within tol of the replica run to the same
    // iteration count, and running the replica further moves nothing by
    // more than tol per step at the stop point
    val atStop = replica(edges, ran)
    got.foreach { case (v, r) => assert(math.abs(r - atStop(v)) <= 1L, s"node $v") }
    // default config (tol = 0) still runs exactly `iters` passes
    val (_, ranFixed) = Graphs.pageRankRun(df, iters = 4)
    assert(ranFixed == 4)
  }

  test("tol on an EMPTY edge relation converges to the empty rank relation, no NPE") {
    // max over zero rows is one all-NULL row; the convergence probe must
    // read it as delta 0 (converged), matching the tol=0 path's empty
    // result, instead of throwing from getLong on the null
    val empty = Seq.empty[(Long, Long)].toDF("src", "dst")
    val (ranks, ran) = Graphs.pageRankRun(empty, iters = 5, tol = 1L)
    assert(ranks.count() == 0L)
    assert(ran <= 1, s"an empty graph must converge immediately, ran $ran")
    val (ranksFixed, _) = Graphs.pageRankRun(empty, iters = 5)
    assert(ranksFixed.count() == 0L)
  }

  test("reliable-checkpoint knob produces identical ranks") {
    val rnd = new Random(71)
    val edges = (0 until 200).map(_ =>
      (rnd.nextInt(30).toLong, rnd.nextInt(30).toLong)).distinct
    val dir = java.nio.file.Files.createTempDirectory("pr-ckpt").toString
    val df = edges.toDF("src", "dst")
    val local = Graphs.pageRank(df, 6).as[(Long, Long)].collect().toMap
    val reliable = Graphs.pageRank(df, 6, checkpointDir = Some(dir))
      .as[(Long, Long)].collect().toMap
    assert(reliable == local)
    assert(local == replica(edges, 6))
    // the reliable path actually wrote RDD checkpoint data
    val wrote = java.nio.file.Files.walk(java.nio.file.Paths.get(dir))
      .filter(p => java.nio.file.Files.isRegularFile(p)).count()
    assert(wrote > 0, "checkpoint dir is empty — reliable path did not engage")
  }

  // ------------------------------------------------------------------ HITS

  /** Independent replica of the documented integer L1-normalized HITS
    * update (Maps and loops — no Spark).
    */
  private def hitsReplica(edges: Seq[(Long, Long)],
                          iters: Int): Map[Long, (Long, Long)] = {
    val nodes = (edges.map(_._1) ++ edges.map(_._2)).distinct.sorted
    val init = scale / nodes.size.toLong
    var hub = nodes.map(_ -> init).toMap
    var auth = nodes.map(_ -> 0L).toMap
    def half(src: Map[Long, Long], in: Boolean): Map[Long, Long] = {
      val raw = edges.groupBy(e => if (in) e._2 else e._1).view
        .mapValues(_.map(e => src(if (in) e._1 else e._2)).sum).toMap
      val tot = raw.values.sum
      nodes.map(v => v ->
        (if (tot == 0L) 0L else raw.getOrElse(v, 0L) * scale / tot)).toMap
    }
    (1 to iters).foreach { _ =>
      auth = half(hub, in = true)
      hub = half(auth, in = false)
    }
    nodes.map(v => v -> ((hub(v), auth(v)))).toMap
  }

  test("hits matches the independent replica on a random graph, any layout") {
    val rnd = new Random(83)
    val edges = (0 until 400).map(_ =>
      (rnd.nextInt(40).toLong, rnd.nextInt(40).toLong)).distinct
    val want = hitsReplica(edges, 6)
    for (parts <- Seq(1, 7)) {
      val got = Graphs.hits(edges.toDF("src", "dst").repartition(parts), 6)
        .as[(Long, Long, Long)].collect()
        .map(r => r._1 -> ((r._2, r._3))).toMap
      assert(got == want, s"parts=$parts")
    }
  }

  test("hits structure: a star's center is the authority, leaves the hubs") {
    val edges = (1L to 9L).map(i => (i, 0L)) // 9 leaves all point at 0
    val got = Graphs.hits(edges.toDF("src", "dst"), 4)
      .as[(Long, Long, Long)].collect().map(r => r._1 -> ((r._2, r._3))).toMap
    // the center holds ALL authority mass and none of the hub mass;
    // each leaf holds 1/9 of the hub mass and zero authority
    assert(got(0L)._2 == scale && got(0L)._1 == 0L)
    for (l <- 1L to 9L) {
      assert(got(l)._2 == 0L, s"leaf $l must have no authority")
      assert(got(l)._1 == scale / 9, s"leaf $l hub share")
    }
    assert(got == hitsReplica(edges, 4))
  }

  test("hits zero-total guard: a single self-loop-free chain end stays finite") {
    // 0 -> 1: after auth normalizes to node 1 only, hubs re-derive from
    // auth; no division by zero anywhere even with one edge
    val got = Graphs.hits(Seq((0L, 1L)).toDF("src", "dst"), 3)
      .as[(Long, Long, Long)].collect().map(r => r._1 -> ((r._2, r._3))).toMap
    assert(got(0L) == ((scale, 0L))) // the only hub
    assert(got(1L) == ((0L, scale))) // the only authority
  }
}
