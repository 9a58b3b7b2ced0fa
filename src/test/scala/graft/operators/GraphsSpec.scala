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
}
