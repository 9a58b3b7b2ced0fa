package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

import scala.util.Random

class StatsSpec extends SparkSpec {
  import spark.implicits._

  /** Brute-force percentile_disc: 1-based element at ceil(p*n/100). */
  private def disc(sorted: Seq[Long], p: Int): Long =
    sorted((p * sorted.size + 99) / 100 - 1)

  test("histogram quantiles equal brute-force percentile_disc on random data") {
    val rng = new Random(21)
    val rows = Seq.tabulate(20000) { _ =>
      (s"g${rng.nextInt(4)}", rng.nextInt(500).toLong)
    }
    val df = rows.toDF("g", "v").repartition(6)
    val got = Stats.histogramQuantiles(df, Seq("g"), "v", Seq(25, 50, 90, 99, 100))
      .select("g", "n_rows", "p25", "p50", "p90", "p99", "p100")
      .as[(String, Long, Long, Long, Long, Long, Long)].collect()
      .map(r => r._1 -> r).toMap
    val byG = rows.groupBy(_._1).map { case (g, vs) => g -> vs.map(_._2).sorted.toIndexedSeq }
    for ((g, sorted) <- byG) {
      val (_, n, p25, p50, p90, p99, p100) = got(g)
      assert(n == sorted.size)
      assert(p25 == disc(sorted, 25), s"$g p25")
      assert(p50 == disc(sorted, 50), s"$g p50")
      assert(p90 == disc(sorted, 90), s"$g p90")
      assert(p99 == disc(sorted, 99), s"$g p99")
      assert(p100 == sorted.last, s"$g p100 must be the max")
    }
  }

  test("heavy ties and single-value groups") {
    val df = (Seq.fill(999)(("a", 7L)) ++ Seq(("a", 8L)) ++ Seq(("b", 1L)))
      .toDF("g", "v")
    val got = Stats.histogramQuantiles(df, Seq("g"), "v", Seq(50, 99, 100))
      .select("g", "p50", "p99", "p100").as[(String, Long, Long, Long)]
      .collect().map(r => r._1 -> r).toMap
    assert(got("a") == (("a", 7L, 7L, 8L)))  // 999 sevens, one eight
    assert(got("b") == (("b", 1L, 1L, 1L)))
  }

  test("plan: the exchange carries the histogram, not the rows") {
    val df = Seq(("a", 1L), ("b", 2L)).toDF("g", "v").repartition(2)
    val p = Stats.histogramQuantiles(df, Seq("g"), "v", Seq(50))
      .queryExecution.executedPlan.toString()
    // partial_count before any exchange = the map-side histogram combine
    assert(p.contains("partial_count"), s"histogram must combine map-side:\n$p")
  }
}
