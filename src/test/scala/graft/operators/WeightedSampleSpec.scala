package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

import scala.util.Random

/** Priority sampling (Duffield–Lund–Thorup) — selection identity vs a JVM
  * replica, mergeability, the subset-sum estimator, weight bounds, and the
  * bounded-heap plan shape.
  */
class WeightedSampleSpec extends SparkSpec {
  import spark.implicits._

  private def md5hex(s: String): String =
    java.security.MessageDigest.getInstance("MD5").digest(s.getBytes("UTF-8"))
      .map("%02x".format(_)).mkString

  /** JVM replica: m from the first 12 md5 hex chars + 1, integer priority,
    * (prio desc, m, id) order.
    */
  private def replica(rows: Seq[(String, Long, Long)], k: Int, seed: String)
      : Map[String, Seq[(Long, Long, Long)]] = {
    // (group, id, w) -> group -> sample of (id, weight, w_hat)
    val keyed = rows.map { case (g, id, w) =>
      val m = java.lang.Long.parseLong(md5hex(s"$seed:$id").take(12), 16) + 1L
      val prio = w * (1L << 48) / m
      (g, id, w, m, prio)
    }
    keyed.groupBy(_._1).map { case (g, xs) =>
      val sorted = xs.sortBy { case (_, id, _, m, prio) => (-prio, m, id) }
      val tau = if (sorted.size > k) sorted(k)._5 else 0L
      g -> sorted.take(k).map { case (_, id, w, _, _) =>
        (id, w, math.max(w, tau))
      }.sortBy(_._1)
    }
  }

  test("sample equals the JVM replica across groups, incl. an under-k group") {
    val rng = new Random(17)
    val rows = (0L until 3000L).map { id =>
      (s"g${id % 3}", id, 1L + rng.nextInt(16384).toLong)
    } ++ (9000L until 9005L).map(id => ("tiny", id, 7L)) // under-k group
    val got = Sampling.weightedSample(
        rows.toDF("g", "doc_id", "w").repartition(7), "doc_id", Seq("g"), "w", k = 32)
      .select("g", "doc_id", "weight", "w_hat")
      .as[(String, Long, Long, Long)].collect()
      .groupBy(_._1).map { case (g, xs) =>
        g -> xs.map(x => (x._2, x._3, x._4)).toSeq.sortBy(_._1)
      }
    val want = replica(rows, 32, "ws0")
    assert(got.keySet == want.keySet)
    for (g <- want.keySet) assert(got(g) == want(g), s"group $g")
    // under-k group: everything kept, tau absent => w_hat == w
    assert(got("tiny") == (9000L until 9005L).map(id => (id, 7L, 7L)))
  }

  test("incremental wsUpdate equals the one-shot survivors and sample") {
    val rng = new Random(5)
    val all = (0L until 2000L).map(id => ("g", id, 1L + rng.nextInt(500).toLong))
    val (p1, p2) = all.splitAt(1200)
    val oneShot = Sampling.wsSurvivors(all.toDF("g", "doc_id", "w"),
      "doc_id", Seq("g"), "w", k = 24)
    val folded = Sampling.wsUpdate(
      Sampling.wsSurvivors(p1.toDF("g", "doc_id", "w"), "doc_id", Seq("g"), "w", 24),
      p2.toDF("g", "doc_id", "w"), "doc_id", Seq("g"), "w", 24)
    def canon(df: org.apache.spark.sql.DataFrame) =
      df.select("g", "doc_id", "weight", "mh", "prio")
        .as[(String, Long, Long, Long, Long)].collect().sortBy(_._2).toSeq
    assert(canon(folded) == canon(oneShot))
    // and a replayed batch changes nothing (same id => same (mh, prio) row)
    val replayed = Sampling.wsUpdate(folded, p2.toDF("g", "doc_id", "w"),
      "doc_id", Seq("g"), "w", 24)
    assert(canon(replayed) == canon(oneShot))
  }

  test("sum(w_hat) over the sample estimates the group's total weight") {
    // DLT: E[sum over sample of max(w, tau)] = sum(w). Skewed weights, many
    // seeds; the mean over seeds must land near the true total.
    val rng = new Random(11)
    val rows = (0L until 400L).map { id =>
      ("g", id, if (id % 40 == 0) 4000L else 1L + rng.nextInt(40).toLong)
    }
    val total = rows.map(_._3).sum.toDouble
    val df = rows.toDF("g", "doc_id", "w")
    val ests = (0 until 30).map { s =>
      Sampling.weightedSample(df, "doc_id", Seq("g"), "w", k = 24, seed = s"e$s")
        .agg(sum("w_hat")).as[Long].head().toDouble
    }
    val mean = ests.sum / ests.size
    assert(math.abs(mean - total) / total < 0.15,
      s"mean estimate $mean vs true $total across 30 seeds")
  }

  test("an id re-delivered with a changed weight keeps ONE row — larger weight wins") {
    val base = (0L until 300L).map(id => ("g", id, 1L + (id * 7 % 200)))
    val surv = Sampling.wsSurvivors(base.toDF("g", "doc_id", "w"),
      "doc_id", Seq("g"), "w", k = 16)
    // pick a current survivor and re-deliver it with a LARGER weight
    val someId = surv.select("doc_id").as[Long].head()
    val up = Sampling.wsUpdate(surv,
      Seq(("g", someId, 16000L)).toDF("g", "doc_id", "w"),
      "doc_id", Seq("g"), "w", 16)
    val upRows = up.select("doc_id", "weight").as[(Long, Long)].collect()
    assert(upRows.count(_._1 == someId) == 1, "one row per id")
    assert(upRows.find(_._1 == someId).get._2 == 16000L, "larger weight wins")
    // re-deliver with a SMALLER weight: the survivor keeps its larger draw
    val down = Sampling.wsUpdate(up,
      Seq(("g", someId, 1L)).toDF("g", "doc_id", "w"),
      "doc_id", Seq("g"), "w", 16)
    val downRows = down.select("doc_id", "weight").as[(Long, Long)].collect()
    assert(downRows.count(_._1 == someId) == 1)
    assert(downRows.find(_._1 == someId).get._2 == 16000L)
    // the final sample holds distinct ids only
    val sample = Sampling.wsSample(down, "doc_id", Seq("g"), 16)
      .select("doc_id").as[Long].collect()
    assert(sample.length == sample.distinct.length)
  }

  test("weights outside [1, 16384] and null weights raise") {
    for (bad <- Seq(0L, 16385L)) {
      val e = intercept[Exception] {
        Sampling.weightedSample(Seq(("g", 1L, bad)).toDF("g", "doc_id", "w"),
          "doc_id", Seq("g"), "w", 4).collect()
      }
      assert(e.getMessage.contains("weight must be in"), s"weight $bad: $e")
    }
    val nullW = intercept[Exception] {
      Sampling.weightedSample(
        Seq(("g", 1L, Option.empty[Long])).toDF("g", "doc_id", "w"),
        "doc_id", Seq("g"), "w", 4).collect()
    }
    assert(nullW.getMessage.contains("weight must be in"))
  }

  test("selection runs on the bounded heaps; the window sees survivors only") {
    val rows = (0L until 5000L).map(id => (s"g${id % 2}", id, 1L + id % 100))
    val plan = Sampling.weightedSample(rows.toDF("g", "doc_id", "w"),
      "doc_id", Seq("g"), "w", 16).queryExecution.executedPlan.toString()
    assert(plan.contains("GroupTopK"), s"expected the bounded-heap node:\n$plan")
    // the Window must sit ABOVE the heap node (survivor-sized input), i.e.
    // the plan string shows Window before GroupTopK in top-down print order
    val wIdx = plan.indexOf("Window")
    val hIdx = plan.indexOf("GroupTopK")
    assert(wIdx >= 0 && hIdx > wIdx,
      s"Window must consume the heap output, not the corpus:\n$plan")
  }
}
