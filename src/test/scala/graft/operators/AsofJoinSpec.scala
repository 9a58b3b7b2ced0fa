package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

import scala.util.Random

/** As-of join: hand-derived edge cases plus a randomized differential
  * against an independent scan-based replica (the DuckDB ASOF JOIN oracle
  * covers the catalog query at all SFs).
  */
class AsofJoinSpec extends SparkSpec {

  import spark.implicits._

  test("asof join: latest at-or-before match, ties inclusive, leading nulls") {
    val probes = Seq(
      (1L, "a", 5L), (2L, "a", 10L), (3L, "a", 15L),
      (4L, "b", 10L), (5L, "b", 30L),
      (6L, "c", 100L) // key with no right rows at all
    ).toDF("event_id", "k", "t")
    val right = Seq(
      ("a", 10L, 1.0), ("a", 12L, 2.0),
      ("b", 20L, 3.0)
    ).toDF("k", "t", "v")
    val got = AsofJoin.asofJoin(probes, right, Seq("k"), "t", Seq("v"))
      .select("event_id", "asof_v", "asof_t")
      .as[(Long, Option[Double], Option[Long])].collect()
      .map(r => r._1 -> ((r._2, r._3))).toMap
    assert(got(1L) == ((None, None)))          // before any setpoint
    assert(got(2L) == ((Some(1.0), Some(10L)))) // tie: value AT t applies
    assert(got(3L) == ((Some(2.0), Some(12L)))) // latest of two
    assert(got(4L) == ((None, None)))           // other key's rows invisible
    assert(got(5L) == ((Some(3.0), Some(20L))))
    assert(got(6L) == ((None, None)))
  }

  test("asof join carries multiple payload columns together") {
    val probes = Seq((1L, "a", 10L)).toDF("event_id", "k", "t")
    val right = Seq(("a", 5L, 1.5, "lo")).toDF("k", "t", "v", "mode")
    val row = AsofJoin.asofJoin(probes, right, Seq("k"), "t", Seq("v", "mode"))
      .select("asof_v", "asof_mode", "asof_t")
      .as[(Double, String, Long)].head()
    assert(row == ((1.5, "lo", 5L)))
  }

  test("asof join: NULL payload in the latest setpoint travels atomically") {
    // Two setpoints: the older has v=1.5/mode=lo, the NEWER has v=NULL.
    // Per-column carries would mix rows (v from t=5, ts/mode from t=8);
    // the struct carry must deliver the t=8 row whole: v NULL, mode "hi".
    val probes = Seq((1L, "a", 10L)).toDF("event_id", "k", "t")
    val right = Seq(
      ("a", 5L, Some(1.5), "lo"),
      ("a", 8L, None: Option[Double], "hi")
    ).toDF("k", "t", "v", "mode")
    val row = AsofJoin.asofJoin(probes, right, Seq("k"), "t", Seq("v", "mode"))
      .select("asof_v", "asof_mode", "asof_t")
      .as[(Option[Double], String, Long)].head()
    assert(row == ((None, "hi", 8L)))
  }

  test("asof join matches a scan replica on random data") {
    val rnd = new Random(23)
    val keys = Seq("k0", "k1", "k2", "k3")
    val probes = (1L to 400L).map(i =>
      (i, keys(rnd.nextInt(keys.size)), rnd.nextInt(1000).toLong))
    val right = (0 until 120).map { i =>
      (keys(rnd.nextInt(keys.size)), rnd.nextInt(1000).toLong, rnd.nextDouble)
    }.distinct
      // contract: unique per (key, ts)
      .groupBy(r => (r._1, r._2)).map(_._2.head).toSeq
    val got = AsofJoin.asofJoin(
        probes.toDF("event_id", "k", "t"),
        right.toDF("k", "t", "v"), Seq("k"), "t", Seq("v"))
      .select("event_id", "asof_v")
      .as[(Long, Option[Double])].collect().toMap
    val byKey = right.groupBy(_._1)
    probes.foreach { case (id, k, t) =>
      val exp = byKey.getOrElse(k, Seq.empty)
        .filter(_._2 <= t).sortBy(_._2).lastOption.map(_._3)
      assert(got(id) == exp, s"probe $id ($k, $t)")
    }
  }
}
