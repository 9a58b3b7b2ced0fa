package graft.operators

import graft.{SparkSpec, Tables}
import org.apache.spark.sql.functions._

/** Bloom-pruned join: output identity with the plain join, the
  * no-false-negative guarantee the identity rests on, the pruning power
  * the operator exists for, and the narrow-prefilter plan shape.
  */
class JoinPruneSpec extends SparkSpec {

  private val sf = "/root/testdata/sf0.001"

  test("bloom-pruned inner and semi joins equal the plain joins") {
    val li = Tables.lineitem(spark, sf).select("l_orderkey", "l_extendedprice")
    val dim = Tables.orders(spark, sf)
      .filter(col("o_orderpriority") === "1-URGENT")
      .select("o_orderkey", "o_orderstatus")
    def canon(df: org.apache.spark.sql.DataFrame): Seq[String] =
      df.select(concat_ws("|", df.columns.map(col): _*))
        .collect().map(_.getString(0)).sorted.toSeq
    val prunedInner = canon(
      JoinPrune.bloomPrunedJoin(li, dim, "l_orderkey", "o_orderkey"))
    val plainInner = canon(li.join(dim, col("l_orderkey") === col("o_orderkey")))
    assert(prunedInner.nonEmpty && prunedInner == plainInner)
    val prunedSemi = canon(JoinPrune.bloomPrunedJoin(li, dim,
      "l_orderkey", "o_orderkey", joinType = "left_semi"))
    val plainSemi = canon(li.join(dim,
      col("l_orderkey") === col("o_orderkey"), "left_semi"))
    assert(prunedSemi.nonEmpty && prunedSemi == plainSemi)
    intercept[IllegalArgumentException] {
      JoinPrune.bloomPrunedJoin(li, dim, "l_orderkey", "o_orderkey",
        joinType = "left_outer")
    }
  }

  test("null fact keys are dropped by the prefilter") {
    // xxhash64 SKIPS null inputs, so without the explicit isNotNull
    // conjunct a null key would probe the fixed positions of hash(seed)
    // and could pass the filter whenever those bits happen to be set —
    // this pins the documented null-free contract for direct callers
    val dim = spark.range(100).select(col("id").as("k"))
    val words = JoinPrune.bloomWords(dim, "k", nBits = 1 << 10)
    val fact = spark.range(50)
      .select(when(col("id") % 2 === 0, col("id")).as("k"))
    val kept = JoinPrune.bloomPrefilter(fact, "k", words)
    assert(kept.filter(col("k").isNull).count() == 0)
    assert(kept.count() == 25) // all non-null keys are dim keys -> all pass
  }

  test("no false negatives: every dim key passes its own filter") {
    val dim = spark.range(5000).select((col("id") * 37 + 11).as("k"))
    val words = JoinPrune.bloomWords(dim, "k", nBits = 1 << 16)
    assert(JoinPrune.bloomPrefilter(dim, "k", words).count() == 5000)
  }

  test("pruning: a selective dim removes most fact rows before the shuffle") {
    val fact = spark.range(100000).select(col("id").as("k"))
    val dim = spark.range(1000).select((col("id") * 100).as("k")) // 1% match
    val words = JoinPrune.bloomWords(dim, "k", nBits = 1 << 20)
    val survivors = JoinPrune.bloomPrefilter(fact, "k", words).count()
    // 1000 true matches + fp; at 2^20 bits / 1000 keys fp is ~0
    assert(survivors >= 1000, s"false negatives: only $survivors survived")
    assert(survivors <= 2000, s"pruned too little: $survivors of 100000")
    // the prefilter itself is a narrow codegen'd filter — no exchange
    val plan = JoinPrune.bloomPrefilter(fact, "k", words)
      .queryExecution.executedPlan.toString
    assert(!plan.contains("Exchange"), s"prefilter must not shuffle:\n$plan")

    // empty dim: the filter rejects everything, like the join would
    val none = JoinPrune.bloomWords(dim.filter(col("k") < 0), "k",
      nBits = 1 << 16)
    assert(JoinPrune.bloomPrefilter(fact, "k", none).count() == 0)
  }
}
