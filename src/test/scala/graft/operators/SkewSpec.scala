package graft.operators

import graft.{SparkSpec, Tables}
import org.apache.spark.sql.functions._

/** Salted skew join: output identity with the plain join (all supported
  * join types), the distribution property on a planted 90%-hot-key
  * fixture, and the plan shape (replicated dim side, salt in the
  * exchange keys).
  */
class SkewSpec extends SparkSpec {

  private val sf = "/root/testdata/sf0.001"

  test("salted inner join output equals the plain join") {
    val li = Tables.lineitem(spark, sf)
      .select("l_orderkey", "l_extendedprice", "l_discount")
    val o = Tables.orders(spark, sf).select("o_orderkey", "o_orderpriority")
    def canon(df: org.apache.spark.sql.DataFrame): Seq[String] =
      df.select(concat_ws("|", col("l_orderkey"), col("l_extendedprice"),
          col("l_discount"), col("o_orderpriority")))
        .collect().map(_.getString(0)).sorted.toSeq
    val salted = canon(
      Skew.saltedJoin(li, o, "l_orderkey", "o_orderkey", salt = 4))
    val plain = canon(li.join(o, col("l_orderkey") === col("o_orderkey")))
    assert(salted.nonEmpty && salted == plain)
  }

  test("left outer null-extends an unmatched fact row exactly once; semi dedups") {
    import spark.implicits._
    val f = Seq((1L, "a"), (1L, "b"), (2L, "c"), (5L, "d")).toDF("k", "payload")
    val dm = Seq((1L, "X"), (2L, "Y"), (9L, "Z")).toDF("dk", "dval")
    val left = Skew.saltedJoin(f, dm, "k", "dk", salt = 4, joinType = "left_outer")
      .select("k", "payload", "dval").as[(Long, String, String)].collect().sorted
    assert(left.toSeq == Seq((1L, "a", "X"), (1L, "b", "X"), (2L, "c", "Y"),
      (5L, "d", null)))
    val semi = Skew.saltedJoin(f, dm, "k", "dk", salt = 4, joinType = "left_semi")
      .as[(Long, String)].collect().sorted
    assert(semi.toSeq == Seq((1L, "a"), (1L, "b"), (2L, "c")))
    // the dim-replicating construction cannot support right/full joins
    intercept[IllegalArgumentException] {
      Skew.saltedJoin(f, dm, "k", "dk", salt = 4, joinType = "full_outer")
    }
  }

  test("the salt splits a 90%-hot key into near-even sub-keys") {
    val salt = 8
    val fact = spark.range(20000).select(
      when(col("id") < 18000, 0L).otherwise(col("id")).as("k"),
      col("id").as("payload"))
    val dist = fact.withColumn("s", Skew.saltColumn(fact, salt))
      .groupBy("k", "s").agg(count(lit(1)).as("n"))
    val hot = dist.filter(col("k") === 0L).select("s", "n").collect()
    assert(hot.length == salt, s"hot key landed on ${hot.length}/$salt salts")
    val maxN = hot.map(_.getLong(1)).max
    // perfectly even would be 2250; allow 30% imbalance from the row hash
    assert(maxN <= 18000 / salt * 13 / 10,
      s"hottest sub-key still holds $maxN of 18000 rows")
  }

  test("plan: dim side replicated via explode, exchange keyed on the salt") {
    val prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try {
      val li = Tables.lineitem(spark, sf).select("l_orderkey", "l_quantity")
      val o = Tables.orders(spark, sf).select("o_orderkey", "o_orderpriority")
      val j = Skew.saltedJoin(li, o, "l_orderkey", "o_orderkey", salt = 8)
      assert(j.count() > 0)
      val plan = j.queryExecution.executedPlan.toString
      assert(plan.contains("Generate explode"), s"dim side not replicated:\n$plan")
      // both exchanges hash on (key, _salt) — the 1/salt distribution
      assert("hashpartitioning\\([^)]*_salt".r.findFirstIn(plan).isDefined,
        s"salt missing from the exchange keys:\n$plan")
    } finally spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)
  }
}
