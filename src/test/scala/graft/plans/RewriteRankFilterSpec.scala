package graft.plans

import graft.SparkSpec

import scala.util.Random

/** [[RewriteRankFilterToTopK]]: the SQL rank-filter spelling must plan onto
  * the GroupTopK heap operator exactly when the rewrite is airtight, and
  * never change results.
  */
class RewriteRankFilterSpec extends SparkSpec {
  import spark.implicits._

  private lazy val view: Unit = {
    val rng = new Random(31)
    Seq.tabulate(4000) { i =>
      (rng.nextInt(9).toLong, rng.nextInt(300).toLong, i.toLong)
    }.toDF("g", "v", "id").repartition(5).createOrReplaceTempView("rrf_t")
  }

  private def planOf(sql: String): String = {
    view
    spark.sql(sql).queryExecution.executedPlan.toString()
  }

  private def rows(sql: String): Seq[(Long, Long, Long)] = {
    view
    spark.sql(sql).as[(Long, Long, Long)].collect().toSeq.sorted
  }

  private val inner =
    "SELECT g, v, id, row_number() OVER (PARTITION BY g ORDER BY v DESC, id) AS rn FROM rrf_t"

  test("rank filter with rn dropped rewrites to GroupTopK, results unchanged") {
    val q = s"SELECT g, v, id FROM ($inner) WHERE rn <= 7"
    assert(planOf(q).contains("GroupTopK ["), planOf(q))
    // expected via a query shape the rule does NOT touch (rn projected)
    val want = rows(s"SELECT g, v, id FROM (SELECT *, rn AS rn2 FROM ($inner)) WHERE rn <= 7")
    assert(rows(q) == want)
  }

  test("strict bound and reversed literal forms rewrite too") {
    for (cond <- Seq("rn < 4", "3 >= rn", "4 > rn")) {
      val q = s"SELECT g, v, id FROM ($inner) WHERE $cond"
      assert(planOf(q).contains("GroupTopK ["), s"$cond:\n${planOf(q)}")
      assert(rows(q).groupBy(_._1).values.forall(_.size <= 3), cond)
    }
  }

  test("extra conjuncts survive as a residual filter above the heap") {
    val q = s"SELECT g, v, id FROM ($inner) WHERE rn <= 5 AND v > 100"
    val p = planOf(q)
    assert(p.contains("GroupTopK ["), p)
    val want = rows(s"SELECT g, v, id FROM (SELECT *, rn AS r2 FROM ($inner)) WHERE rn <= 5 AND v > 100")
    assert(rows(q) == want)
  }

  test("no rewrite when rn is projected, referenced elsewhere, or not row_number") {
    val keepRn = s"SELECT g, v, rn FROM ($inner) WHERE rn <= 7"
    assert(!planOf(keepRn).contains("GroupTopK ["), planOf(keepRn))

    val rnInPred = s"SELECT g, v, id FROM ($inner) WHERE rn <= 7 AND v > rn"
    assert(!planOf(rnInPred).contains("GroupTopK ["), planOf(rnInPred))

    val rankInner =
      "SELECT g, v, id, rank() OVER (PARTITION BY g ORDER BY v DESC) AS rn FROM rrf_t"
    val rk = s"SELECT g, v, id FROM ($rankInner) WHERE rn <= 7"
    assert(!planOf(rk).contains("GroupTopK ["), planOf(rk))
  }

  test("nonsense bounds do not fire (rn <= 0)") {
    val q = s"SELECT g, v, id FROM ($inner) WHERE rn <= 0"
    assert(!planOf(q).contains("GroupTopK ["), planOf(q))
    assert(rows(q).isEmpty)
  }
}
