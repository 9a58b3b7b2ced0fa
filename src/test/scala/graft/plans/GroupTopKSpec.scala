package graft.plans

import graft.SparkSpec
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import scala.util.Random

/** [[GroupTopK]] — the custom logical node / strategy / physical operator —
  * differentially against the rank-window spelling it replaces.
  */
class GroupTopKSpec extends SparkSpec {
  import spark.implicits._

  private def windowTopK(df: org.apache.spark.sql.DataFrame,
                         k: Int): org.apache.spark.sql.DataFrame = {
    val w = Window.partitionBy(col("g")).orderBy(col("v").desc, col("id"))
    df.withColumn("_rn", row_number().over(w)).filter(col("_rn") <= k).drop("_rn")
  }

  private def canon(df: org.apache.spark.sql.DataFrame): Seq[(Long, Long, Long)] =
    df.select(col("g").cast("long"), col("v").cast("long"), col("id").cast("long"))
      .as[(Long, Long, Long)].collect().toSeq.sorted

  test("matches row_number window on randomized data, several k") {
    val rng = new Random(42)
    val rows = Seq.tabulate(5000) { i =>
      (rng.nextInt(37).toLong, rng.nextInt(200).toLong, i.toLong)
    }
    val df = rows.toDF("g", "v", "id").repartition(7)
    for (k <- Seq(1, 3, 10, 400)) {
      val got = canon(GroupTopK.topK(df, Seq("g"), Seq("v" -> false, "id" -> true), k))
      val want = canon(windowTopK(df, k))
      assert(got == want, s"k=$k")
    }
  }

  test("groups smaller than k emit all rows; ties on v broken by id") {
    val df = Seq((1L, 5L, 10L), (1L, 5L, 11L), (1L, 5L, 12L), (2L, 9L, 20L))
      .toDF("g", "v", "id").repartition(3)
    val got = canon(GroupTopK.topK(df, Seq("g"), Seq("v" -> false, "id" -> true), 2))
    assert(got == Seq((1L, 5L, 10L), (1L, 5L, 11L), (2L, 9L, 20L)))
  }

  test("multi-column group keys and ascending order") {
    val rng = new Random(7)
    val rows = Seq.tabulate(2000) { i =>
      (rng.nextInt(5).toLong, rng.nextInt(4).toLong, rng.nextInt(100).toLong, i.toLong)
    }
    val df = rows.toDF("ga", "gb", "v", "id").repartition(5)
    val got = GroupTopK.topK(df, Seq("ga", "gb"), Seq("v" -> true, "id" -> true), 3)
      .select("ga", "gb", "v", "id").as[(Long, Long, Long, Long)]
      .collect().toSeq.sorted
    val w = Window.partitionBy(col("ga"), col("gb")).orderBy(col("v"), col("id"))
    val want = df.withColumn("_rn", row_number().over(w)).filter(col("_rn") <= 3)
      .select("ga", "gb", "v", "id").as[(Long, Long, Long, Long)]
      .collect().toSeq.sorted
    assert(got == want)
  }

  test("empty input, k=1, and null order values") {
    val empty = Seq.empty[(Long, Long, Long)].toDF("g", "v", "id")
    assert(GroupTopK.topK(empty, Seq("g"), Seq("v" -> false, "id" -> true), 3).count() == 0)

    // nulls order per SortOrder defaults (NULLS LAST on desc), same as the window
    val withNulls = Seq((1L, Some(3L), 1L), (1L, None, 2L), (1L, Some(9L), 3L))
      .toDF("g", "v", "id").repartition(2)
    val got = GroupTopK.topK(withNulls, Seq("g"), Seq("v" -> false, "id" -> true), 2)
      .select("id").as[Long].collect().toSeq.sorted
    assert(got == Seq(1L, 3L))
  }

  test("physical plan: partial+final pair with one exchange between") {
    val df = Seq((1L, 2L, 3L), (2L, 4L, 5L)).toDF("g", "v", "id").repartition(4)
    val plan = GroupTopK.topK(df, Seq("g"), Seq("v" -> false, "id" -> true), 2)
      .queryExecution.executedPlan.toString()
    // the exec node prints with the Exec suffix stripped
    assert("GroupTopK \\[".r.findAllIn(plan).size == 2, plan)
    assert(plan.contains("Exchange hashpartitioning(g"), plan)
  }

  test("single-partition child needs no exchange (SinglePartition satisfies)") {
    val df = Seq((1L, 2L, 3L)).toDF("g", "v", "id").coalesce(1)
    val plan = GroupTopK.topK(df, Seq("g"), Seq("v" -> false, "id" -> true), 2)
      .queryExecution.executedPlan.toString()
    assert(!plan.contains("Exchange hashpartitioning(g"), plan)
  }

  test("strategy leaves unrelated plans alone (smoke: normal query still plans)") {
    assert(Seq((1, 2)).toDF("a", "b").groupBy("a").count().count() == 1)
  }

  test("a table bucketed on the group key satisfies the final phase — zero exchanges") {
    val wh = java.nio.file.Files.createTempDirectory("topkbuckets").toString
    spark.sql(s"CREATE DATABASE IF NOT EXISTS topkdb LOCATION '$wh'")
    try {
      val rng = new Random(3)
      val df = Seq.tabulate(2000) { i =>
        (rng.nextInt(11).toLong, rng.nextInt(500).toLong, i.toLong)
      }.toDF("g", "v", "id")
      graft.io.Bucketing.writeBucketed(df, "topkdb.profile", Seq("g"), 4)
      val t = spark.table("topkdb.profile")
      val q = GroupTopK.topK(t, Seq("g"), Seq("v" -> false, "id" -> true), 3)
      val got = canon(q)
      assert(got == canon(windowTopK(df, 3)))
      val p = q.queryExecution.executedPlan.toString()
      assert("GroupTopK \\[".r.findAllIn(p).size == 2, p)
      assert(!p.contains("Exchange hashpartitioning"),
        s"bucketed layout should satisfy ClusteredDistribution:\n$p")
    } finally {
      spark.sql("DROP TABLE IF EXISTS topkdb.profile")
      spark.sql("DROP DATABASE IF EXISTS topkdb")
    }
  }
}
