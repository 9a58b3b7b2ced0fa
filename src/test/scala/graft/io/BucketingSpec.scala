package graft.io

import graft.{SparkSpec, Tables}
import org.apache.spark.sql.functions._

/** Bucketed-table co-location: a join of two tables bucketed+sorted on
  * the join key must plan with NO shuffle exchange and NO per-query sort
  * on either side — the layout IS the distribution.
  */
class BucketingSpec extends SparkSpec {

  private val sf = "/root/testdata/sf0.001"

  test("bucketed tables sort-merge join without exchange or sort") {
    val wh = java.nio.file.Files.createTempDirectory("bucketdb").toString
    spark.sql(s"CREATE DATABASE IF NOT EXISTS bucketdb LOCATION '$wh'")
    try {
      val ev = Tables.events(spark, sf)
        .select("user_id", "event_id", "value")
      Bucketing.writeBucketed(ev, "bucketdb.ev_facts", Seq("user_id"), 8)
      Bucketing.writeBucketed(
        ev.groupBy("user_id").agg(avg(col("value")).as("mean_v")),
        "bucketdb.ev_stats", Seq("user_id"), 8)

      val prevThresh = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1") // force SMJ
      try {
        val j = spark.table("bucketdb.ev_facts")
          .join(spark.table("bucketdb.ev_stats"), "user_id")
          .filter(col("value") > col("mean_v"))
        val n = j.collect().length // drive THIS query execution, not a count() derivative
        assert(n > 0)
        val plan = j.queryExecution.executedPlan.toString
        assert(plan.contains("SortMergeJoin"), plan)
        assert(!plan.contains("Exchange hashpartitioning"),
          s"bucketed join still shuffles:\n$plan")
        // sortBy + one file per bucket additionally removes the per-query
        // Sort — but scan output ORDERING is behind a legacy flag since
        // SPARK-28595 (partitioning is always propagated; ordering is not)
        spark.conf.set("spark.sql.legacy.bucketedTableScan.outputOrdering", "true")
        try {
          val j2 = spark.table("bucketdb.ev_facts")
            .join(spark.table("bucketdb.ev_stats"), "user_id")
            .filter(col("value") > col("mean_v"))
          j2.collect()
          val plan2 = j2.queryExecution.executedPlan.toString
          assert(!plan2.contains("Exchange hashpartitioning") &&
            !plan2.contains("Sort ["),
            s"sorted-bucket join should be exchange- and sort-free:\n$plan2")
        } finally spark.conf
          .unset("spark.sql.legacy.bucketedTableScan.outputOrdering")

        // control: the same join over plain parquet MUST shuffle — the
        // assertion above is meaningful, not vacuous
        val plain = ev.join(
          ev.groupBy("user_id").agg(avg(col("value")).as("mean_v")), "user_id")
        plain.count()
        assert(plain.queryExecution.executedPlan.toString
          .contains("Exchange hashpartitioning"))
      } finally spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prevThresh)
    } finally {
      spark.sql("DROP DATABASE IF EXISTS bucketdb CASCADE")
    }
  }
}
