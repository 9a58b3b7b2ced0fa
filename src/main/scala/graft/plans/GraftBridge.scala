package org.apache.spark.sql

import org.apache.spark.sql.catalyst.plans.logical.LogicalPlan

/** `private[sql]`-scope bridge: [[org.apache.spark.sql.classic.Dataset.ofRows]]
  * is the only public-jar way to lift a hand-built [[LogicalPlan]] (like
  * [[graft.plans.GroupTopK]]) into a `DataFrame`, and it is package-private to
  * `org.apache.spark.sql`. This one-liner lives in that package solely to
  * re-export it; nothing else in the repo does.
  */
object GraftBridge {
  def ofRows(spark: SparkSession, plan: LogicalPlan): DataFrame =
    classic.Dataset.ofRows(spark.asInstanceOf[classic.SparkSession], plan)
}
