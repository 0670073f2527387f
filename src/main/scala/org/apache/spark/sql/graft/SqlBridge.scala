package org.apache.spark.sql.graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.catalyst.plans.logical.LogicalPlan
import org.apache.spark.sql.classic.{Dataset, SparkSession}

/** Minimal bridge into `private[sql]` planner surface: turning a custom
  * [[LogicalPlan]] (e.g. [[graft.plans.AsofJoin]]) into a DataFrame needs
  * `classic.Dataset.ofRows`, whose companion is sql-private. Living in a
  * subpackage of `org.apache.spark.sql` grants access — the same pattern
  * Spark connector libraries use. Nothing else from the private surface
  * is touched.
  */
object SqlBridge {
  def ofRows(spark: SparkSession, plan: LogicalPlan): DataFrame =
    Dataset.ofRows(spark, plan)
}
