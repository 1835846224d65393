package org.apache.spark.sql

import org.apache.spark.sql.catalyst.plans.logical.LogicalPlan

/** The one `private[sql]` door a plan-level library extension needs:
  * wrapping a custom [[LogicalPlan]] node into a user-facing DataFrame.
  * Everything else in graft.plans stays in graft's own package — this
  * object exists solely because `Dataset.ofRows` is package-private.
  */
object GraftPlanBridge {
  def ofRows(spark: SparkSession, plan: LogicalPlan): DataFrame =
    classic.Dataset.ofRows(spark.asInstanceOf[classic.SparkSession], plan)
}
