package org.apache.spark.sql

import org.apache.spark.sql.catalyst.plans.logical.LogicalPlan

/** Bridge to Spark 4's package-private `Dataset.ofRows`, needed to
  * wrap a custom logical operator (e.g. graft's TopKPerKeyNode) back
  * into a public DataFrame. Sibling of [[GraftExprBridge]].
  */
object GraftPlanBridge {
  def ofRows(spark: SparkSession, plan: LogicalPlan): DataFrame =
    classic.Dataset.ofRows(spark.asInstanceOf[classic.SparkSession], plan)
}
