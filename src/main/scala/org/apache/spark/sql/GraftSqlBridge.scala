package org.apache.spark.sql

import org.apache.spark.sql.catalyst.plans.logical.LogicalPlan

/** Minimal `private[sql]` bridge: build a DataFrame from a custom
  * LogicalPlan node (`Dataset.ofRows` is package-private to
  * `org.apache.spark.sql`). This is the standard extension-library
  * pattern — the only member of this package the engine defines, and it
  * forwards without touching any internal state.
  */
object GraftSqlBridge {
  def ofRows(spark: SparkSession, plan: LogicalPlan): DataFrame =
    classic.Dataset.ofRows(spark.asInstanceOf[classic.SparkSession], plan)
}
