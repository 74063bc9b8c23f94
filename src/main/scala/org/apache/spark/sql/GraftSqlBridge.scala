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

  /** Catalyst expression behind a Column (Spark 4 wraps columns in
    * ColumnNodes; the converter lives behind `private[sql]`).
    */
  def expression(col: Column): org.apache.spark.sql.catalyst.expressions.Expression =
    classic.ExpressionUtils.expression(col)
}
