package org.apache.spark.sql

import org.apache.spark.sql.catalyst.plans.logical.LogicalPlan

/** Package bridge into the classic SparkSession internals the dialect
  * layer needs: parse a statement without executing it, and execute a
  * rewritten logical plan. Both are `private[sql]` on the classic
  * implementation, so this one-file shim exposes them — the same
  * pattern as `GraftHiveUdfBridge`.
  */
object GraftSqlBridge {

  private def classicSession(spark: SparkSession): classic.SparkSession =
    spark.asInstanceOf[classic.SparkSession]

  def parsePlan(spark: SparkSession, sqlText: String): LogicalPlan =
    classicSession(spark).sessionState.sqlParser.parsePlan(sqlText)

  def ofRows(spark: SparkSession, plan: LogicalPlan): DataFrame =
    classic.Dataset.ofRows(classicSession(spark), plan)

  /** Wrap a raw Catalyst Expression as a Column (private[sql] in
    * classic.ExpressionUtils) — for custom kernels used from the
    * DataFrame API without a SQL registration.
    */
  def column(e: org.apache.spark.sql.catalyst.expressions.Expression): Column =
    classic.ExpressionUtils.column(e)

  /** The Catalyst expression behind a Column. */
  def expression(c: Column): org.apache.spark.sql.catalyst.expressions.Expression =
    classic.ExpressionUtils.expression(c)
}
