package org.apache.spark.sql

import org.apache.spark.sql.catalyst.expressions.Expression

/** Bridge into the sql-package-private Column ⇄ Expression conversions
  * (`classic.ExpressionUtils`), needed to expose a custom Catalyst
  * expression ([[graft.functions.VecDot]]) as a `Column` without going
  * through the SQL parser. Spark 4 scopes these helpers `private[sql]`, so
  * this one-object shim lives in the `org.apache.spark.sql` package — the
  * standard pattern for Spark-native extension libraries.
  */
object GraftSqlBridge {
  def column(e: Expression): Column = classic.ExpressionUtils.column(e)
  def expression(c: Column): Expression = classic.ExpressionUtils.expression(c)

  /** Wrap a (possibly custom) logical plan as a DataFrame —
    * `Dataset.ofRows` is `private[sql]` in Spark 4; needed to surface the
    * [[graft.plans]] custom operators through the public Dataset API.
    */
  def dataFrame(spark: SparkSession,
                plan: org.apache.spark.sql.catalyst.plans.logical.LogicalPlan): DataFrame =
    classic.Dataset.ofRows(spark.asInstanceOf[classic.SparkSession], plan)

}
