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

  /** Unload every loaded state-store provider (and its RocksDB native
    * state) from this JVM. A STOPPED streaming query's providers stay
    * loaded until the 60 s maintenance tick gets around to them, and with
    * changelog checkpointing the maintenance work is the DEFERRED
    * snapshot — so a benchmark suite that runs 13 streaming queries then
    * heavy batch queries has that O(state) work landing inside later
    * queries' timings. The next streaming query transparently reloads
    * providers and restarts maintenance — this is the executor-shutdown
    * path, safe between queries. `private[sql]` in Spark 4, hence bridged.
    */
  def unloadStateStores(): Unit =
    execution.streaming.state.StateStore.stop()
}
