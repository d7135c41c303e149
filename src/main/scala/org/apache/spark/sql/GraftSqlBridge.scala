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

  /** Explicit bloom-semi-join runtime filter, quarantining the PRIVATE
    * Catalyst surface it needs (`BloomFilterAggregate`,
    * `BloomFilterMightContain`, `ScalarSubquery` over an analyzed plan —
    * the pieces `InjectRuntimeFilter` wires internally) into this one
    * bridge file. The filter is semantically OPTIONAL pruning — callers
    * (`Analytics.qBloomJoin`) treat `None` as "run the plain equi-join
    * unpruned" — so a Spark minor-version change to these internals must
    * only ever cost performance here, never correctness or a build break
    * outside this file. Any construction/analysis failure is caught and
    * collapsed to `None`.
    *
    * @param buildKeyHash xxhash64 of the build (dimension) side's key,
    *                     evaluated against `buildSide`
    * @param probeKeyHash xxhash64 of the probe (fact) side's key
    * @return a `might_contain` predicate Column for the probe side, or
    *         `None` if the internal API is unavailable
    */
  def bloomMightContain(buildSide: DataFrame,
                        buildKeyHash: Column,
                        probeKeyHash: Column): Option[Column] =
    scala.util.Try {
      import org.apache.spark.sql.catalyst.expressions.{BloomFilterMightContain, ScalarSubquery}
      import org.apache.spark.sql.catalyst.expressions.aggregate.BloomFilterAggregate
      val bloom = buildSide.select(column(
        new BloomFilterAggregate(expression(buildKeyHash))
          .toAggregateExpression()).as("bf"))
      column(BloomFilterMightContain(
        ScalarSubquery(bloom.queryExecution.analyzed),
        expression(probeKeyHash)))
    } match {
      case scala.util.Success(c) => Some(c)
      case scala.util.Failure(e) =>
        // The None path only costs pruning, never correctness — but a
        // silent None after a Spark upgrade breaking these internals is a
        // permanent invisible performance regression. Warn ONCE per JVM so
        // the degraded path is observable without spamming per-query.
        if (bloomWarned.compareAndSet(false, true)) {
          System.err.println(
            "[graft] bloom runtime-filter construction failed; joins run " +
              s"unpruned from here on (internal API drift?): $e")
        }
        None
    }

  private val bloomWarned = new java.util.concurrent.atomic.AtomicBoolean(false)
}
