package graft

import graft.functions.{LnLibm, VecDot}
import org.apache.spark.sql.{SparkSession, SparkSessionExtensions}
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo}

/** Session extension installer — makes the engine's custom expressions
  * available to SQL users:
  *
  * {{{
  *   spark.sql.extensions=graft.GraftExtensions
  *   SELECT vec_dot(embedding, query_vec) FROM embeddings
  * }}}
  *
  * The same registration can be applied to an already-built session via
  * [[GraftExtensions.register]] (used by the test suite, where the shared
  * session exists before the extension class could be configured).
  */
class GraftExtensions extends (SparkSessionExtensions => Unit) {
  override def apply(ext: SparkSessionExtensions): Unit = {
    GraftExtensions.descriptors.foreach(ext.injectFunction)
    ext.injectPlannerStrategy(_ => graft.plans.TopKStrategy)
    ext.injectOptimizerRule(_ => graft.plans.RowNumberTopKRewrite)
    // PRE-CBO, not injectOptimizerRule: extension optimizer rules run
    // inside the operator-optimization batch, BEFORE V2 scan planning
    // creates the DataSourceV2ScanRelation the MV match needs — there
    // the rule could never fire (round-18 review finding). The pre-CBO
    // batch runs after scan planning; `register()`'s
    // experimental.extraOptimizations placement (last) works too.
    ext.injectPreCBORule(_ => graft.plans.MvRewrite)
    // SQL surface for the one-commit MERGE WITH SCHEMA EVOLUTION on
    // graft-cow targets (round-17 brief #3); every other statement
    // delegates to Spark's parser byte-identically.
    ext.injectParser((session, delegate) =>
      new graft.plans.GraftSqlParser(session, delegate))
  }
}

object GraftExtensions {
  private[graft] val vecDotDescriptor
      : (FunctionIdentifier, ExpressionInfo, Seq[Expression] => Expression) = (
    FunctionIdentifier("vec_dot"),
    new ExpressionInfo(classOf[VecDot].getName, "vec_dot"),
    (children: Seq[Expression]) => {
      require(children.length == 2, "vec_dot(a, b) takes exactly 2 arguments")
      VecDot(children.head, children(1))
    })

  private[graft] val lnLibmDescriptor
      : (FunctionIdentifier, ExpressionInfo, Seq[Expression] => Expression) = (
    FunctionIdentifier("ln_libm"),
    new ExpressionInfo(classOf[LnLibm].getName, "ln_libm"),
    (children: Seq[Expression]) => {
      require(children.length == 1, "ln_libm(x) takes exactly 1 argument")
      LnLibm(children.head)
    })

  private val descriptors = Seq(vecDotDescriptor, lnLibmDescriptor)

  /** Register the custom functions and planner strategy into an existing
    * session (the extensions-conf path above covers sessions built with
    * `spark.sql.extensions=graft.GraftExtensions`).
    */
  def register(spark: SparkSession): Unit = {
    descriptors.foreach { case (id, info, builder) =>
      spark.sessionState.functionRegistry.registerFunction(id, info, builder)
    }
    if (!spark.experimental.extraStrategies.contains(graft.plans.TopKStrategy))
      spark.experimental.extraStrategies =
        spark.experimental.extraStrategies :+ graft.plans.TopKStrategy
    if (!spark.experimental.extraOptimizations.contains(graft.plans.RowNumberTopKRewrite))
      spark.experimental.extraOptimizations =
        spark.experimental.extraOptimizations :+ graft.plans.RowNumberTopKRewrite
    if (!spark.experimental.extraOptimizations.contains(graft.plans.MvRewrite))
      spark.experimental.extraOptimizations =
        spark.experimental.extraOptimizations :+ graft.plans.MvRewrite
  }
}
