package graft

import graft.functions.VecDot
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
  override def apply(ext: SparkSessionExtensions): Unit =
    ext.injectFunction(GraftExtensions.vecDotDescriptor)
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

  /** Register the custom functions into an existing session. */
  def register(spark: SparkSession): Unit = {
    val (id, info, builder) = vecDotDescriptor
    spark.sessionState.functionRegistry.registerFunction(id, info, builder)
  }
}
