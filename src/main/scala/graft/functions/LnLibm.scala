package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.types.{DataType, DoubleType}

/** Natural log via `java.lang.Math.log` — NOT Spark's built-in `log`,
  * which routes through `StrictMath.log` (fdlibm) and disagrees with
  * platform libm by 1-2 ulp on some inputs (verified: ln(500/386) differs
  * in the last two bits). DuckDB's `ln` is platform libm, and `Math.log`
  * matches it bit-for-bit across the whole N/df ratio range the TF-IDF
  * query produces — so expressions scored with [[LnLibm]] hash-match the
  * oracle exactly, while the built-in would be permanently 2 ulp red.
  *
  * Spark's StrictMath choice buys cross-platform reproducibility; this
  * expression deliberately trades that for cross-ENGINE reproducibility
  * on one platform, which is what the verification contract needs. Same
  * (b)-tier codegen'd-Expression shape as [[VecDot]]: the call compiles
  * into the whole-stage loop (and `Math.log` JIT-compiles to the same
  * bits as its interpreted form — verified under a hot loop).
  */
case class LnLibm(child: Expression) extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == DoubleType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"ln_libm requires double, got ${child.dataType.catalogString}")

  override def dataType: DataType = DoubleType

  override def prettyName: String = "ln_libm"

  override def nullSafeEval(x: Any): Any =
    java.lang.Math.log(x.asInstanceOf[Double])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, x => s"java.lang.Math.log($x)")

  override protected def withNewChildInternal(newChild: Expression): LnLibm =
    copy(child = newChild)
}
