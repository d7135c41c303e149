package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.types.{DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Unicode NFC normalization (canonical composition) as a Catalyst
  * expression — the text-pipeline step that MUST precede any
  * hash/fingerprint dedup: "café" with a precomposed é (U+00E9) and
  * "café" with e + combining acute (U+0065 U+0301) are byte-different,
  * so every exact-dedup, MinHash shingle, SimHash fingerprint and
  * tokenizer in the engine would treat them as distinct documents unless
  * the corpus is normalized to one canonical form first. Spark ships no
  * normalization function (SPARK-34618 territory); a Scala UDF would
  * leave whole-stage codegen and serialize every row — so this is the
  * (b)-tier codegen'd Expression the build plan prescribes
  * ([[VecDot]] / [[LnLibm]] shape): the `java.text.Normalizer.normalize`
  * call compiles straight into the stage loop.
  *
  * Determinism across engines: NFC is defined by the Unicode standard,
  * not by an engine — the JDK's Normalizer and DuckDB's `nfc_normalize`
  * implement the same canonical composition, so outputs hash-match
  * (gated by q_clean_text). The UTF8String round-trip is exact: decode
  * to UTF-16, compose, re-encode.
  */
case class NfcNormalize(child: Expression) extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == StringType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"nfc_normalize requires string, got ${child.dataType.catalogString}")

  override def dataType: DataType = StringType

  override def prettyName: String = "nfc_normalize"

  override def nullSafeEval(s: Any): Any =
    NfcNormalize.normalize(s.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev,
      s => s"graft.functions.NfcNormalize.normalize($s)")

  override protected def withNewChildInternal(newChild: Expression): NfcNormalize =
    copy(child = newChild)
}

object NfcNormalize {
  /** Shared by interpreted and codegen paths — one definition, one
    * behavior. The isNormalized fast path skips the UTF-16 composition
    * pass for already-canonical text (the overwhelmingly common case in
    * a mostly-ASCII corpus; ASCII is trivially NFC).
    */
  def normalize(s: UTF8String): UTF8String = {
    val str = s.toString
    if (java.text.Normalizer.isNormalized(str, java.text.Normalizer.Form.NFC)) s
    else UTF8String.fromString(
      java.text.Normalizer.normalize(str, java.text.Normalizer.Form.NFC))
  }
}
