package graft.expr

import org.apache.spark.sql.{Column, GraftBridge}
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.types.{DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Unicode NFC normalization as a codegen'd expression. Canonically
  * equivalent strings ("é" precomposed vs "e" + U+0301) have DIFFERENT
  * bytes, so every byte-keyed operator downstream — exact-dedup content
  * keys, fingerprints, group-bys on text — silently treats them as
  * distinct documents. Production text pipelines normalize to NFC at the
  * ingestion boundary for exactly this reason; the reference has no
  * Unicode story (Python `str` comparisons are code-point-exact too).
  *
  * Already-NFC input (the overwhelming common case) pays one
  * `Normalizer.isNormalized` scan and returns the INPUT object — no
  * allocation, no copy; only genuinely denormalized strings pay the
  * String round trip. Both paths run inside whole-stage codegen via a
  * static helper call.
  */
final case class NfcNormalize(child: Expression) extends UnaryExpression {

  override def dataType: DataType = StringType
  override def prettyName: String = "nfc_normalize"

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"nfc_normalize requires string, got ${other.simpleString}")
  }

  override protected def nullSafeEval(input: Any): Any =
    NfcNormalize.normalize(input.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.expr.NfcNormalize.normalize($c)")

  override protected def withNewChildInternal(newChild: Expression): NfcNormalize =
    copy(child = newChild)
}

object NfcNormalize {

  /** Static entry shared by interpreted and generated code. */
  def normalize(s: UTF8String): UTF8String = {
    val str = s.toString
    if (java.text.Normalizer.isNormalized(str, java.text.Normalizer.Form.NFC)) s
    else UTF8String.fromString(
      java.text.Normalizer.normalize(str, java.text.Normalizer.Form.NFC))
  }

  def column(c: Column): Column =
    GraftBridge.column(NfcNormalize(GraftBridge.expression(c)))
}
