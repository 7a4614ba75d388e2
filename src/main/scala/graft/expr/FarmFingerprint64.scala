package graft.expr

import org.apache.spark.sql.{Column, GraftBridge}
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.types.{BinaryType, DataType, LongType}

/** Native Catalyst expression computing Google FarmHash Fingerprint64 —
  * bit-exact parity with the reference's `farm_fingerprint` clean mode
  * (`data_structures.py:1348-1353`, which calls the farmhash package's
  * Fingerprint64). The one place SURVEY.md §4 identified where a custom
  * `Expression` is needed; everything else in the engine composes
  * built-ins.
  *
  * Both interpreted and codegen paths delegate to Guava's
  * `FarmHashFingerprint64` (shipped with Spark), so the expression stays
  * inside whole-stage codegen — no UDF boundary, no serialization.
  *
  * Note: the value is the UNSIGNED 64-bit fingerprint carried in a Spark
  * LongType (two's-complement bits identical; render with
  * `conv(hex(x), 16, 10)` for the reference's unsigned decimal form).
  */
final case class FarmFingerprint64(child: Expression) extends UnaryExpression {

  override def dataType: DataType = LongType
  override def prettyName: String = "farm_fingerprint64"

  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == BinaryType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"farm_fingerprint64 requires BINARY input, got ${child.dataType.simpleString}")

  override protected def nullSafeEval(input: Any): Any =
    com.google.common.hash.Hashing.farmHashFingerprint64()
      .hashBytes(input.asInstanceOf[Array[Byte]]).asLong()

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c =>
      s"com.google.common.hash.Hashing.farmHashFingerprint64().hashBytes($c).asLong()")

  override protected def withNewChildInternal(newChild: Expression): FarmFingerprint64 =
    copy(child = newChild)
}

object FarmFingerprint64 {
  /** Column form: fingerprint of a binary column (cast strings first —
    * `c.cast("binary")` is the UTF-8 bytes, matching the reference's
    * `_value_to_bytes`).
    */
  def apply(c: Column): Column =
    GraftBridge.column(FarmFingerprint64(GraftBridge.expression(c)))
}
