package graft.expr

import org.apache.spark.sql.{Column, GraftBridge}
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression, XXH64}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, LongType, StringType}

/** Native codegen'd SimHash: 64-bit signature of a string array. Per
  * element, xxhash64 (seed 42, matching Spark's `xxhash64` function) votes
  * ±1 on each bit position; the output sets bit i when votes(i) > 0.
  *
  * Replaces the HOF formulation (`aggregate` + `zip_with` over a 64-mask
  * array), which is CodegenFallback — interpreted lambdas allocating two
  * 64-element boxed arrays per word. This is a primitive loop over the
  * unsafe string bytes inside whole-stage codegen.
  */
final case class SimHash64(child: Expression) extends UnaryExpression {

  override def dataType: DataType = LongType
  override def prettyName: String = "simhash64"

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(StringType, _) => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"simhash64 requires array<string>, got ${other.simpleString}")
  }

  override protected def nullSafeEval(input: Any): Any = {
    val arr = input.asInstanceOf[ArrayData]
    val votes = new Array[Int](64)
    val n = arr.numElements()
    var k = 0
    while (k < n) {
      if (!arr.isNullAt(k)) {
        val s = arr.getUTF8String(k)
        val h = XXH64.hashUnsafeBytes(s.getBaseObject, s.getBaseOffset, s.numBytes, 42L)
        var i = 0
        while (i < 64) {
          if (((h >>> i) & 1L) == 1L) votes(i) += 1 else votes(i) -= 1
          i += 1
        }
      }
      k += 1
    }
    var sig = 0L
    var i = 0
    while (i < 64) {
      if (votes(i) > 0) sig |= (1L << i)
      i += 1
    }
    sig
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, a => {
      val votes = ctx.freshName("votes")
      val k = ctx.freshName("k")
      val i = ctx.freshName("i")
      val s = ctx.freshName("s")
      val h = ctx.freshName("h")
      val n = ctx.freshName("n")
      val sig = ctx.freshName("sig")
      s"""
         |int[] $votes = new int[64];
         |int $n = $a.numElements();
         |for (int $k = 0; $k < $n; $k++) {
         |  if (!$a.isNullAt($k)) {
         |    UTF8String $s = $a.getUTF8String($k);
         |    long $h = org.apache.spark.sql.catalyst.expressions.XXH64.hashUnsafeBytes(
         |      $s.getBaseObject(), $s.getBaseOffset(), $s.numBytes(), 42L);
         |    for (int $i = 0; $i < 64; $i++) {
         |      if ((($h >>> $i) & 1L) == 1L) $votes[$i]++; else $votes[$i]--;
         |    }
         |  }
         |}
         |long $sig = 0L;
         |for (int $i = 0; $i < 64; $i++) {
         |  if ($votes[$i] > 0) $sig |= (1L << $i);
         |}
         |${ev.value} = $sig;
       """.stripMargin
    })

  override protected def withNewChildInternal(newChild: Expression): SimHash64 =
    copy(child = newChild)
}

object SimHash64 {
  def apply(c: Column): Column =
    GraftBridge.column(SimHash64(GraftBridge.expression(c)))
}
