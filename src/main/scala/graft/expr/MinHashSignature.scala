package graft.expr

import org.apache.spark.sql.{Column, GraftBridge}
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types.{ArrayType, DataType, LongType, StringType}
import org.apache.spark.sql.catalyst.expressions.XXH64
import org.apache.spark.unsafe.types.UTF8String

/** Native codegen'd MinHash signature: for each of `numHashes` seeds, the
  * minimum xxhash64(seed, shingle) over a string array.
  *
  * The HOF formulation (aggregate + zip_with + transform) is a
  * CodegenFallback — interpreted with boxed lambdas, allocating two
  * `numHashes`-element arrays per shingle. This expression is a primitive
  * double loop over the unsafe string bytes inside whole-stage codegen.
  * Seeds are the hash indices (0..numHashes-1), deterministic across runs.
  */
final case class MinHashSignature(child: Expression, numHashes: Int)
    extends UnaryExpression {

  require(numHashes > 0, "numHashes must be positive")

  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def prettyName: String = "minhash_signature"

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(StringType, _) => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"minhash_signature requires array<string>, got ${other.simpleString}")
  }

  override protected def nullSafeEval(input: Any): Any = {
    val arr = input.asInstanceOf[ArrayData]
    val sig = Array.fill(numHashes)(Long.MaxValue)
    var k = 0
    val n = arr.numElements()
    while (k < n) {
      if (!arr.isNullAt(k)) {
        val s = arr.getUTF8String(k)
        var j = 0
        while (j < numHashes) {
          val h = XXH64.hashUnsafeBytes(s.getBaseObject, s.getBaseOffset, s.numBytes, j.toLong)
          if (h < sig(j)) sig(j) = h
          j += 1
        }
      }
      k += 1
    }
    new GenericArrayData(sig)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, a => {
      val sig = ctx.freshName("sig")
      val k = ctx.freshName("k")
      val j = ctx.freshName("j")
      val s = ctx.freshName("s")
      val h = ctx.freshName("h")
      val n = ctx.freshName("n")
      s"""
         |long[] $sig = new long[$numHashes];
         |java.util.Arrays.fill($sig, Long.MAX_VALUE);
         |int $n = $a.numElements();
         |for (int $k = 0; $k < $n; $k++) {
         |  if (!$a.isNullAt($k)) {
         |    UTF8String $s = $a.getUTF8String($k);
         |    for (int $j = 0; $j < $numHashes; $j++) {
         |      long $h = org.apache.spark.sql.catalyst.expressions.XXH64.hashUnsafeBytes(
         |        $s.getBaseObject(), $s.getBaseOffset(), $s.numBytes(), (long) $j);
         |      if ($h < $sig[$j]) $sig[$j] = $h;
         |    }
         |  }
         |}
         |${ev.value} = new org.apache.spark.sql.catalyst.util.GenericArrayData($sig);
       """.stripMargin
    })

  override protected def withNewChildInternal(newChild: Expression): MinHashSignature =
    copy(child = newChild)
}

object MinHashSignature {
  def apply(c: Column, numHashes: Int): Column =
    GraftBridge.column(MinHashSignature(GraftBridge.expression(c), numHashes))
}
