package graft.expr

import org.apache.spark.sql.{Column, GraftBridge}
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression, XXH64}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, DoubleType, FloatType, LongType}

/** Packed hyperplane-LSH signature: bit j of the output long is the sign
  * of the dot product between the input vector and pseudo-random plane j,
  * whose coefficient at dimension i is
  * `xxhash64(j*100003 + i) / Long.MaxValue` — deterministic, seedless
  * state, identical across runs and engines.
  *
  * Bit-for-bit equal to the higher-order-function formulation it replaces
  * (`transform`/`zip_with`/`aggregate` nests — all CodegenFallback, so the
  * hot projection was interpreted with per-element boxing and two
  * allocated accumulator arrays per plane): the hash argument is the INT
  * `j*100003 + i` exactly as the column expression typed it, and the sum
  * runs in index order. Here it is one fused primitive loop inside
  * whole-stage codegen, no allocation at all.
  */
final case class HyperplaneSig(child: Expression, dim: Int, numPlanes: Int)
    extends UnaryExpression {

  require(numPlanes > 0 && numPlanes <= 63, s"numPlanes must be in [1,63], got $numPlanes")
  require(dim > 0, s"dim must be positive, got $dim")

  override def dataType: DataType = LongType
  override def prettyName: String = "hyperplane_sig"

  private def isFloat: Boolean = child.dataType match {
    case ArrayType(FloatType, _) => true
    case _ => false
  }

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(FloatType, _) | ArrayType(DoubleType, _) => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires array<float> or array<double>, got ${other.simpleString}")
  }

  override protected def nullSafeEval(input: Any): Any = {
    val arr = input.asInstanceOf[ArrayData]
    val float = isFloat
    HyperplaneSig.signature(
      i => if (float) arr.getFloat(i).toDouble else arr.getDouble(i),
      math.min(arr.numElements(), dim), numPlanes)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, a => {
      val sig = ctx.freshName("sig"); val j = ctx.freshName("j")
      val s = ctx.freshName("s"); val i = ctx.freshName("i")
      val n = ctx.freshName("n")
      val getElem = if (isFloat) s"(double) $a.getFloat($i)" else s"$a.getDouble($i)"
      s"""
         |long $sig = 0L;
         |int $n = java.lang.Math.min($a.numElements(), $dim);
         |for (int $j = 0; $j < $numPlanes; $j++) {
         |  double $s = 0.0;
         |  for (int $i = 0; $i < $n; $i++) {
         |    $s += $getElem *
         |      ((double) org.apache.spark.sql.catalyst.expressions.XXH64.hashInt(
         |         $j * 100003 + $i, 42L) / (double) Long.MAX_VALUE);
         |  }
         |  if ($s > 0.0) $sig |= (1L << $j);
         |}
         |${ev.value} = $sig;
       """.stripMargin
    })

  override protected def withNewChildInternal(newChild: Expression): HyperplaneSig =
    copy(child = newChild)
}

object HyperplaneSig {
  /** Shared interpreted kernel (also the spec's reference implementation). */
  def signature(elem: Int => Double, n: Int, numPlanes: Int): Long = {
    var sig = 0L
    var j = 0
    while (j < numPlanes) {
      var s = 0.0
      var i = 0
      while (i < n) {
        s += elem(i) * (XXH64.hashInt(j * 100003 + i, 42L).toDouble / Long.MaxValue.toDouble)
        i += 1
      }
      if (s > 0.0) sig |= (1L << j)
      j += 1
    }
    sig
  }

  def apply(emb: Column, dim: Int, numPlanes: Int): Column =
    GraftBridge.column(HyperplaneSig(GraftBridge.expression(emb), dim, numPlanes))
}
