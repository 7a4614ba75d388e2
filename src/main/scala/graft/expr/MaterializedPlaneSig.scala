package graft.expr

import org.apache.spark.sql.{Column, GraftBridge}
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, DoubleType, FloatType, LongType}

/** Packed sign signature on an EXPLICIT plane matrix: bit j of the output
  * long is set when `dot(vector, planes(j)) > 0`, the dot running in
  * ascending index order over `min(vector.length, planes(j).length)`
  * elements — bit-for-bit the semantics of the composed form it replaces
  * (one codegen'd [[DotProduct]] against a constant-folded literal array
  * per plane, OR-reduced), which [[graft.scale.Similarity.planeSignature]]
  * used for the md5-derived oracle-restatable plane family
  * ([[graft.scale.Similarity.md5Planes]]).
  *
  * Why a fused expression: 60 planes × 64 literal doubles expand the
  * composed form into a generated method far past Janino's 64 KB method
  * limit — the whole projection fell out of whole-stage codegen into
  * interpreted evaluation (an `InternalCompilerException` fallback on
  * every probe/build). Here the matrix is ONE reference object shared by
  * the generated class and the loop is a compact two-level primitive
  * walk, so the signature stays inside whole-stage codegen at any plane
  * count. `ExprParitySpec` pins native == composed == interpreted.
  *
  * The matrix is carried as `Seq[Seq[Double]]` so two expressions over
  * the same plane family are structurally equal (plan dedup /
  * ReusedExchange see through it); the hot path reads a transient
  * `double[][]` built once per task.
  */
final case class MaterializedPlaneSig(child: Expression, planes: Seq[Seq[Double]])
    extends UnaryExpression {

  require(planes.nonEmpty && planes.length <= 63,
    s"plane count must be in [1,63], got ${planes.length}")

  @transient private lazy val matrix: Array[Array[Double]] =
    planes.map(_.toArray).toArray

  override def dataType: DataType = LongType
  override def prettyName: String = "plane_sig"

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
    MaterializedPlaneSig.signature(
      i => if (float) arr.getFloat(i).toDouble else arr.getDouble(i),
      arr.numElements(), matrix)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, a => {
      val m = ctx.addReferenceObj("planes", matrix, "double[][]")
      val sig = ctx.freshName("sig"); val j = ctx.freshName("j")
      val s = ctx.freshName("s"); val i = ctx.freshName("i")
      val n = ctx.freshName("n"); val p = ctx.freshName("p")
      val getElem = if (isFloat) s"(double) $a.getFloat($i)" else s"$a.getDouble($i)"
      s"""
         |long $sig = 0L;
         |for (int $j = 0; $j < $m.length; $j++) {
         |  double[] $p = $m[$j];
         |  int $n = java.lang.Math.min($a.numElements(), $p.length);
         |  double $s = 0.0;
         |  for (int $i = 0; $i < $n; $i++) {
         |    $s += $getElem * $p[$i];
         |  }
         |  if ($s > 0.0) $sig |= (1L << $j);
         |}
         |${ev.value} = $sig;
       """.stripMargin
    })

  override protected def withNewChildInternal(newChild: Expression): MaterializedPlaneSig =
    copy(child = newChild)
}

object MaterializedPlaneSig {
  /** Shared interpreted kernel (also the spec's reference implementation). */
  def signature(elem: Int => Double, len: Int, matrix: Array[Array[Double]]): Long = {
    var sig = 0L
    var j = 0
    while (j < matrix.length) {
      val p = matrix(j)
      val n = math.min(len, p.length)
      var s = 0.0
      var i = 0
      while (i < n) { s += elem(i) * p(i); i += 1 }
      if (s > 0.0) sig |= (1L << j)
      j += 1
    }
    sig
  }

  def apply(emb: Column, planes: Seq[Seq[Double]]): Column =
    GraftBridge.column(MaterializedPlaneSig(GraftBridge.expression(emb), planes))
}
