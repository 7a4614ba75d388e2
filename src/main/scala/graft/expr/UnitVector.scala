package graft.expr

import org.apache.spark.sql.{Column, GraftBridge}
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types.{ArrayType, DataType, DoubleType}

/** Native codegen'd unit-vector projection: `e / ‖e‖₂` for an
  * `array<double>` column, the L2 norm computed ONCE per row.
  *
  * The declarative form — `transform(e, x -> x / __n)` over an aliased
  * `__n = sqrt(dot(e, e))` — is defeated by the optimizer: CollapseProject
  * inlines a single-use alias back into the lambda, so the norm (an
  * O(dim) dot) is re-evaluated per ELEMENT (O(dim²) per row), and
  * `ArrayTransform` is CodegenFallback, so all of it runs interpreted
  * with boxed lambda variables. At 10⁹ vectors the unit projection is on
  * every LSH/ANN ingest path; this expression is one primitive
  * two-pass loop (squares-sum, then divide) inside whole-stage codegen.
  *
  * Values are bit-identical to the declarative form: the squares sum
  * runs in ascending index order (the [[DotProduct]] contract), the norm
  * is one IEEE `sqrt`, and each element is one IEEE divide — the
  * operations DuckDB oracles reproduce exactly.
  *
  * NULL array → NULL (null-safe). Elements are assumed non-null, as
  * everywhere else in the embedding family.
  */
final case class UnitVector(child: Expression) extends UnaryExpression {

  override def dataType: DataType = ArrayType(DoubleType, containsNull = false)
  override def prettyName: String = "unit_vector"

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(DoubleType, _) => TypeCheckResult.TypeCheckSuccess
    case dt => TypeCheckResult.TypeCheckFailure(
      s"unit_vector requires array<double>, got ${dt.simpleString}")
  }

  override protected def nullSafeEval(a: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    val n = x.numElements()
    var ss = 0.0
    var i = 0
    while (i < n) { val v = x.getDouble(i); ss += v * v; i += 1 }
    val nrm = math.sqrt(ss)
    val out = new Array[Any](n)
    i = 0
    while (i < n) { out(i) = x.getDouble(i) / nrm; i += 1 }
    new GenericArrayData(out)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, a => {
      val n = ctx.freshName("n")
      val i = ctx.freshName("i")
      val ss = ctx.freshName("ss")
      val nrm = ctx.freshName("nrm")
      val out = ctx.freshName("out")
      s"""
         |int $n = $a.numElements();
         |double $ss = 0.0;
         |for (int $i = 0; $i < $n; $i++) {
         |  double v = $a.getDouble($i);
         |  $ss += v * v;
         |}
         |double $nrm = java.lang.Math.sqrt($ss);
         |double[] $out = new double[$n];
         |for (int $i = 0; $i < $n; $i++) {
         |  $out[$i] = $a.getDouble($i) / $nrm;
         |}
         |${ev.value} = org.apache.spark.sql.catalyst.util.ArrayData.toArrayData($out);
       """.stripMargin
    })

  override protected def withNewChildInternal(newChild: Expression): UnitVector =
    copy(child = newChild)
}

object UnitVector {
  def apply(a: Column): Column =
    GraftBridge.column(UnitVector(GraftBridge.expression(a)))
}
