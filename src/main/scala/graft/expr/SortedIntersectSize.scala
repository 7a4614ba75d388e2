package graft.expr

import org.apache.spark.sql.{Column, GraftBridge}
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, IntegerType, LongType, StringType}

/** Native codegen'd intersection SIZE of two SORTED arrays (binary-
  * comparison order, i.e. Spark's `array_sort` order) — a merge scan,
  * O(n+m) with zero allocations. Supports `array<string>` (shingle
  * strings) and `array<long>` (hashed shingle sets).
  *
  * `size(array_intersect(a, b))` builds a hash set of boxed elements per
  * CALL — on near-dup verification that is millions of set builds. Callers
  * must pre-sort both sides once per ROW (`array_sort` or
  * [[ShingleHashSet]]), which the dedup operators do in their enrichment
  * stage.
  */
final case class SortedIntersectSize(left: Expression, right: Expression)
    extends BinaryExpression {

  override def dataType: DataType = IntegerType
  override def prettyName: String = "sorted_intersect_size"

  private def elemOk(dt: DataType): Boolean = dt match {
    case ArrayType(StringType, _) | ArrayType(LongType, _) => true
    case _ => false
  }
  private def isLong: Boolean = left.dataType match {
    case ArrayType(LongType, _) => true
    case _ => false
  }

  override def checkInputDataTypes(): TypeCheckResult = {
    def elem(dt: DataType): DataType = dt.asInstanceOf[ArrayType].elementType
    if (elemOk(left.dataType) && elemOk(right.dataType) &&
        elem(left.dataType) == elem(right.dataType))
      TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"sorted_intersect_size requires two array<string> or two array<bigint> inputs, got " +
        s"${left.dataType.simpleString} and ${right.dataType.simpleString}")
  }

  override protected def nullSafeEval(a: Any, b: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    val y = b.asInstanceOf[ArrayData]
    var i = 0; var j = 0; var c = 0
    val n = x.numElements(); val m = y.numElements()
    val long = isLong
    while (i < n && j < m) {
      val cmp =
        if (long) java.lang.Long.compare(x.getLong(i), y.getLong(j))
        else x.getUTF8String(i).compareTo(y.getUTF8String(j))
      if (cmp == 0) { c += 1; i += 1; j += 1 }
      else if (cmp < 0) i += 1
      else j += 1
    }
    c
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val i = ctx.freshName("i"); val j = ctx.freshName("j")
      val c = ctx.freshName("c"); val cmp = ctx.freshName("cmp")
      val n = ctx.freshName("n"); val m = ctx.freshName("m")
      val cmpExpr =
        if (isLong) s"java.lang.Long.compare($a.getLong($i), $b.getLong($j))"
        else s"$a.getUTF8String($i).compareTo($b.getUTF8String($j))"
      s"""
         |int $i = 0, $j = 0, $c = 0;
         |int $n = $a.numElements(), $m = $b.numElements();
         |while ($i < $n && $j < $m) {
         |  int $cmp = $cmpExpr;
         |  if ($cmp == 0) { $c++; $i++; $j++; }
         |  else if ($cmp < 0) { $i++; } else { $j++; }
         |}
         |${ev.value} = $c;
       """.stripMargin
    })

  override protected def withNewChildrenInternal(newLeft: Expression, newRight: Expression): SortedIntersectSize =
    copy(left = newLeft, right = newRight)
}

object SortedIntersectSize {
  def apply(a: Column, b: Column): Column =
    GraftBridge.column(SortedIntersectSize(GraftBridge.expression(a), GraftBridge.expression(b)))
}
