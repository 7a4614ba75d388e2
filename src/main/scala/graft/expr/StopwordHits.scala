package graft.expr

import org.apache.spark.sql.{Column, GraftBridge}
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, IntegerType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Occurrence count of vocabulary words in a word array (stopword hits —
  * the language-ID / quality-scoring primitive). Semantically identical
  * to `size(filter(ws, w => w.isin(vocab)))`, but that HOF chain is
  * CodegenFallback: interpreted, with a closure call and a boxed
  * comparison per word per vocabulary — and the scoring projection
  * evaluates it once per language list, twice when a pushed-down filter
  * references the scored alias. Here it is a primitive loop over a
  * shared UTF8String hash set inside whole-stage codegen.
  *
  * Duplicate words count once per OCCURRENCE (filter semantics, not
  * set-intersection semantics) — the cross-engine oracle restates this
  * as `len(list_filter(ws, x -> x IN (...)))`.
  */
final case class StopwordHits(child: Expression, vocab: Seq[String])
    extends UnaryExpression {

  require(vocab.nonEmpty, "vocab must be non-empty")

  // Seq constructor field keeps case-class equality structural (plan
  // canonicalization / ReuseExchange — see NearestCells).
  @transient private lazy val vocabSet: java.util.HashSet[UTF8String] = {
    val s = new java.util.HashSet[UTF8String](vocab.size * 2)
    vocab.foreach(w => s.add(UTF8String.fromString(w)))
    s
  }

  override def dataType: DataType = IntegerType
  override def prettyName: String = "stopword_hits"

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(StringType, _) => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires array<string>, got ${other.simpleString}")
  }

  override protected def nullSafeEval(input: Any): Any = {
    val arr = input.asInstanceOf[ArrayData]
    var hits = 0
    var i = 0
    val n = arr.numElements()
    while (i < n) {
      if (!arr.isNullAt(i) && vocabSet.contains(arr.getUTF8String(i))) hits += 1
      i += 1
    }
    hits
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, a => {
      val setRef = ctx.addReferenceObj("vocabSet", vocabSet, "java.util.HashSet")
      val hits = ctx.freshName("hits"); val i = ctx.freshName("i")
      val n = ctx.freshName("n")
      s"""
         |int $hits = 0;
         |int $n = $a.numElements();
         |for (int $i = 0; $i < $n; $i++) {
         |  if (!$a.isNullAt($i) && $setRef.contains($a.getUTF8String($i))) $hits++;
         |}
         |${ev.value} = $hits;
       """.stripMargin
    })

  override protected def withNewChildInternal(newChild: Expression): StopwordHits =
    copy(child = newChild)
}

object StopwordHits {
  def apply(ws: Column, vocab: Seq[String]): Column =
    GraftBridge.column(StopwordHits(GraftBridge.expression(ws), vocab))
}
