package graft.expr

import org.apache.spark.sql.SparkSessionExtensions
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo}

/** SparkSessionExtensions registration: makes the engine's custom
  * expressions available to SQL as functions. Enable with
  * `spark.sql.extensions=graft.expr.GraftExtensions`.
  */
class GraftExtensions extends (SparkSessionExtensions => Unit) {
  override def apply(ext: SparkSessionExtensions): Unit = {
    ext.injectFunction((
      FunctionIdentifier("farm_fingerprint64"),
      new ExpressionInfo(classOf[FarmFingerprint64].getName, "farm_fingerprint64"),
      (children: Seq[Expression]) => FarmFingerprint64(children.head)))
    ext.injectFunction((
      FunctionIdentifier("dot_product"),
      new ExpressionInfo(classOf[DotProduct].getName, "dot_product"),
      (children: Seq[Expression]) => DotProduct(children(0), children(1))))
  }
}
